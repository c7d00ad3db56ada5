"""CLI: run the north quality-filter pipeline (with resume).

    python -m data_quality_ray run INPUT_DIR OUT_DIR [--cpus N]
        [--batch-size B] [--concurrency C] [--no-dedup] [--no-validate]
    python -m data_quality_ray gen OUT_DIR N_ROWS [--seed S]

Owns a Ray session (scripts own sessions; library code never calls
ray.init — see __ray_entry__ contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="data_quality_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run/resume the quality-filter pipeline")
    runp.add_argument("input_dir")
    runp.add_argument("out_dir")
    runp.add_argument("--cpus", type=int, default=32)
    runp.add_argument("--batch-size", type=int, default=1024)
    runp.add_argument("--concurrency", type=int, default=0, help="actor pool size (0 → task mode)")
    runp.add_argument("--wave-files", type=int, default=64)
    runp.add_argument("--no-dedup", action="store_true")
    runp.add_argument("--no-validate", action="store_true")
    runp.add_argument("--dedup-index", default=None,
                      help="cross-run dedup index dir (drop keys committed by previous runs)")
    runp.add_argument("--address", default="local",
                      help="Ray address ('local', or 'auto' inside a cluster / ray job submit)")

    genp = sub.add_parser("gen", help="generate a synthetic image+caption table")
    genp.add_argument("out_dir")
    genp.add_argument("n_rows", type=int)
    genp.add_argument("--seed", type=int, default=42)
    genp.add_argument("--cpus", type=int, default=32)
    genp.add_argument("--labels", action="store_true")

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        addr = getattr(args, "address", "local")
        if addr == "local":
            ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                     logging_level="ERROR")
        else:  # cluster mode (ray job submit / existing cluster): resources come from the cluster
            ray.init(address=addr, logging_level="ERROR")
    try:
        if args.cmd == "gen":
            from .sources.fixtures import write_f1

            write_f1(args.out_dir, n_rows=args.n_rows, seed=args.seed,
                     with_labels=args.labels)
            print(json.dumps({"written": args.out_dir, "rows": args.n_rows}))
        else:
            from .pipelines.north import run_quality_pipeline

            stats = run_quality_pipeline(
                args.input_dir, args.out_dir,
                concurrency=(2, args.concurrency) if args.concurrency else 4,
                batch_size=args.batch_size, wave_files=args.wave_files,
                dedup=not args.no_dedup, validate_images=not args.no_validate,
                stage_mode="actors" if args.concurrency else "tasks",
                dedup_index_dir=args.dedup_index,
            )
            print(json.dumps(stats))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
