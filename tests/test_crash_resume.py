"""Crash-resume proof: SIGKILL the pipeline mid-run, resume, and verify
the final state is identical to an uninterrupted run — the north rule's
"exact resume from checkpoint" exercised the hard way."""

import json
import os
import shutil
import signal
import subprocess
import sys
import time

import pytest

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from data_quality_ray.pipelines.north import run_quality_pipeline
stats = run_quality_pipeline({src!r}, {out!r}, concurrency=2, batch_size=128,
                             wave_files=1)
import json
print("DONE " + json.dumps(stats))
ray.shutdown()
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(src, out, kill_after=None):
    proc = subprocess.Popen(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, src=src, out=out)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    if kill_after is None:
        out_text, _ = proc.communicate(timeout=300)
        return out_text
    time.sleep(kill_after)
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    return None


@pytest.mark.slow
def test_sigkill_mid_run_then_resume(f1_dir, tmp_path):
    out_a = str(tmp_path / "clean")
    out_b = str(tmp_path / "crashed")

    # uninterrupted reference run
    text = _run(f1_dir, out_a)
    clean = json.loads(text.split("DONE ", 1)[1])

    # killed mid-run (wave_files=1 → per-fragment commits; kill lands
    # after Ray startup, during the waves)
    _run(f1_dir, out_b, kill_after=12)
    manifest_dir = os.path.join(out_b, "_manifest")
    partial = len(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else 0
    # resume to completion
    text = _run(f1_dir, out_b)
    resumed = json.loads(text.split("DONE ", 1)[1])

    assert resumed["n_rows"] == clean["n_rows"] == 600
    assert resumed["kept"] == clean["kept"]
    assert resumed["rule_hits"] == clean["rule_hits"]
    assert resumed["final_rows"] == clean["final_rows"]
    # and the surviving-row payloads are byte-identical
    import duckdb

    h_a = duckdb.sql(f"select count(*), sum(phash), sum(length(caption)) from '{out_a}/final/*.parquet'").fetchone()
    h_b = duckdb.sql(f"select count(*), sum(phash), sum(length(caption)) from '{out_b}/final/*.parquet'").fetchone()
    assert h_a == h_b
