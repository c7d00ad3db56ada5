"""Hardware-envelope probe for scaling-measurement gating (no Ray).

Measures the host's own N→4N throughput scaling for a pure-ALU loop and
a memory-bandwidth-bound numpy copy, with plain multiprocessing. The
BASELINE.md protocol runs the pipeline scaling pair only in a window
where the membw envelope reads ≥ 0.75 (degraded boots collapse it to
0.25–0.65 and any pipeline reading just tracks that ceiling).

Usage: python tools/ambient_probe.py [lo=4] [hi=16]
Prints one JSON line: {"alu": e, "membw": e, "lo": n, "hi": n}.
"""

import json
import multiprocessing as mp
import sys
import time


def _alu(n):
    x = 1
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


def _membw(n):
    import numpy as np

    a = np.ones(8_000_000, dtype=np.float64)  # 64 MB working set
    s = 0.0
    for _ in range(n):
        b = a * 1.0000001
        s += float(b[0])
        a = b
    return s


def _leg(fn, procs, work):
    with mp.Pool(procs) as p:
        t0 = time.perf_counter()
        p.map(fn, [work] * procs)
        dt = time.perf_counter() - t0
    return procs / dt  # throughput: work-units per second


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {"lo": lo, "hi": hi}
    for name, fn, work in (("alu", _alu, 30_000_000), ("membw", _membw, 24)):
        _leg(fn, 2, work // 4)  # warmup
        tl = _leg(fn, lo, work)
        th = _leg(fn, hi, work)
        out[name] = round(th / tl / (hi / lo), 3)  # efficiency vs ideal 4x
    print(json.dumps(out))


if __name__ == "__main__":
    main()
