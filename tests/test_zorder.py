"""Z-order layout (functions/zorder.py)."""

import os

import numpy as np
import pandas as pd

from data_quality_ray.functions.zorder import (BITS, build_zorder_store,
                                               zorder_scan_stats,
                                               zorder_values)


def test_zorder_values_interleave():
    # full bucket range on both dims: z of (max, max) is all ones
    u = np.array([0, 255, 255, 0], dtype=np.int64)
    v = np.array([0, 255, 0, 255], dtype=np.int64)
    z = zorder_values(u, v, 0, 255, 0, 255)
    assert z[0] == 0
    assert z[1] == (1 << (2 * BITS)) - 1
    # u occupies odd bit positions, v even
    assert z[2] == sum(1 << (2 * i + 1) for i in range(BITS))
    assert z[3] == sum(1 << (2 * i) for i in range(BITS))


def test_zorder_locality_monotone_diagonal():
    # along the diagonal the curve is monotone
    x = np.arange(0, 256, dtype=np.int64)
    z = zorder_values(x, x, 0, 255, 0, 255)
    assert (np.diff(z) > 0).all()


def test_zorder_store_prunes_both_dims(ray_session, tmp_path):
    import ray.data as rd

    rng = np.random.default_rng(4)
    n = 20000
    df = pd.DataFrame({"a": rng.integers(0, 1000, n),
                       "b": rng.integers(0, 1000, n)}).astype("int64")
    zdir = str(tmp_path / "z")
    build_zorder_store(rd.from_pandas(df), zdir, "a", "b", n_files=16)
    for col in ("a", "b"):
        st = zorder_scan_stats(zdir, col, 400, 520)
        assert 0 < st["files_scanned"] < st["files_total"], (col, st)
    # contrast: a store sorted by "a" alone cannot prune on "b"
    adir = str(tmp_path / "a")
    rd.from_pandas(df).sort("a").repartition(16).write_parquet(adir)
    sa = zorder_scan_stats(adir, "a", 400, 520)
    sb = zorder_scan_stats(adir, "b", 400, 520)
    assert 0 < sa["files_scanned"] < sa["files_total"]
    assert sb["files_scanned"] == sb["files_total"]  # no pruning on b
    # and the z store scans fewer rows on b than the a-sorted store
    zb = zorder_scan_stats(zdir, "b", 400, 520)
    assert zb["rows_scanned"] < sb["rows_scanned"]
