"""Consistent-hash sharding (functions/sharding.py)."""

import numpy as np
import pandas as pd

from data_quality_ray.functions.sharding import (assign_ring,
                                                 rebalance_audit,
                                                 ring_points)


def test_ring_assignment_wraparound():
    pos, shard = ring_points(4, replicas=8)
    assert (np.diff(pos) >= 0).all()
    # a key past the last ring point wraps to the first point's shard
    beyond = np.array([pos[-1] + 1], dtype=np.int64)
    assert assign_ring(beyond, pos, shard)[0] == shard[0]
    # a key exactly on a point lands on that point
    assert assign_ring(pos[:3], pos, shard).tolist() == shard[:3].tolist()


def test_minimal_movement_vs_mod_hash(ray_session):
    import ray.data as rd

    keys = pd.DataFrame({"k": np.arange(30000, dtype=np.int64)})
    out = rebalance_audit(rd.from_pandas(keys), "k",
                          n_before=8, n_after=9)
    total = out["n"].sum()
    moved = out.loc[out["shard_before"] != out["shard_after"], "n"].sum()
    frac = moved / total
    # expected 1/9 ≈ 0.111; hash%N would move ~8/9
    assert 0.05 < frac < 0.25, frac
    # every before-shard keeps most of its keys
    kept = out[out["shard_before"] == out["shard_after"]]
    assert kept["n"].sum() / total > 0.75


def test_balance_across_shards(ray_session):
    import ray.data as rd

    keys = pd.DataFrame({"k": np.arange(40000, dtype=np.int64)})
    out = rebalance_audit(rd.from_pandas(keys), "k",
                          n_before=8, n_after=8)  # identical rings
    assert (out["shard_before"] == out["shard_after"]).all()
    load = out.groupby("shard_before")["n"].sum()
    # 16 virtual replicas keep the imbalance bounded
    assert load.max() / load.min() < 3.5
