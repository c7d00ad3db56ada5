"""Epoch planning (pipelines/epochs.py): determinism, shard math, and
the materialized hive layout."""

import numpy as np
import pandas as pd

from data_quality_ray.pipelines.epochs import epoch_plan, write_epoch


def _ds(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def test_epoch_plan_partition_invariant_and_complete(ray_session):
    df = pd.DataFrame({"k": range(300)})
    a = epoch_plan(_ds(df, blocks=5), "k", seed=3, shard_rows=50).to_pandas()
    b = epoch_plan(_ds(df, blocks=1), "k", seed=3, shard_rows=50).to_pandas()
    a, b = (x.sort_values("k").reset_index(drop=True) for x in (a, b))
    assert (a["shard_id"].to_numpy() == b["shard_id"].to_numpy()).all()
    assert (a["pos"].to_numpy() == b["pos"].to_numpy()).all()
    # exact layout: 6 shards of 50, positions 0..49 each
    g = a.groupby("shard_id")["pos"].agg(["count", "min", "max"])
    assert len(g) == 6 and (g["count"] == 50).all()
    assert (g["min"] == 0).all() and (g["max"] == 49).all()


def test_write_epoch_hive_layout(ray_session, tmp_path):
    import ray.data as rd

    df = pd.DataFrame({"k": range(120), "payload": [f"p{i}" for i in range(120)]})
    out = write_epoch(_ds(df, blocks=3), str(tmp_path / "ep"), "k",
                      seed=9, shard_rows=40)
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 120
    assert set(back["shard"].unique()) == {0, 1, 2}  # in-file shard copy
    # shard content matches the plan
    plan = epoch_plan(_ds(df, blocks=3), "k", seed=9, shard_rows=40).to_pandas()
    m = back.merge(plan[["k", "shard_id"]].rename(
        columns={"shard_id": "want"}), on="k")
    assert (m["shard"].to_numpy() == m["want"].to_numpy()).all()
