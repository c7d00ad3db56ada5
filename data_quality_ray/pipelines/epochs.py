"""Epoch planning — the last mile of a training-data pipeline: turn a
curated corpus into a REPRODUCIBLE epoch layout (which example lands in
which shard, at which position) and optionally materialize the shards.

The plan is pure deterministic math over the seeded global shuffle
(``functions/partitioning.seeded_shuffle_rank``): rank = row_number over
(md5-low-64 of '{seed}-{key}', key), shard_id = (rank−1) // shard_rows,
pos = (rank−1) % shard_rows. Identical on any cluster size or block
order — a crashed epoch resumes with the same example order, and two
trainers given the same seed read the same shards. ONE exchange total
(the range-partitioned ranking).

Materialization composes with the existing sinks: hive-partitioned
parquet via ``sort(shard_id) → write_parquet(partition_cols)`` (the
sorted-write rule from BASELINE.md: unsorted, every block fans a tiny
file into every partition directory) or WebDataset tar shards via
``sources/webdataset.write_webdataset`` keyed by ``shard:pos``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def epoch_plan(ds, key_col: str, seed: int, shard_rows: int,
               n_parts: int = 32):
    """→ Dataset with ``shard_id`` / ``pos`` appended (0-based), one
    exchange. See module docstring for the determinism contract."""
    from ..functions.partitioning import seeded_shuffle_rank

    if shard_rows <= 0:
        raise ValueError("shard_rows must be positive")
    ranked = seeded_shuffle_rank(ds, key_col, seed=seed, n_parts=n_parts,
                                 out_col="__rank")

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        r = b["__rank"].to_numpy(np.int64) - 1
        b["shard_id"] = r // shard_rows
        b["pos"] = r % shard_rows
        return b.drop(columns="__rank")

    return ranked.map_batches(assign, batch_format="pandas")


def write_epoch(ds, out_dir: str, key_col: str, seed: int,
                shard_rows: int, n_parts: int = 32):
    """Materialize the epoch as hive-partitioned parquet (one directory
    per shard — the resumable layout: a re-run skips finished shard
    directories at the consumer). Sorts by shard_id BEFORE the
    partitioned write so each shard is one file run, and duplicates
    shard_id into the files (the partition-filter gotcha: Ray's
    read-time filters cannot reference hive columns)."""
    planned = epoch_plan(ds, key_col, seed, shard_rows, n_parts=n_parts)

    def dup(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["shard"] = b["shard_id"]
        return b

    (planned.map_batches(dup, batch_format="pandas")
     .sort("shard_id")
     .write_parquet(out_dir, partition_cols=["shard_id"]))
    return out_dir
