"""Explicit range rebalancing: quantile split points → balanced partition
ids (the north-rule's "skewed partitions rebalanced explicitly" turned
into a mechanism rather than a diagnostic — `profiling/skew.py` measures,
this module fixes).

Two split-point modes:
- ``exact``: one value→count exchange (``grouped_aggregate`` partials —
  the shuffle moves per-batch DISTINCT values, not rows), cumulative
  counts on the driver, ``quantile_disc`` positions — bit-identical to
  DuckDB, so the whole partitioner is SQL-replayable.
- ``tdigest``: mergeable fixed-size sketches, one streaming pass — the
  10^12-row path where even the distinct-value table is too big; split
  points land within the digest's rank-error bound (balance asserted in
  tests, not oracled).

Assignment is one broadcast + ``searchsorted`` per batch: part_id =
#splits strictly below the value (== SQL ``count(*) WHERE x > v``), so
rows equal to a split value go LEFT — deterministic on ties.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _disc_quantile_val(sorted_vals: np.ndarray, cum_n: np.ndarray,
                       q: float) -> float:
    """DuckDB ``quantile_disc``: the 1-indexed element at position
    max(1, ceil(q·n)) of the ascending multiset (same contract as
    profiling/skew._disc_quantile, value kept in its own dtype)."""
    n = int(cum_n[-1])
    pos = max(1, math.ceil(q * n))
    return sorted_vals[np.searchsorted(cum_n, pos)]


def range_split_points(ds, col: str, n_parts: int,
                       mode: str = "exact") -> np.ndarray:
    """B-1 ascending split points for ``n_parts`` range partitions."""
    qs = [i / n_parts for i in range(1, n_parts)]
    if mode == "exact":
        from ..profiling.groupagg import grouped_aggregate

        counts = grouped_aggregate(ds, [col], {"cnt": (col, "count")},
                                   final="driver")
        counts = counts.sort_values(col, kind="mergesort")
        vals = counts[col].to_numpy()
        cum = counts["cnt"].to_numpy(dtype=np.int64).cumsum()
        return np.array([_disc_quantile_val(vals, cum, q) for q in qs])
    if mode == "tdigest":
        import pickle

        from ..profiling.sketches import TDigest

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            d = TDigest()
            d.update_array(b[col].to_numpy(dtype=np.float64))
            return pd.DataFrame({"blob": [pickle.dumps(d)]})

        acc = TDigest()
        for b in ds.map_batches(partial, batch_format="pandas") \
                   .iter_batches(batch_size=256, batch_format="pandas"):
            for blob in b["blob"]:
                acc.merge(pickle.loads(blob))
        return np.array([acc.quantile(q) for q in qs])
    raise ValueError(f"unknown mode {mode!r}")


def add_range_partition(ds, col: str, splits: np.ndarray,
                        out_col: str = "part_id"):
    """Append ``out_col`` = number of split points strictly below the
    value. One broadcast, one vectorized searchsorted per batch."""
    import ray

    from .broadcast import cached_get

    ref = ray.put(np.asarray(splits))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        s = cached_get(ref)
        b = b.copy()
        b[out_col] = np.searchsorted(s, b[col].to_numpy(),
                                     side="left").astype(np.int64)
        return b

    return ds.map_batches(assign, batch_format="pandas")


def range_balance(ds, col: str, n_parts: int,
                  mode: str = "exact") -> pd.DataFrame:
    """Rebalance report: split, assign, and fold per-partition
    (n, lo, hi) — the before/after evidence that the partitioner
    actually leveled the key range. → (part_id, n, lo, hi)."""
    from ..profiling.groupagg import grouped_aggregate

    splits = range_split_points(ds, col, n_parts, mode=mode)
    parts = add_range_partition(ds.select_columns([col]), col, splits)
    out = grouped_aggregate(parts, ["part_id"],
                            {"n": (col, "count"), "lo": (col, "min"),
                             "hi": (col, "max")}, final="driver")
    return out.sort_values("part_id").reset_index(drop=True)


def global_row_number(ds, col: str, tiebreak: str, n_parts: int = 32,
                      ascending: bool = True, out_col: str = "rn",
                      mode: str = "exact"):
    """Global ``row_number() OVER (ORDER BY col [DESC], tiebreak)``
    WITHOUT a global sort: range-partition on ``col`` (equal values
    always co-locate — the x > v assignment rule), count partitions in
    one grouped fold, then each partition ranks locally and adds its
    broadcast cumulative offset. One exchange total (the partition
    groupby); the sort is per-partition.

    ``mode="tdigest"`` splits approximately at scale — ranks stay EXACT
    either way (offsets come from real partition counts; splits only
    balance the work). → Dataset with ``out_col`` appended."""
    import ray

    from ..functions.broadcast import cached_get
    from ..profiling.groupagg import grouped_aggregate

    # Materialize ONCE: this function consumes `ds` three times (split
    # points, partition counts, the rank map_groups) — unmaterialized,
    # every expensive upstream (classifier pools, joins, hash stages)
    # re-executes 3x (same trap similarity/pq.py materializes against).
    # Object-store spill on oversize still beats three upstream scans.
    ds = ds.materialize()
    splits = range_split_points(ds, col, n_parts, mode=mode)
    parts = add_range_partition(ds, col, splits)
    counts = grouped_aggregate(parts, ["part_id"], {"n": (col, "count")},
                               final="driver").sort_values("part_id")
    pid = counts["part_id"].to_numpy(dtype=np.int64)
    n = counts["n"].to_numpy(dtype=np.int64)
    # offset of partition p = rows ranked BEFORE it: lower partitions
    # when ascending, higher when descending
    cum = np.concatenate([[0], np.cumsum(n)[:-1]]) if ascending else \
        np.concatenate([[0], np.cumsum(n[::-1])[:-1]])[::-1]
    offsets = dict(zip(pid.tolist(), cum.tolist()))
    ref = ray.put(offsets)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        offs = cached_get(ref)
        part = int(g["part_id"].iloc[0])
        g = g.sort_values([col, tiebreak],
                          ascending=[ascending, True], kind="mergesort")
        g = g.drop(columns=["part_id"]).reset_index(drop=True)
        g[out_col] = np.arange(1, len(g) + 1, dtype=np.int64) + offs[part]
        return g

    return parts.groupby("part_id").map_groups(rank_group,
                                               batch_format="pandas")


def seeded_shuffle_rank(ds, key_col: str, seed: int = 42,
                        n_parts: int = 32, out_col: str = "rank"):
    """Deterministic seeded GLOBAL shuffle order — the reproducible
    training-data shuffle: every row gets rank = ``row_number() OVER
    (ORDER BY md5_number_lower('{seed}-' || key), key)``, identical on
    any cluster size / partitioning / day (resume a crashed epoch and
    the example order is unchanged). Rides ``global_row_number`` over
    the 64-bit digest (``mode="tdigest"`` — hash keys are uniform, so
    approximate splits are balanced by construction; ranks stay exact),
    ONE exchange, no global sort. For the physically reordered dataset,
    follow with ``ds.sort([hash, key])`` or write partitioned by
    ``rank // block``."""
    from ..profiling.sketches import md5_hash64

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__shuf64"] = md5_hash64(
            (f"{seed}-" + b[key_col].astype(str)).to_numpy())
        return b

    ranked = global_row_number(ds.map_batches(add_hash,
                                              batch_format="pandas"),
                               "__shuf64", tiebreak=key_col,
                               n_parts=n_parts, mode="tdigest",
                               out_col=out_col)
    return ranked.drop_columns(["__shuf64"])
