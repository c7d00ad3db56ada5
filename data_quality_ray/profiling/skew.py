"""Key-skew diagnostics for shuffle planning.

Every wide operation here (hash_join / window_ops / grouped dedup) hashes
a key into a fixed bucket count, so ONE hot key serializes its bucket —
the north-rule's "skewed partitions rebalanced explicitly" concern. This
module measures the per-key count distribution with driver state bounded
by a frequency-of-frequencies table (counts are small integers, so the
table has ~#distinct-count-values rows, not #keys), and turns the result
into a concrete ``salt=N`` recommendation for ``functions.joins``.

Shape: one exchange for the per-key counts (``grouped_aggregate`` — batch
partials collapse first, so the shuffle moves #keys×#batches rows at
most), then a tiny second pass folding counts → (freq-of-freq, top-k)
partials. Nothing row-sized reaches the driver on the shuffle path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .groupagg import grouped_aggregate

_QS = (0.5, 0.9, 0.99)


def _disc_quantile(sorted_vals: np.ndarray, cum_n: np.ndarray, q: float) -> int:
    """DuckDB ``quantile_disc`` over a value→cumulative-count table: the
    1-indexed element at position max(1, ceil(q·n)) of the ascending
    multiset (probed against DuckDB across n and q)."""
    n = int(cum_n[-1])
    pos = max(1, math.ceil(q * n))
    return int(sorted_vals[np.searchsorted(cum_n, pos)])


def key_skew_report(ds, key, top_k: int = 10, final: str = "auto") -> dict:
    """Per-key count distribution of ``ds[key]`` (``key``: column name or
    list for composite keys).

    Returns ``{n_rows, n_keys, max_cnt, mean_cnt, max_over_mean,
    cnt_p50, cnt_p90, cnt_p99, top}`` where ``top`` is a DataFrame of
    the ``top_k`` heaviest keys (cnt desc, key asc tie-break) and the
    quantiles are exact disc quantiles over the per-key counts.

    ``final`` passes through to ``grouped_aggregate``: "driver" collects
    the per-key count frame (low-cardinality keys), "shuffle" keeps it
    distributed and folds freq-of-freq + top-k partials instead, "auto"
    gates on the measured partial size.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sort_cols, asc = ["cnt", *keys], [False] + [True] * len(keys)
    counts = grouped_aggregate(ds, keys, {"cnt": (keys[0], "count")},
                               final=final)

    if isinstance(counts, pd.DataFrame):
        cnt = counts["cnt"].to_numpy(dtype=np.int64)
        fof = pd.Series(cnt).value_counts().sort_index()
        vals, freq = fof.index.to_numpy(np.int64), fof.to_numpy(np.int64)
        top = counts.sort_values(sort_cols, ascending=asc) \
                    .head(top_k).reset_index(drop=True)
    else:
        counts = counts.materialize()  # two tiny consumers below

        def fof_partial(b: pd.DataFrame) -> pd.DataFrame:
            return (b.groupby("cnt").size().rename("freq")
                    .reset_index())

        def top_partial(b: pd.DataFrame) -> pd.DataFrame:
            return b.sort_values(sort_cols, ascending=asc).head(top_k)

        fof = (counts.map_batches(fof_partial, batch_format="pandas")
               .to_pandas().groupby("cnt")["freq"].sum().sort_index())
        vals, freq = fof.index.to_numpy(np.int64), fof.to_numpy(np.int64)
        top = (counts.map_batches(top_partial, batch_format="pandas")
               .to_pandas().sort_values(sort_cols, ascending=asc)
               .head(top_k).reset_index(drop=True))

    cum = np.cumsum(freq)
    n_keys = int(cum[-1])
    n_rows = int((vals * freq).sum())
    max_cnt = int(vals[-1])
    mean_cnt = n_rows / n_keys
    report = {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "max_cnt": max_cnt,
        "mean_cnt": mean_cnt,
        "max_over_mean": max_cnt / mean_cnt,
        "top": top[keys + ["cnt"]],
    }
    for q in _QS:
        report[f"cnt_p{int(q * 100)}"] = _disc_quantile(vals, cum, q)
    return report


def recommend_salt(report: dict, n_buckets: int = 64,
                   target_ratio: float = 2.0) -> int:
    """Pick ``salt`` for ``hash_join``-family exchanges: smallest N so
    the hottest key's per-bucket share stays within ``target_ratio``× the
    mean bucket load, clamped to [1, n_buckets] (salting past the bucket
    count buys nothing — the replicas land in at most n_buckets places).
    Returns 1 when the key space is too small to matter (fewer keys than
    buckets: every key already gets its own bucket at best)."""
    if report["n_keys"] <= n_buckets:
        return 1
    mean_bucket_load = report["n_rows"] / n_buckets
    salt = math.ceil(report["max_cnt"] / max(target_ratio * mean_bucket_load, 1.0))
    return max(1, min(int(salt), n_buckets))
