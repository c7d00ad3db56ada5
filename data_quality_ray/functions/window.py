"""Partitioned analytic (window) functions — SQL's
``f(x) OVER (PARTITION BY key ORDER BY order_cols)``.

Ray Data has no window operator; a naive build would ``map_groups`` a
Python callback per key (per-tiny-group — forbidden here). Instead:
ONE hash shuffle co-locates each partition key into a bucket, and each
bucket runs vectorized pandas kernels (``sort_values`` + groupby
``cumcount``/``shift``/``cumsum`` — C loops, no per-group Python).

Determinism contract: ``order_by`` must be a TOTAL order within a key
(include a tie-break column, e.g. the row id) or lag/lead are
engine-dependent — same requirement DuckDB's window functions have for
a stable oracle.

Scale: the single shuffle moves each row once; a partition's rows must
fit one bucket's worker (same co-location assumption as ``hash_join`` /
``asof_join``). Skewed partition keys bound by the bucket count; salt
upstream if one key dominates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_OPS = ("row_number", "lag", "lead", "cumsum", "cummin", "cummax", "cumcount",
        "count")


def window_ops(ds, by, order_by, ops: dict, n_buckets: int = 64):
    """Attach analytic columns to every row of ``ds``.

    ``by``: partition key column (or list). ``order_by``: ordering
    column(s) within the partition. ``ops``: out_col → spec tuple:

    - ``("row_number",)`` — 1-based position in partition order
    - ``("lag", col)`` / ``("lag", col, n)`` — value n rows back (null
      at the partition head); ``("lead", col[, n])`` symmetric
    - ``("cumsum", col)`` / ``("cummin", col)`` / ``("cummax", col)`` —
      running aggregate, inclusive of the current row
    - ``("count",)`` — partition row count on every row (SQL
      ``count(*) OVER (PARTITION BY key)`` — unordered, whole frame)

    Returns a Dataset with the input columns plus the analytic columns.
    """
    import pandas.util as pdu

    keys = [by] if isinstance(by, str) else list(by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    for out_col, spec in ops.items():
        if spec[0] not in _OPS:
            raise ValueError(f"{out_col}: unknown window op {spec[0]!r}")

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bucket"] = (pdu.hash_pandas_object(b[keys], index=False)
                         .to_numpy() % np.uint64(n_buckets)).astype("int64")
        return b

    def apply_window(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket").sort_values(
            keys + order, kind="mergesort").reset_index(drop=True)
        gb = g.groupby(keys, sort=False)
        for out_col, spec in ops.items():
            kind = spec[0]
            if kind == "row_number":
                g[out_col] = (gb.cumcount() + 1).astype("int64")
            elif kind == "count":
                g[out_col] = gb[keys[0]].transform("size").astype("int64")
            elif kind in ("lag", "lead"):
                col = spec[1]
                n = spec[2] if len(spec) > 2 else 1
                g[out_col] = gb[col].shift(n if kind == "lag" else -n)
            else:  # cumsum / cummin / cummax
                g[out_col] = getattr(gb[spec[1]], kind)()
        return g

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("__bucket")
            .map_groups(apply_window, batch_format="pandas"))
