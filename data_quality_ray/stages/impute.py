"""Null imputation — the standardization-adjacent cleanup transform:
fill a column's nulls from a constant, the (grouped) mean, or the
(grouped) mode.

Scale shape: ONE stats fold (per-batch algebraic partials, driver merge
∝ groups — groups × values for mode) → broadcast the per-group
fill values as sorted arrays (`ray.put` once, `cached_get` per worker) →
one streaming searchsorted fill pass. The data never shuffles.

Mode ties break to the smallest value (SQL ``row_number() OVER (ORDER BY
n DESC, value)`` replay). Groups whose values are ALL null keep their
nulls (SQL ``coalesce(value, avg-over-group)`` semantics: the group
aggregate itself is NULL).

Reference precedent: the reference standardizes values via synonym
lookups (standardization/*, stages/standardize.py) but has no numeric
imputation; beyond-reference surface in the same spirit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _group_stats(ds, col: str, group_col: str, strategy: str) -> pd.DataFrame:
    """→ (group, fill) for mean/mode over non-null rows."""
    sub = ds.select_columns([group_col, col])
    if strategy == "mean":
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b[col].notna()]
            g = b.groupby(group_col, sort=False)[col]
            return g.agg(s="sum", n="size").reset_index()

        parts = sub.map_batches(partial, batch_format="pandas").to_pandas()
        agg = parts.groupby(group_col, sort=True).sum().reset_index()
        agg["fill"] = agg["s"] / agg["n"]
        return agg[[group_col, "fill"]]
    if strategy == "mode":
        def partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b[col].notna()]
            return (b.groupby([group_col, col], sort=False).size()
                    .reset_index(name="n"))

        parts = sub.map_batches(partial, batch_format="pandas").to_pandas()
        agg = (parts.groupby([group_col, col], sort=True)["n"].sum()
               .reset_index())
        agg = agg.sort_values(["n", col], ascending=[False, True],
                              kind="mergesort")
        top = agg.groupby(group_col, sort=True).head(1)
        return top.rename(columns={col: "fill"})[[group_col, "fill"]]
    raise ValueError(f"strategy={strategy!r}: expected mean/mode/const")


def impute_column(ds, col: str, strategy: str = "mean",
                  group_col: str | None = None, fill_value=None):
    """Fill nulls of ``col`` in place; returns the Dataset with the same
    schema. ``strategy``: "const" (uses ``fill_value``), "mean" or
    "mode" — grouped per ``group_col`` when given, global otherwise."""
    import ray

    from ..functions.broadcast import cached_get

    if strategy == "const":
        def fill_const(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b[col] = b[col].fillna(fill_value)
            return b

        return ds.map_batches(fill_const, batch_format="pandas")

    if group_col is None:
        # global stat = grouped stat over one pseudo-group
        tagged = ds.map_batches(
            lambda b: b.assign(__g=np.int8(0)), batch_format="pandas")
        stats = _group_stats(tagged, col, "__g", strategy)
        const = stats["fill"].iloc[0] if len(stats) else None
        return impute_column(ds, col, "const", fill_value=const)

    stats = _group_stats(ds, col, group_col, strategy)
    keys = stats[group_col].to_numpy()
    order = np.argsort(keys, kind="mergesort")
    ref = ray.put((keys[order], stats["fill"].to_numpy()[order]))

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        keys_s, fills_s = cached_get(ref)
        b = b.copy()
        na = b[col].isna().to_numpy()
        if not na.any() or not len(keys_s):
            return b
        g = b.loc[na, group_col].to_numpy()
        pos = np.searchsorted(keys_s, g)
        ok = (pos < len(keys_s)) & (keys_s[np.minimum(pos, len(keys_s) - 1)] == g)
        vals = b[col].to_numpy(dtype=object)
        idx = np.flatnonzero(na)[ok]
        vals[idx] = fills_s[pos[ok]]
        b[col] = vals.astype(b[col].dtype) if b[col].dtype != object else vals
        return b

    return ds.map_batches(fill, batch_format="pandas")
