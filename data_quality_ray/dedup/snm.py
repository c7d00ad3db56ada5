"""Sorted-neighborhood pair generation (Hernández & Stolfo, SIGMOD '95).

The classic alternative to key-equality blocking (dedup/blocking.py —
reference record-linkage/grouping/AbstractRecordGrouping.java:35-118
pairs records WITHIN a blocking-key group): sort the corpus once by a
fuzzy key, then only compare records whose global sort ranks are within
a fixed window w — O(n·w) candidate pairs instead of per-block n²,
robust to blocking keys that fragment true matches across groups.

Distributed shape: ONE rank exchange + ONE grouped exchange, no n²
anywhere. Ranks come from functions/partitioning.global_row_number
(range-partitioned, no global sort). Pair generation uses the
partition+halo pattern: rows scatter to rank-contiguous groups of
~n/n_parts rows, the first w−1 ranks of each group replicate into the
previous group as halo, and every group shift-pairs its consecutive
ranks vectorized (pairs whose LOWER rank is home — each pair exactly
once, window pairs never straddle more than the halo). n_parts Python
callbacks total, not one per window — the documented
no-tiny-group-callback rule.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["snm_pairs", "snm_multipass"]


def snm_pairs(ds, id_col: str, key_col: str, window: int = 5,
              max_dist: int | None = None, n_parts: int = 32) -> pd.DataFrame:
    """Candidate pairs (id_a, id_b, lev) for all rank-window neighbors
    under ORDER BY (key, id); ``id_a`` is the lower-ranked row. With
    ``max_dist``, pairs are scored with the banded vectorized edit
    distance (O(L·k) per pair, not O(L²)) and filtered to lev ≤
    max_dist. Result is driver-bounded by n·(w−1)·selectivity; for
    key spaces beyond that, feed the same grouped stage into the
    bucketed pair-dedup dataset route like dedup/simhash.py."""
    from ..functions.matchers_vec import (levenshtein_pairs,
                                          levenshtein_pairs_bounded)
    from ..functions.partitioning import global_row_number

    ranked = global_row_number(ds.select_columns([id_col, key_col]),
                               key_col, tiebreak=id_col, n_parts=n_parts,
                               out_col="__rn").materialize()
    n = ranked.count()
    if n < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "lev": pd.Series([], dtype="int64")})
    size = max(math.ceil(n / n_parts), window)

    def scatter(b: pd.DataFrame) -> pd.DataFrame:
        rn = b["__rn"].to_numpy(np.int64)
        home = (rn - 1) // size
        out = [b.assign(__g=home)]
        halo = ((rn - 1) % size < window - 1) & (home > 0)
        if halo.any():
            out.append(b[halo].assign(__g=home[halo] - 1))
        return pd.concat(out, ignore_index=True)

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        grp = int(g["__g"].iloc[0])
        g = g.sort_values("__rn", kind="mergesort")
        rn = g["__rn"].to_numpy(np.int64)
        keys = g[key_col].to_numpy(object)
        ids = g[id_col].to_numpy()
        ia, ib = [], []
        for d in range(1, window):
            if d >= len(rn):
                break
            # global ranks are consecutive integers, so position shift
            # == rank distance; keep pairs whose lower rank is home
            lo = np.arange(len(rn) - d)
            keep = (rn[lo] - 1) // size == grp
            ia.append(lo[keep])
            ib.append(lo[keep] + d)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=ids.dtype),
                              "id_b": pd.Series([], dtype=ids.dtype),
                              "lev": pd.Series([], dtype="int64")})
        if not ia:
            return empty
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        if not len(ia):
            return empty
        if max_dist is not None:
            lev = levenshtein_pairs_bounded(keys[ia], keys[ib], max_dist)
            ok = lev <= max_dist
            ia, ib, lev = ia[ok], ib[ok], lev[ok]
        else:
            lev = levenshtein_pairs(keys[ia], keys[ib])
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib], "lev": lev})

    out = (ranked.map_batches(scatter, batch_format="pandas")
           .groupby("__g").map_groups(gen, batch_format="pandas")
           .to_pandas())
    out["lev"] = out["lev"].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def snm_multipass(ds, id_col: str, key_cols: list[str], window: int = 5,
                  max_dist: int | None = None,
                  n_parts: int = 32) -> pd.DataFrame:
    """Multi-pass sorted neighborhood (the full Hernández-Stolfo
    method): one SNM pass per sort key, pairs unioned — a single fuzzy
    key misses matches that differ early in the string; a second pass
    over e.g. the REVERSED key catches prefix-divergent duplicates.
    Pairs normalize to (min id, max id); ``lev`` is identical across
    passes when keys are distance-preserving transforms (reversal is),
    otherwise the minimum is kept. ``n_passes`` = how many passes
    surfaced the pair (2-pass agreement is a confidence signal).
    → (id_a, id_b, lev, n_passes) sorted."""
    frames = []
    for k in key_cols:
        p = snm_pairs(ds, id_col, k, window=window, max_dist=max_dist,
                      n_parts=n_parts)
        if len(p):
            frames.append(pd.DataFrame({
                "id_a": np.minimum(p["id_a"], p["id_b"]),
                "id_b": np.maximum(p["id_a"], p["id_b"]),
                "lev": p["lev"],
            }))
    if not frames:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "lev": pd.Series([], dtype="int64"),
                             "n_passes": pd.Series([], dtype="int64")})
    allp = pd.concat(frames, ignore_index=True)
    out = (allp.groupby(["id_a", "id_b"], sort=False)
           .agg(lev=("lev", "min"), n_passes=("lev", "size"))
           .reset_index())
    out["lev"] = out["lev"].astype("int64")
    out["n_passes"] = out["n_passes"].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
