"""Two-dimensional Pareto skyline (maximal vector / dominance query):
rows not dominated by any other row under (minimize x, maximize y).

Shape: the classic distributed skyline — a vectorized per-block
sort-sweep local skyline (skyline(S) ⊆ ∪ skyline(block), so the local
pass is a lossless filter), then an iterated tree reduction: while the
surviving candidate set is larger than ``collect_limit`` it is
repartitioned and swept again (skyline(skyline(S)) == skyline(S), so
each round is exact), and only the final — typically O(polylog n) —
candidate set reaches the driver for the closing sweep. No all-to-all
shuffle anywhere: every round moves only current candidates.

Dominance uses SQL semantics: q dominates p iff q.x <= p.x AND
q.y >= p.y AND (q.x < p.x OR q.y > p.y); duplicate (x, y) rows never
dominate each other, so ALL of them survive together.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["skyline2d"]


def _sweep(b: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact local skyline, fully vectorized: a row survives iff its y
    equals its x-group's max AND that max strictly exceeds the running
    max over all strictly-smaller x groups."""
    if b.empty:
        return b
    s = b.sort_values([x, y], ascending=[True, False], kind="mergesort")
    xv = s[x].to_numpy()
    yv = s[y].to_numpy()
    new_group = np.empty(len(s), dtype=bool)
    new_group[0] = True
    new_group[1:] = xv[1:] != xv[:-1]
    gid = np.cumsum(new_group) - 1
    gmax = yv[new_group]  # first row of each x group has the group max
    before = np.maximum.accumulate(gmax)
    prev = np.concatenate(([-np.inf], before[:-1]))  # strictly-smaller-x max
    keep_group = gmax > prev
    keep = keep_group[gid] & (yv == gmax[gid])
    return s[keep]


def skyline2d(ds, minimize: str, maximize: str, out_cols: list[str],
              collect_limit: int = 200_000, max_rounds: int = 4):
    """→ pandas DataFrame of ``out_cols`` for every non-dominated row
    under (minimize, maximize). Null coordinates are excluded (SQL
    comparison semantics: a NULL coordinate can neither dominate nor be
    ranked)."""

    def local(b: pd.DataFrame) -> pd.DataFrame:
        b = b[out_cols]
        b = b[b[minimize].notna() & b[maximize].notna()]
        return _sweep(b, minimize, maximize)

    cur = ds.map_batches(local, batch_format="pandas").materialize()
    rounds = 0
    while cur.count() > collect_limit and rounds < max_rounds:
        nb = max(1, cur.num_blocks() // 8)
        cur = (cur.repartition(nb)
               .map_batches(local, batch_format="pandas").materialize())
        rounds += 1
    return (_sweep(cur.to_pandas(), minimize, maximize)
            .reset_index(drop=True))
