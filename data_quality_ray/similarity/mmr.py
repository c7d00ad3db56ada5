"""Maximal Marginal Relevance (MMR) selection over an embedding column.

Carbonell & Goldstein 1998: greedily pick k rows maximizing
``lam·sim(q, d) − (1−lam)·max_{s∈S} sim(d, s)`` — relevance to a query
balanced against redundancy with what's already selected. The
data-curation use: diverse exemplar selection near a topic vector
(kcenter's query-aware sibling: kcenter maximizes spread alone, MMR
trades spread against relevance).

Scale shape = the kcenter/kmeans broadcast-round pattern: selection is
inherently sequential in k, so the engine runs k−1 streaming passes;
each pass broadcasts (query, selected matrix) — tiny — computes every
candidate's penalized score inside ``map_batches`` (one vectorized
matmul per batch), and emits a FIXED-SIZE partial (the single best row
per batch). Driver merges O(num_blocks) rows per round; no shuffle,
driver state = the selected list. Cosines are 6-dp rounded BEFORE the
combine and the combined score re-rounded (the quantized-state trick),
so argmax ties are engine-stable and DuckDB replays every round with
unrolled CTEs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROUND_TO = 6


def _unit(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(n == 0, 1, n)


def mmr_select(ds, id_col: str, vec_col: str, query: np.ndarray,
               k: int = 10, lam: float = 0.7, cache: bool = True):
    """→ DataFrame (id, sel_order, rel): the k MMR picks in selection
    order; ``rel`` = 6-dp cosine to the query. First pick = max
    relevance; every tie breaks to the smaller id."""
    import ray

    from ..functions.broadcast import cached_get

    ds = ds.select_columns([id_col, vec_col])
    if cache:
        ds = ds.materialize()
    q = _unit(np.asarray(query, dtype=np.float64)[None, :])[0]

    def best_of(b: pd.DataFrame, sel_ids, sel_mat) -> pd.DataFrame:
        ids = b[id_col].to_numpy()
        mask = ~np.isin(ids, sel_ids)
        if not mask.any():
            return pd.DataFrame({id_col: [], "score": [], "rel": [],
                                 vec_col: []})
        ids = ids[mask]
        mat = _unit(np.stack(b[vec_col].to_numpy()[mask]).astype(np.float64))
        rel = np.round(mat @ q, ROUND_TO)
        if sel_mat is None:
            score = rel
        else:
            pen = np.round(mat @ sel_mat.T, ROUND_TO).max(axis=1)
            score = np.round(lam * rel - (1.0 - lam) * pen, ROUND_TO)
        best = np.lexsort((ids, -score))[0]
        return pd.DataFrame({id_col: [ids[best]], "score": [score[best]],
                             "rel": [rel[best]],
                             vec_col: [b[vec_col].to_numpy()[mask][best]]})

    picks: list[tuple] = []  # (id, rel, unit vec)
    for _ in range(k):
        sel_ids = np.array([p[0] for p in picks])
        sel_mat = (np.stack([p[2] for p in picks])
                   if picks else None)
        ref = ray.put((sel_ids, sel_mat))

        def rnd(b: pd.DataFrame) -> pd.DataFrame:
            si, sm = cached_get(ref)
            return best_of(b, si, sm)

        got = list(ds.map_batches(rnd, batch_format="pandas")
                   .iter_batches(batch_size=64, batch_format="pandas"))
        if not got:
            break  # fewer than k rows: every batch came back empty
        parts = pd.concat(got, ignore_index=True)
        parts = parts[parts[id_col].notna()]
        if parts.empty:
            break
        win = parts.iloc[np.lexsort((parts[id_col].to_numpy(),
                                     -parts["score"].to_numpy()))[0]]
        picks.append((win[id_col], float(win["rel"]),
                      _unit(np.asarray(win[vec_col],
                                       dtype=np.float64)[None, :])[0]))

    return pd.DataFrame({
        id_col: [p[0] for p in picks],
        "sel_order": np.arange(len(picks), dtype=np.int64),
        "rel": [p[1] for p in picks],
    })
