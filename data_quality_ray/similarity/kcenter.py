"""Greedy k-center (farthest-point) coreset selection over an embedding
column — diversity-aware data pruning (the k-center objective behind
coreset / active-learning selection; SemDeDup's complement: instead of
dropping near-duplicates, KEEP a maximally-spread representative set).

Scale shape: the algorithm is inherently sequential in k, so the engine
runs k-1 streaming passes; each pass broadcasts the chosen centers
(tiny — k × dim floats), computes every row's min distance to them
inside ``map_batches`` (vectorized (B × C × D) fold), and emits a
FIXED-SIZE partial (the single farthest row per batch). The driver
merges O(num_blocks) candidate rows per round — no shuffle anywhere,
driver state = the center list. Distances are 6-dp-rounded before any
comparison so argmax/argmin ties are engine-stable (the kmeans
quantized-state trick), which is what lets DuckDB replay every round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROUND_TO = 6


def _min_dist_to(mat: np.ndarray, centers: np.ndarray) -> np.ndarray:
    """Per-row min Euclidean distance to the center set, 6-dp-rounded
    BEFORE the min (matches SQL ``min(round(list_distance(...), 6))``)."""
    d = np.sqrt(((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2))
    return np.round(d, ROUND_TO).min(axis=1)


def kcenter_select(ds, id_col: str, vec_col: str, k: int = 8,
                   cache: bool = True):
    """Greedy k-center selection: center 0 = smallest id
    (content-deterministic), each next center = the row farthest from
    the chosen set (ties → smallest id). Returns a DataFrame of the k
    centers with ``sel_order``.

    ``cache=True`` materializes the pruned (id, vec) projection once so
    the k-1 passes don't re-execute the upstream read (the lazy-Dataset
    re-execution trap); at corpus scales where even the projection
    shouldn't persist, pass ``cache=False`` to re-stream from source
    each round — the passes themselves never hold more than a batch."""
    import ray

    from ..functions.broadcast import cached_get

    ds = ds.select_columns([id_col, vec_col])
    if cache:
        ds = ds.materialize()

    # center 0: smallest id (partial sorted heads, CONTENT-deterministic
    # — materialize() block order is run-dependent)
    def head1(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(id_col, kind="mergesort").head(1)

    first = pd.concat(
        list(ds.map_batches(head1, batch_format="pandas")
             .iter_batches(batch_size=64, batch_format="pandas")),
        ignore_index=True).sort_values(id_col, kind="mergesort").head(1)

    centers = [(first[id_col].iloc[0],
                np.asarray(first[vec_col].iloc[0], dtype=np.float64))]
    for _ in range(k - 1):
        cmat = np.stack([c[1] for c in centers])
        ref = ray.put(cmat)

        def farthest(b: pd.DataFrame) -> pd.DataFrame:
            cm = cached_get(ref)
            mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            md = _min_dist_to(mat, cm)
            ids = b[id_col].to_numpy()
            best = np.lexsort((ids, -md))[0]
            return pd.DataFrame({id_col: [ids[best]], "md": [md[best]],
                                 vec_col: [b[vec_col].iloc[best]]})

        parts = pd.concat(
            list(ds.map_batches(farthest, batch_format="pandas")
                 .iter_batches(batch_size=64, batch_format="pandas")),
            ignore_index=True)
        win = parts.iloc[np.lexsort((parts[id_col].to_numpy(),
                                     -parts["md"].to_numpy()))[0]]
        centers.append((win[id_col],
                        np.asarray(win[vec_col], dtype=np.float64)))

    return pd.DataFrame({
        id_col: [c[0] for c in centers],
        vec_col: [c[1] for c in centers],
        "sel_order": np.arange(len(centers), dtype=np.int64),
    })


def kcenter_assign(ds, id_col: str, vec_col: str,
                   centers: pd.DataFrame):
    """Assign every row to its nearest selected center (rounded distance,
    ties → smaller center id — the SQL row_number contract). One
    broadcast + one streaming pass. → Dataset of
    (id_col, center_id, dist, is_center)."""
    import ray

    from ..functions.broadcast import cached_get

    order = np.argsort(centers[id_col].to_numpy(), kind="mergesort")
    cids = centers[id_col].to_numpy()[order]
    cmat = np.stack(centers[vec_col].to_numpy())[order].astype(np.float64)
    ref = ray.put((cids, cmat))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        _cids, _cmat = cached_get(ref)
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        d = np.round(np.sqrt(
            ((mat[:, None, :] - _cmat[None, :, :]) ** 2).sum(axis=2)),
            ROUND_TO)
        # argmin with ties to the SMALLER center id: _cids are sorted, so
        # plain argmin (first occurrence wins) is exactly that
        ci = d.argmin(axis=1)
        ids = b[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids,
            "center_id": _cids[ci],
            "dist": d[np.arange(len(ids)), ci],
            "is_center": np.isin(ids, _cids),
        })

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pandas")
