"""Distributed k-means (Lloyd's) over an embedding column — full-corpus
clustering, unlike ``knn.train_ivf_centroids`` which fits on a bounded
head sample. Building block for semantic dedup sharding, IVF list
training at corpus scale, and data-mixture analysis.

Iteration shape (the canonical broadcast + partial-sum pattern): each
round broadcasts the k×d centroid matrix once (``ray.put``), one
``map_batches`` pass emits a fixed-size partial per batch — per-centroid
vector sums and member counts, (k, d+1) floats regardless of batch size
— and the driver merges partials and updates centroids. Driver state is
k×d; data never moves. ITERS+1 streaming passes total (final assignment
pass included).

Determinism contract (what makes this SQL-replayable, the repo's
quantized-state trick): init = the k vectors with the smallest ids
(cast float64); assignment = argmin squared-Euclidean with lowest
centroid id on ties; after every update the centroids are ROUNDED to
``round_to`` decimals, so engine-level float summation-order differences
(numpy pairwise sum vs a sequential SQL ``avg``) are quantized away
instead of compounding across iterations. Empty clusters keep their
previous centroid.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

ROUND_TO = 6


def _init_centroids(ds, id_col: str, vec_col: str, k: int) -> np.ndarray:
    """k vectors with the globally smallest ids, float64. One streaming
    pass keeping a k-row head per batch (ids need not be sorted)."""
    best: pd.DataFrame | None = None
    for b in ds.iter_batches(batch_size=4096, batch_format="pandas"):
        cand = b[[id_col, vec_col]].nsmallest(k, id_col)
        best = cand if best is None else \
            pd.concat([best, cand]).nsmallest(k, id_col)
    if best is None or len(best) < k:
        raise ValueError(f"need at least k={k} rows")
    best = best.sort_values(id_col)
    return np.stack(best[vec_col].to_numpy()).astype(np.float64)


def _assign(x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    # squared euclidean via the expansion; argmin takes the LOWEST
    # centroid id on exact ties (numpy argmin semantics)
    d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cent.T) \
        + (cent * cent).sum(axis=1)
    return np.argmin(d2, axis=1)


def kmeans_fit(ds, id_col: str, vec_col: str, k: int, iters: int = 3,
               round_to: int = ROUND_TO) -> np.ndarray:
    """→ final (k, d) centroid matrix after ``iters`` quantized Lloyd
    rounds."""
    import ray

    from ..functions.broadcast import cached_get

    cent = np.round(_init_centroids(ds, id_col, vec_col, k), round_to)
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            c = cached_get(ref)
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            a = _assign(x, c)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.float64)
            return pd.DataFrame({"p": [pickle.dumps((sums, counts))]})

        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent))
        for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
                batch_size=64, batch_format="pandas"):
            for blob in b["p"]:
                s, c = pickle.loads(blob)
                sums += s
                counts += c
        nonempty = counts > 0
        cent[nonempty] = np.round(
            sums[nonempty] / counts[nonempty, None], round_to)
    return cent


def kmeans_assign(ds, id_col: str, vec_col: str, cent: np.ndarray):
    """→ Dataset (id, cid): nearest final centroid per vector."""
    import ray

    from ..functions.broadcast import cached_get

    ref = ray.put(cent)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = cached_get(ref)
        x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({id_col: b[id_col],
                             "cid": _assign(x, c).astype(np.int64)})

    return ds.map_batches(assign, batch_format="pandas")


def kmeans(ds, id_col: str, vec_col: str, k: int, iters: int = 3,
           round_to: int = ROUND_TO):
    """Fit + final assignment → (Dataset (id, cid), centroids)."""
    cent = kmeans_fit(ds, id_col, vec_col, k, iters, round_to)
    return kmeans_assign(ds, id_col, vec_col, cent), cent
