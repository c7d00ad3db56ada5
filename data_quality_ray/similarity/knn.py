"""Similarity search over an embedding column (list<float>).

- ``cosine_topk``: brute-force top-k — the correctness baseline. The query
  matrix is broadcast ONCE via ``ray.put`` and read in every task (not
  re-shipped per batch); each batch does one float64 matmul; per-batch
  top-k partials merge on the driver (k rows per block, tiny).
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing: only
  batches' vectors whose signature matches one of the query's probe
  signatures are scored. Same merge; recall < 1 by design.

Computation is float64 end-to-end so DuckDB's ``list_cosine_similarity``
(also float64) can be the oracle for the brute-force variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _batch_topk(ids: np.ndarray, sims: np.ndarray, k: int) -> pd.DataFrame:
    if len(ids) > k:
        part = np.argpartition(-sims, k)[:k]
        ids, sims = ids[part], sims[part]
    return pd.DataFrame({"id": ids, "sim": sims})


def cosine_topk(ds, id_col: str, vec_col: str, query: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of one query vector. Returns (id, sim) sorted by
    (-sim, id) — deterministic ties."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    from ..functions.broadcast import cached_get

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv = cached_get(q_ref)  # fetched/deserialized once per worker
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ qv) / np.where(norms == 0, 1, norms)
        return _batch_topk(batch[id_col].to_numpy(), sims, k)

    parts = pd.concat(
        list(ds.map_batches(score, batch_format="pandas").iter_batches(batch_size=4 * k, batch_format="pandas")),
        ignore_index=True,
    )
    out = parts.sort_values(["sim", "id"], ascending=[False, True], kind="mergesort").head(k)
    return out.reset_index(drop=True)


class LSHIndexStage:
    """Random-hyperplane signature per vector (actor-pool stage): appends a
    ``bucket`` int column. Vectors in the same bucket are ANN candidates;
    at scale, ``groupby("bucket")`` co-locates candidates so per-bucket
    scoring never sees the full table."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 7, vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_planes)
        self.vec_col = vec_col

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[self.vec_col].to_numpy()).astype(np.float64)
        batch = batch.copy()
        batch["bucket"] = self.signature(mat)
        return batch


def lsh_topk(ds, id_col: str, vec_col: str, query: np.ndarray, k: int = 10,
             dim: int | None = None, n_planes: int = 12, seed: int = 7,
             multiprobe_bits: int = 1) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose LSH bucket is within
    ``multiprobe_bits`` Hamming distance of the query's bucket."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    dim = dim or len(q)
    stage = LSHIndexStage(dim, n_planes, seed, vec_col)
    q_sig = int(stage.signature((q / np.linalg.norm(q)).reshape(1, -1))[0])
    probes = {q_sig}
    if multiprobe_bits >= 1:
        probes |= {q_sig ^ (1 << b) for b in range(n_planes)}
    qn = q / np.linalg.norm(q)
    q_ref = ray.put((qn, probes))

    from ..functions.broadcast import cached_get

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        qv, probe_set = cached_get(q_ref)
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        sig = stage.signature(mat / np.linalg.norm(mat, axis=1, keepdims=True))
        cand = np.isin(sig, list(probe_set))
        if not cand.any():
            return pd.DataFrame({"id": [], "sim": []})
        sub = mat[cand]
        sims = (sub @ qv) / np.linalg.norm(sub, axis=1)
        return _batch_topk(batch[id_col].to_numpy()[cand], sims, k)

    parts = pd.concat(
        list(ds.map_batches(score, batch_format="pandas").iter_batches(batch_size=4 * k, batch_format="pandas")),
        ignore_index=True,
    )
    out = parts.sort_values(["sim", "id"], ascending=[False, True], kind="mergesort").head(k)
    return out.reset_index(drop=True)
