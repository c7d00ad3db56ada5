"""Distributed PCA over an embedding column.

The covariance is a perfectly mergeable fold: each batch contributes
(Σxxᵀ, Σx, n) — fixed d×d + d + 1 floats regardless of rows — and the
driver closes cov = Σxxᵀ/n − μμᵀ. The eigendecomposition runs on the
driver (d×d, trivial for embedding dims); components are sign-normalized
(largest-|w| element made positive) so the fit is deterministic.
Projection is one broadcast + matmul per batch.

Oracle strategy: eigenvectors are not SQL-replayable (sign/order/
iteration ambiguity), so the ORACLED query is the covariance matrix
itself (exact SQL replay); the eigen step is pinned against numpy and a
reconstruction-error bound in pytest — the same split as the image
feature stages (distributed plumbing oracled, local math unit-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def covariance(ds, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """→ (cov d×d population covariance, mean d, n) from one streaming
    pass of fixed-size partials."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame({
            "sxx": [mat.T @ mat],
            "sx": [mat.sum(axis=0)],
            "n": [len(mat)],
        })

    sxx = sx = None
    n = 0
    for b in ds.map_batches(partial, batch_format="pandas") \
               .iter_batches(batch_size=64, batch_format="pandas"):
        for row in b.itertuples(index=False):
            sxx = row.sxx if sxx is None else sxx + row.sxx
            sx = row.sx if sx is None else sx + row.sx
            n += row.n
    mu = sx / n
    return sxx / n - np.outer(mu, mu), mu, n


def pca_fit(ds, vec_col: str, k: int = 8):
    """→ (components k×d, eigenvalues k, mean d): top-k eigenpairs of
    the population covariance, eigenvalue-descending, sign-normalized."""
    cov, mu, _ = covariance(ds, vec_col)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    # deterministic sign: the largest-|w| coordinate of each component
    # is made positive
    for i in range(len(comps)):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, w[order], mu


def pca_project(ds, id_col: str, vec_col: str, comps: np.ndarray,
                mu: np.ndarray, out_col: str = "pca"):
    """Center + project every row onto the fitted components — one
    broadcast, one matmul per batch. → Dataset (id_col, out_col)."""
    import ray

    from ..functions.broadcast import cached_get

    ref = ray.put((np.asarray(comps), np.asarray(mu)))

    def project(b: pd.DataFrame) -> pd.DataFrame:
        w, m = cached_get(ref)
        mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
        proj = (mat - m) @ w.T
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             out_col: list(proj)})

    return ds.select_columns([id_col, vec_col]).map_batches(
        project, batch_format="pandas")
