"""Embedding-cosine near-duplicate detection.

Pairs with cosine ≥ threshold, found without a cross join: vectors are
bucketed (by a provided partition column, or by LSH signature via
similarity.LSHIndexStage) and compared all-pairs *within* buckets by one
float64 matmul per group — ``groupby(bucket).map_groups``. The bucket
column is the partitioning assumption: pairs crossing buckets are not
compared (use multi-probe LSH for recall at scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def neardup_pairs_within(ds, id_col: str, vec_col: str, bucket_col: str,
                         threshold: float = 0.99) -> pd.DataFrame:
    """All pairs (id_a < id_b, cos) with cosine ≥ threshold inside each
    bucket. Returns DataFrame(id_a, id_b, cos) — cos rounded to 6 dp so
    float64 results compare stably across engines."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        mat = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1, norms)
        sims = mat @ mat.T
        ids = g[id_col].to_numpy()
        iu = np.triu_indices(len(ids), k=1)
        # threshold on the 6-dp-rounded value so engine-level double
        # summation order can't flip boundary pairs vs the oracle
        mask = np.round(sims[iu], 6) >= threshold
        return pd.DataFrame({
            "id_a": ids[iu[0][mask]],
            "id_b": ids[iu[1][mask]],
            "cos": np.round(sims[iu][mask], 6),
        })

    out = ds.groupby(bucket_col).map_groups(pairs, batch_format="pandas").to_pandas()
    if out.empty:  # Ray drops the schema of an all-empty map_groups result
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
