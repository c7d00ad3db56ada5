"""SemDeDup: semantic (embedding-space) deduplication.

Abbas et al. 2023 (arXiv:2303.09540): cluster embeddings with a cheap
k-means coarse quantizer, compare pairs only WITHIN clusters, collapse
connected components of cosine-≥-threshold pairs keeping one
representative. The cluster assignment is the partitioning assumption —
pairs crossing clusters are not compared (the paper's own trade-off);
recall scales with ``n_lists`` resolution, cost with cluster size².

Reuses the repo's proven pieces end to end: `similarity.knn`'s seeded
k-means + broadcast `IVFAssignStage` (train once, `ray.put` once),
`dedup.embedding.neardup_pairs_within` (one matmul per cluster group,
never per-pair Python), and `dedup.minhash`'s gated components
(driver union-find under the shared size gate, distributed min-label
propagation above it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def semantic_dedup(ds, id_col: str, vec_col: str, threshold: float = 0.2,
                   n_lists: int = 16, sample_rows: int = 4096,
                   seed: int = 11, centroids: np.ndarray | None = None) -> pd.DataFrame:
    """→ DataFrame(id, sem_cluster, keep) over ALL rows: ``sem_cluster``
    = min id of the row's cosine-component (itself if un-duplicated),
    ``keep`` = is the component representative. Pass ``centroids`` to
    reuse a quantizer trained on a reference corpus.

    Scale: this DataFrame route materializes only (id, cluster) — at
    10^12 rows, consume ``keep=False`` ids as a broadcast drop-filter
    (the `dedup_by_key` winner pattern) instead of joining the frame.
    """
    import ray

    from ..similarity.knn import IVFAssignStage, train_ivf_centroids
    from .embedding import neardup_pairs_within
    from .minhash import (UNION_FIND_MAX_PAIRS, distributed_components,
                          union_find_components)

    cent = (centroids if centroids is not None
            else train_ivf_centroids(ds, vec_col, n_lists=n_lists,
                                     sample_rows=sample_rows, seed=seed))
    ref = ray.put(cent)
    assigned = ds.map_batches(IVFAssignStage(ref, vec_col), batch_format="pandas")
    pairs = neardup_pairs_within(assigned, id_col, vec_col, "ivf_list",
                                 threshold=threshold)
    ids = ds.select_columns([id_col]).to_pandas()[id_col]
    if pairs.empty:
        comp = pd.Series(dtype=ids.dtype, name="cluster")
    else:
        edges = pairs[["id_a", "id_b"]]
        cdf = (union_find_components(edges)
               if len(edges) <= UNION_FIND_MAX_PAIRS
               else distributed_components(edges))
        comp = cdf.set_index("id")["cluster"]
    sem = ids.map(comp).fillna(ids).astype(ids.dtype)
    return (pd.DataFrame({id_col: ids, "sem_cluster": sem,
                          "keep": (sem == ids).to_numpy()})
            .sort_values(id_col).reset_index(drop=True))
