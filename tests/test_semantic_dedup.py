"""SemDeDup: exact-duplicate vectors always collapse (identical vectors
share a cluster assignment by construction), near-orthogonal vectors
survive, output covers every id with min-id representatives."""

import numpy as np
import pandas as pd

from data_quality_ray.dedup.semantic import semantic_dedup


def test_semantic_dedup_collapses_exact_dups(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(13)
    base = rng.normal(size=(40, 16))
    rows, gid = [], []
    for i in range(120):
        g = i % 40
        v = base[g] + (0.001 * rng.normal(size=16) if i >= 40 else 0)
        rows.append(v.tolist())
        gid.append(g)
    df = pd.DataFrame({"vec_id": np.arange(120), "embedding": rows})
    out = semantic_dedup(rd.from_pandas(df).repartition(4), "vec_id",
                         "embedding", threshold=0.999, n_lists=8,
                         sample_rows=120)
    assert len(out) == 120 and (out["vec_id"] == np.arange(120)).all()
    # ids 0..39 are exact bases; 40..119 are (near-)copies of base i%40.
    # every exact copy pair (i, i+40 jittered may differ) — at 0.999 the
    # jittered copies still match their base direction
    clus = out.set_index("vec_id")["sem_cluster"]
    for i in range(40, 120):
        assert clus[i] == clus[i % 40] == i % 40, i
    # representative invariants
    assert (out.loc[out["keep"], "vec_id"] == out.loc[out["keep"], "sem_cluster"]).all()
    assert set(out["sem_cluster"]) == set(range(40))
    assert out["keep"].sum() == 40


def test_semantic_dedup_no_pairs(ray_session):
    import ray.data as rd
    vecs = np.eye(8)  # mutually orthogonal: nothing collapses
    df = pd.DataFrame({"vec_id": np.arange(8), "embedding": list(vecs)})
    out = semantic_dedup(rd.from_pandas(df), "vec_id", "embedding",
                         threshold=0.5, n_lists=4, sample_rows=8)
    assert out["keep"].all() and (out["sem_cluster"] == out["vec_id"]).all()
