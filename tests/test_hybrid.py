"""RRF hybrid retrieval (similarity/hybrid.py): multi-query cosine
parity with per-query cosine_topk, and RRF fusion math vs hand
computation."""

import numpy as np
import pandas as pd

from data_quality_ray.similarity.hybrid import multi_cosine_topk, rrf_fuse


def test_multi_cosine_matches_single(ray_session):
    import ray.data as rd

    from data_quality_ray.similarity.knn import cosine_topk

    rng = np.random.default_rng(8)
    emb = rng.normal(size=(400, 16))
    df = pd.DataFrame({"id": np.arange(400), "v": list(emb)})
    ds = rd.from_pandas(df).repartition(5)
    queries = {"a": emb[3], "b": emb[7]}
    got = multi_cosine_topk(ds, "id", "v", queries, k=5)
    for qid in queries:
        single = cosine_topk(ds, "id", "v", queries[qid], k=5)
        g = got[got["query_id"] == qid].reset_index(drop=True)
        assert list(g["id"]) == list(single["id"])
        np.testing.assert_allclose(g["sim"], single["sim"].round(6),
                                   atol=2e-6)
    assert list(got.columns) == ["query_id", "id", "sim", "rank"]


def test_rrf_fusion_math():
    r1 = pd.DataFrame({"query_id": "q", "id": [10, 20, 30],
                       "rank": [1, 2, 3]})
    r2 = pd.DataFrame({"query_id": "q", "id": [20, 40],
                       "rank": [1, 2]})
    out = rrf_fuse([r1, r2], k=10, c=60)
    m = dict(zip(out["id"], out["rrf"]))
    assert m[20] == round(1 / 62 + 1 / 61, 6)  # appears in both lists
    assert m[10] == round(1 / 61, 6)
    assert m[40] == round(1 / 62, 6)
    # fused order: 20 first (two contributions), then 10, 40, 30
    assert list(out.sort_values("rank")["id"]) == [20, 10, 40, 30]
