"""MMR selection (similarity/mmr.py) vs a brute-force reference."""

import numpy as np
import pandas as pd

from data_quality_ray.similarity.mmr import mmr_select


def _brute(ids, mat, q, k, lam):
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = q / np.linalg.norm(q)
    rel = np.round(mat @ q, 6)
    sel = []
    for _ in range(min(k, len(ids))):
        cand = [i for i in range(len(ids)) if i not in sel]
        if sel:
            pen = np.round(mat[cand] @ mat[sel].T, 6).max(axis=1)
            score = np.round(lam * rel[cand] - (1 - lam) * pen, 6)
        else:
            score = rel[cand]
        order = sorted(range(len(cand)),
                       key=lambda j: (-score[j], ids[cand[j]]))
        sel.append(cand[order[0]])
    return [(ids[i], rel[i]) for i in sel]


def test_mmr_vs_brute(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, d = 60, 12
    mat = rng.normal(size=(n, d))
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({"vec_id": ids,
                       "embedding": [r.astype(np.float32) for r in mat]})
    q = rng.normal(size=d)
    got = mmr_select(rd.from_pandas(df), "vec_id", "embedding", q,
                     k=8, lam=0.6)
    want = _brute(ids, np.stack(df["embedding"].to_numpy()).astype(np.float64),
                  q, 8, 0.6)
    assert list(zip(got["vec_id"], got["rel"])) == \
        [(i, round(r, 6)) for i, r in want]
    assert got["sel_order"].tolist() == list(range(8))


def test_mmr_k_exceeds_rows(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"vec_id": np.arange(3, dtype=np.int64),
                       "embedding": [rng.normal(size=8).astype(np.float32)
                                     for _ in range(3)]})
    out = mmr_select(rd.from_pandas(df), "vec_id", "embedding",
                     rng.normal(size=8), k=10)
    assert len(out) == 3 and set(out["vec_id"]) == {0, 1, 2}


def test_mmr_lambda_one_is_pure_relevance(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(20, 6))
    df = pd.DataFrame({"vec_id": np.arange(20, dtype=np.int64),
                       "embedding": [r.astype(np.float32) for r in mat]})
    q = rng.normal(size=6)
    out = mmr_select(rd.from_pandas(df), "vec_id", "embedding", q,
                     k=5, lam=1.0)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    rel = np.round(matn @ (q / np.linalg.norm(q)), 6)
    want = np.lexsort((np.arange(20), -rel))[:5]
    assert out["vec_id"].tolist() == want.tolist()
