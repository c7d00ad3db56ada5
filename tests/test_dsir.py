"""DSIR importance resampling: weight math vs a local reference, and
the selection actually prefers target-like documents."""

import numpy as np
import pandas as pd
import pytest


def _mk(df):
    import ray.data as rd

    return rd.from_pandas(df).repartition(3)


def test_dsir_weights_match_local_reference(ray_session):
    from data_quality_ray.profiling.sketches import md5_hash64
    from data_quality_ray.sampling.dsir import dsir_weights

    rng = np.random.RandomState(9)
    vocab_a = [f"alpha{i}" for i in range(30)]
    vocab_b = [f"beta{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab_a if i % 2 else vocab_b, 12))
             for i in range(120)]
    corpus = pd.DataFrame({"doc_id": np.arange(120), "text": texts})
    target = corpus[corpus["doc_id"] % 2 == 1]  # the alpha dialect

    B = 64
    got = dsir_weights(_mk(corpus), _mk(target), "doc_id", "text",
                       n_buckets=B).to_pandas().sort_values("doc_id")

    # local reference: same features, same hash, plain numpy
    def feats(t):
        toks = t.lower().split()
        return toks + [a + " " + b for a, b in zip(toks, toks[1:])]

    def fold(frame):
        flat = [f for t in frame["text"] for f in feats(t)]
        b = (md5_hash64(np.array(flat, dtype=object)) % np.uint64(B)).astype(int)
        return np.bincount(b, minlength=B), len(flat)

    tc, tn = fold(target)
    rc, rn = fold(corpus)
    lr = np.log((tc + 1.0) / (tn + B)) - np.log((rc + 1.0) / (rn + B))
    for _, row in got.head(20).iterrows():
        fl = feats(corpus.loc[corpus["doc_id"] == row["doc_id"], "text"].iloc[0])
        hb = (md5_hash64(np.array(fl, dtype=object)) % np.uint64(B)).astype(int)
        assert row["dsir_weight"] == pytest.approx(lr[hb].sum(), abs=1e-6)
        assert row["n_features"] == len(fl)


def test_dsir_select_prefers_target_dialect(ray_session):
    from data_quality_ray.sampling.dsir import dsir_select

    rng = np.random.RandomState(17)
    vocab_a = [f"alpha{i}" for i in range(40)]
    vocab_b = [f"beta{i}" for i in range(40)]
    rows = []
    for i in range(300):
        dialect = vocab_a if i < 150 else vocab_b
        rows.append((i, " ".join(rng.choice(dialect, 15))))
    rows.append((300, ""))      # zero-feature docs are never selected
    rows.append((301, "   "))
    corpus = pd.DataFrame(rows, columns=["doc_id", "text"])
    target = corpus[(corpus["doc_id"] < 150) & (corpus["doc_id"] % 5 == 0)]

    out = dsir_select(_mk(corpus), _mk(target), "doc_id", "text",
                      n_select=50, n_buckets=256)
    assert len(out) == 50
    assert list(out["rank"]) == list(range(1, 51))
    assert (out["dsir_weight"].to_numpy()[:-1]
            >= out["dsir_weight"].to_numpy()[1:]).all()
    # selection should be dominated by the alpha dialect
    assert (out["doc_id"] < 150).mean() > 0.9
    assert not out["doc_id"].isin([300, 301]).any()
