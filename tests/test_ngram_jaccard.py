"""Exact n-gram Jaccard set-similarity join: completeness vs an
all-pairs brute force (the property the prefix filter must never lose),
ordering-path parity (cms frequency order vs stateless hash order), and
edge cases (empty/short texts, no duplicates)."""

import numpy as np
import pandas as pd


def _corpus(n=150, seed=11):
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(n):
        base = " ".join(rng.choice(words, size=rng.randint(4, 24)))
        docs.append(base)
        r = rng.rand()
        if r < 0.2:
            docs.append(base + " tail")          # near-dup
        elif r < 0.3:
            docs.append(base)                     # exact dup
    return pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                         "text": docs})


def _brute_clusters(df, threshold=0.5, shingle_size=3, hash_fn="stable"):
    from data_quality_ray.dedup.minhash import _cached_hasher, union_find_components

    mh = _cached_hasher(64, shingle_size, 17, hash_fn)
    sets = {r.doc_id: frozenset(mh.shingles(r.text).tolist())
            for r in df.itertuples()}
    ids = df["doc_id"].tolist()
    edges = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa and not sb:
                continue
            if len(sa & sb) / max(1, len(sa | sb)) >= threshold:
                edges.append((a, b))
    if not edges:
        return pd.DataFrame({"doc_id": [], "cluster": []})
    comp = union_find_components(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    return (comp.rename(columns={"id": "doc_id"})
            .sort_values("doc_id").reset_index(drop=True))


def test_ngram_jaccard_matches_brute_force_both_orderings(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.ngram_jaccard import ngram_jaccard_dedup

    df = _corpus()
    truth = _brute_clusters(df)
    assert len(truth) > 10  # the fixture plants real clusters
    for ordering in ("cms", "hash"):
        ds = rd.from_pandas(df).repartition(6)
        out = (ngram_jaccard_dedup(ds, "doc_id", "text", threshold=0.5,
                                   ordering=ordering)
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(out.astype("int64"),
                                      truth.astype("int64"))


def test_ngram_jaccard_dataset_route_matches_pandas(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.ngram_jaccard import ngram_jaccard_dedup

    df = _corpus(n=120, seed=5)
    ds = rd.from_pandas(df).repartition(5)
    pdf = (ngram_jaccard_dedup(ds, "doc_id", "text", threshold=0.5)
           .sort_values("doc_id").reset_index(drop=True))
    ds = rd.from_pandas(df).repartition(5)
    dd = (ngram_jaccard_dedup(ds, "doc_id", "text", threshold=0.5,
                              output="dataset")
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(dd.astype("int64"), pdf.astype("int64"))


def test_ngram_jaccard_higher_threshold_is_subset(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.ngram_jaccard import ngram_jaccard_dedup

    df = _corpus(seed=3)
    ds = rd.from_pandas(df).repartition(4)
    lo = ngram_jaccard_dedup(ds, "doc_id", "text", threshold=0.5)
    ds = rd.from_pandas(df).repartition(4)
    hi = ngram_jaccard_dedup(ds, "doc_id", "text", threshold=0.9)
    assert set(hi["doc_id"]) <= set(lo["doc_id"])
    assert _brute_clusters(df, threshold=0.9)["doc_id"].tolist() == \
        sorted(hi["doc_id"].tolist())


def test_ngram_jaccard_edge_cases(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.ngram_jaccard import ngram_jaccard_dedup

    # empty / one-word / None-ish texts and zero clusters
    df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                       "text": ["", "solo", "alpha beta gamma delta",
                                "one two three four five six"]})
    out = ngram_jaccard_dedup(rd.from_pandas(df), "doc_id", "text",
                              threshold=0.5)
    assert len(out) == 0

    # two identical one-word docs DO cluster (whole-text gram)
    df2 = pd.DataFrame({"doc_id": np.array([7, 9], dtype=np.int64),
                        "text": ["solo", "solo"]})
    out2 = ngram_jaccard_dedup(rd.from_pandas(df2), "doc_id", "text",
                               threshold=0.5)
    assert sorted(out2["doc_id"].tolist()) == [7, 9]
    assert set(out2["cluster"]) == {7}
