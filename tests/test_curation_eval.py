"""Round-5 curation surface: UniMax waterfill, LSH-vs-exact eval, and
the curation-funnel tallies (queries unimax_mix_docs,
minhash_eval_docs, uncertainty_sample_docs, curation_funnel_docs —
each also holds a full DuckDB oracle in __ray_entry__)."""

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.sampling.stratified import unimax_allocation


def test_unimax_pivot_mid_list():
    r = unimax_allocation({"a": 100, "b": 200, "c": 1000, "d": 5000},
                          budget_fraction=0.5, epoch_cap=2.0)
    by = dict(zip(r["group"], r["alloc_tokens"]))
    # small groups saturate at capacity, large ones split the level
    assert by["a"] == 200.0 and by["b"] == 400.0
    assert by["c"] == by["d"] == pytest.approx(1275.0)
    # budget under total capacity is allocated exactly
    assert r["alloc_tokens"].sum() == pytest.approx(0.5 * 6300)


def test_unimax_epoch_cap_binds():
    # budget far above capacity: everyone capped, leftover unallocated
    r = unimax_allocation({"a": 10, "b": 90}, budget_fraction=10.0,
                          epoch_cap=3.0)
    assert r["alloc_tokens"].tolist() == [30.0, 270.0]
    assert r["epochs"].tolist() == [3.0, 3.0]


def test_unimax_uniform_when_budget_small():
    r = unimax_allocation({"a": 10, "b": 1000, "c": 50},
                          budget_fraction=0.01, epoch_cap=2.0)
    assert np.allclose(r["alloc_tokens"], 1060 * 0.01 / 3)


def test_unimax_sequential_equivalence():
    # the closed form must match the literal sequential rule
    counts = {f"g{i}": c for i, c in enumerate([7, 3, 19, 4, 120, 55, 2])}
    e, frac = 1.5, 0.8
    r = unimax_allocation(counts, frac, e)
    items = sorted(counts.items(), key=lambda kv: (kv[1] * e, kv[0]))
    rem = frac * sum(counts.values())
    seq = {}
    for i, (g, n) in enumerate(items):
        a = min(n * e, rem / (len(items) - i))
        seq[g] = a
        rem -= a
    got = dict(zip(r["group"], r["alloc_tokens"]))
    for g in counts:
        assert got[g] == pytest.approx(seq[g], abs=1e-12)


def test_unimax_edges():
    assert unimax_allocation({}, 1.0, 2.0).empty
    with pytest.raises(ValueError):
        unimax_allocation({"a": 10}, -0.1, 2.0)
    with pytest.raises(ValueError):
        unimax_allocation({"a": 10}, 1.0, 0.0)
    with pytest.raises(ValueError):
        unimax_allocation({"a": -5}, 1.0, 2.0)
    z = unimax_allocation({"a": 0, "b": 100}, 0.5, 2.0)
    assert dict(zip(z["group"], z["epochs"]))["a"] == 0.0


def test_lsh_recall_eval_toy(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.ngram_jaccard import lsh_recall_eval

    dup = "the quick brown fox jumps over the lazy dog again and again"
    near = ("the quick brown fox jumps over the lazy dog again and "
            "again today")
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [dup, dup, near, "completely different words entirely",
                 "", None],  # empty docs excluded from the universe
    })
    ds = rd.from_pandas(rows)
    out = lsh_recall_eval(ds, "doc_id", "text", threshold=0.5)
    assert len(out) == 1
    r = out.iloc[0]
    # identical pair (1,2) has J=1: always in truth, always a candidate
    assert r["n_truth"] >= 1 and r["n_hit"] >= 1
    assert 0.0 <= r["precision"] <= 1.0 and 0.0 <= r["recall"] <= 1.0
    assert r["n_hit"] <= min(r["n_cand"], r["n_truth"])


def test_funnel_tallies_telescope(ray_session):
    from data_quality_ray.pipelines.queries import curation_funnel_docs

    out = curation_funnel_docs("/root/testdata/sf0.001")
    assert out["stage"].tolist() == [0, 1, 2, 3]
    kept = out["n_kept"].to_numpy()
    assert (np.diff(kept) <= 0).all()  # monotone survivor counts
    # each stage's drop is the previous stage's kept minus this one's
    assert out["n_dropped"].tolist() == [0] + (
        kept[:-1] - kept[1:]).tolist()
    assert kept[0] == 500


def test_uncertainty_sample_is_bottom_k(ray_session):
    from data_quality_ray.pipelines.queries import (UNCERTAIN_K,
                                                    uncertainty_sample_docs)

    out = uncertainty_sample_docs("/root/testdata/sf0.001")
    assert len(out) == UNCERTAIN_K
    assert (out["margin"].to_numpy() ==
            np.abs(out["quality_score"].to_numpy())).all()
