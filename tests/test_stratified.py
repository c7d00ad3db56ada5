"""Stratified sampling: threshold math, determinism/stability, fraction
accuracy per group, unknown-group handling, and md5 DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_quality_ray.sampling.stratified import sample_mask, stratified_sample


def test_fraction_accuracy_per_group():
    n = 20000
    keys = np.arange(n)
    groups = np.where(keys % 2 == 0, "a", "b")
    m = sample_mask(keys, groups, {"a": 0.25, "b": 0.9}, hash_fn="stable")
    fa = m[groups == "a"].mean()
    fb = m[groups == "b"].mean()
    assert abs(fa - 0.25) < 0.02 and abs(fb - 0.9) < 0.02
    # edge fractions are exact
    m0 = sample_mask(keys, groups, {"a": 0.0, "b": 1.0}, hash_fn="stable")
    assert not m0[groups == "a"].any() and m0[groups == "b"].all()


def test_deterministic_stable_and_salted():
    keys = np.arange(3000)
    groups = np.repeat(["x", "y", "z"], 1000)
    fr = {"x": 0.5, "y": 0.5, "z": 0.5}
    a = sample_mask(keys, groups, fr)
    np.testing.assert_array_equal(a, sample_mask(keys, groups, fr))
    # decision is per-key: appending rows never flips old rows
    a2 = sample_mask(np.arange(6000), np.tile(groups, 2), fr)
    np.testing.assert_array_equal(a2[:3000], a)
    # salt gives an independent draw
    b = sample_mask(keys, groups, fr, salt="run2")
    assert (a != b).any()


def test_unknown_group_default_and_raise():
    keys = np.arange(10)
    groups = np.array(["seen"] * 5 + ["new"] * 5, dtype=object)
    with pytest.raises(KeyError):
        sample_mask(keys, groups, {"seen": 0.5})
    m = sample_mask(keys, groups, {"seen": 1.0}, default=0.0)
    assert m[:5].all() and not m[5:].any()
    with pytest.raises(ValueError):
        sample_mask(keys, groups, {"seen": 1.5}, default=1.5)


def test_md5_matches_duckdb():
    df = pd.DataFrame({"k": [f"id{i}" for i in range(400)],
                       "g": ["w" if i % 3 else "b" for i in range(400)]})
    got = sample_mask(df["k"].to_numpy(), df["g"].to_numpy(),
                      {"w": 0.37, "b": 0.8}, hash_fn="md5")
    exp = duckdb.sql("""
        SELECT md5_number_lower(k) % 10000 <
               CASE g WHEN 'w' THEN 3700 ELSE 8000 END FROM df
        """).df().iloc[:, 0].to_numpy()
    np.testing.assert_array_equal(got, exp)


def test_stratified_sample_dataset(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"doc_id": np.arange(1000),
                       "src": np.where(np.arange(1000) < 500, "a", "b")})
    out = stratified_sample(rd.from_pandas(df), "doc_id", "src",
                            {"a": 0.3, "b": 1.0}, hash_fn="stable").to_pandas()
    m = sample_mask(df["doc_id"].to_numpy(), df["src"].to_numpy(),
                    {"a": 0.3, "b": 1.0}, hash_fn="stable")
    np.testing.assert_array_equal(
        np.sort(out["doc_id"].to_numpy()), df["doc_id"].to_numpy()[m])


def test_temperature_fractions_math():
    """T→∞ approaches uniform mass per source; T=1 keeps natural
    proportions; capping at 1.0; deterministic rounding."""
    from data_quality_ray.sampling.stratified import temperature_fractions

    counts = {"big": 8000, "mid": 1500, "tiny": 500}
    # T=1: keep-rate identical across sources (natural proportions)
    f1 = temperature_fractions(counts, 1.0, 5000)
    assert len({f1[g] for g in counts}) == 1 and abs(f1["big"] - 0.5) < 1e-9
    # high T: tiny source oversampled, caps at 1.0; big undersampled
    f8 = temperature_fractions(counts, 8.0, 5000)
    assert f8["tiny"] == 1.0 and f8["big"] < f1["big"]
    # monotone: raising T never raises the biggest source's rate
    f2, f4 = (temperature_fractions(counts, t, 5000) for t in (2.0, 4.0))
    assert f1["big"] >= f2["big"] >= f4["big"] >= f8["big"]
    import pytest

    with pytest.raises(ValueError):
        temperature_fractions(counts, 0.0, 10)


def test_temperature_mix_dataset_route(ray_session):
    """temperature_mix == stratified_sample with the derived fractions;
    per-source keep counts track the computed rates."""
    import ray.data as rd

    from data_quality_ray.sampling.stratified import (
        group_counts, sample_mask, temperature_fractions, temperature_mix)

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "k": np.arange(3000),
        "src": rng.choice(["a", "b", "c"], size=3000, p=[0.7, 0.2, 0.1]),
    })
    ds = rd.from_pandas(df).repartition(4)
    got = temperature_mix(ds, "k", "src", temperature=2.0,
                          target_fraction=0.5).to_pandas()
    counts = group_counts(rd.from_pandas(df), "src")
    fr = temperature_fractions(counts, 2.0, 0.5 * len(df))
    mask = sample_mask(df["k"], df["src"], fr, salt="mix:")
    ref = df[mask]
    assert sorted(got["k"]) == sorted(ref["k"])
    # realized per-source rate within 5% absolute of the target rate
    for g, n in counts.items():
        kept = (got["src"] == g).sum()
        assert abs(kept / n - fr[g]) < 0.05


def test_apportioned_sample_exact_total_and_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.sampling.budget import apportion, apportioned_sample

    df = pd.DataFrame({"id": range(400),
                       "g": ["a"] * 200 + ["b"] * 150 + ["c"] * 50})
    w = {"a": 1.0, "b": 2.0, "c": 5.0}
    ds = rd.from_pandas(df).repartition(5)
    out = apportioned_sample(ds, ["id"], "g", lambda s: w[s],
                             total_n=80).to_pandas()
    # exact-N when no group caps: 80·(1/8, 2/8, 5/8) = 10/20/50
    sizes = out.groupby("g")["id"].count().to_dict()
    assert sizes == {"a": 10, "b": 20, "c": 50} and len(out) == 80
    out2 = apportioned_sample(rd.from_pandas(df).repartition(1), ["id"],
                              "g", lambda s: w[s], total_n=80).to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])  # partition-invariant
    # group cap binds: c has only 50 rows, ask for more than it can give
    plan = apportion(pd.DataFrame({"g": ["a", "b", "c"],
                                   "n_rows": [200, 150, 10]}),
                     "g", lambda s: w[s], 80)
    assert plan.set_index("g")["alloc"].to_dict() == {"a": 10, "b": 20,
                                                      "c": 10}
