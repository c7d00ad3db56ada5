"""Profiling layer: sketches, accumulators, and the one-pass Ray profile."""

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.profiling.analyzers import (
    FrequencyAcc, HistogramAcc, QualityAcc, SummaryAcc, TextLengthAcc, TypeAcc, profile,
)
from data_quality_ray.profiling.sketches import HyperLogLog, TDigest, stable_hash64


def test_hll_accuracy_and_merge():
    rng = np.random.RandomState(0)
    vals = np.array([f"v{i}" for i in rng.randint(0, 50_000, size=200_000)], dtype=object)
    true = len(np.unique(vals))
    whole = HyperLogLog()
    whole.update_array(vals)
    assert abs(whole.estimate() - true) / true < 0.03
    # split + merge == whole
    a, b = HyperLogLog(), HyperLogLog()
    a.update_array(vals[:100_000])
    b.update_array(vals[100_000:])
    a.merge(b)
    assert a.estimate() == whole.estimate()


def test_stable_hash_deterministic():
    v = np.array(["x", "y", "z"], dtype=object)
    assert stable_hash64(v).tolist() == stable_hash64(v.copy()).tolist()


def test_tdigest_quantiles_and_merge():
    rng = np.random.RandomState(1)
    vals = rng.lognormal(0, 1, size=100_000)
    td = TDigest()
    td.update_array(vals)
    for q in (0.25, 0.5, 0.75, 0.95):
        exact = np.percentile(vals, q * 100)
        assert abs(td.quantile(q) - exact) / exact < 0.02
    parts = [TDigest() for _ in range(4)]
    for i, p in enumerate(parts):
        p.update_array(vals[i * 25_000 : (i + 1) * 25_000])
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert abs(m.quantile(0.5) - np.percentile(vals, 50)) / np.percentile(vals, 50) < 0.02


def test_summary_acc_matches_numpy():
    rng = np.random.RandomState(2)
    vals = rng.rand(10_000) * 100
    acc, a, b = SummaryAcc(), SummaryAcc(), SummaryAcc()
    acc.update(vals)
    a.update(vals[:5000]); b.update(vals[5000:]); a.merge(b)
    for s in (acc, a):
        r = s.result()
        assert r["count"] == 10_000
        assert abs(r["mean"] - vals.mean()) < 1e-9
        assert abs(r["variance"] - vals.var()) < 1e-6
        assert r["min"] == vals.min() and r["max"] == vals.max()


def test_text_length_acc():
    acc = TextLengthAcc()
    acc.update(np.array(["ab", "🎉🎉🎉", None, "  ", ""], dtype=object))
    r = acc.result()
    assert r["count"] == 4 and r["min_length"] == 0 and r["max_length"] == 3
    assert r["blank_count"] == 2  # "  " and ""
    assert r["sum_length"] == 2 + 3 + 2 + 0


def test_histogram_acc():
    acc = HistogramAcc(0, 10, 5)
    acc.update(np.array([-1.0, 0.0, 1.0, 5.0, 9.999, 10.0, 11.0]))
    r = acc.result()
    assert r["below"] == 1 and r["above"] == 1
    assert sum(r["counts"]) == 5 and r["counts"][0] == 2  # 0.0 and 1.0

    b = HistogramAcc(0, 10, 5)
    b.update(np.array([2.5]))
    acc.merge(b)
    assert sum(acc.result()["counts"]) == 6


def test_type_acc_dominant():
    acc = TypeAcc()
    acc.update(np.array(["1", "2", "3.5", "x", "", "true", "2020-01-01"], dtype=object))
    r = acc.result()
    assert r["type_counts"]["INTEGER"] == 2
    assert r["type_counts"]["DOUBLE"] == 1
    assert r["type_counts"]["BOOLEAN"] == 1
    assert r["type_counts"]["DATE"] == 1
    assert r["type_counts"]["EMPTY"] == 1
    # 2 INT + 1 DOUBLE of 6 non-empty → numeric 0.5 → DOUBLE (INT⊂DOUBLE fold)
    assert r["dominant_type"] == "DOUBLE"


def test_quality_acc():
    import re

    rx = re.compile(r"^c\d+$")
    acc = QualityAcc(lambda vals: np.array([bool(rx.match(v)) for v in vals], dtype=bool))
    acc.update(np.array(["c1", "c2", "bad", "", None], dtype=object))
    r = acc.result()
    assert (r["valid"], r["empty"], r["invalid"]) == (2, 2, 1)
    assert r["invalid_samples"] == ["bad"]


def test_frequency_deterministic_ties():
    acc = FrequencyAcc(top_k=2)
    acc.update(np.array(["b", "a", "b", "a", "c"], dtype=object))
    assert acc.result()["top_values"] == [("a", 2), ("b", 2)]


def test_profile_one_pass_via_ray(ray_session):
    import ray.data as rd

    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = profile(
        ds,
        {
            "l_quantity": ["summary", "quantile", ("hist", lambda: HistogramAcc(0, 50, 10))],
            "l_returnflag": ["frequency", "cardinality", "text_length"],
        },
        batch_size=1024,
    )
    import duckdb

    exp = duckdb.sql(
        "select count(l_quantity), sum(l_quantity), min(l_quantity), max(l_quantity), avg(l_quantity) "
        "from '/root/testdata/sf0.001/lineitem.parquet'"
    ).fetchone()
    r = out["l_quantity"]["summary"]
    assert r["count"] == exp[0]
    assert abs(r["sum"] - exp[1]) < 1e-6
    assert (r["min"], r["max"]) == (exp[2], exp[3])
    assert abs(r["mean"] - exp[4]) < 1e-9
    card = out["l_returnflag"]["cardinality"]["distinct_estimate"]
    assert round(card) == 3
    top = dict(out["l_returnflag"]["frequency"]["top_values"])
    exp_top = dict(duckdb.sql(
        "select l_returnflag, count(*) from '/root/testdata/sf0.001/lineitem.parquet' group by 1"
    ).fetchall())
    assert top == exp_top


def test_count_min_sketch_merge_and_bounds():
    import numpy as np

    from data_quality_ray.profiling.sketches import CountMinSketch

    rng = np.random.RandomState(3)
    # zipf-ish stream: a few heavy keys + long tail
    keys = np.array([f"k{i}" for i in range(5000)], dtype=object)
    stream = np.concatenate([
        np.repeat(keys[:5], 2000),                 # heavy hitters
        keys[rng.randint(0, 5000, size=30000)],    # tail
    ])
    rng.shuffle(stream)
    whole = CountMinSketch()
    whole.update_array(stream)
    # merge of partials == whole
    parts = [CountMinSketch() for _ in range(4)]
    for i, p in enumerate(parts):
        p.update_array(stream[i::4])
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert (merged.table == whole.table).all() and merged.n == whole.n
    # never under-counts; heavy hitters within epsilon*N
    import collections

    exact = collections.Counter(stream)
    heavy = keys[:5]
    est = whole.estimate(heavy)
    eps_n = int(np.e / whole.width * whole.n) + 1
    for k, e in zip(heavy, est):
        assert e >= exact[k]
        assert e - exact[k] <= eps_n


def test_grouped_sketches_merge_matches_single_pass(ray_session):
    """grouped_sketches partial-merge digests agree with a single-shot
    per-group digest in rank space; per-group HLL counts distinct values
    within its rsd."""
    import ray.data as rd

    from data_quality_ray.profiling.groupagg import grouped_sketches
    from data_quality_ray.profiling.sketches import HyperLogLog, TDigest

    rng = np.random.RandomState(31)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=6000),
        "x": rng.lognormal(3, 1, size=6000),
    })
    ds = rd.from_pandas(df).repartition(6)
    digests = grouped_sketches(ds, "g", TDigest,
                               lambda a, s: a.update_array(s["x"].to_numpy()))
    for g, sub in df.groupby("g"):
        v = np.sort(sub["x"].to_numpy())
        for q in (0.1, 0.5, 0.9):
            rank = np.searchsorted(v, digests[g].quantile(q)) / len(v)
            assert abs(rank - q) <= 0.02, (g, q, rank)

    df["s"] = [f"v{i % 500}" for i in range(len(df))]
    hlls = grouped_sketches(rd.from_pandas(df).repartition(4), "g", HyperLogLog,
                            lambda a, s: a.update_array(s["s"].to_numpy()))
    for g, sub in df.groupby("g"):
        exact = sub["s"].nunique()
        assert abs(hlls[g].estimate() - exact) <= 3 * 0.026 * exact + 2


def test_bloom_filter_membership_and_merge():
    """No false negatives; FPR near design; merge == union; partials
    built per chunk equal one-shot."""
    from data_quality_ray.profiling.sketches import BloomFilter

    rng = np.random.RandomState(37)
    present = np.array([f"key-{i}" for i in range(20_000)], dtype=object)
    absent = np.array([f"other-{i}" for i in range(20_000)], dtype=object)
    bf = BloomFilter(expected_items=20_000, fpr=0.01)
    bf.update_array(present)
    assert bf.contains_array(present).all()               # zero false negatives
    fpr = bf.contains_array(absent).mean()
    assert fpr < 0.03, fpr                                # ~design FPR

    merged = BloomFilter(expected_items=20_000, fpr=0.01)
    for chunk in np.array_split(present, 7):
        part = BloomFilter(expected_items=20_000, fpr=0.01)
        part.update_array(chunk)
        merged.merge(part)
    assert np.array_equal(merged.bits, bf.bits)
    import pytest

    with pytest.raises(ValueError):
        bf.merge(BloomFilter(expected_items=5_000, fpr=0.01))


def test_grouped_tdigest_near_exact(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.profiling.quantile_exact import grouped_tdigest

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"g": np.repeat(["a", "b"], 5000),
                       "v": np.concatenate([rng.normal(100, 10, 5000),
                                            rng.exponential(50, 5000)])})
    est = grouped_tdigest(rd.from_pandas(df).repartition(6), "g", "v",
                          qs=(0.5, 0.95))
    for g in ("a", "b"):
        sub = np.sort(df.loc[df["g"] == g, "v"].to_numpy())
        for q in (0.5, 0.95):
            lo = sub[int(max(q - 0.02, 0) * len(sub))]
            hi = sub[min(int((q + 0.02) * len(sub)), len(sub) - 1)]
            assert lo <= est[g][q] <= hi, (g, q, est[g][q], lo, hi)
