"""Composite one-pass profiling over the F2 typed-columns table — the
AnalyzerPerformanceTest analog (expected dominant type per column,
quality tallies, pattern frequencies), plus Japanese-text stages."""

import numpy as np
import pytest

from data_quality_ray.sources.fixtures import F2_EXPECTED_TYPES, generate_f2


@pytest.fixture(scope="module")
def f2(ray_session):
    import ray.data as rd

    return rd.from_arrow(generate_f2(2000, seed=42))


def test_dominant_types_all_columns(f2):
    from data_quality_ray.profiling.analyzers import profile

    res = profile(f2, {col: ["type"] for col in F2_EXPECTED_TYPES}, batch_size=256)
    got = {col: res[col]["type"]["dominant_type"] for col in F2_EXPECTED_TYPES}
    assert got == F2_EXPECTED_TYPES


def test_composite_single_pass(f2):
    """Several analyzers over several columns in ONE pass (Analyzers.with_)."""
    from data_quality_ray.profiling.analyzers import profile

    res = profile(
        f2,
        {
            "int_col": ["type", "cardinality", "text_length"],
            "bool_col": ["frequency"],
            "empty_heavy": ["text_length", "pattern_frequency"],
            "constant_col": ["cardinality", "frequency"],
        },
        batch_size=256,
    )
    assert res["constant_col"]["frequency"]["top_values"] == [("CONST", 2000)]
    assert round(res["constant_col"]["cardinality"]["distinct_estimate"]) == 1
    tl = res["empty_heavy"]["text_length"]
    assert tl["min_length"] == 0 and tl["max_length"] == 3 and tl["blank_count"] > 400
    freqs = dict(res["bool_col"]["frequency"]["top_values"])
    assert set(freqs) == {"true", "false", "TRUE", "False"}
    # pattern frequency collapses to the 'a'/'aa'/'aaa'/'' fingerprints
    pats = dict(res["empty_heavy"]["pattern_frequency"]["top_values"])
    assert set(pats) <= {"", "a", "aa", "aaa"}


def test_jp_text_stages(ray_session):
    import ray.data as rd

    from data_quality_ray.stages.jp_text import (
        hira_to_romaji, kata_to_hira, normalize_japanese_number, tokenize_japanese,
    )

    assert kata_to_hira("カタカナ") == "かたかな"
    assert hira_to_romaji("さくら") == "sakura"
    assert hira_to_romaji("トウキョウ") == "toukyou"
    assert normalize_japanese_number("三千五百円です") == "3500円です"
    assert normalize_japanese_number("一万二千三百四十五") == "12345"

    out = tokenize_japanese(
        rd.from_items([{"text": "東京タワーはtall building 123です"}])
    ).take(1)[0]
    assert "tall" in out["tokens"] and "123" in out["tokens"]


def test_profile_tree_merge_equals_driver(ray_session):
    """merge='tree' (distributed combine rounds) must produce identical
    results to the driver merge — accumulator merges are associative."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.profiling.analyzers import profile

    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "x": rng.randint(0, 50, size=4000).astype(float),
        "s": rng.choice(["aa", "bb", "cc", None, ""], size=4000),
    })
    ds = rd.from_pandas(df).repartition(16)
    spec = {"x": ["summary", "cardinality", "quantile"],
            "s": ["text_length", "frequency", "type"]}
    a = profile(ds, spec, batch_size=256)
    b = profile(rd.from_pandas(df).repartition(16), spec, batch_size=256,
                merge="tree", tree_fanin=4)
    # exact accumulators: identical under any merge grouping
    for col, names in (("x", ["summary", "cardinality"]),
                       ("s", ["text_length", "frequency", "type"])):
        for name in names:
            assert a[col][name] == b[col][name], (col, name)
    # t-digest quantiles are merge-ORDER-sensitive by design (approximate
    # sketch): tree grouping shifts estimates within the accuracy bound
    for q in ("q25", "median", "q75"):
        assert abs(a["x"]["quantile"][q] - b["x"]["quantile"][q]) <= 0.5
