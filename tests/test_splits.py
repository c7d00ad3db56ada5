"""Deterministic hash splits: boundary math, determinism/stability under
incremental ingestion, fraction accuracy, and md5-path DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_quality_ray.sampling.splits import (
    N_BUCKETS, assign_split, split_boundaries, with_split_column)


def test_split_boundaries_exact_and_pinned():
    assert split_boundaries({"train": 0.8, "valid": 0.1, "test": 0.1}) == [
        ("train", 8000), ("valid", 9000), ("test", 10000)]
    # non-normalized fractions normalize; last boundary always pinned
    assert split_boundaries({"a": 2, "b": 1})[-1] == ("b", N_BUCKETS)
    # float fractions that don't sum to 1 exactly still cover every bucket
    b = split_boundaries({"a": 1 / 3, "b": 1 / 3, "c": 1 / 3})
    assert b[-1][1] == N_BUCKETS
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.5, "b": -0.1})


def test_assign_split_deterministic_and_stable():
    keys = np.arange(5000)
    a = assign_split(keys, {"train": 0.8, "valid": 0.1, "test": 0.1})
    b = assign_split(keys, {"train": 0.8, "valid": 0.1, "test": 0.1})
    np.testing.assert_array_equal(a, b)
    # incremental ingestion: old keys never move when new keys arrive
    c = assign_split(np.arange(10000), {"train": 0.8, "valid": 0.1, "test": 0.1})
    np.testing.assert_array_equal(c[:5000], a)
    # fractions approximately honored
    frac = (a == "train").mean()
    assert 0.77 < frac < 0.83
    # salt changes the assignment
    d = assign_split(keys, {"train": 0.8, "valid": 0.1, "test": 0.1}, salt="v2")
    assert (a != d).any()


def test_assign_split_matches_duckdb_md5():
    keys = np.array([f"doc{i}" for i in range(500)], dtype=object)
    got = assign_split(keys, {"train": 0.8, "valid": 0.1, "test": 0.1},
                       hash_fn="md5")
    df = pd.DataFrame({"k": keys})
    exp = duckdb.sql("""
        SELECT CASE WHEN md5_number_lower(k) % 10000 < 8000 THEN 'train'
                    WHEN md5_number_lower(k) % 10000 < 9000 THEN 'valid'
                    ELSE 'test' END AS s FROM df""").df()["s"].to_numpy()
    np.testing.assert_array_equal(got, exp)


def test_with_split_column_dataset(ray_session):
    import ray.data as rd
    ds = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(200)}))
    out = with_split_column(ds, "doc_id").to_pandas()
    ref = assign_split(np.arange(200), {"train": 0.8, "valid": 0.1, "test": 0.1})
    np.testing.assert_array_equal(
        out.sort_values("doc_id")["split"].to_numpy(), ref)
