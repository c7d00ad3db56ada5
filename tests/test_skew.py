"""Key-skew report: exact distribution stats, driver/shuffle path parity,
and the salt recommendation it feeds into the join machinery."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_quality_ray.profiling.skew import key_skew_report, recommend_salt


def _skewed_frame(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    # zipf-ish: one dominating key plus a long tail
    keys = np.where(rng.random(n) < 0.3, 0, rng.integers(1, 800, n))
    return pd.DataFrame({"k": keys.astype(np.int64)})


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df).repartition(8)


def test_report_matches_duckdb(ray_session):
    df = _skewed_frame()
    r = key_skew_report(_ds(df), "k", top_k=5)
    ref = duckdb.sql("""
        WITH c AS (SELECT k, count(*) cnt FROM df GROUP BY k)
        SELECT count(*) n_keys, sum(cnt) n_rows, max(cnt) max_cnt,
               quantile_disc(cnt, 0.5) p50, quantile_disc(cnt, 0.9) p90,
               quantile_disc(cnt, 0.99) p99
        FROM c""").fetchone()
    assert (r["n_keys"], r["n_rows"], r["max_cnt"]) == ref[:3]
    assert (r["cnt_p50"], r["cnt_p90"], r["cnt_p99"]) == ref[3:]
    top_ref = duckdb.sql("""
        SELECT k, count(*) cnt FROM df GROUP BY k
        ORDER BY cnt DESC, k LIMIT 5""").df()
    assert (r["top"]["k"].to_numpy() == top_ref["k"].to_numpy()).all()
    assert (r["top"]["cnt"].to_numpy() == top_ref["cnt"].to_numpy()).all()


def test_driver_shuffle_parity(ray_session):
    df = _skewed_frame(seed=9)
    a = key_skew_report(_ds(df), "k", top_k=7, final="driver")
    b = key_skew_report(_ds(df), "k", top_k=7, final="shuffle")
    for f in ("n_rows", "n_keys", "max_cnt", "cnt_p50", "cnt_p90",
              "cnt_p99"):
        assert a[f] == b[f], f
    assert a["max_over_mean"] == pytest.approx(b["max_over_mean"])
    pd.testing.assert_frame_equal(a["top"].reset_index(drop=True),
                                  b["top"].reset_index(drop=True))


def test_recommend_salt_hot_key(ray_session):
    # 30% of rows on one key out of ~800 → that key must be split
    r = key_skew_report(_ds(_skewed_frame()), "k")
    salt = recommend_salt(r, n_buckets=64, target_ratio=2.0)
    assert salt > 1
    # the hot key's share per salted bucket now fits the target
    assert r["max_cnt"] / salt <= 2.0 * r["n_rows"] / 64 + 1
    assert salt <= 64


def test_recommend_salt_uniform_is_one(ray_session):
    df = pd.DataFrame({"k": np.arange(4000, dtype=np.int64) % 500})
    r = key_skew_report(_ds(df), "k")
    assert recommend_salt(r, n_buckets=64) == 1


def test_recommend_salt_tiny_keyspace_is_one():
    r = {"n_keys": 3, "n_rows": 1_000_000, "max_cnt": 999_000}
    assert recommend_salt(r, n_buckets=64) == 1


def test_hash_join_auto_salt_parity(ray_session):
    from data_quality_ray.functions.joins import hash_join

    left = _skewed_frame(seed=17)
    left["v"] = np.arange(len(left))
    right = pd.DataFrame({"k": np.arange(800, dtype=np.int64),
                          "label": [f"n{i}" for i in range(800)]})
    out_auto = (hash_join(_ds(left), _ds(right), on="k",
                          right_cols=["label"], salt="auto")
                .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    out_plain = (hash_join(_ds(left), _ds(right), on="k",
                           right_cols=["label"], salt=1)
                 .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out_auto, out_plain)


def test_composite_key_report(ray_session):
    df = _skewed_frame(seed=5)
    df["k2"] = (df["k"] % 3).astype(np.int64)
    r = key_skew_report(_ds(df), ["k", "k2"], top_k=3)
    ref = duckdb.sql("""
        WITH c AS (SELECT k, k2, count(*) cnt FROM df GROUP BY k, k2)
        SELECT count(*), max(cnt) FROM c""").fetchone()
    assert (r["n_keys"], r["max_cnt"]) == ref
    assert list(r["top"].columns) == ["k", "k2", "cnt"]
