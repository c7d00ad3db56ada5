"""Distribution-test / classifier-evaluation statistics
(profiling/hypothesis.py): exact small-input expectations, tie
handling, and SQL-window parity via DuckDB on the same frame."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_quality_ray.profiling.hypothesis import (
    cohens_kappa, grouped_percent_rank, ks_statistic, roc_auc, welch_ttest)


def _ds(df, n_blocks=3):
    import ray.data as rd

    return rd.from_pandas([df.iloc[i::n_blocks].reset_index(drop=True)
                           for i in range(n_blocks)])


def test_welch_ttest_exact(ray_session):
    # hand-checkable: a=[1,2,3,4], b=[2,4,6,8,10]
    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 5 + ["c"] * 2,
        "v": [1, 2, 3, 4, 2, 4, 6, 8, 10, 99, -99],  # 'c' must be ignored
    })
    r = welch_ttest(_ds(df), "g", "v", "a", "b")
    ma, mb = 2.5, 6.0
    va, vb = 5.0 / 3.0, 10.0
    se2 = va / 4 + vb / 5
    assert r["n_a"] == 4 and r["n_b"] == 5
    assert r["mean_a"] == pytest.approx(ma) and r["mean_b"] == pytest.approx(mb)
    assert r["var_a"] == pytest.approx(va) and r["var_b"] == pytest.approx(vb)
    assert r["t_stat"] == pytest.approx((ma - mb) / np.sqrt(se2))
    assert r["welch_df"] == pytest.approx(
        se2 ** 2 / ((va / 4) ** 2 / 3 + (vb / 5) ** 2 / 4))


def test_welch_ignores_nulls(ray_session):
    df = pd.DataFrame({"g": ["a", "a", "a", "b", "b", "b"],
                       "v": [1.0, None, 3.0, 4.0, 6.0, None]})
    r = welch_ttest(_ds(df, 2), "g", "v", "a", "b")
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["mean_a"] == pytest.approx(2.0)
    assert r["mean_b"] == pytest.approx(5.0)


def test_ks_statistic_exact(ray_session):
    # a = {1,2,3,4}, b = {3,4,5,6}: max gap at value 2 (F_a=.5, F_b=0)
    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 4,
                       "v": [1, 2, 3, 4, 3, 4, 5, 6]})
    r = ks_statistic(_ds(df), "g", "v", "a", "b")
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_stat"] == pytest.approx(0.5)
    assert r["ks_at"] == 2.0


def test_ks_tie_takes_smallest_value(ray_session):
    # identical gap 0.5 attained at v=1 and v=2 → report v=1
    df = pd.DataFrame({"g": ["a", "a", "b", "b"], "v": [1, 2, 3, 4]})
    r = ks_statistic(_ds(df, 2), "g", "v", "a", "b")
    assert r["ks_stat"] == pytest.approx(1.0)  # disjoint supports
    assert r["ks_at"] == 2.0  # first value where the full gap is reached


def test_roc_auc_exact_and_ties(ray_session):
    # scores: pos={3,4}, neg={1,2} → AUC=1; with a tie it drops by 0.125
    df = pd.DataFrame({"s": [1.0, 2.0, 3.0, 4.0],
                       "y": [False, False, True, True]})
    assert roc_auc(_ds(df, 2), "s", "y")["auc"] == pytest.approx(1.0)
    df2 = pd.DataFrame({"s": [1.0, 2.0, 2.0, 4.0],
                        "y": [False, False, True, True]})
    r = roc_auc(_ds(df2, 2), "s", "y")
    # pairs: (2,1)=1, (2,2)=.5, (4,1)=1, (4,2)=1 → 3.5/4
    assert r["auc"] == pytest.approx(0.875)
    assert (r["n_pos"], r["n_neg"]) == (2, 2)


def test_roc_auc_matches_sql_rank_formula(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"s": np.round(rng.normal(size=300), 2),
                       "y": rng.random(300) > 0.6})
    r = roc_auc(_ds(df), "s", "y")
    sql = duckdb.sql("""
        WITH v AS (SELECT s, count(*) n, count(*) FILTER (WHERE y) np
                   FROM df GROUP BY 1),
        w AS (SELECT n, np, coalesce(sum(n) OVER (ORDER BY s
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0) b FROM v),
        t AS (SELECT sum(np) p, sum(n)-sum(np) q,
                     sum(np*(2*b+n+1)) r2 FROM w)
        SELECT (r2 - p*(p+1)) * 1.0 / (2*p*q) FROM t""").fetchone()[0]
    assert r["auc"] == pytest.approx(sql, abs=1e-12)


def test_cohens_kappa_exact(ray_session):
    # classic 2x2: tp=20, fp=5, fn=10, tn=15 → po=0.7, pe=0.5, κ=0.4
    rows = ([(True, True)] * 20 + [(True, False)] * 5 +
            [(False, True)] * 10 + [(False, False)] * 15)
    df = pd.DataFrame(rows, columns=["p", "t"])
    r = cohens_kappa(_ds(df), "p", "t")
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (20, 5, 10, 15)
    assert r["p_o"] == pytest.approx(0.7)
    assert r["p_e"] == pytest.approx(0.5)
    assert r["kappa"] == pytest.approx(0.4)


def test_grouped_percent_rank_matches_sql_window(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.choice(["x", "y", "z"], 200),
                       "v": rng.integers(0, 30, 200)})
    out = (grouped_percent_rank(_ds(df), "g", "v").to_pandas()
           .sort_values(["g", "v"]).reset_index(drop=True))
    sql = duckdb.sql("""
        SELECT g, v, percent_rank() OVER (PARTITION BY g ORDER BY v) pr
        FROM df ORDER BY g, v""").df()
    assert np.allclose(out["pct_rank"].to_numpy(),
                       sql["pr"].to_numpy(), atol=1e-12)


def test_grouped_percent_rank_single_row_group(ray_session):
    df = pd.DataFrame({"g": ["solo", "big", "big"], "v": [5, 1, 2]})
    out = grouped_percent_rank(_ds(df, 1), "g", "v").to_pandas()
    assert out.loc[out["g"] == "solo", "pct_rank"].iloc[0] == 0.0


def test_grouped_roc_auc_matches_global_and_one_class(ray_session):
    from data_quality_ray.profiling.hypothesis import grouped_roc_auc, roc_auc

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "g": np.repeat(["x", "y", "z"], 100),
        "s": np.round(rng.normal(size=300), 2),
        "y": np.concatenate([rng.random(200) > 0.5,
                             np.ones(100, dtype=bool)]),  # z: one class
    })
    out = grouped_roc_auc(_ds(df), "g", "s", "y").set_index("group")
    for grp in ("x", "y"):
        sub = df[df["g"] == grp]
        solo = roc_auc(_ds(sub.reset_index(drop=True), 2), "s", "y")
        assert out.loc[grp, "auc"] == pytest.approx(solo["auc"])
    assert pd.isna(out.loc["z", "auc"])  # no negatives → null
    assert out.loc["z", "n_neg"] == 0


def test_wasserstein1_exact(ray_session):
    # a = {1,2}, b = {2,3} (2-dp fixed point): W1 = 1.0 exactly —
    # area between ECDFs is 0.5 over [1,2] and 0.5 over [2,3]
    from data_quality_ray.profiling.hypothesis import wasserstein1

    df = pd.DataFrame({"g": ["a", "a", "b", "b", "c"],
                       "v": [1.0, 2.0, 2.0, 3.0, 99.0]})  # 'c' ignored
    r = wasserstein1(_ds(df), "g", "v", "a", "b", decimals=2)
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["emd"] == pytest.approx(1.0)


def test_wasserstein1_identical_is_zero(ray_session):
    from data_quality_ray.profiling.hypothesis import wasserstein1

    df = pd.DataFrame({"g": ["a", "a", "b", "b"],
                       "v": [1.25, 7.5, 7.5, 1.25]})
    r = wasserstein1(_ds(df, 2), "g", "v", "a", "b")
    assert r["emd"] == 0.0


def test_wasserstein1_matches_scipy_formula(ray_session):
    # cross-check against the direct sorted-sample formula on
    # equal-sized samples: W1 = mean |sorted(a) - sorted(b)|
    from data_quality_ray.profiling.hypothesis import wasserstein1

    rng = np.random.RandomState(7)
    a = np.round(rng.uniform(0, 50, 64), 2)
    b = np.round(rng.uniform(10, 60, 64), 2)
    df = pd.DataFrame({"g": ["a"] * 64 + ["b"] * 64,
                       "v": np.concatenate([a, b])})
    r = wasserstein1(_ds(df), "g", "v", "a", "b")
    expect = float(np.mean(np.abs(np.sort(a) - np.sort(b))))
    assert r["emd"] == pytest.approx(expect, abs=1e-9)


def test_cusum_changepoint_finds_level_shift(ray_session):
    # 6 days at ~2/day then 6 days at ~10/day → change at day 6
    from data_quality_ray.profiling.hypothesis import cusum_changepoint

    ts = []
    for d in range(6):
        ts += [np.datetime64(f"2024-01-{d+1:02d}T03:00")] * 2
    for d in range(6, 12):
        ts += [np.datetime64(f"2024-01-{d+1:02d}T03:00")] * 10
    df = pd.DataFrame({"ts": pd.to_datetime(ts)})
    r = cusum_changepoint(_ds(df), "ts", unit="day")
    assert r["n_buckets"] == 12 and r["n_events"] == 72
    assert pd.Timestamp(r["change_at"]) == pd.Timestamp("2024-01-06")
    # |S_6|·12 = |12·12 − 6·72| = 288 → stat = 288/12 = 24
    assert r["cusum_stat"] == pytest.approx(24.0)


def test_cusum_tie_takes_earliest_bucket(ray_session):
    # flat series: every |S_i| = 0 → earliest day reported
    from data_quality_ray.profiling.hypothesis import cusum_changepoint

    ts = [np.datetime64(f"2024-02-{d+1:02d}T12:00") for d in range(5)]
    df = pd.DataFrame({"ts": pd.to_datetime(ts)})
    r = cusum_changepoint(_ds(df, 2), "ts", unit="day")
    assert pd.Timestamp(r["change_at"]) == pd.Timestamp("2024-02-01")
    assert r["cusum_stat"] == 0.0
