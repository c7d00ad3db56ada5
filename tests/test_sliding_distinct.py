"""Exact sliding distinct counts (functions/window.sliding_distinct):
hand-built expectations and randomized DuckDB range-join parity."""

import duckdb
import numpy as np
import pandas as pd


def _ds(df, n_blocks=3):
    import ray.data as rd

    return rd.from_pandas([df.iloc[i::n_blocks].reset_index(drop=True)
                           for i in range(n_blocks)])


def _sql(df, w):
    return duckdb.sql(f"""
        WITH p AS (SELECT DISTINCT k,
                     CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) h
                   FROM df WHERE k IS NOT NULL AND ts IS NOT NULL),
        b AS (SELECT min(h) mn, max(h) mx FROM p),
        hours AS (SELECT unnest(generate_series(
            (SELECT mn FROM b), (SELECT mx FROM b))) h)
        SELECT make_timestamp(hours.h * 3600 * 1000000) window_start,
               CAST(count(DISTINCT p.k) AS BIGINT) n_distinct
        FROM hours LEFT JOIN p ON p.h BETWEEN hours.h - {w - 1}
                                          AND hours.h
        GROUP BY 1 ORDER BY 1""").df()


def test_sliding_distinct_hand_case(ray_session):
    from data_quality_ray.functions.window import sliding_distinct

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "k": [1, 1, 2, 1, 3],
        "ts": [t0, t0 + pd.Timedelta(hours=1),
               t0 + pd.Timedelta(hours=1),
               t0 + pd.Timedelta(hours=4),
               t0 + pd.Timedelta(hours=6)],
    })
    out = sliding_distinct(_ds(df, 2), "k", "ts", window_hours=3)
    # h0:{1} h1:{1,2} h2:{1,2} h3:{1,2} h4:{1} h5:{1} h6:{1,3}
    assert out["n_distinct"].tolist() == [1, 2, 2, 2, 1, 1, 2]


def test_sliding_distinct_gap_hours_counted_as_zero(ray_session):
    from data_quality_ray.functions.window import sliding_distinct

    t0 = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({"k": [9, 9],
                       "ts": [t0, t0 + pd.Timedelta(hours=10)]})
    out = sliding_distinct(_ds(df, 1), "k", "ts", window_hours=2)
    assert len(out) == 11
    assert out["n_distinct"].tolist() == [1, 1] + [0] * 8 + [1]


def test_sliding_distinct_matches_duckdb_random(ray_session):
    from data_quality_ray.functions.window import sliding_distinct

    rng = np.random.default_rng(11)
    t0 = pd.Timestamp("2024-03-01")
    df = pd.DataFrame({
        "k": rng.integers(0, 40, 600),
        "ts": t0 + pd.to_timedelta(rng.integers(0, 72 * 3600, 600),
                                   unit="s"),
    })
    for w in (1, 4, 6):
        out = sliding_distinct(_ds(df), "k", "ts", window_hours=w)
        exp = _sql(df, w)
        assert out["n_distinct"].tolist() == exp["n_distinct"].tolist()
        assert (out["window_start"].astype(str).tolist()
                == exp["window_start"].astype(str).tolist())


def test_running_max_matches_sql_window(ray_session):
    import duckdb

    from data_quality_ray.functions.window import running_max

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"o": rng.permutation(500).astype(np.int64),
                       "v": rng.integers(0, 1000, 500).astype(np.int64)})
    out = (running_max(_ds(df), "o", "v", n_parts=7).to_pandas()
           .sort_values("o").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT o, max(v) OVER (ORDER BY o
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) rm
        FROM df ORDER BY o""").df()
    mine = out["run_max"].to_numpy()
    ref = exp["rm"].to_numpy(np.float64)
    assert np.isnan(mine[0]) and np.isnan(ref[0])
    assert np.allclose(mine[1:], ref[1:])
