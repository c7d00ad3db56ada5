"""Markov transition matrix (functions/markov.py) vs a single-node
pandas lag ground truth, including ts ties broken by the tiebreak column
and keys split across input blocks."""

import numpy as np
import pandas as pd

from data_quality_ray.functions.markov import transition_matrix


def _truth(df):
    s = df.sort_values(["u", "ts", "i"], kind="mergesort")
    same = s["u"].to_numpy()[:-1] == s["u"].to_numpy()[1:]
    out = (pd.DataFrame({"src": s["t"].to_numpy()[:-1][same],
                         "dst": s["t"].to_numpy()[1:][same]})
           .groupby(["src", "dst"], sort=True).size().rename("n")
           .reset_index())
    out["p"] = (out["n"] / out.groupby("src")["n"].transform("sum")).round(6)
    return out


def test_matches_pandas_with_ties(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({
        "u": rng.integers(0, 120, n),
        # coarse ts: many exact ties per user -> tiebreak column matters
        "ts": pd.to_datetime(rng.integers(0, 50, n), unit="h"),
        "i": np.arange(n),
        "t": rng.choice(list("ABCD"), n),
    })
    ds = rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(7)
    got = transition_matrix(ds, "u", "ts", "t", "i", n_buckets=8)
    want = _truth(df)
    pd.testing.assert_frame_equal(
        got.sort_values(["src", "dst"]).reset_index(drop=True), want,
        check_dtype=False)


def test_single_event_users_emit_nothing(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"u": [1, 2, 3], "ts": pd.to_datetime([0, 0, 0]),
                       "i": [0, 1, 2], "t": ["A", "B", "C"]})
    got = transition_matrix(rd.from_pandas(df).repartition(2),
                            "u", "ts", "t", "i")
    assert len(got) == 0
