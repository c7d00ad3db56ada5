"""2-D Pareto skyline (functions/skyline.py) vs brute-force dominance,
including duplicate points, equal-coordinate ties, nulls, and the
forced tree-reduction path."""

import numpy as np
import pandas as pd

from data_quality_ray.functions.skyline import skyline2d


def _brute(df):
    x = df["x"].to_numpy()
    y = df["y"].to_numpy()
    keep = []
    for i in range(len(df)):
        dom = (x <= x[i]) & (y >= y[i]) & ((x < x[i]) | (y > y[i]))
        keep.append(not dom.any())
    return (df[np.array(keep)].sort_values(["id"])
            .reset_index(drop=True))


def _check(df, **kw):
    import ray.data as rd

    ds = rd.from_pandas(df.sample(frac=1, random_state=2)).repartition(6)
    got = (skyline2d(ds, "x", "y", ["id", "x", "y"], **kw)
           .sort_values("id").reset_index(drop=True))
    want = _brute(df.dropna(subset=["x", "y"]))[["id", "x", "y"]]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_random_with_dup_points_and_ties(ray_session):
    rng = np.random.default_rng(21)
    df = pd.DataFrame({"x": rng.integers(0, 40, 800).astype(float),
                       "y": rng.integers(0, 40, 800).astype(float)})
    df = pd.concat([df, df.head(30)], ignore_index=True)  # exact dup points
    df.loc[5, "x"] = np.nan  # null coordinate excluded
    df["id"] = np.arange(len(df))
    _check(df)


def test_tree_reduction_path(ray_session):
    rng = np.random.default_rng(4)
    # anti-correlated: big skyline, forces the reduction rounds
    x = rng.uniform(0, 1, 3000)
    df = pd.DataFrame({"x": x, "y": 1 - x + rng.normal(0, 1e-9, 3000),
                       "id": np.arange(3000)})
    _check(df, collect_limit=100, max_rounds=6)
