"""Distributed quantized logistic regression (similarity/logreg.py):
serial-reference parity, partition invariance, learning signal."""

import numpy as np
import pandas as pd

from data_quality_ray.similarity.logreg import _r6, logreg_fit


def _ds(df, blocks=5):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def _serial(df, x_cols, rounds, lr):
    x = df[x_cols].to_numpy(np.float64)
    y = df["y"].to_numpy(np.float64)
    xa = np.concatenate([np.ones((len(x), 1)), x], axis=1)
    w = np.zeros(xa.shape[1])
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-(xa @ w)))
        w = _r6(w - lr * (xa.T @ (p - y)) / len(x))
        loss = _r6(np.float64(
            -(y * np.log(np.maximum(p, 1e-300))
              + (1 - y) * np.log(np.maximum(1 - p, 1e-300))).mean()))
    return w, loss


def test_logreg_matches_serial_and_partitioning(ray_session):
    rng = np.random.default_rng(13)
    n = 4000
    x1 = rng.normal(0, 1, n)
    x2 = rng.normal(0, 1, n)
    y = (2 * x1 - x2 + rng.normal(0, 0.5, n) > 0).astype(float)
    df = pd.DataFrame({"x1": x1, "x2": x2, "y": y})
    got = logreg_fit(_ds(df, blocks=7), ["x1", "x2"], "y", rounds=6, lr=1.0)
    w_ref, loss_ref = _serial(df, ["x1", "x2"], rounds=6, lr=1.0)
    # quantized rounds absorb partial-sum order: exact equality expected
    assert np.array_equal(got["w"], w_ref)
    assert got["loss"] == loss_ref and got["n"] == n
    got1 = logreg_fit(_ds(df, blocks=1), ["x1", "x2"], "y", rounds=6, lr=1.0)
    assert np.array_equal(got1["w"], got["w"])
    # learned the right signs and actually classifies
    assert got["w"][1] > 0.5 and got["w"][2] < -0.2
    assert got["loss"] < 0.69  # better than chance


def test_logreg_excludes_null_rows(ray_session):
    df = pd.DataFrame({"x1": [0.0, 1.0, np.nan, 2.0],
                       "y": [0.0, 1.0, 1.0, np.nan]})
    got = logreg_fit(_ds(df, blocks=2), ["x1"], "y", rounds=2)
    assert got["n"] == 2
