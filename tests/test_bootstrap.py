"""Deterministic Poisson bootstrap (profiling/bootstrap.py)."""

import numpy as np
import pandas as pd

from data_quality_ray.profiling.bootstrap import (POISSON_THRESHOLDS,
                                                  bootstrap_means,
                                                  poisson_weights)


def test_poisson_weight_distribution_matches_cdf():
    # a uniform sweep over 2^53 must reproduce the Poisson(1) pmf
    m = np.linspace(0, (1 << 53) - 1, 2_000_001).astype(np.int64)
    w = poisson_weights(m)
    freq = np.bincount(w, minlength=10) / len(w)
    import math
    pmf = [math.exp(-1.0) / math.factorial(k) for k in range(9)]
    assert np.allclose(freq[:9], pmf, atol=1e-3)
    assert len(POISSON_THRESHOLDS) == 9


def test_bootstrap_means_deterministic_and_centered(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(8)
    n = 4000
    df = pd.DataFrame({"k1": np.arange(n, dtype=np.int64),
                       "k2": np.ones(n, dtype=np.int64),
                       "price": np.round(rng.normal(100, 10, n), 2)})
    ds = rd.from_pandas(df)
    a = bootstrap_means(ds, ["k1", "k2"], "price", b_replicates=8)
    b = bootstrap_means(ds, ["k1", "k2"], "price", b_replicates=8)
    pd.testing.assert_frame_equal(a, b)  # deterministic
    # replicate means straddle the data mean; n_eff ~ n
    mu = df["price"].mean()
    assert abs(a["mean_value"].mean() - mu) < 1.0
    assert (np.abs(a["n_eff"].to_numpy() - n) < 4 * np.sqrt(n)).all()
    # replicates differ from each other (the weights actually vary)
    assert a["mean_value"].nunique() > 1
