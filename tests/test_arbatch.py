"""Aspect-ratio bucketing + batch assembly (stages/arbatch.py) vs a
brute-force pandas reference, plus the window_ops partition count op."""

import numpy as np
import pandas as pd

from data_quality_ray.stages.arbatch import (SDXL_BUCKETS, ar_bucket_batches,
                                             assign_ar_buckets)


def _ds(df, n_blocks=4):
    import ray.data as rd

    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % n_blocks)])


def _frame(n=600, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "image_id": [f"im{i:06d}" for i in range(n)],
        "w": rng.integers(200, 2000, n),
        "h": rng.integers(200, 2000, n),
    })


def _ref_assign(df, buckets):
    log_l = np.log([b[0] / b[1] for b in buckets])
    d = np.round(np.abs(np.log(df["w"].to_numpy(float)
                               / df["h"].to_numpy(float))[:, None]
                        - log_l[None, :]), 6)
    return np.argmin(d, axis=1)


def test_assign_matches_reference_and_tie_breaks_low(ray_session):
    df = _frame()
    # exact tie: aspect 1.0 sits between none of the SDXL entries, so
    # plant a symmetric two-entry ladder where every row ties
    out = assign_ar_buckets(_ds(df), buckets=((512, 512), (512, 512))).to_pandas()
    assert (out["bucket_idx"] == 0).all()  # tie → lowest ladder index
    out2 = assign_ar_buckets(_ds(df)).to_pandas().sort_values("image_id")
    exp = _ref_assign(df.sort_values("image_id"), SDXL_BUCKETS)
    assert (out2["bucket_idx"].to_numpy() == exp).all()
    lw = np.array([b[0] for b in SDXL_BUCKETS])
    assert (out2["bucket_w"].to_numpy() == lw[exp]).all()


def test_ar_bucket_batches_full_and_ordered(ray_session):
    df = _frame()
    out = (ar_bucket_batches(_ds(df), batch_size=8).to_pandas()
           .sort_values(["bucket_idx", "batch_id", "slot"])
           .reset_index(drop=True))
    exp_idx = _ref_assign(df, SDXL_BUCKETS)
    for bidx, grp in out.groupby("bucket_idx"):
        ids = sorted(df["image_id"][exp_idx == bidx])
        n_full = (len(ids) // 8) * 8
        assert list(grp["image_id"]) == ids[:n_full]  # id order, partial dropped
        assert (grp["slot"].to_numpy() == np.arange(len(grp)) % 8).all()
        assert (grp["batch_id"].to_numpy() == np.arange(len(grp)) // 8).all()
    # every emitted batch is exactly full
    sizes = out.groupby(["bucket_idx", "batch_id"]).size()
    assert (sizes == 8).all()


def test_ar_bucket_batches_keep_partial(ray_session):
    df = _frame(n=37)
    out = ar_bucket_batches(_ds(df), batch_size=8, drop_last=False).to_pandas()
    assert len(out) == 37  # nothing dropped
    exp_idx = _ref_assign(df, SDXL_BUCKETS)
    got = out.groupby("bucket_idx").size().to_dict()
    want = pd.Series(exp_idx).value_counts().to_dict()
    assert got == {k: v for k, v in want.items()}


def test_window_count_op(ray_session):
    from data_quality_ray.functions.window import window_ops

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 3, "v": range(8)})
    out = window_ops(_ds(df), by="k", order_by="v",
                     ops={"n": ("count",)}).to_pandas().sort_values("v")
    assert list(out["n"]) == [5] * 5 + [3] * 3


def test_assign_rejects_nonpositive_dims(ray_session):
    import pytest

    df = _frame(n=20)
    df.loc[3, "w"] = 0
    with pytest.raises(Exception, match="non-positive"):
        assign_ar_buckets(_ds(df)).to_pandas()


def test_window_rank_family(ray_session):
    from data_quality_ray.functions.window import window_ops

    rng = np.random.default_rng(8)
    df = pd.DataFrame({"k": rng.choice(["a", "b"], 300),
                       "t": rng.integers(0, 5, 300),      # tie-prone
                       "id": np.arange(300)})
    out = (window_ops(_ds(df), by="k", order_by=["t", "id"],
                      ops={"rnk": ("rank", ["t"]),
                           "drnk": ("dense_rank", ["t"]),
                           "q": ("ntile", 4),
                           "seq": ("row_number",)})
           .to_pandas().sort_values(["k", "seq"]).reset_index(drop=True))
    ref = df.sort_values(["k", "t", "id"]).reset_index(drop=True)
    gb = ref.groupby("k", sort=False)
    assert (out["rnk"].to_numpy()
            == gb["t"].rank(method="min").astype(int).to_numpy()).all()
    assert (out["drnk"].to_numpy()
            == gb["t"].rank(method="dense").astype(int).to_numpy()).all()
    # SQL NTILE: first count%n buckets hold ceil(count/n)
    for _, grp in out.groupby("k"):
        cnt, n = len(grp), 4
        k, r = cnt // n, cnt % n
        sizes = grp.groupby("q").size()
        assert list(sizes.index) == list(range(1, n + 1))
        assert all(sizes[i] == (k + 1 if i <= r else k) for i in sizes.index)


def test_window_value_distribution_family(ray_session):
    from data_quality_ray.functions.window import window_ops

    rng = np.random.default_rng(21)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 300),
                       "t": rng.integers(0, 5, 300),      # tie-prone
                       "id": np.arange(300),
                       "v": rng.normal(0, 10, 300)})
    out = (window_ops(_ds(df), by="k", order_by=["t", "id"],
                      ops={"pr": ("percent_rank", ["t"]),
                           "cd": ("cume_dist", ["t"]),
                           "fv": ("first_value", "v"),
                           "lv": ("last_value", "v"),
                           "nv": ("nth_value", "v", 3),
                           "seq": ("row_number",)})
           .to_pandas().sort_values(["k", "seq"]).reset_index(drop=True))
    ref = df.sort_values(["k", "t", "id"]).reset_index(drop=True)
    gb = ref.groupby("k", sort=False)
    cnt = gb["t"].transform("size").to_numpy()
    rmin = gb["t"].rank(method="min").to_numpy()
    rmax = gb["t"].rank(method="max").to_numpy()
    np.testing.assert_allclose(out["pr"], np.where(cnt > 1, (rmin - 1)
                               / np.maximum(cnt - 1, 1), 0.0), rtol=1e-12)
    np.testing.assert_allclose(out["cd"], rmax / cnt, rtol=1e-12)
    np.testing.assert_allclose(out["fv"], gb["v"].transform("first"), rtol=1e-12)
    np.testing.assert_allclose(out["lv"], gb["v"].transform("last"), rtol=1e-12)
    nth = gb["v"].nth(2)  # pandas nth is 0-based
    ref_nv = ref["k"].map(nth.set_axis(ref.loc[gb["v"].nth(2).index, "k"]))
    np.testing.assert_allclose(out["nv"], ref_nv.to_numpy(), rtol=1e-12)


def test_window_nth_value_short_partition(ray_session):
    from data_quality_ray.functions.window import window_ops

    df = pd.DataFrame({"k": ["a", "a", "b"], "o": [1, 2, 3],
                       "v": [10.0, 20.0, 30.0]})
    out = (window_ops(_ds(df), by="k", order_by="o",
                      ops={"nv": ("nth_value", "v", 2)})
           .to_pandas().sort_values("o").reset_index(drop=True))
    assert out.loc[0, "nv"] == 20.0 and out.loc[1, "nv"] == 20.0
    assert pd.isna(out.loc[2, "nv"])


def test_window_rolling_frames(ray_session):
    from data_quality_ray.functions.window import window_ops

    rng = np.random.default_rng(14)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 200),
                       "o": np.arange(200),
                       "v": rng.normal(0, 10, 200)})
    out = (window_ops(_ds(df), by="k", order_by="o",
                      ops={"s": ("rolling_sum", "v", 5),
                           "m": ("rolling_mean", "v", 5)})
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    ref = df.sort_values(["k", "o"]).reset_index(drop=True)
    g = ref.groupby("k", sort=False)["v"]
    np.testing.assert_allclose(out["s"], g.rolling(5, min_periods=1).sum()
                               .to_numpy(), rtol=1e-12)
    np.testing.assert_allclose(out["m"], g.rolling(5, min_periods=1).mean()
                               .to_numpy(), rtol=1e-12)
