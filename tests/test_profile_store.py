"""Cross-run profile store (state/profile_store.py): merged == one-shot,
crash-invisibility, spec-mismatch refusal, per-run drift series."""

import os

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.profiling.analyzers import profile
from data_quality_ray.state.profile_store import ProfileStore

SPEC = {"price": ["summary"], "status": ["text_length", "frequency"]}


def _frame(n=3000, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "price": np.round(rng.uniform(1, 9e5, n), 2),
        "status": rng.choice(["OPEN", "FILLED", "PENDING", ""], n),
    })


def _ds(df, n_blocks=4):
    import ray.data as rd

    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % n_blocks)])


def test_merged_equals_one_shot(ray_session, tmp_path):
    df = _frame()
    day1, day2 = df.iloc[: len(df) // 3], df.iloc[len(df) // 3:]
    store = ProfileStore(str(tmp_path / "ps"))
    store.commit(_ds(day1), SPEC, run_label="day1")
    store.commit(_ds(day2), SPEC, run_label="day2")
    assert store.n_runs() == 2
    got = store.merged()
    want = profile(_ds(df), SPEC)
    # counts/extrema/frequencies merge exactly; float sums only to
    # summation-order ulps
    for field in ("count", "min", "max"):
        assert got["price"]["summary"][field] == want["price"]["summary"][field]
    for field in ("sum", "mean", "variance"):
        assert got["price"]["summary"][field] == pytest.approx(
            want["price"]["summary"][field], rel=1e-12)
    assert got["status"]["text_length"] == want["status"]["text_length"]
    assert got["status"]["frequency"] == want["status"]["frequency"]


def test_crash_invisibility_and_labels(ray_session, tmp_path):
    df = _frame(800)
    store = ProfileStore(str(tmp_path / "ps"))
    store.commit(_ds(df), SPEC, run_label="good")
    # a torn generation (no _GEN marker) must be invisible
    torn = str(tmp_path / "ps" / "gen-7")
    os.makedirs(torn)
    open(os.path.join(torn, "profile.bin"), "wb").close()
    assert store.n_runs() == 1
    runs = store.run_results()
    assert [r["run_label"] for r in runs] == ["good"]
    assert runs[0]["profile"]["price"]["summary"]["count"] == 800
    # the torn dir's number is burned — the next commit skips past it
    store.commit(_ds(df), SPEC, run_label="later")
    assert store.n_runs() == 2
    assert store.merged()["price"]["summary"]["count"] == 1600


def test_spec_mismatch_refused(ray_session, tmp_path):
    store = ProfileStore(str(tmp_path / "ps"))
    store.commit(_ds(_frame(200)), SPEC)
    with pytest.raises(ValueError, match="spec mismatch"):
        store.commit(_ds(_frame(200)), {"price": ["summary"]})
    with pytest.raises(ValueError, match="no committed runs"):
        ProfileStore(str(tmp_path / "empty")).merged()


def test_same_name_different_params_refused(ray_session, tmp_path):
    from data_quality_ray.profiling.analyzers import HistogramAcc

    store = ProfileStore(str(tmp_path / "ps"))
    store.commit(_ds(_frame(100)),
                 {"price": [("hist", lambda: HistogramAcc(0, 100, 10))]})
    with pytest.raises(ValueError, match="spec mismatch"):
        store.commit(_ds(_frame(100)),
                     {"price": [("hist", lambda: HistogramAcc(500, 900, 10))]})


def test_drift_series(ray_session, tmp_path):
    from data_quality_ray.profiling.analyzers import HistogramAcc

    spec = {"price": [("hist", lambda: HistogramAcc(0.0, 1000.0, 10))]}
    store = ProfileStore(str(tmp_path / "ps"))
    rng = np.random.default_rng(4)
    for label, mid in (("r1", 300.0), ("r2", 305.0), ("r3", 700.0)):
        df = pd.DataFrame({"price": rng.normal(mid, 50, 2000)})
        store.commit(_ds(df), spec, run_label=label)
    out = store.drift("price", "hist")
    assert list(out["run_prev"]) == ["r1", "r2"]
    assert list(out["run_cur"]) == ["r2", "r3"]
    # a tiny shift drifts a little; a regime change drifts a lot
    assert out["psi"].iloc[0] < 0.25 < out["psi"].iloc[1]
    # reference PSI from the stored accs' own counts
    runs = store.run_results()
    c1 = np.asarray(runs[0]["profile"]["price"]["hist"]["counts"], float)
    c1[0] += runs[0]["profile"]["price"]["hist"]["below"]
    c1[-1] += runs[0]["profile"]["price"]["hist"]["above"]
    c2 = np.asarray(runs[1]["profile"]["price"]["hist"]["counts"], float)
    c2[0] += runs[1]["profile"]["price"]["hist"]["below"]
    c2[-1] += runs[1]["profile"]["price"]["hist"]["above"]
    p = np.maximum(c1 / c1.sum(), 1e-6)
    q = np.maximum(c2 / c2.sum(), 1e-6)
    assert out["psi"].iloc[0] == round(float(((p - q) * np.log(p / q)).sum()), 6)
