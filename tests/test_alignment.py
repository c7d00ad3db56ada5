"""Caption–image alignment stage: exact hand-computed scores, null
handling, and actor-pool execution over the fixture."""

import numpy as np
import pandas as pd
import pyarrow as pa

from data_quality_ray.profiling.sketches import md5_hash64
from data_quality_ray.stages.alignment import (
    D, AlignmentStage, align_captions, tokenize,
)


def _expected(caption, phash, threshold=0.0):
    toks = tokenize(caption)
    if not toks:
        return None, False
    counts = np.zeros(D)
    for t in toks:
        counts[int(md5_hash64(np.array([t], dtype=object))[0]) % D] += 1
    u = np.int64(phash).view(np.uint64)
    bits = ((u >> np.arange(D, dtype=np.uint64)) & np.uint64(1)).astype(float)
    a = (counts * (2 * bits - 1)).sum() / (np.sqrt((counts ** 2).sum())
                                           * np.sqrt(D))
    return a, bool(a >= threshold)


def test_exact_scores_and_nulls():
    df = pd.DataFrame({
        "caption": ["A narrow   Forest path", "", None, "x"],
        "phash": np.array([-9150453391003158288, 5, 5, -1], dtype=np.int64),
    })
    out = AlignmentStage()(pa.Table.from_pandas(df)).to_pandas()
    for i in range(4):
        exp_a, exp_f = _expected(df.caption[i], df.phash[i])
        if exp_a is None:
            assert pd.isna(out.alignment[i]) and not out.is_aligned[i]
        else:
            assert out.alignment[i] == pytest_approx(exp_a)
            assert bool(out.is_aligned[i]) == exp_f


def pytest_approx(x):
    import pytest

    return pytest.approx(x, rel=1e-12)


def test_case_and_whitespace_fold_to_same_score():
    df = pd.DataFrame({"caption": ["Dog  park", "dog park"],
                       "phash": np.array([123456789, 123456789],
                                         dtype=np.int64)})
    out = AlignmentStage()(pa.Table.from_pandas(df)).to_pandas()
    assert out.alignment[0] == out.alignment[1]


def test_actor_pool_over_fixture(ray_session, f1_dir):
    import ray.data as rd

    ds = rd.read_parquet(f1_dir, columns=["image_id", "caption", "phash"])
    out = align_captions(ds, concurrency=2, batch_size=256).to_pandas()
    assert len(out) == ds.count()
    assert out["alignment"].notna().all()  # fixture captions all tokenize
    assert out["alignment"].between(-1, 1).all()
    # memoized actor state must not depend on batch order: single-batch ref
    ref = AlignmentStage()(
        pa.Table.from_pandas(
            out[["image_id"]].merge(
                pd.read_parquet(f1_dir, columns=None)[
                    ["image_id", "caption", "phash"]], on="image_id"))
    ).to_pandas().set_index("image_id")["alignment"]
    got = out.set_index("image_id")["alignment"]
    assert np.allclose(got.sort_index(), ref.sort_index())
