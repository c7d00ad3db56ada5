"""Multimodal stages: resize, feature extraction, video frame sampling."""

import numpy as np
import pytest

from data_quality_ray.stages.image import decode, encode_png
from data_quality_ray.stages.image_ops import (
    encode_fake_video, resize_pixels,
)


def test_resize_pixels_box_filter():
    px = np.zeros((32, 32, 3), dtype=np.uint8)
    px[:16] = 200  # top half bright
    out = resize_pixels(px, 4, 4)
    assert out.shape == (4, 4, 3)
    assert (out[:2] == 200).all() and (out[2:] == 0).all()
    # constant image stays constant at any size
    const = np.full((33, 17, 3), 77, dtype=np.uint8)
    assert (resize_pixels(const, 5, 9) == 77).all()


def test_resize_stage(ray_session, f1_dir):
    import ray.data as rd

    from data_quality_ray.stages.image_ops import resize_images

    ds = rd.read_parquet(f1_dir, columns=["image_id", "bytes", "fmt"]).limit(40)
    out = resize_images(ds, 8, 8, concurrency=2).to_pandas()
    assert out["bytes_resized"].notna().all()
    px = decode(bytes(out["bytes_resized"].iloc[0]), out["fmt"].iloc[0])
    assert px.shape == (8, 8, 3)


def test_feature_stage(ray_session, f1_dir):
    import ray.data as rd

    from data_quality_ray.stages.image_ops import extract_image_features

    ds = rd.read_parquet(f1_dir, columns=["image_id", "bytes", "fmt", "phash"]).limit(40)
    out = extract_image_features(ds, concurrency=2).to_pandas()
    assert out["lum_mean"].between(0, 255).all()
    assert out["mean_rgb"].map(len).eq(3).all()
    hist_sums = out["lum_hist"].map(sum)
    assert ((hist_sums - 1).abs() < 1e-3).all()
    # png rows: recomputed phash equals the stored one exactly
    png = out[out["fmt"] == "png"]
    assert (png["phash_recomputed"] == png["phash"]).all()


def test_frame_sampling(ray_session):
    import ray.data as rd

    from data_quality_ray.stages.image_ops import sample_frames

    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8) for _ in range(10)]
    rows = [
        {"vid_id": "v1", "video": encode_fake_video(frames)},
        {"vid_id": "v2", "video": b"not-a-video"},  # real codecs absent → None (stub path)
    ]
    # consume as Arrow: list<binary> columns don't round-trip through
    # pandas (Ray tries a tensor-extension cast) — a known pitfall the
    # stage sidesteps by staying batch_format="pyarrow"
    import pyarrow as pa

    tbl = pa.concat_tables(
        sample_frames(rd.from_items(rows), n_frames=4)
        .iter_batches(batch_size=16, batch_format="pyarrow")
    )
    by_id = {tbl["vid_id"][i].as_py(): i for i in range(len(tbl))}
    i1, i2 = by_id["v1"], by_id["v2"]
    assert tbl["frame_indices"][i1].as_py() == [0, 3, 6, 9]
    sampled = tbl["frames"][i1].as_py()
    assert len(sampled) == 4
    assert np.array_equal(decode(bytes(sampled[0]), "png"), frames[0])
    assert tbl["frames"][i2].as_py() is None


def test_phash64_batch_bit_identical():
    from data_quality_ray.stages.image import phash64, phash64_batch

    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 256, size=(s, s, 3), dtype=np.uint8)
            for s in (32, 48, 32, 33, 17, 48)]  # mixed + non-multiple-of-8
    batch = phash64_batch(imgs)
    for px, v in zip(imgs, batch):
        assert phash64(px) == int(v)


def test_sharpness_entropy_kernel():
    from data_quality_ray.stages.image_ops import sharpness_entropy

    # flat image: zero Laplacian variance, zero entropy (one bin)
    flat = np.full((16, 16, 3), 100, dtype=np.uint8)
    s, e = sharpness_entropy(flat)
    assert s == 0.0 and e == 0.0

    # checkerboard 0/255: maximal local contrast, exactly 1 bit of entropy
    idx = np.indices((16, 16)).sum(axis=0) % 2
    board = np.repeat((idx * 255).astype(np.uint8)[..., None], 3, axis=2)
    s2, e2 = sharpness_entropy(board)
    assert s2 > 1e5  # |Laplacian| = 4*255 everywhere interior
    assert e2 == pytest.approx(1.0, abs=1e-6)

    # blurring the checkerboard (box resize down+up) must reduce sharpness
    soft = resize_pixels(resize_pixels(board, 4, 4), 16, 16)
    s3, _ = sharpness_entropy(soft)
    assert s3 < s2

    # degenerate 1-pixel image: defined, zero sharpness
    s4, e4 = sharpness_entropy(np.zeros((1, 1, 3), dtype=np.uint8))
    assert s4 == 0.0 and e4 == 0.0


def test_geometry_flags(ray_session):
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.stages.image_ops import geometry_flags

    df = pd.DataFrame({
        "image_id": ["a", "b", "c", "d"],
        "w": np.array([32, 48, 100, 30], dtype=np.int32),
        "h": np.array([32, 48, 20, 90], dtype=np.int32),
    })
    out = geometry_flags(rd.from_pandas(df)).to_pandas().set_index("image_id")
    assert out.loc["a", "too_small"] and not out.loc["b", "too_small"]
    assert not out.loc["a", "bad_aspect"] and not out.loc["b", "bad_aspect"]
    assert out.loc["c", "bad_aspect"]   # 5.0 aspect
    assert out.loc["d", "bad_aspect"]   # 0.33 aspect
    assert out.loc["c", "too_small"] and out.loc["d", "too_small"]
