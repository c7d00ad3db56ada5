"""End-to-end flagship pipeline tests: Ray pipeline vs row-by-row oracle.

The north-rule acceptance gates:
- keep/drop F1 ≥ 0.99 vs oracle labels (expected: exact agreement),
- scrubbed-caption equality on surviving rows,
- image payload integrity: PNG exact, lossy PSNR ≥ 40 dB,
- deterministic reruns.
"""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

from data_quality_ray.stages.image import decode, psnr


def _f1_score(pred: np.ndarray, truth: np.ndarray) -> float:
    tp = np.sum(pred & truth)
    fp = np.sum(pred & ~truth)
    fn = np.sum(~pred & truth)
    return 2 * tp / (2 * tp + fp + fn)


@pytest.fixture(scope="module")
def pipeline_result(ray_session, f1_dir):
    import ray.data as rd

    from data_quality_ray.pipelines.quality_filter import filtered

    ds = rd.read_parquet(f1_dir)
    out = filtered(ds, concurrency=2, batch_size=256).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def labels(f1_dir):
    return (
        pq.read_table(f1_dir + "/_labels.parquet")
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )


def test_keep_drop_f1(pipeline_result, labels):
    pred = (pipeline_result["verdict"] != "DROP").to_numpy()
    truth = labels["keep"].to_numpy()
    assert _f1_score(pred, truth) >= 0.99
    assert (pred == truth).all()  # expected: exact


def test_first_rule_attribution(pipeline_result, labels):
    assert (pipeline_result["first_rule"] == labels["first_rule"]).all()


def test_scrubbed_caption_equality(pipeline_result, labels):
    keep = labels["keep"].to_numpy()
    assert (
        pipeline_result["caption"].to_numpy()[keep] == labels["scrubbed_caption"].to_numpy()[keep]
    ).all()


def test_image_payload_integrity(f1_dir, pipeline_result):
    """Pipeline must pass image bytes through untouched; decoded pixels of
    the output must match the input exactly (png) / PSNR≥40dB (lossy)."""
    src = pq.read_table(sorted(glob.glob(f1_dir + "/part-*.parquet"))).to_pandas()
    src = src.sort_values("image_id").reset_index(drop=True)
    assert (src["image_id"] == pipeline_result["image_id"]).all()
    out_bytes = pipeline_result["bytes"]
    for i in range(0, len(src), 37):
        assert bytes(out_bytes[i]) == bytes(src["bytes"][i])
        px = decode(bytes(out_bytes[i]), src["fmt"][i])
        assert px.shape == (src["h"][i], src["w"][i], 3)


def test_lossy_codec_psnr():
    """The stand-in lossy codec meets the PSNR ≥ 40 dB acceptance bar."""
    from data_quality_ray.stages.image import encode_jpeg, decode_jpeg

    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, size=(64, 64, 3)).astype(np.uint8)
    assert psnr(px, decode_jpeg(encode_jpeg(px))) >= 40.0


def test_determinism(ray_session, f1_dir):
    import ray.data as rd

    from data_quality_ray.pipelines.quality_filter import filtered

    a = filtered(rd.read_parquet(f1_dir), concurrency=2).to_pandas().sort_values("image_id")
    b = filtered(rd.read_parquet(f1_dir), concurrency=2).to_pandas().sort_values("image_id")
    assert (a["verdict"].to_numpy() == b["verdict"].to_numpy()).all()
    assert (a["caption"].to_numpy() == b["caption"].to_numpy()).all()


def test_phash_dedup(ray_session, f1_dir):
    """groupby(phash) keep-first dedup: survivors unique on phash, count =
    distinct phash count, deterministic representative (min image_id)."""
    import ray.data as rd

    from data_quality_ray.dedup.exact import dedup_by_key

    ds = rd.read_parquet(f1_dir, columns=["image_id", "phash"])
    result = dedup_by_key(ds, key="phash", order_col="image_id").to_pandas()
    src = pq.read_table(sorted(glob.glob(f1_dir + "/part-*.parquet")), columns=["image_id", "phash"]).to_pandas()
    expected = src.groupby("phash")["image_id"].min()
    assert len(result) == src["phash"].nunique()
    got = result.set_index("phash")["image_id"]
    assert got.sort_index().equals(expected.sort_index())
