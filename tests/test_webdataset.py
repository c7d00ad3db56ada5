"""WebDataset tar-shard source/sink round-trip and resume semantics."""

import os

import pyarrow.parquet as pq
import pytest

from data_quality_ray.sources.webdataset import (
    read_webdataset, shard_stats, write_webdataset,
)

EXTS = {"bytes": "img", "caption": "txt"}


@pytest.fixture(scope="module")
def wds_dir(ray_session, f1_dir, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("wds"))
    ds = rd.read_parquet(f1_dir, columns=["image_id", "bytes", "caption"]).sort("image_id")
    manifest = write_webdataset(ds, out, key_col="image_id", exts=EXTS,
                                shard_rows=128)
    return out, manifest


def test_roundtrip_bytes_and_text(ray_session, f1_dir, wds_dir):
    out, manifest = wds_dir
    back = (read_webdataset(out, exts={"img": "binary", "txt": "text"})
            .to_pandas().sort_values("__key__").reset_index(drop=True))
    src = pq.read_table(f1_dir, columns=["image_id", "bytes", "caption"]) \
            .to_pandas().sort_values("image_id").reset_index(drop=True)
    assert len(back) == len(src)
    assert (back["__key__"].to_numpy() == src["image_id"].to_numpy()).all()
    assert all(a == b for a, b in zip(back["img"], src["bytes"]))
    assert (back["txt"].to_numpy() == src["caption"].to_numpy()).all()


def test_manifest_covers_all_rows(f1_dir, wds_dir):
    out, manifest = wds_dir
    n_src = pq.read_table(f1_dir, columns=["image_id"]).num_rows
    assert manifest["n_samples"].sum() == n_src
    # shards are key-ranged and non-overlapping over the sorted input
    m = manifest.sort_values("key_min").reset_index(drop=True)
    for i in range(1, len(m)):
        assert m.loc[i - 1, "key_max"] < m.loc[i, "key_min"]
    stats = shard_stats(manifest)
    assert stats["n_shards"] == len(manifest)
    assert stats["total_bytes"] > 0
    # manifest sidecar landed
    assert os.path.exists(os.path.join(out, "_manifest.parquet"))


def test_resume_skips_committed_shards(ray_session, f1_dir, wds_dir):
    import ray.data as rd

    out, manifest = wds_dir
    shard0 = os.path.join(out, manifest.loc[0, "shard"])
    mtime_before = os.path.getmtime(shard0)
    ds = rd.read_parquet(f1_dir, columns=["image_id", "bytes", "caption"]).sort("image_id")
    m2 = write_webdataset(ds, out, key_col="image_id", exts=EXTS,
                          shard_rows=128, write_manifest=False)
    assert os.path.getmtime(shard0) == mtime_before  # not rewritten
    assert m2["n_samples"].sum() == manifest["n_samples"].sum()


def test_none_member_skipped(ray_session, tmp_path):
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame({"k": ["a0", "a1"], "payload": [b"xx", b"yy"],
                       "note": ["hello", None]})
    out = str(tmp_path / "wds_none")
    write_webdataset(rd.from_pandas(df), out, key_col="k",
                     exts={"payload": "bin", "note": "txt"}, shard_rows=8)
    back = (read_webdataset(out, exts={"bin": "binary", "txt": "text"})
            .to_pandas().sort_values("__key__").reset_index(drop=True))
    assert back.loc[0, "txt"] == "hello"
    assert back.loc[1, "txt"] is None
    assert back.loc[1, "bin"] == b"yy"
