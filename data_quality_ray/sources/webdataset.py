"""WebDataset-style tar-shard source and sink.

Large image+caption training corpora ship as directories of POSIX tar
shards where each sample is a run of adjacent members sharing a basename
(``{key}.img``, ``{key}.txt``, ``{key}.json`` …) — the WebDataset
convention (Aizman et al., "High Performance I/O For Large Scale Deep
Learning", IEEE BigData 2019). The reference engine reads row formats
only (common/util/AvroUtils.java:194 streams Avro containers); this
module is the engine-surface analog for the sharded-tar layout the
north-rule image corpus would actually arrive in.

Scale shape: the SHARD is the unit of parallelism in both directions.

- Sink: one ``map_batches`` pass; each batch becomes one tar shard
  written worker-side (atomic tmp+rename, skip-if-committed so a
  re-run resumes), and only a one-row manifest leaves the worker.
- Source: ``read_binary_files`` over ``*.tar`` (one block per shard)
  → a vectorized untar ``map_batches``; a worker holds one shard's
  bytes at a time and pixels/payloads never touch the driver.

Tar members are written with zeroed mtime/uid/gid so shard bytes are
bit-reproducible for a given input order.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np
import pyarrow as pa

# Keys must render as strings (tar stores member names). Samples are
# emitted in input order within a shard; the sink names each shard by its
# first key, so over key-sorted fixed-width keys lexicographic shard
# order == input order.


def _sample_members(key: str, row: dict[str, bytes | str | None],
                    exts: dict[str, str]) -> list[tuple[str, bytes]]:
    out = []
    for col, ext in exts.items():
        v = row[col]
        if v is None:
            continue
        data = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
        out.append((f"{key}.{ext}", bytes(data)))
    return out


def write_webdataset(ds, out_dir: str, key_col: str,
                     exts: dict[str, str], shard_rows: int = 2048,
                     write_manifest: bool = True):
    """Write ``ds`` as a directory of WebDataset tar shards.

    ``exts`` maps input column → member extension (e.g. ``{"bytes":
    "img", "caption": "txt"}``). None-valued cells skip that member
    (WebDataset's missing-field convention). Returns the manifest as a
    pandas DataFrame: one row per shard (shard, n_samples, n_bytes,
    key_min, key_max) — small (one row / shard_rows inputs), so
    collecting it is not a scale hazard; the sample payloads themselves
    never leave the workers.

    Resumable: each shard commits via tmp+rename and records a marker
    entry; a re-run over the same input re-maps the batches but skips
    the tar write for committed shards (same pattern as
    state/manifest.py).
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, *exts.keys()]

    def write_shard(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        first = str(keys[0])
        shard_name = f"shard-{first}.tar"
        path = os.path.join(out_dir, shard_name)
        done = path + ".done"
        n_bytes = 0
        if not os.path.exists(done):
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tf:
                for i, key in enumerate(keys):
                    row = {c: batch[c][i].as_py() for c in exts}
                    for name, data in _sample_members(str(key), row, exts):
                        info = tarfile.TarInfo(name=name)
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        tf.addfile(info, io.BytesIO(data))
            payload = buf.getvalue()
            n_bytes = len(payload)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)
            open(done, "w").close()
        else:
            n_bytes = os.path.getsize(path)
        skeys = sorted(str(k) for k in keys)
        return pa.table({
            "shard": pa.array([shard_name]),
            "n_samples": pa.array([len(keys)], type=pa.int64()),
            "n_bytes": pa.array([n_bytes], type=pa.int64()),
            "key_min": pa.array([skeys[0]]),
            "key_max": pa.array([skeys[-1]]),
        })

    manifest = (ds.select_columns(cols)
                  .map_batches(write_shard, batch_format="pyarrow",
                               batch_size=shard_rows)
                  .to_pandas())
    manifest = manifest.sort_values("shard").reset_index(drop=True)
    if write_manifest:
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(manifest),
                       os.path.join(out_dir, "_manifest.parquet"))
    return manifest


def read_webdataset(path: str, exts: dict[str, str], key_name: str = "__key__"):
    """Read a WebDataset shard directory back as a Dataset.

    ``exts`` maps member extension → output kind: ``"binary"`` (raw
    bytes) or ``"text"`` (utf-8 decoded). Missing members surface as
    nulls. One input block per shard; the untar is a single pass over
    the shard bytes with no per-member syscalls (in-memory tarfile).
    """
    import ray.data as rd

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".tar")
    )
    if not files:
        raise FileNotFoundError(f"no .tar shards under {path}")
    raw = rd.read_binary_files(files)

    def untar(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        samples: list[dict[str, bytes]] = []
        for blob in batch["bytes"]:
            with tarfile.open(fileobj=io.BytesIO(blob.as_py()), mode="r") as tf:
                cur_key, cur = None, None
                for m in tf:
                    if not m.isfile():
                        continue
                    base, _, ext = m.name.rpartition(".")
                    if ext not in exts:
                        continue
                    if base != cur_key:
                        if cur is not None:
                            keys.append(cur_key)
                            samples.append(cur)
                        cur_key, cur = base, {}
                    cur[ext] = tf.extractfile(m).read()
                if cur is not None:
                    keys.append(cur_key)
                    samples.append(cur)
        arrays: dict[str, pa.Array] = {key_name: pa.array(keys, type=pa.string())}
        for ext, kind in exts.items():
            vals = [s.get(ext) for s in samples]
            if kind == "text":
                arrays[ext] = pa.array(
                    [v.decode("utf-8") if v is not None else None for v in vals],
                    type=pa.string())
            else:
                arrays[ext] = pa.array(vals, type=pa.binary())
        return pa.Table.from_pydict(arrays)

    return raw.map_batches(untar, batch_format="pyarrow", batch_size=1)


def shard_stats(manifest) -> dict:
    """Balance diagnostics over a sink manifest (skew visibility for the
    shard layout): sample/byte totals plus the max/mean byte ratio."""
    nb = np.asarray(manifest["n_bytes"], dtype=np.float64)
    return {
        "n_shards": int(len(manifest)),
        "n_samples": int(manifest["n_samples"].sum()),
        "total_bytes": int(nb.sum()),
        "max_over_mean_bytes": float(nb.max() / nb.mean()) if len(nb) else 0.0,
    }
