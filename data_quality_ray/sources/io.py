"""Source / sink helpers.

The north-rule input is a Lance table; this sandbox has no ``lance``
package, so ``read_images`` prefers Lance when available and falls back
to the Parquet mirror with the identical schema (write side in
sources/fixtures.write_f1). Other formats map to the matching
``ray.data`` reader (the AvroUtils.streamAvroFile analog for Avro —
common/util/AvroUtils.java:194).
"""

from __future__ import annotations

import os


def read_images(path: str, columns: list[str] | None = None):
    """North-pipeline source: Lance dataset if present/installed, else the
    parquet directory mirror. Always column-prunable."""
    import ray.data as rd

    lance_path = os.path.join(path, "images.lance")
    if os.path.exists(lance_path):
        try:
            return rd.read_lance(lance_path, columns=columns)
        except (ImportError, AttributeError):
            pass
    return rd.read_parquet(path, columns=columns)


def read_any(path: str, fmt: str | None = None, **kwargs):
    """Generic source dispatch: parquet / csv / json / text / avro / lance
    / binary, inferred from the extension when ``fmt`` is None."""
    import ray.data as rd

    fmt = fmt or os.path.splitext(path)[1].lstrip(".").lower() or "parquet"
    readers = {
        "parquet": rd.read_parquet,
        "csv": rd.read_csv,
        "json": rd.read_json,
        "jsonl": rd.read_json,
        "txt": rd.read_text,
        "text": rd.read_text,
    }
    if fmt in readers:
        return readers[fmt](path, **kwargs)
    if fmt == "avro":
        try:
            return rd.read_avro(path, **kwargs)
        except AttributeError as e:  # pragma: no cover
            raise NotImplementedError("no avro reader in this Ray build") from e
    if fmt == "lance":
        try:
            return rd.read_lance(path, **kwargs)
        except (ImportError, AttributeError) as e:
            raise NotImplementedError("lance not installed in this environment") from e
    if fmt in ("bin", "binary", "img", "images"):
        return rd.read_binary_files(path, include_paths=True, **kwargs)
    raise ValueError(f"unknown format: {fmt}")


def write_partitioned(ds, out_dir: str, partition_cols: list[str] | None = None,
                      payload: bool = False, **kwargs):
    """Partitioned parquet sink; ``payload=True`` disables parquet
    re-compression/dictionary for already-compressed binary columns."""
    args = dict(kwargs)
    if payload:
        args.setdefault("compression", "none")
        args.setdefault("use_dictionary", False)
    if partition_cols:
        args["partition_cols"] = partition_cols
    ds.write_parquet(out_dir, **args)


def write_any(ds, path: str, fmt: str | None = None, **kwargs):
    """Generic sink dispatch mirroring ``read_any``: parquet / csv /
    json(l). Parquet accepts the ``payload`` keyword via
    ``write_partitioned``; row formats map to the matching ray.data
    writer (one file per block — the resumable-output layout)."""
    fmt = (fmt or os.path.splitext(path)[1].lstrip(".").lower()
           or "parquet")
    if fmt == "parquet":
        return write_partitioned(ds, path, **kwargs)
    if fmt == "csv":
        return ds.write_csv(path, **kwargs)
    if fmt in ("json", "jsonl"):
        return ds.write_json(path, **kwargs)
    raise ValueError(f"unknown sink format: {fmt}")
