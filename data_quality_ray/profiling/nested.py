"""Nested-structure analysis — the Avro analyzer analog for Arrow.

Rebuilds the reference's nested record analyzers
(dataquality-statistics type/AvroDataTypeDiscoveryAnalyzer.java:89-189,
quality/AvroDataTypeQualityAnalyzer.java:70-120, leaf addressing per
AvroUtils.itemId, common/util/AvroUtils.java:126-131):

- recursive traversal of struct / list / map columns down to leaves,
  each leaf addressed by a dotted path (``rec.a``, ``arr[].x``,
  ``mp{}.value``);
- per-leaf TYPE DISCOVERY: inferred-type counts for string leaves
  (via functions.typeinfer), physical type otherwise;
- per-leaf QUALITY: valid / empty / null tallies (validity = value
  parses as the leaf's dominant type — mirrors VALID=1/EMPTY=0/INVALID=-1
  of AvroQualityAnalyzer.java:36-40);
- a VALUE-LEVEL METADATA column mirroring the input shape with each leaf
  replaced by its type verdict (the "metadata record" surface,
  AvroAnalyzer.java:18-67) via ``add_type_metadata``.

All tallies are mergeable dicts → the same partial/final contract as the
flat analyzers; ``profile_nested`` runs one ``map_batches`` pass.
"""

from __future__ import annotations

import pickle
from collections import Counter

import numpy as np
import pyarrow as pa

from ..functions.typeinfer import dominant_type, infer_type_one
from ..functions.text import unique_apply


def _leaf_paths(typ: pa.DataType, prefix: str = "") -> list[tuple[str, pa.DataType]]:
    if pa.types.is_struct(typ):
        out = []
        for f in typ:
            out.extend(_leaf_paths(f.type, f"{prefix}{'.' if prefix else ''}{f.name}"))
        return out
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        return _leaf_paths(typ.value_type, prefix + "[]")
    if pa.types.is_map(typ):
        return _leaf_paths(typ.item_type, prefix + "{}.value")
    return [(prefix, typ)]


def _walk(arr: pa.Array, typ: pa.DataType, prefix: str, out: dict,
          null_counts: dict) -> None:
    """Flatten one level at a time, accumulating leaf values per path.
    A null at a parent (null struct / null list) counts as one null at
    every descendant leaf path; only children of VALID parents recurse
    (a null struct's child slots are not real values)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_struct(typ):
        if arr.null_count:
            for path, _ in _leaf_paths(typ, prefix):
                null_counts[path] = null_counts.get(path, 0) + arr.null_count
            arr = arr.drop_null()
        for i, f in enumerate(typ):
            _walk(arr.field(i), f.type, f"{prefix}{'.' if prefix else ''}{f.name}",
                  out, null_counts)
        return
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        if arr.null_count:
            for path, _ in _leaf_paths(typ.value_type, prefix + "[]"):
                null_counts[path] = null_counts.get(path, 0) + arr.null_count
        _walk(arr.flatten(), typ.value_type, prefix + "[]", out, null_counts)
        return
    if pa.types.is_map(typ):
        if arr.null_count:
            for path, _ in _leaf_paths(typ.item_type, prefix + "{}.value"):
                null_counts[path] = null_counts.get(path, 0) + arr.null_count
        _walk(arr.items, typ.item_type, prefix + "{}.value", out, null_counts)
        return
    out.setdefault(prefix, []).append(arr)
    null_counts.setdefault(prefix, null_counts.get(prefix, 0))


class NestedTypeAcc:
    """Per-leaf-path inferred-type and validity tallies (mergeable)."""

    def __init__(self):
        self.type_counts: dict[str, Counter] = {}
        self.quality: dict[str, Counter] = {}

    def update_column(self, arr, typ: pa.DataType, root: str) -> None:
        leaves: dict[str, list[pa.Array]] = {}
        parent_nulls: dict[str, int] = {}
        _walk(arr, typ, root, leaves, parent_nulls)
        for path, n in parent_nulls.items():
            self.quality.setdefault(path, Counter())["null"] += n
            self.type_counts.setdefault(path, Counter())
        for path, chunks in leaves.items():
            tc = self.type_counts.setdefault(path, Counter())
            qc = self.quality.setdefault(path, Counter())
            for chunk in chunks:
                n = len(chunk)
                nulls = chunk.null_count
                qc["null"] += nulls
                if pa.types.is_string(chunk.type) or pa.types.is_large_string(chunk.type):
                    vals = chunk.drop_null().to_numpy(zero_copy_only=False)
                    types = unique_apply(vals.astype(object), infer_type_one)
                    tc.update(types)
                    qc["empty"] += int(np.sum(types == "EMPTY"))
                    qc["valid"] += int(np.sum(types != "EMPTY"))
                else:
                    tc[str(chunk.type).upper()] += n - nulls
                    qc["valid"] += n - nulls

    def merge(self, other: "NestedTypeAcc") -> "NestedTypeAcc":
        for path, c in other.type_counts.items():
            self.type_counts.setdefault(path, Counter()).update(c)
        for path, c in other.quality.items():
            self.quality.setdefault(path, Counter()).update(c)
        return self

    def result(self) -> dict[str, dict]:
        out = {}
        for path in sorted(self.type_counts):
            tc = self.type_counts[path]
            out[path] = {
                "type_counts": dict(tc),
                "dominant_type": dominant_type(tc) if tc else "EMPTY",
                "quality": dict(self.quality.get(path, {})),
            }
        return out


def profile_nested(ds, columns: list[str], batch_size: int = 8192) -> dict[str, dict]:
    """One-pass nested discovery+quality over the given (nested) columns."""

    def partial(batch: pa.Table) -> pa.Table:
        acc = NestedTypeAcc()
        for col in columns:
            acc.update_column(batch[col], batch.schema.field(col).type, col)
        return pa.table({"partial": pa.array([pickle.dumps(acc)], type=pa.binary())})

    merged: NestedTypeAcc | None = None
    parts = ds.select_columns(columns).map_batches(partial, batch_format="pyarrow",
                                                   batch_size=batch_size)
    for b in parts.iter_batches(batch_size=64, batch_format="pyarrow"):
        for blob in b["partial"]:
            acc = pickle.loads(blob.as_py())
            merged = acc if merged is None else merged.merge(acc)
    return merged.result() if merged else {}


def _type_meta_array(arr: pa.Array, typ: pa.DataType) -> pa.Array:
    """Mirror the input shape with each leaf replaced by its inferred-type
    verdict string (the metadata-record surface)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_struct(typ):
        fields = [(_type_meta_array(arr.field(i), f.type)) for i, f in enumerate(typ)]
        return pa.StructArray.from_arrays(fields, names=[f.name for f in typ],
                                          mask=arr.is_null())
    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        inner = _type_meta_array(arr.flatten(), typ.value_type)
        return pa.ListArray.from_arrays(arr.offsets, inner)
    if pa.types.is_map(typ):
        inner = _type_meta_array(arr.items, typ.item_type)
        return pa.MapArray.from_arrays(arr.offsets, arr.keys, inner)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        vals = arr.to_numpy(zero_copy_only=False)
        verdicts = np.array(
            [None if v is None else infer_type_one(v) for v in vals], dtype=object
        )
        return pa.array(verdicts, type=pa.string())
    return pa.array([None if v is None else str(typ).upper() for v in arr.to_pylist()],
                    type=pa.string())


def add_type_metadata(ds, columns: list[str]):
    """Append ``<col>__types`` metadata columns (one per nested column)."""

    def f(batch: pa.Table) -> pa.Table:
        for col in columns:
            meta = _type_meta_array(batch[col], batch.schema.field(col).type)
            batch = batch.append_column(col + "__types", meta)
        return batch

    return ds.map_batches(f, batch_format="pyarrow")
