"""The end-to-end north-star pipeline with lineage + exact resume.

    read (per-fragment tagged, wave of files)
      → map_batches(QualityFilterStage, actor pool)     # caption rules
      → write_parquet(out/filtered, partition_cols=[fragment])
      → per-fragment lineage records → manifest (atomic commit per wave)
    then (phase 2, over committed survivors)
      → groupby(phash) keep-first dedup → out/final

Resume: fragments present in the manifest are skipped entirely; phase 2
reruns from the committed phase-1 output (idempotent overwrite). Wave
size bounds work lost to a crash (wave_files=1 → exact per-fragment).

Scale shape: the image ``bytes`` column rides through the filter stage
zero-copy and is written back untouched (pixel integrity); the only
shuffle is the phash groupby. Fragment tagging reads each input file as
its own (lazy) Dataset and unions them — the union's read tasks still
execute in parallel under the streaming executor.
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

from ..dedup.exact import dedup_by_key
from ..state.manifest import Manifest
from .quality_filter import QualityFilterStage, build_image_chain


def _fragment_files(input_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(input_dir, "part-*.parquet")))


def run_quality_pipeline(input_dir: str, out_dir: str, concurrency: int | tuple = 4,
                         batch_size: int = 2048, wave_files: int = 32,
                         dedup: bool = True) -> dict:
    """Run (or resume) the full pipeline. Returns run-level metrics."""
    import ray.data as rd

    manifest = Manifest(out_dir)
    files = _fragment_files(input_dir)
    done = manifest.completed_fragments()
    pending = [(i, f) for i, f in enumerate(files) if i not in done]
    filtered_dir = os.path.join(out_dir, "filtered")

    for w in range(0, len(pending), wave_files):
        wave = pending[w : w + wave_files]
        ranges = _id_ranges([p for _, p in wave], id_col="image_id")
        if ranges is not None:
            # fast path: ONE fused read over the wave's files; fragment
            # recovered from footer min/max id ranges (vectorized
            # searchsorted) — no union, full streaming fusion
            wave_ds = rd.read_parquet([p for _, p in wave]).map_batches(
                _RangeTagger([r[0] for r in ranges], [wave[i][0] for _, i in ranges]),
                batch_format="pyarrow",
            )
        else:
            # fallback (id ranges overlap across files): per-file tag + union
            parts = [
                rd.read_parquet(path).map_batches(_FragmentTagger(frag_id), batch_format="pyarrow")
                for frag_id, path in wave
            ]
            wave_ds = parts[0]
            if len(parts) > 1:
                wave_ds = wave_ds.union(*parts[1:])
        out = wave_ds.map_batches(
            QualityFilterStage,
            fn_constructor_kwargs={"chain_builder": build_image_chain, "column": "caption"},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        out.write_parquet(filtered_dir, partition_cols=["fragment"])
        # lineage from the COMMITTED output (consistent even under task
        # retries): one tiny pass over the wave's verdict columns, with
        # hive-partition pruning on the fragment partition column
        wave_ids = [frag for frag, _ in wave]
        # one root read; the hive partition column comes back as a string
        # column, pruned to the 3 tiny columns (bytes never leave disk)
        tallies = (
            rd.read_parquet(filtered_dir, columns=["fragment", "verdict", "first_rule"])
            .map_batches(_tally_batch, batch_format="pyarrow")
            .to_pandas()
        )
        tallies = tallies[tallies["fragment"].isin(wave_ids)]
        agg_all = tallies.groupby(["fragment", "key"])["n"].sum()
        src = dict(wave)
        for frag_id in wave_ids:
            agg = agg_all.loc[frag_id].to_dict() if frag_id in agg_all.index.get_level_values(0) else {}
            record = {
                "fragment": int(frag_id),
                "source_file": os.path.basename(src[frag_id]),
                "n_rows": int(sum(v for k, v in agg.items() if k.startswith("verdict:"))),
                "kept": int(agg.get("verdict:KEEP", 0)),
                "dropped": int(agg.get("verdict:DROP", 0)),
                "corrected": int(agg.get("verdict:CORRECTED", 0)),
                "rule_hits": {k.split(":", 1)[1]: int(v) for k, v in agg.items()
                              if k.startswith("rule:") and k != "rule:"},
                "output_path": f"filtered/fragment={frag_id:d}",
            }
            manifest.commit(record)

    totals = manifest.totals()
    if dedup:
        final_dir = os.path.join(out_dir, "final")
        shutil.rmtree(final_dir, ignore_errors=True)
        def _surviving(t: pa.Table) -> pa.Table:
            return t.filter(pc.not_equal(t["verdict"], pa.scalar("DROP")))

        survivors = rd.read_parquet(filtered_dir).map_batches(_surviving, batch_format="pyarrow")
        # winners pass over the two key columns only — bytes scanned once
        keys_only = rd.read_parquet(
            filtered_dir, columns=["phash", "image_id", "verdict"]
        ).map_batches(_surviving, batch_format="pyarrow").select_columns(["phash", "image_id"])
        deduped = dedup_by_key(survivors, key="phash", order_col="image_id",
                               winners_from=keys_only)
        deduped.write_parquet(final_dir)
        totals["final_rows"] = rd.read_parquet(final_dir).count()
    return totals


def _id_ranges(paths: list[str], id_col: str):
    """(min_id, file_pos) per file from parquet FOOTER statistics only (no
    data read). Returns None when ranges overlap (caller falls back to
    per-file tagging). Assumption documented: web-scale shards are
    id-sorted; the synthetic F1 generator writes sequential id slices."""
    import pyarrow.parquet as pq

    spans = []
    for i, p in enumerate(paths):
        md = pq.ParquetFile(p).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0)
            if st.path_in_schema != id_col or st.statistics is None:
                return None
            mins.append(st.statistics.min)
            maxs.append(st.statistics.max)
        spans.append((min(mins), max(maxs), i))
    spans.sort()
    for (a_min, a_max, _), (b_min, _, _) in zip(spans, spans[1:]):
        if b_min <= a_max:
            return None
    return [(s[0], s[2]) for s in spans]


class _RangeTagger:
    """Adds the fragment column by binary search of the id column against
    the sorted per-file min-id boundaries."""

    def __init__(self, boundaries: list, frag_ids: list[int]):
        import numpy as np

        self.boundaries = np.asarray(boundaries, dtype=object)
        self.frag_ids = np.asarray(frag_ids, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.boundaries, ids, side="right") - 1
        return batch.append_column(
            "fragment", pa.array(self.frag_ids[pos], type=pa.int32())
        )


class _FragmentTagger:
    def __init__(self, frag_id: int):
        self.frag_id = frag_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "fragment", pa.array([self.frag_id] * len(batch), type=pa.int32())
        )


def _tally_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial tallies as (fragment, key, n) rows: verdict:* and
    rule:* counters per fragment."""
    frags, keys, ns = [], [], []
    frag_col = pc.cast(batch["fragment"], pa.int64())
    for frag in pc.unique(frag_col):
        sub = batch.filter(pc.equal(frag_col, frag))
        for col, prefix in (("verdict", "verdict:"), ("first_rule", "rule:")):
            for item in pc.value_counts(sub[col]):
                frags.append(frag.as_py())
                keys.append(prefix + item["values"].as_py())
                ns.append(item["counts"].as_py())
    return pa.table({"fragment": pa.array(frags, type=pa.int64()),
                     "key": pa.array(keys, type=pa.string()),
                     "n": pa.array(ns, type=pa.int64())})
