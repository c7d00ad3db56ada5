"""Global row indexing for order-sensitive distributed operators.

Several reference semantics are first-seen-order-sensitive (MostCommon
survivorship ties in StringsClusterAnalyzer.java:45-120, master-list
order in AbstractRecordGrouping.doGroup:201-254). Ray Data preserves
block order but gives a ``map_batches`` fn no global offset, so an
order-faithful distributed rebuild needs an explicit index column.

``with_row_index`` attaches one WITHOUT collecting data to the driver:
per-block row counts come from block *metadata* (bytes never leave the
object store), offsets are a tiny driver-side cumsum, and each block is
indexed by one Ray task reading its own offset. Cost: one materialize
barrier + one zero-shuffle pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _index_block(blk, off: int, out_col: str):
    if isinstance(blk, pd.DataFrame):
        blk = pa.Table.from_pandas(blk, preserve_index=False)
    return blk.append_column(out_col, pa.array(np.arange(off, off + len(blk)), type=pa.int64()))


def with_row_index(ds, out_col: str = "__row_id"):
    """→ Dataset with a global 0-based int64 ``out_col`` following the
    dataset's block order. The input is materialized (the barrier that
    pins the order); blocks are re-emitted by per-block Ray tasks, so no
    row data ever crosses the driver."""
    import ray
    import ray.data as rd

    task = ray.remote(num_cpus=1)(_index_block)
    mds = ds.materialize()
    refs, off = [], 0
    for bundle in mds.iter_internal_ref_bundles():
        for blk_ref, meta in bundle.blocks:
            refs.append(task.remote(blk_ref, off, out_col))
            off += meta.num_rows
    if not refs:
        return mds
    return rd.from_arrow_refs(refs)
