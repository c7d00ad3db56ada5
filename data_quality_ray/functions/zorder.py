"""Z-order (Morton-curve) multi-column physical layout.

The data-layout optimization behind "OPTIMIZE ZORDER BY": interleaving
the bit patterns of two bucketized columns gives a sort key under which
ranges of EITHER column map to a bounded number of curve segments — so a
z-sorted store has tight per-file min/max footer statistics on BOTH
columns, and range predicates on either one prune files at the I/O
level. A single-column sort gives that property for one column only.

Pieces:
- ``zorder_values``: vectorized bucketize (integer math — exact in SQL)
  + bit interleave; BITS=8 per dimension → 16-bit z keys.
- ``build_zorder_store``: one min/max fold (per-batch partials, driver
  merge of O(blocks) rows), broadcast bounds, one range-partitioned sort
  by z, parquet write — sorted blocks ⇒ each file covers one z segment.
- ``zorder_scan_stats``: pruning measured from parquet FOOTERS alone
  (row-group column statistics), no row read — the ivf_scan_stats
  pattern applied to min/max pruning.

Scale shape: the only exchange is the sort (the layout IS a sort); the
min/max fold is fixed-size partials. Reference precedent: none — this is
beyond-reference physical-layout surface for the 100 TB story.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

BITS = 8  # buckets per dimension = 256; z key fits 16 bits


def zorder_values(u: np.ndarray, v: np.ndarray, umin: int, umax: int,
                  vmin: int, vmax: int) -> np.ndarray:
    """Bucketize each value to BITS bits by exact integer math
    ``(x - lo) * 2^BITS // (hi - lo + 1)`` then interleave: u's bit i
    lands at position 2i+1, v's at 2i."""
    bu = ((u.astype(np.int64) - umin) * (1 << BITS)) // (umax - umin + 1)
    bv = ((v.astype(np.int64) - vmin) * (1 << BITS)) // (vmax - vmin + 1)
    z = np.zeros(len(u), dtype=np.int64)
    for i in range(BITS):
        z |= (((bu >> i) & 1) << (2 * i + 1)) | (((bv >> i) & 1) << (2 * i))
    return z


def column_bounds(ds, cols: list[str]) -> dict[str, tuple[int, int]]:
    """Global (min, max) per column: per-batch partials → driver merge of
    O(blocks) rows."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({c: [b[c].min(), b[c].max()] for c in cols})

    parts = pd.concat(
        list(ds.select_columns(cols).map_batches(partial,
                                                 batch_format="pandas")
             .iter_batches(batch_size=1024, batch_format="pandas")),
        ignore_index=True)
    return {c: (int(parts[c].min()), int(parts[c].max())) for c in cols}


def build_zorder_store(ds, store_dir: str, col_u: str, col_v: str,
                       n_files: int = 32) -> dict:
    """Z-sort ``ds`` by (col_u, col_v) and persist; returns the bounds
    used (callers hand them to the SQL replay). ``n_files`` bounds the
    output file count via repartition AFTER the sort (sorted order is
    preserved within the range partitioning)."""
    import ray

    from .broadcast import cached_get

    bounds = column_bounds(ds, [col_u, col_v])
    ref = ray.put(bounds)

    def add_z(b: pd.DataFrame) -> pd.DataFrame:
        bo = cached_get(ref)
        b = b.copy()
        b["zval"] = zorder_values(b[col_u].to_numpy(), b[col_v].to_numpy(),
                                  *bo[col_u], *bo[col_v])
        return b

    (ds.map_batches(add_z, batch_format="pandas")
       .sort("zval")
       .repartition(n_files)
       .write_parquet(store_dir))
    return bounds


def zorder_scan_stats(store_dir: str, col: str, lo, hi) -> dict:
    """Files/rows a range predicate ``lo <= col <= hi`` must scan, from
    row-group footer statistics alone."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(store_dir, "*.parquet")))
    scan_files = scan_rows = total_rows = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().names.index(col)
        hit = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total_rows += md.row_group(rg).num_rows
            if st is None or (st.min <= hi and st.max >= lo):
                hit = True
                scan_rows += md.row_group(rg).num_rows
        scan_files += int(hit)
    return {"files_scanned": scan_files, "files_total": len(files),
            "rows_scanned": scan_rows, "rows_total": total_rows}
