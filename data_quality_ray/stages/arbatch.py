"""Aspect-ratio bucketing + deterministic training-batch assembly.

Multi-resolution image training (SDXL-style) groups images into a fixed
ladder of (width, height) buckets of roughly equal pixel area so every
training batch shares one resolution — the multimodal twin of text
sequence packing (``functions/packing.py``). The reference has no image
module; this is engine surface for the image axis of the rebuild (same
spirit as the quality-filter flagship in pipelines/north.py).

Two stages, one exchange:

1. **Bucket assignment** — stateless ``map_batches``: each image goes to
   the ladder entry minimizing ``|ln(w/h) − ln(bw/bh)|`` (vectorized
   argmin over the whole ladder at once; ties break to the LOWEST ladder
   index). Distances are rounded to 6 dp before the argmin — the repo's
   ratio float contract — so the choice is replayable bit-for-bit by a
   SQL oracle.
2. **Batch assembly** — per-bucket 1-based ranks in ``id_col`` order plus
   the partition count from ONE ``window_ops`` hash exchange; then
   ``batch_id = (rank−1) // batch_size`` and ``slot = (rank−1) %
   batch_size`` are stateless arithmetic. ``drop_last=True`` (the
   training default) drops each bucket's trailing partial batch using the
   partition count — no second pass.

Scale: one all-to-all on the bucket index. The ladder is tiny (≪
#workers), so bucket keys are inherently HOT — ``window_ops`` co-locates
each bucket in one task, which bounds per-task rows at corpus/|ladder|.
For 100 TB, salt the window by a coarse id prefix and re-offset ranks
with per-salt counts (the ``with_row_index`` block-offset trick) — at
that point batches are assembled per shard anyway; the single-exchange
form here is the per-shard unit of that layout. Batch ids are unique per
(bucket_idx, batch_id) pair, deterministic given the ladder, ids, and
batch size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: the SDXL 1024px ladder (area ≈ 1024², step-0.25 aspect ratios)
SDXL_BUCKETS: tuple[tuple[int, int], ...] = (
    (1024, 1024), (1152, 896), (896, 1152), (1344, 768), (768, 1344),
    (1536, 640), (640, 1536),
)

ROUND_DP = 6  # ratio float contract (shared with every SQL oracle)


def assign_ar_buckets(ds, buckets=SDXL_BUCKETS, w_col: str = "w",
                      h_col: str = "h"):
    """Attach ``bucket_idx`` / ``bucket_w`` / ``bucket_h`` to every row:
    the ladder entry with the minimal 6-dp-rounded ``|Δ ln aspect|``
    (ties → lowest index). Stateless, zero shuffle."""
    bw = np.array([b[0] for b in buckets], dtype=np.float64)
    bh = np.array([b[1] for b in buckets], dtype=np.float64)
    ladder_log = np.log(bw / bh)  # (L,)
    bwi = np.array([b[0] for b in buckets], dtype=np.int64)
    bhi = np.array([b[1] for b in buckets], dtype=np.int64)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        w = b[w_col].to_numpy(dtype=np.float64)
        h = b[h_col].to_numpy(dtype=np.float64)
        bad = ~((w > 0) & (h > 0))
        if bad.any():
            # fail loudly: an argmin over NaN distances would silently
            # drop corrupt rows into bucket 0 — route geometry-invalid
            # rows through a quality filter BEFORE batching
            raise ValueError(
                f"assign_ar_buckets: {int(bad.sum())} rows have "
                f"non-positive {w_col}/{h_col} (first at index "
                f"{int(np.flatnonzero(bad)[0])}) — filter them upstream")
        ar = np.log(w / h)
        dist = np.round(np.abs(ar[:, None] - ladder_log[None, :]), ROUND_DP)
        idx = np.argmin(dist, axis=1)  # first minimum → lowest ladder index
        b["bucket_idx"] = idx.astype("int64")
        b["bucket_w"] = bwi[idx]
        b["bucket_h"] = bhi[idx]
        return b

    return ds.map_batches(assign, batch_format="pandas")


def ar_bucket_batches(ds, buckets=SDXL_BUCKETS, batch_size: int = 8,
                      id_col: str = "image_id", w_col: str = "w",
                      h_col: str = "h", drop_last: bool = True,
                      n_buckets: int = 64):
    """Assemble fixed-size same-resolution training batches.

    → Dataset of ``(id_col, bucket_idx, bucket_w, bucket_h, batch_id,
    slot)`` — ``batch_id`` 0-based per bucket, ``slot`` ∈ [0,
    batch_size); with ``drop_last`` each bucket's trailing partial batch
    is dropped (every surviving batch is exactly full).
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    from ..functions.window import window_ops

    assigned = assign_ar_buckets(ds, buckets, w_col=w_col, h_col=h_col)
    ranked = window_ops(assigned, by="bucket_idx", order_by=id_col,
                        ops={"__rank": ("row_number",),
                             "__n": ("count",)},
                        n_buckets=n_buckets)

    def to_batches(b: pd.DataFrame) -> pd.DataFrame:
        r0 = b["__rank"].to_numpy() - 1
        b = b.assign(batch_id=(r0 // batch_size).astype("int64"),
                     slot=(r0 % batch_size).astype("int64"))
        if drop_last:
            full = (b["__n"].to_numpy() // batch_size) * batch_size
            b = b[r0 < full]
        return b[[id_col, "bucket_idx", "bucket_w", "bucket_h",
                  "batch_id", "slot"]]

    return ranked.map_batches(to_batches, batch_format="pandas")
