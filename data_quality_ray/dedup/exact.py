"""Exact deduplication: hash-partition on a key, keep one row per group.

Reference precedent: blocking-key grouping with a deterministic
representative (dataquality-record-linkage genkey/BlockingKeyHandler.java:27-135
+ grouping/AbstractRecordGrouping.java:201-254 master-record selection).

Scale notes: ``groupby(key)`` is the only shuffle. The per-group reduce is
"min(order_col) wins" — order-insensitive, so it admits partial
pre-aggregation inside each batch before the shuffle (we first reduce each
batch to one candidate row per key, shrinking the exchange by the in-batch
duplication factor — the StringsClusterAnalyzer.blockSizeThreshold:57,85
early-reduction idea).
"""

from __future__ import annotations

import pandas as pd


def _keep_first(g: pd.DataFrame, order_col: str) -> pd.DataFrame:
    return g.sort_values(order_col, kind="mergesort").head(1)


def dedup_by_key(ds, key: str, order_col: str):
    """One surviving row per distinct ``key`` — the row with the minimal
    ``order_col`` (deterministic representative). Streaming: batch-level
    pre-dedup → groupby(key) shuffle → per-group first."""

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        # in-batch partial: keeps shuffle volume at one row per (batch, key)
        return batch.sort_values(order_col, kind="mergesort").groupby(key, as_index=False).head(1)

    return (
        ds.map_batches(pre, batch_format="pandas")
        .groupby(key)
        .map_groups(lambda g: _keep_first(g, order_col), batch_format="pandas")
    )


def dedup_by_content(ds, text_col: str, order_col: str, key_col: str = "__content_hash"):
    """Exact content dedup: add a content-hash column (cheap, vectorized)
    then hash-partition on it — avoids shuffling long text as the key."""
    import pandas.util as pdu

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[key_col] = pdu.hash_array(batch[text_col].to_numpy(dtype=object)).astype("int64")
        return batch

    out = dedup_by_key(ds.map_batches(add_hash, batch_format="pandas"), key=key_col, order_col=order_col)
    return out.drop_columns([key_col])
