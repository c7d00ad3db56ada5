"""SimHash near-duplicate fingerprints.

64-bit SimHash over word features: each feature's stable 64-bit hash votes
±1 per bit; the sign of the vote sum is the fingerprint bit. Near-dups
differ in ≤ ``hamming_threshold`` bits. Candidate generation uses the
standard block-permutation trick: split the 64 bits into ``n_blocks``
blocks; dups within threshold t share at least one block exactly when
n_blocks > t, so ``groupby(block_id, block_value)`` finds all candidates
without a cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..profiling.sketches import stable_hash64


def simhash64(text: str) -> int:
    toks = (text or "").lower().split()
    if not toks:
        return 0
    h = stable_hash64(np.array(toks, dtype=object))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def add_simhash(ds, text_col: str, out_col: str = "simhash"):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = [np.int64(np.uint64(simhash64(t)).astype(np.int64)) for t in batch[text_col]]
        return batch

    return ds.map_batches(f, batch_format="pandas")


def simhash_candidates(ds, id_col: str, text_col: str, hamming_threshold: int = 3,
                       n_blocks: int = 4) -> pd.DataFrame:
    """Candidate near-dup pairs (verified Hamming ≤ threshold).
    ``n_blocks`` must exceed ``hamming_threshold`` for full recall."""
    assert n_blocks > hamming_threshold
    width = 64 // n_blocks

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_block, rows_val, rows_sh = [], [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            sh = simhash64(text)
            for b in range(n_blocks):
                rows_id.append(doc_id)
                rows_block.append(b)
                rows_val.append((sh >> (b * width)) & ((1 << width) - 1))
                rows_sh.append(np.uint64(sh).astype(np.int64))
        return pd.DataFrame({id_col: rows_id, "block_id": rows_block,
                             "block_val": rows_val, "simhash": rows_sh})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        hs = g["simhash"].tolist()
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(int(np.uint64(hs[i])), int(np.uint64(hs[j])))
                if d <= hamming_threshold:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_d.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_d})

    out = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby(["block_id", "block_val"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return out.drop_duplicates(subset=["id_a", "id_b"]).reset_index(drop=True)
