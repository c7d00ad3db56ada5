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

from ..profiling.sketches import HASH64

_BIT_POS = np.arange(64, dtype=np.uint64)
_BIT_VAL = np.uint64(1) << _BIT_POS


def simhash64_batch(texts, hash_fn: str = "stable") -> np.ndarray:
    """Vectorized per-batch simhash: ONE hash call over the unique tokens
    of the whole batch (tokens repeat heavily), then an ``np.add.at`` vote
    scatter per (row, bit). Returns int64 (uint64 bit patterns viewed
    signed, Arrow-friendly). Rows with no tokens → 0."""
    tok_lists = [(t or "").lower().split() for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    n = len(tok_lists)
    if counts.sum() == 0:
        return np.zeros(n, dtype=np.int64)
    flat = np.array([tok for toks in tok_lists for tok in toks], dtype=object)
    row_ids = np.repeat(np.arange(n), counts)
    uniq, inv = np.unique(flat, return_inverse=True)
    hh = HASH64[hash_fn](uniq)[inv]
    # n_tok × 64 ±1 vote matrix, scattered into per-row accumulators
    bits = ((hh[:, None] >> _BIT_POS) & np.uint64(1)).astype(np.int64)
    votes = np.zeros((n, 64), dtype=np.int64)
    np.add.at(votes, row_ids, 2 * bits - 1)
    sig = np.bitwise_or.reduce(np.where(votes > 0, _BIT_VAL, np.uint64(0)), axis=1)
    return sig.view(np.int64)


def simhash64(text: str, hash_fn: str = "stable") -> int:
    return int(np.uint64(simhash64_batch([text], hash_fn)[0].astype(np.uint64)))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def add_simhash(ds, text_col: str, out_col: str = "simhash", hash_fn: str = "stable"):
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = simhash64_batch(batch[text_col].to_numpy(dtype=object), hash_fn)
        return batch

    return ds.map_batches(f, batch_format="pandas")


def simhash_candidates(ds, id_col: str, text_col: str, hamming_threshold: int = 3,
                       n_blocks: int = 4) -> pd.DataFrame:
    """Candidate near-dup pairs (verified Hamming ≤ threshold).
    ``n_blocks`` must exceed ``hamming_threshold`` for full recall."""
    assert n_blocks > hamming_threshold
    width = 64 // n_blocks

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64_batch(batch[text_col].to_numpy(dtype=object))
        shu = sh.view(np.uint64)
        shifts = (np.arange(n_blocks, dtype=np.uint64) * np.uint64(width))
        mask = np.uint64((1 << width) - 1)
        vals = ((shu[:, None] >> shifts) & mask).astype(np.int64).ravel()
        return pd.DataFrame({
            id_col: np.repeat(batch[id_col].to_numpy(), n_blocks),
            "block_id": np.tile(np.arange(n_blocks), len(sh)),
            "block_val": vals,
            "simhash": np.repeat(sh, n_blocks),
        })

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
