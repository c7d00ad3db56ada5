"""Sliding-window document chunking (the RAG / retrieval-corpus layout).

Each document's whitespace token stream is cut into overlapping windows
of ``window`` tokens advancing by ``stride`` (< window ⇒ overlap — the
standard retrieval-chunk layout, vs functions/packing.py's cross-doc
boundary-agnostic packing). Chunk starts are 0, S, 2S, …, last_k·S with
last_k = ceil(max(T−W, 0)/S), so coverage is complete and the final
window is the first one reaching the document's end; empty documents
produce no chunks.

Every chunk carries an order-sensitive integer checksum the SQL oracle
replays EXACTLY in int64: sum over the chunk's tokens of
``(relpos+1) · (md5_number_lower(token) % 1000003)`` — positional
weighting makes token-order bugs fail the compare, the small modulus
keeps the sum ≤ ~2^34 (exact in BIGINT and float64 alike).

Scale shape: chunking is per-document with no cross-document state —
ONE embarrassingly parallel map_batches pass, zero shuffle, zero driver
state. The per-batch kernel is fully vectorized: one str.split, one
np.unique-memoized md5 over distinct tokens (tokens repeat heavily),
variable-repeat window assignment via the cumsum/arange trick, one
pandas groupby-sum per batch. Reference precedent: none (the reference
has no retrieval layout step) — beyond-reference training-data surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CHECKSUM_MOD = 1_000_003  # shared with the SQL oracle


def chunk_batch(b: pd.DataFrame, id_col: str, text_col: str,
                window: int, stride: int) -> pd.DataFrame:
    """Vectorized per-batch kernel → one row per (doc, chunk)."""
    from ..profiling.sketches import md5_hash64

    texts = b[text_col].fillna("").astype(str)
    toks_per_doc = texts.str.split()
    counts = toks_per_doc.str.len().to_numpy(dtype=np.int64)
    keep = counts > 0
    if not keep.any():
        return _empty(id_col)
    doc_ids = b[id_col].to_numpy()[keep]
    counts = counts[keep]
    tok_lists = toks_per_doc.to_numpy()[keep]

    toks = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
    # token position within its doc: global arange minus each doc's start
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(toks), dtype=np.int64) - np.repeat(starts, counts)
    tdoc = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    t_of_doc = counts[tdoc]
    last_k = (np.maximum(t_of_doc - window, 0) + stride - 1) // stride

    uniq, inv = np.unique(toks.astype(object), return_inverse=True)
    h = (md5_hash64(uniq) % np.uint64(CHECKSUM_MOD)).astype(np.int64)[inv]

    # token at pos p belongs to windows k with k·S <= p < k·S + W
    kmin = np.maximum((pos - window) // stride + 1, 0)
    kmax = np.minimum(pos // stride, last_k)
    reps = (kmax - kmin + 1).astype(np.int64)  # >= 1: kmin <= p//S always
    total = int(reps.sum())
    rep_start = np.concatenate([[0], np.cumsum(reps)[:-1]])
    intra = np.arange(total, dtype=np.int64) - np.repeat(rep_start, reps)
    k = np.repeat(kmin, reps) + intra
    rel = np.repeat(pos, reps) - k * stride
    contrib = (rel + 1) * np.repeat(h, reps)

    frame = pd.DataFrame({"__doc": np.repeat(tdoc, reps), "chunk_idx": k,
                          "checksum": contrib})
    agg = (frame.groupby(["__doc", "chunk_idx"], sort=False)["checksum"]
           .sum().reset_index())
    di = agg["__doc"].to_numpy()
    ks = agg["chunk_idx"].to_numpy()
    n_toks = np.minimum(window, counts[di] - ks * stride)
    return (pd.DataFrame({id_col: doc_ids[di], "chunk_idx": ks,
                          "start_tok": ks * stride, "n_toks": n_toks,
                          "checksum": agg["checksum"].to_numpy()})
            .sort_values([id_col, "chunk_idx"]).reset_index(drop=True))


def _empty(id_col: str) -> pd.DataFrame:
    return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                         "chunk_idx": pd.Series(dtype="int64"),
                         "start_tok": pd.Series(dtype="int64"),
                         "n_toks": pd.Series(dtype="int64"),
                         "checksum": pd.Series(dtype="int64")})


def sliding_chunks(ds, id_col: str, text_col: str, window: int = 128,
                   stride: int = 96):
    """→ Dataset (id, chunk_idx, start_tok, n_toks, checksum), one row
    per overlapping window. ``stride <= window`` required (gaps would
    silently drop tokens from every chunk)."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        return chunk_batch(b, id_col, text_col, window, stride)

    return ds.map_batches(fn, batch_format="pandas")
