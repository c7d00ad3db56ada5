"""Train/test decontamination: flag corpus documents that share word
k-grams with a benchmark (eval) set.

The standard LLM-training hygiene step (GPT-3 §C / PaLM style): any
training document containing an n-gram that also appears in an evaluation
benchmark is suspect. The benchmark side is SMALL by nature (thousands of
prompts vs billions of docs), so this is a broadcast membership filter,
not a join: the benchmark's distinct gram hashes are collected once,
sorted, ``ray.put`` once, and every corpus batch probes them with
``np.searchsorted`` — one streaming ``map_batches`` pass over the corpus,
zero shuffle.

Shares the MinHash shingle convention (lowercase, ``\\s+`` split, k-gram
join by single space, per-doc DISTINCT grams) and the md5 hash mode, so
the DuckDB oracle replays gram hashing bit-for-bit.

Reference precedent: none (the reference has no eval-contamination
operator); beyond-reference training-pipeline operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup.minhash import shingle_strings
from ..profiling.sketches import HASH64
from ..rules.heuristics import round6_away


def _doc_gram_hashes(texts, k: int, hash_fn: str):
    """Per-doc DISTINCT gram hashes with ONE hash call over the batch's
    unique grams (grams repeat heavily across near-dup docs).
    → (flat uint64 hashes, per-doc counts); flat is per-doc deduplicated
    and grouped in row order."""
    hasher = HASH64[hash_fn]
    gram_sets = [sorted(set(shingle_strings(t, k))) for t in texts]
    counts = np.array([len(g) for g in gram_sets], dtype=np.int64)
    if counts.sum() == 0:
        return np.empty(0, dtype=np.uint64), counts
    flat = np.array([g for gs in gram_sets for g in gs], dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    return hasher(uniq)[inv], counts


def benchmark_gram_hashes(bench_ds, text_col: str, k: int = 8,
                          hash_fn: str = "md5") -> np.ndarray:
    """Distinct sorted gram hashes of the benchmark set. One map_batches
    pass emitting per-batch unique hashes (tiny), unioned on the driver —
    the benchmark is the small side; its hash set is the broadcast
    payload, bounded by benchmark token count, not corpus size."""

    def grams(b: pa.Table) -> pa.Table:
        flat, _ = _doc_gram_hashes(b[text_col].to_pylist(), k, hash_fn)
        return pa.table({"h": pa.array(np.unique(flat), type=pa.uint64())})

    parts = bench_ds.select_columns([text_col]).map_batches(
        grams, batch_format="pyarrow").to_pandas()
    return np.unique(parts["h"].to_numpy().astype(np.uint64))


def decontaminate(ds, text_col: str, id_col: str, bench_hashes: np.ndarray,
                  k: int = 8, hash_fn: str = "md5",
                  threshold: float = 0.1):
    """→ Dataset of (id_col, n_grams, n_hits, contam_frac, contaminated):
    per-doc distinct-gram count, how many of those grams appear in the
    benchmark, their ratio (round6_away — DuckDB's rounding mode), and
    the ``contam_frac >= threshold`` verdict. Empty docs: 0/0/0.0/False.

    Scale: ``bench_hashes`` rides the object store once (``ray.put`` +
    per-process ``cached_get``); the corpus never shuffles.
    """
    import ray

    from ..functions.broadcast import cached_get

    ref = ray.put(np.ascontiguousarray(np.sort(bench_hashes)))

    def probe(b: pa.Table) -> pa.Table:
        bench = cached_get(ref)
        flat, counts = _doc_gram_hashes(b[text_col].to_pylist(), k, hash_fn)
        if len(flat) and len(bench):
            pos = np.searchsorted(bench, flat)
            hit = (pos < len(bench)) & (bench[np.minimum(pos, len(bench) - 1)] == flat)
        else:
            hit = np.zeros(len(flat), dtype=bool)
        # prefix-sum segment totals: robust to zero-gram docs anywhere
        # (reduceat would fault on a start index == len(flat))
        csum = np.concatenate(([0], np.cumsum(hit.astype(np.int64))))
        ends = np.cumsum(counts)
        n_hits = csum[ends] - csum[ends - counts]
        frac = round6_away(n_hits / np.maximum(counts, 1))
        return pa.table({
            id_col: b[id_col],
            "n_grams": pa.array(counts, type=pa.int64()),
            "n_hits": pa.array(n_hits, type=pa.int64()),
            "contam_frac": pa.array(frac, type=pa.float64()),
            "contaminated": pa.array(frac >= threshold),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pyarrow")
