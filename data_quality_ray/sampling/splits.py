"""Deterministic hash-based dataset splits (train/valid/test).

The standard large-corpus split discipline: a row's split is a pure
function of its key (+ a salt), so splits are reproducible across runs,
partitionings and cluster sizes, stable under incremental ingestion
(new rows never move old rows between splits), and need no shuffle at
any scale — one stateless map_batches.

Bucket = hash(salt + str(key)) % 10000; split boundaries are the
cumulative fractions scaled to 10000 (so fractions are exact to 0.01%).
``hash_fn="md5"`` makes the assignment bit-identical to DuckDB's
``md5_number_lower(salt || CAST(key AS VARCHAR)) % 10000`` for the
driver oracle; ``"stable"`` is the faster SipHash path.

Reference precedent: the digest-keyed deterministic reservoir
(sampling/parallel/ReservoirSamplerWithBinaryHeap.java:27-69 — same
"randomness from a keyed digest" trick); fixed-fraction splitting itself
is a beyond-reference training-data-pipeline operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..profiling.sketches import HASH64

N_BUCKETS = 10_000


def split_boundaries(splits: dict[str, float]) -> list[tuple[str, int]]:
    """[(name, exclusive_upper_bucket)] with the last boundary pinned to
    N_BUCKETS so fractions that don't sum to exactly 1.0 in float still
    cover every bucket."""
    if any(f <= 0 for f in splits.values()):
        raise ValueError("split fractions must be positive")
    total = sum(splits.values())
    names = list(splits)
    uppers, acc = [], 0.0
    for name in names:
        acc += splits[name] / total
        uppers.append(min(N_BUCKETS, int(round(acc * N_BUCKETS))))
    uppers[-1] = N_BUCKETS
    return list(zip(names, uppers))


def assign_split(keys, splits: dict[str, float], salt: str = "",
                 hash_fn: str = "md5") -> np.ndarray:
    """Vectorized split name per key (keys stringified, salt prepended)."""
    bounds = split_boundaries(splits)
    svals = np.array([salt + str(k) for k in np.asarray(keys, dtype=object)],
                     dtype=object)
    buckets = HASH64[hash_fn](svals) % np.uint64(N_BUCKETS)
    out = np.empty(len(svals), dtype=object)
    lo = 0
    for name, hi in bounds:
        out[(buckets >= lo) & (buckets < hi)] = name
        lo = hi
    return out


def with_split_column(ds, key_col: str, splits: dict[str, float] | None = None,
                      salt: str = "", hash_fn: str = "md5",
                      out_col: str = "split"):
    """Dataset + a split-name column — stateless, shuffle-free."""
    splits = splits or {"train": 0.8, "valid": 0.1, "test": 0.1}

    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = assign_split(b[key_col].to_numpy(), splits, salt, hash_fn)
        return b

    return ds.map_batches(f, batch_format="pandas")


def cluster_safe_split(ds, id_col: str, text_col: str,
                       splits: dict[str, float] | None = None,
                       threshold: float = 0.5, salt: str = "",
                       hash_fn: str = "md5", out_col: str = "split"):
    """Leakage-safe splitting: near-duplicate documents must land in the
    SAME split (a near-dup of a training doc inside the validation set
    is evaluation leakage), so the split key is the doc's MinHash
    near-dup CLUSTER label, not the doc id.

    Shape: `minhash_dedup` (threshold-verified clusters; only CLUSTERED
    docs appear — the map is bounded by the duplicated-doc count, the
    classic broadcast-winners pattern) → the label map broadcasts as
    sorted arrays → one streaming pass assigns label = map.get(id, id)
    and the hash split of the label. The corpus itself never shuffles
    beyond the dedup's own exchanges.

    → Dataset of (id_col, cluster, out_col)."""
    import ray

    from ..dedup.minhash import minhash_dedup
    from ..functions.broadcast import cached_get

    splits = splits or {"train": 0.8, "valid": 0.1, "test": 0.1}
    comp = minhash_dedup(ds, id_col, text_col, threshold=threshold,
                         hash_fn=hash_fn)
    ids = comp[id_col].to_numpy()
    order = np.argsort(ids, kind="mergesort")
    ref = ray.put((ids[order], comp["cluster"].to_numpy()[order]))

    def f(b: pd.DataFrame) -> pd.DataFrame:
        k, lbl = cached_get(ref)
        mine = b[id_col].to_numpy()
        cluster = mine.copy()
        if len(k):
            pos = np.searchsorted(k, mine)
            ok = (pos < len(k)) & (k[np.minimum(pos, len(k) - 1)] == mine)
            cluster[ok] = lbl[pos[ok]]
        out = b[[id_col]].copy()
        out["cluster"] = cluster
        out[out_col] = assign_split(cluster, splits, salt, hash_fn)
        return out

    return ds.select_columns([id_col, text_col]).map_batches(
        f, batch_format="pandas")
