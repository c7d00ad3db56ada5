"""Consistent-hash sharding and minimal-movement rebalance audit.

The Karger ring: every (shard, virtual-replica) pair hashes to a point
on a 2^53 ring (md5 — both engines derive the ring independently from
the shard NAMES, nothing is handed over), a key lands on the first ring
point clockwise from its own hash. Adding one shard then moves only the
keys whose arc the new shard's points capture — expected 1/(N+1) of
them — which is why 100 TB stores reshard this way instead of
`hash % N` (which moves ~all keys).

Scale shape: the ring is tiny (N × replicas points) and broadcasts; key
assignment is ONE streaming searchsorted pass, no shuffle. The movement
audit (assignment under N and N+1 in the same pass → (before, after)
matrix) is a fixed-size grouped fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RING_MOD = 1 << 53
REPLICAS = 16


def _md5_low53_str(strings: np.ndarray) -> np.ndarray:
    from ..profiling.sketches import md5_hash64

    return (md5_hash64(strings) % np.uint64(RING_MOD)).astype(np.int64)


def ring_points(n_shards: int, replicas: int = REPLICAS):
    """→ (positions sorted asc, shard ids aligned). Point =
    md5_low53('shard|<s>|<r>')."""
    names = np.array([f"shard|{s}|{r}" for s in range(n_shards)
                      for r in range(replicas)], dtype=object)
    pos = _md5_low53_str(names)
    shard = np.repeat(np.arange(n_shards, dtype=np.int64), replicas)
    order = np.lexsort((shard, pos))
    return pos[order], shard[order]


def assign_ring(key_pos: np.ndarray, pos: np.ndarray,
                shard: np.ndarray) -> np.ndarray:
    """First ring point at or clockwise-after the key (wraparound to the
    ring's first point)."""
    idx = np.searchsorted(pos, key_pos, side="left")
    return shard[np.where(idx == len(pos), 0, idx)]


def rebalance_audit(ds, key_col: str, n_before: int, n_after: int,
                    replicas: int = REPLICAS):
    """→ DataFrame (shard_before, shard_after, n): the movement matrix of
    keys between the n_before-shard and n_after-shard rings, computed in
    ONE streaming pass (both rings broadcast; per-batch fixed-size
    grouped partials; driver merge over ≤ n_before × n_after rows)."""
    import ray

    from .broadcast import cached_get

    rings = (ring_points(n_before, replicas), ring_points(n_after, replicas))
    ref = ray.put(rings)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from ..profiling.bootstrap import _md5_low53  # DuckDB-vectorized

        (p0, s0), (p1, s1) = cached_get(ref)
        kp = _md5_low53(b[key_col].astype(str).to_numpy(dtype=object))
        a0 = assign_ring(kp, p0, s0)
        a1 = assign_ring(kp, p1, s1)
        f = pd.DataFrame({"shard_before": a0, "shard_after": a1})
        return (f.groupby(["shard_before", "shard_after"], sort=False)
                .size().rename("n").reset_index())

    parts = pd.concat(
        list(ds.select_columns([key_col])
             .map_batches(partial, batch_format="pandas")
             .iter_batches(batch_size=4096, batch_format="pandas")),
        ignore_index=True)
    out = (parts.groupby(["shard_before", "shard_after"], sort=True)["n"]
           .sum().reset_index())
    return out.astype("int64")
