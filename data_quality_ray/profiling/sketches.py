"""Mergeable sketches: HyperLogLog and t-digest.

The reference ships mergeable stats beans precisely so callers can do
partial/final distributed aggregation (SURVEY.md §4):

- HLL cardinality: cardinality/CardinalityHLLAnalyzer.java:33-84 with
  merge at CardinalityHLLStatistics.java:53-58 (stream-lib HLL, rsd 20%).
  Here: classic Flajolet HLL, p=14 (~0.81% rsd) over the deterministic
  64-bit SipHash from ``pandas.util.hash_array`` (stable across worker
  processes, unlike builtin ``hash``).
- t-digest quantiles: numeric/quantile/TDigestAnalyzer.java:32-102
  (mergeable sketch). Here: a merging t-digest with the standard k1 scale
  bound on centroid size.

Both expose ``update_array`` (vectorized per batch), ``merge``, and are
small + picklable (one sketch per block rides the tiny partials stream).
"""

from __future__ import annotations

import numpy as np
import pandas.util as pdu


def stable_hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes (same value → same hash in every worker
    process; builtin str hash is salted per process and unusable here)."""
    return pdu.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)


def md5_hash64(values: np.ndarray) -> np.ndarray:
    """64-bit hash = low half of md5, little-endian — bit-identical to
    DuckDB's ``md5_number_lower(s)``, which is what makes the simhash /
    minhash driver queries SQL-oracle-able. Slower than ``stable_hash64``;
    callers memoize over unique values (tokens/shingles repeat heavily)."""
    import hashlib

    vals = np.asarray(values, dtype=object)
    out = np.empty(len(vals), dtype=np.uint64)
    md5 = hashlib.md5
    for i, v in enumerate(vals):
        out[i] = int.from_bytes(md5(v.encode("utf-8")).digest()[8:], "little")
    return out


HASH64 = {"stable": stable_hash64, "md5": md5_hash64}


class HyperLogLog:
    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = 1 + count of leading zeros of the remaining 64-p bits
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        done = np.zeros(len(h), dtype=bool)
        for r in range(64 - self.p + 2):
            top = (cur & mask) != 0
            newly = top & ~done
            lz[newly] = r
            done |= top
            if done.all():
                break
            cur = cur << np.uint64(1)
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def update_array(self, values: np.ndarray) -> None:
        self.update_hashes(stable_hash64(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)


class TDigest:
    """Merging t-digest (Dunning's k1 size bound). Centroids kept sorted."""

    def __init__(self, compression: float = 100.0):
        self.compression = compression
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._min = np.inf
        self._max = -np.inf

    def update_array(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self._buf.append(v)
        if sum(len(b) for b in self._buf) > 16384:
            self._compress()

    def _compress(self) -> None:
        if not self._buf and len(self.means) <= 2 * self.compression:
            return
        pts = np.concatenate([self.means] + self._buf) if self._buf else self.means
        wts = np.concatenate([self.weights] + [np.ones(len(b)) for b in self._buf]) if self._buf else self.weights
        self._buf = []
        if len(pts) == 0:
            return
        order = np.argsort(pts, kind="mergesort")
        pts, wts = pts[order], wts[order]
        total = wts.sum()
        out_m, out_w = [], []
        q0 = 0.0
        cur_m, cur_w = pts[0], wts[0]
        for i in range(1, len(pts)):
            q = q0 + (cur_w + wts[i]) / total
            # k1 bound: max centroid weight 4·total·q(1-q)/compression
            limit = 4 * total * max(q * (1 - q), 1e-12) / self.compression
            if cur_w + wts[i] <= limit:
                cur_m = (cur_m * cur_w + pts[i] * wts[i]) / (cur_w + wts[i])
                cur_w += wts[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = pts[i], wts[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)

    def merge(self, other: "TDigest") -> "TDigest":
        self._compress()
        other._compress()
        if len(other.means):
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        order = np.argsort(self.means, kind="mergesort")
        m, w = self.means[order], self.weights[order]
        cum = np.cumsum(w) - w / 2
        target = q * w.sum()
        if target <= cum[0]:
            return float(self._min if np.isfinite(self._min) else m[0])
        if target >= cum[-1]:
            return float(self._max if np.isfinite(self._max) else m[-1])
        return float(np.interp(target, cum, m))


class CountMinSketch:
    """Mergeable count-min sketch (Cormode & Muthukrishnan 2005) for
    heavy-hitter frequency estimation over unbounded key spaces: d rows of
    w counters, per-row hash = the stable 64-bit hash salted per row;
    estimate = min over rows (never under-counts, over-counts by at most
    εN with ε≈e/w at δ≈e^-d). Same partial/merge contract as the HLL and
    t-digest sketches (one sketch per block rides the partials stream)."""

    def __init__(self, width: int = 2048, depth: int = 5):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h = stable_hash64(values)
        out = np.empty((self.depth, len(h)), dtype=np.int64)
        for d in range(self.depth):
            # odd multiplier per row = independent-enough salted family
            salt = np.uint64((d * 0x9E3779B97F4A7C15) % (1 << 64))
            out[d] = ((h * np.uint64(2 * d + 1) + salt)
                      % np.uint64(self.width)).astype(np.int64)
        return out

    def update_array(self, values: np.ndarray, counts: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return
        c = np.ones(len(values), dtype=np.int64) if counts is None else np.asarray(counts)
        pos = self._positions(values)
        for d in range(self.depth):
            np.add.at(self.table[d], pos[d], c)
        self.n += int(c.sum())

    def estimate(self, values: np.ndarray) -> np.ndarray:
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return np.empty(0, dtype=np.int64)
        pos = self._positions(values)
        ests = np.stack([self.table[d][pos[d]] for d in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        self.n += other.n
        return self


class KMinValues:
    """Mergeable K-minimum-values distinct sketch (Bar-Yossef et al.
    2002) — keeps the k smallest DISTINCT 64-bit hashes of the keys.
    Unlike HLL it is fully deterministic given the key set (the k-min
    set is partition- and order-invariant, and union = merge of
    sketches), so with the md5 hash the driver oracle replays it
    EXACTLY in SQL (rank window over ``md5_number_lower``) — no
    tolerance gate needed. Jaccard/overlap of two key sets estimates
    from the union sketch: |union_kmin ∩ A_kmin ∩ B_kmin| / k_eff
    (Beyer et al. 2007), RSE ≈ 1/√k. Same partial/merge contract as
    the other sketches here."""

    def __init__(self, k: int = 256, hash_fn: str = "md5"):
        self.k = k
        self.hash_name = hash_fn
        self.hash = HASH64[hash_fn]
        self.vals = np.empty(0, dtype=np.uint64)

    def update_array(self, values) -> None:
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return
        h = self.hash(values)
        self.vals = np.unique(np.concatenate([self.vals, h]))[:self.k]

    def merge(self, other: "KMinValues") -> "KMinValues":
        if (self.k, self.hash_name) != (other.k, other.hash_name):
            raise ValueError("incompatible KMV sketches")
        self.vals = np.unique(
            np.concatenate([self.vals, other.vals]))[:self.k]
        return self

    def jaccard(self, other: "KMinValues") -> tuple[int, int]:
        """(n_both, k_eff) over the union sketch — the exact integers
        the SQL replay computes; estimate = n_both / k_eff."""
        union = np.unique(
            np.concatenate([self.vals, other.vals]))[:self.k]
        both = np.isin(union, self.vals) & np.isin(union, other.vals)
        return int(both.sum()), int(len(union))


class BloomFilter:
    """Mergeable Bloom filter over string/bytes keys: k salted positions
    derived from one 64-bit hash per value (Kirsch-Mitzenmacher double
    hashing — h1 + i·h2 — so membership costs ONE string hash however
    many probe positions). Merge = bitwise OR of equal-shaped filters;
    per-batch partials union exactly like the other mergeable sketches
    (CardinalityHLLStatistics.java:53-58 contract).

    Sized by (expected_items, fpr): m = -n·ln(p)/ln(2)², k = m/n·ln(2).
    No false negatives ever; false-positive rate ≈ ``fpr`` at the design
    load. The fixed-size broadcastable alternative to the sorted-key
    membership arrays in state/dedup_index.py when the key set outgrows
    exact broadcast."""

    def __init__(self, expected_items: int = 1_000_000, fpr: float = 0.01,
                 hash_fn: str = "stable"):
        if not 0 < fpr < 1:
            raise ValueError("fpr must be in (0,1)")
        ln2 = np.log(2.0)
        m = int(np.ceil(-expected_items * np.log(fpr) / (ln2 * ln2)))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, int(round(self.m / expected_items * ln2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self.hash_name = hash_fn
        self.hash = HASH64[hash_fn]
        self.n = 0

    def _positions(self, values: np.ndarray) -> np.ndarray:
        h = self.hash(np.asarray(values, dtype=object))
        h1 = h
        h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(self.m)

    def update_array(self, values) -> None:
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n += len(values)

    def contains_array(self, values) -> np.ndarray:
        values = np.asarray(values, dtype=object)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k, self.hash_name) != (other.m, other.k, other.hash_name):
            raise ValueError("incompatible Bloom filters")
        self.bits |= other.bits
        self.n += other.n
        return self
