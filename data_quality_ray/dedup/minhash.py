"""MinHash + LSH near-duplicate detection.

Pipeline shape (the canonical web-scale text-dedup recipe):
  1. shingle each doc (word n-grams) and minhash → signature of
     ``n_perm`` 64-bit minima, per batch, vectorized;
  2. split the signature into ``bands``; explode to one row per
     (band_id, band_hash, doc_id);
  3. ``groupby(["band_id", "band_hash"])`` — the only shuffle; docs
     sharing any band bucket are candidate pairs;
  4. verify candidates with exact shingle-set Jaccard;
  5. connected components via iterated min-label propagation
     (groupby rounds) → cluster id per doc; keep min doc per cluster.

Reference precedent: blocking-key dedup (genkey/BlockingKeyHandler.java)
with the band hash as the generated key; the per-group "first wins"
mirrors master-record selection in AbstractRecordGrouping.java:201-254.

Hashing uses deterministic SipHash (pandas.util.hash_array) + the standard
(a·h + b mod p) permutation family with a seeded generator, so results are
partition-count independent and reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..profiling.sketches import stable_hash64

_P = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61-1


class MinHasher:
    def __init__(self, n_perm: int = 64, shingle_size: int = 3, seed: int = 17):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 1 << 61, size=n_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 1 << 61, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.shingle_size = shingle_size

    def shingles(self, text: str) -> np.ndarray:
        toks = text.lower().split()
        k = self.shingle_size
        if len(toks) < k:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        return stable_hash64(np.array(grams, dtype=object)) if grams else np.empty(0, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingles(text)
        if len(h) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*h + b) mod p for each permutation — vectorized outer product
        vals = (np.multiply.outer(self.a, h) + self.b[:, None]) % _P
        return vals.min(axis=1)


def minhash_bands(ds, id_col: str, text_col: str, n_perm: int = 64, bands: int = 16,
                  shingle_size: int = 3, seed: int = 17):
    """Stage 1+2: Dataset of (band_id, band_hash, id) rows."""
    rows_per_band = n_perm // bands

    class Sign:
        def __init__(self):
            self.mh = MinHasher(n_perm, shingle_size, seed)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs = [self.mh.signature(t or "") for t in batch[text_col]]
            # ONE vectorized hash call per batch (per-row calls to the
            # SipHash kernel have ~100µs fixed cost each)
            band_strs = np.array(
                ["|".join(map(str, sig[b * rows_per_band : (b + 1) * rows_per_band]))
                 for sig in sigs for b in range(bands)],
                dtype=object,
            )
            hashes = stable_hash64(band_strs).astype(np.int64)
            return pd.DataFrame({
                "band_id": np.tile(np.arange(bands), len(sigs)),
                "band_hash": hashes,
                id_col: np.repeat(batch[id_col].to_numpy(), bands),
            })

    return ds.map_batches(Sign, batch_format="pandas", batch_size=1024, concurrency=(2, 8))


def candidate_pairs(band_ds, id_col: str, strategy: str = "collect") -> pd.DataFrame:
    """Stage 3: docs sharing a (band_id, band_hash) bucket → unique pairs.

    - "collect" (default): the band table is 2 ints + an id per (doc,
      band) — tiny relative to the corpus — so collect it and pair with a
      vectorized pandas self-merge on the duplicated buckets. Right up to
      ~1e8 band rows.
    - "shuffle": ``groupby(band).map_groups`` — no driver-side state, for
      corpora whose band table itself is too big for one node. Slower at
      small scale (a Python callback per mostly-singleton bucket).
    """
    if strategy == "shuffle":
        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            ids = sorted(g[id_col].unique())
            if len(ids) < 2:
                return pd.DataFrame({"id_a": [], "id_b": []})
            a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))])
            return pd.DataFrame({"id_a": a, "id_b": b})

        out = band_ds.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
        return out.to_pandas().drop_duplicates().reset_index(drop=True)

    pdf = band_ds.to_pandas()
    dup = pdf[pdf.duplicated(["band_id", "band_hash"], keep=False)]
    if dup.empty:
        return pd.DataFrame({"id_a": [], "id_b": []})
    m = dup.merge(dup, on=["band_id", "band_hash"], suffixes=("_a", "_b"))
    m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
    out = m[[f"{id_col}_a", f"{id_col}_b"]].rename(
        columns={f"{id_col}_a": "id_a", f"{id_col}_b": "id_b"})
    return out.drop_duplicates().reset_index(drop=True)


def jaccard(text_a: str, text_b: str, shingle_size: int = 3) -> float:
    mh = MinHasher(shingle_size=shingle_size)
    sa, sb = set(mh.shingles(text_a or "").tolist()), set(mh.shingles(text_b or "").tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_dedup(ds, id_col: str, text_col: str, threshold: float = 0.7,
                  n_perm: int = 64, bands: int = 16, shingle_size: int = 3,
                  seed: int = 17) -> pd.DataFrame:
    """Full near-dup pass → DataFrame(id, cluster) for docs in near-dup
    clusters (verified Jaccard ≥ threshold). Candidate verification needs
    the texts: the text lookup is broadcast for the candidate subset only
    (candidates ≪ corpus at scale)."""
    bands_ds = minhash_bands(ds, id_col, text_col, n_perm, bands, shingle_size, seed)
    pairs = candidate_pairs(bands_ds, id_col)
    if pairs.empty:
        return pd.DataFrame({id_col: [], "cluster": []})
    cand_ids = set(pairs["id_a"]) | set(pairs["id_b"])
    texts = (
        ds.map_batches(lambda b: b[b[id_col].isin(cand_ids)][[id_col, text_col]], batch_format="pandas")
        .to_pandas().set_index(id_col)[text_col].to_dict()
    )
    keep = [
        jaccard(texts.get(a, ""), texts.get(b, ""), shingle_size) >= threshold
        for a, b in zip(pairs["id_a"], pairs["id_b"])
    ]
    verified = pairs[np.array(keep, dtype=bool)]
    # union-find on the (small) verified pair set
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(verified["id_a"], verified["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted(parent)
    return pd.DataFrame({id_col: members, "cluster": [find(m) for m in members]})
