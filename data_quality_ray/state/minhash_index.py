"""Cross-run NEAR-dup index (MinHash LSH) — extends the cross-run exact
index to near-duplicates. The observation that makes it cheap: an LSH
band collision IS an exact-key hit over mixed ``(band_id, band_hash)``
keys, so the crash-safe generation store (atomic ``_GEN`` commit
markers, idempotent append, compaction) is REUSED from ``dedup_index``
verbatim — only the key derivation differs.

Production shape this models (reference has no cross-run state; this is
engine surface for the 10^12-image/doc north rule): each day's crawl is
near-dup-screened against every PRIOR crawl before in-run dedup. A doc
sharing >= ``min_bands`` LSH bands with history is a probable near-dup
at the configured ``(n_perm, bands)`` operating point — the standard
MinHashLSH S-curve (Broder 1997; Leskovec/Rajaraman/Ullman ch. 3). No
text re-verification across runs: historical TEXT is not retained, only
band keys, which is exactly what makes the index feasible at scale
(the same trade RefinedWeb/CCNet-style production dedup makes).

Scale budget: one band key = 8 B → 1e8 docs × 16 bands = 12.8 GB
broadcast — the practical single-node ceiling, same order as the exact
index's documented 1e9-key budget. Beyond it, bucket BOTH the incoming
band keys and the index shards by key range and membership-join per
bucket (the shards are already sorted; the layout carries the ranges).
The broadcast path below is the measured-size default, not the only
mechanism — the bucketed path is ``dedup_index``'s documented shard
plan and applies here unchanged because the store is the same.

Screening is ONE streaming ``map_batches`` pass, zero shuffle: per
batch, texts → signatures → band keys → vectorized ``searchsorted``
membership → per-doc hit count (a doc's band rows never leave the
batch that produced them).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from .dedup_index import append, compact, load_keys  # noqa: F401  (compact re-exported)

_PARAMS_FILE = "_params.json"


def _band_salts(bands: int, seed: int) -> np.ndarray:
    """One random 64-bit mix constant per band: the per-band hash spaces
    must not alias (band 3's bucket x is a different key than band 7's)."""
    rng = np.random.RandomState(seed ^ 0x5DEECE66)
    return rng.randint(-(2**63), 2**63 - 1, size=bands, dtype=np.int64)


def band_key_matrix(texts, n_perm: int = 64, bands: int = 16,
                    shingle_size: int = 3, seed: int = 17,
                    hash_fn: str = "stable") -> np.ndarray:
    """(n_docs, bands) matrix of cross-run index keys — the SAME band
    hashes as ``dedup.minhash.minhash_bands`` (shared hasher cache and
    band-slice semantics), mixed with a per-band salt so one flat sorted
    array serves every band. ``hash_fn="md5"`` yields string keys
    ``"<band>|v|v|…"`` that a DuckDB oracle reproduces verbatim."""
    from ..dedup.minhash import HASH64, _cached_hasher

    mh = _cached_hasher(n_perm, shingle_size, seed, hash_fn)
    sigs = mh.signatures_batch(np.asarray(texts, dtype=object))
    rpb = n_perm // bands
    band_strs = np.array(
        ["|".join(map(str, sig[b * rpb: (b + 1) * rpb]))
         for sig in sigs for b in range(bands)],
        dtype=object,
    )
    if hash_fn == "md5":
        bid = np.tile(np.arange(bands), len(sigs))
        return np.array([f"{i}|{s}" for i, s in zip(bid, band_strs)],
                        dtype=object).reshape(len(sigs), bands)
    salts = _band_salts(bands, seed)
    keys = HASH64["stable"](band_strs).astype(np.int64).reshape(len(sigs), bands)
    return keys ^ salts[None, :]


class MinhashIndex:
    """Incremental cross-run near-dup screen.

    >>> idx = MinhashIndex("/data/neardup_index", min_bands=1)
    >>> tagged = idx.screen(ds, "doc_id", "text")   # + n_hit_bands, known_neardup
    >>> fresh = idx.filter_new(ds, "doc_id", "text")
    >>> idx.commit(fresh, "doc_id", "text")          # next generation

    Parameters are persisted to ``_params.json`` on first commit and
    validated on open — band keys from different ``(n_perm, bands,
    shingle_size, seed, hash_fn)`` are incomparable, so a mismatched
    reopen raises instead of silently screening against noise.
    """

    def __init__(self, index_dir: str, n_perm: int = 64, bands: int = 16,
                 shingle_size: int = 3, seed: int = 17,
                 hash_fn: str = "stable", min_bands: int = 1):
        self.index_dir = index_dir
        self.params = {"n_perm": n_perm, "bands": bands,
                       "shingle_size": shingle_size, "seed": seed,
                       "hash_fn": hash_fn}
        self.min_bands = min_bands
        pfile = os.path.join(index_dir, _PARAMS_FILE)
        if os.path.exists(pfile):
            with open(pfile) as f:
                stored = json.load(f)
            if stored != self.params:
                raise ValueError(
                    f"index at {index_dir} was built with {stored}, "
                    f"opened with {self.params} — band keys are incomparable")
        self._hist = load_keys(index_dir)
        self._hist_ref = None

    @property
    def n_keys(self) -> int:
        return len(self._hist)

    # ------------------------------------------------------------- screen

    def screen(self, ds, id_col: str, text_col: str):
        """Tag every row with ``n_hit_bands`` (how many of its LSH bands
        collide with history) and ``known_neardup`` (>= min_bands). One
        streaming pass; the sorted historical key array rides the object
        store once (``ray.put`` + per-task cache)."""
        import ray

        from ..functions.broadcast import cached_get

        if self._hist_ref is None:
            self._hist_ref = ray.put(self._hist)
        ref = self._hist_ref
        p, min_bands = dict(self.params), self.min_bands

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            hist = cached_get(ref)
            if len(hist) == 0:
                b["n_hit_bands"] = np.zeros(len(b), dtype=np.int64)
            else:
                keys = band_key_matrix(b[text_col].to_numpy(dtype=object), **p)
                flat = keys.ravel()
                pos = np.clip(np.searchsorted(hist, flat), 0, len(hist) - 1)
                hits = (hist[pos] == flat).reshape(keys.shape)
                b["n_hit_bands"] = hits.sum(axis=1).astype(np.int64)
            b["known_neardup"] = b["n_hit_bands"] >= min_bands
            return b

        return ds.map_batches(tag, batch_format="pandas")

    def filter_new(self, ds, id_col: str, text_col: str):
        """Rows that are NOT probable near-dups of any committed run
        (vectorized mask per batch, never a per-row filter)."""

        def keep(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[~b["known_neardup"]].drop(
                columns=["n_hit_bands", "known_neardup"])

        return self.screen(ds, id_col, text_col).map_batches(
            keep, batch_format="pandas")

    # ------------------------------------------------------------- commit

    def commit(self, ds, id_col: str, text_col: str) -> str:
        """Append this run's distinct band keys as the next generation.
        Key sets are idempotent under union, so a crashed/retried commit
        is safe (the ``_GEN`` marker lands last — dedup_index contract).
        Signature hashing runs DISTRIBUTED (map_batches); only the
        per-batch distinct band keys move to the driver (bands × docs
        values, the same order as the exact index's key pass). At the
        documented scale ceiling, write the keys as a Dataset into
        range-bucketed shards instead."""
        p = dict(self.params)

        def keys_batch(b: pd.DataFrame) -> pd.DataFrame:
            k = np.unique(band_key_matrix(b[text_col].to_numpy(dtype=object), **p))
            return pd.DataFrame({"key": k})

        key_ds = ds.select_columns([text_col]).map_batches(
            keys_batch, batch_format="pandas")
        parts = [b["key"].to_numpy()
                 for b in key_ds.iter_batches(batch_size=65536,
                                              batch_format="pandas")]
        if parts:
            keys = np.unique(np.concatenate(parts))
        elif p["hash_fn"] == "md5":
            keys = np.empty(0, dtype=object)
        else:
            keys = np.empty(0, dtype=np.int64)
        os.makedirs(self.index_dir, exist_ok=True)
        pfile = os.path.join(self.index_dir, _PARAMS_FILE)
        if not os.path.exists(pfile):
            tmp = pfile + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.params, f)
            os.replace(tmp, pfile)
        gen = append(self.index_dir, keys)
        self._hist = load_keys(self.index_dir)
        self._hist_ref = None
        return gen
