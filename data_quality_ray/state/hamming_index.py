"""Cross-run near-dup index for 64-bit signatures (image phash, simhash)
— the image-side twin of ``minhash_index``: each crawl's signatures are
committed into the same crash-safe generation store (key = the raw
int64 signature), and a later crawl is screened for Hamming-≤-radius
matches against ALL committed history in one streaming pass.

Exactness: with ``n_blocks > radius`` the pigeonhole principle
guarantees any pair within the radius agrees exactly on at least one
block, so block-equality candidate lookup + popcount verification finds
EVERY historical match — the screen is exact, not probabilistic (unlike
the MinHash index's S-curve). Default (radius 2, 4 × 16-bit blocks)
matches the in-run ``phash_neardup_images`` operating point.

Mechanism per batch (vectorized, no Python per row): for each of the
``n_blocks`` block views, ``searchsorted`` the new signatures' block
values into the broadcast block-sorted historical array → candidate
ranges → expand (``repeat``/``arange``) → LUT popcount on the xor →
per-doc min. A new doc's signature rows never leave the batch.

Scale budget: the broadcast bundle holds the historical signature array
once per block view (n_blocks + 0 copies of 8 B each) → 4 × 8 B × 1e9
images = 32 GB at a billion images, the same order as the exact index's
documented ceiling; past it, range-bucket the incoming block values and
the per-block sorted shards and join per bucket (the generation shards
are already sorted).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from .dedup_index import append, compact, load_keys  # noqa: F401  (compact re-exported)

_PARAMS_FILE = "_params.json"


def _block_views(sigs: np.ndarray, n_blocks: int) -> np.ndarray:
    """(n, n_blocks) matrix of block values: contiguous bit slices of the
    64-bit signature (uint64 arithmetic; int64 inputs are reinterpreted)."""
    u = sigs.astype(np.int64).view(np.uint64)
    width = 64 // n_blocks
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    return np.stack([(u >> np.uint64(j * width)) & mask
                     for j in range(n_blocks)], axis=1)


class HammingIndex:
    """Incremental cross-run near-dup screen for 64-bit signatures.

    >>> idx = HammingIndex("/data/phash_index", radius=2)
    >>> tagged = idx.screen(ds, sig_col="phash")  # + min_hamming, known_neardup
    >>> idx.commit(tagged, sig_col="phash")
    """

    def __init__(self, index_dir: str, radius: int = 2, n_blocks: int = 4):
        if n_blocks <= radius:
            raise ValueError(
                f"pigeonhole completeness needs n_blocks > radius "
                f"(got n_blocks={n_blocks}, radius={radius})")
        if 64 % n_blocks:
            raise ValueError(f"n_blocks={n_blocks} must divide 64")
        self.index_dir = index_dir
        self.radius = radius
        self.n_blocks = n_blocks
        # radius/n_blocks are SCREEN-time knobs over the same raw-signature
        # store (keys are the raw signatures, so any operating point can
        # reopen any index); the params file is an audit record only
        self._hist = load_keys(index_dir)
        self._bundle_ref = None

    @property
    def n_keys(self) -> int:
        return len(self._hist)

    def _bundle(self):
        """Per-block sorted views of the historical signatures, built once
        on the driver and broadcast once: (sorted block values, signatures
        permuted into that order) per block."""
        views = _block_views(self._hist, self.n_blocks) if len(self._hist) \
            else np.empty((0, self.n_blocks), dtype=np.uint64)
        out = []
        for j in range(self.n_blocks):
            order = np.argsort(views[:, j], kind="mergesort")
            out.append((views[order, j], self._hist[order]))
        return out

    # ------------------------------------------------------------- screen

    def screen(self, ds, sig_col: str):
        """Tag every row with ``min_hamming`` (closest committed signature
        within the radius; -1 when none) and ``known_neardup``. Exact by
        pigeonhole (see module docstring)."""
        import ray

        from ..dedup.simhash import hamming64_pairs
        from ..functions.broadcast import cached_get

        if self._bundle_ref is None:
            self._bundle_ref = ray.put(self._bundle())
        ref = self._bundle_ref
        radius, n_blocks = self.radius, self.n_blocks

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            bundle = cached_get(ref)
            sigs = b[sig_col].to_numpy()
            best = np.full(len(b), np.iinfo(np.int64).max, dtype=np.int64)
            if len(bundle[0][0]):
                views = _block_views(sigs, n_blocks)
                for j in range(n_blocks):
                    sbv, hsig = bundle[j]
                    lo = np.searchsorted(sbv, views[:, j], side="left")
                    hi = np.searchsorted(sbv, views[:, j], side="right")
                    cnt = hi - lo
                    hit = cnt > 0
                    if not hit.any():
                        continue
                    # expand candidate ranges: row r contributes cnt[r]
                    # (query, historical) aligned pairs
                    rows = np.repeat(np.flatnonzero(hit), cnt[hit])
                    starts = np.repeat(lo[hit], cnt[hit])
                    offs = np.arange(len(rows)) - np.repeat(
                        np.cumsum(np.concatenate([[0], cnt[hit][:-1]])), cnt[hit])
                    cand = hsig[starts + offs]
                    d = hamming64_pairs(sigs[rows], cand)
                    np.minimum.at(best, rows, d)
            found = best <= radius
            b["min_hamming"] = np.where(found, best, -1)
            b["known_neardup"] = found
            return b

        return ds.map_batches(tag, batch_format="pandas")

    def filter_new(self, ds, sig_col: str):
        """Rows with no committed signature within the radius."""

        def keep(b: pd.DataFrame) -> pd.DataFrame:
            return b.loc[~b["known_neardup"]].drop(
                columns=["min_hamming", "known_neardup"])

        return self.screen(ds, sig_col).map_batches(keep, batch_format="pandas")

    # ------------------------------------------------------------- commit

    def commit(self, ds, sig_col: str) -> str:
        """Append this run's distinct signatures as the next generation
        (per-batch distinct computed distributed; only int64 keys land on
        the driver — idempotent under union, crash-safe via the ``_GEN``
        marker landing last)."""

        def keys_batch(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"key": np.unique(b[sig_col].to_numpy())})

        key_ds = ds.select_columns([sig_col]).map_batches(
            keys_batch, batch_format="pandas")
        parts = [b["key"].to_numpy()
                 for b in key_ds.iter_batches(batch_size=65536,
                                              batch_format="pandas")]
        keys = np.unique(np.concatenate(parts)) if parts \
            else np.empty(0, dtype=np.int64)
        os.makedirs(self.index_dir, exist_ok=True)
        pfile = os.path.join(self.index_dir, _PARAMS_FILE)
        if not os.path.exists(pfile):
            tmp = pfile + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"radius": self.radius, "n_blocks": self.n_blocks}, f)
            os.replace(tmp, pfile)
        gen = append(self.index_dir, keys)
        self._hist = load_keys(self.index_dir)
        self._bundle_ref = None
        return gen
