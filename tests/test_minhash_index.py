"""Cross-run near-dup index (state/minhash_index.py): screening verdicts
must equal a brute-force band-key intersection computed independently,
the generation store must be crash-safe/idempotent (inherited dedup_index
contract), and parameter mismatches must refuse to open."""

import os

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.state.minhash_index import (
    MinhashIndex, band_key_matrix, compact,
)

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa", "lam", "mu", "nu", "xi"]


def _corpus(n, seed, prefix=""):
    rng = np.random.RandomState(seed)
    return [prefix + " ".join(rng.choice(WORDS, size=14)) for _ in range(n)]


def _edit(text, rng):
    toks = text.split()
    toks[rng.randint(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


def _ds(df, blocks=3):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def test_screen_matches_bruteforce_band_intersection(ray_session, tmp_path):
    """Verdict parity with an independent in-test computation: a today-doc
    hits band b iff some yesterday-doc shares its band-b key."""
    rng = np.random.RandomState(5)
    yesterday = _corpus(60, seed=1)
    today = ([t for t in yesterday[:10]]                 # exact reposts
             + [_edit(t, rng) for t in yesterday[10:25]]  # near-dups
             + _corpus(25, seed=2, prefix="fresh "))      # new docs
    idx = MinhashIndex(str(tmp_path / "idx"), min_bands=1)
    idx.commit(_ds(pd.DataFrame({"doc_id": np.arange(60), "text": yesterday})),
               "doc_id", "text")
    assert idx.n_keys > 0

    out = (MinhashIndex(str(tmp_path / "idx"), min_bands=1)
           .screen(_ds(pd.DataFrame({"doc_id": np.arange(50), "text": today})),
                   "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    hist = np.unique(band_key_matrix(yesterday).ravel())
    tk = band_key_matrix(today)
    expect_hits = np.isin(tk, hist).sum(axis=1)
    np.testing.assert_array_equal(out["n_hit_bands"].to_numpy(), expect_hits)
    np.testing.assert_array_equal(out["known_neardup"].to_numpy(), expect_hits >= 1)
    # exact reposts collide on EVERY band; genuinely fresh docs on none
    assert (out["n_hit_bands"].to_numpy()[:10] == 16).all()
    assert (~out["known_neardup"].to_numpy()[35:]).all()
    # at least one planted near-dup is caught (deterministic given seeds)
    assert out["known_neardup"].to_numpy()[10:25].any()


def test_filter_new_drops_and_commit_is_idempotent(ray_session, tmp_path):
    docs = _corpus(40, seed=3)
    d = str(tmp_path / "idx")
    idx = MinhashIndex(d)
    run1 = _ds(pd.DataFrame({"doc_id": np.arange(40), "text": docs}))
    idx.commit(run1, "doc_id", "text")
    k1 = idx.n_keys
    # same run again: filter_new drops everything; re-commit adds no keys
    idx2 = MinhashIndex(d)
    fresh = idx2.filter_new(run1, "doc_id", "text").to_pandas()
    assert len(fresh) == 0
    idx2.commit(run1, "doc_id", "text")
    assert MinhashIndex(d).n_keys == k1  # union of identical key sets
    # compaction to one generation preserves membership
    compact(d)
    gens = [g for g in os.listdir(d) if g.startswith("gen-")]
    assert len(gens) == 1
    assert MinhashIndex(d).n_keys == k1


def test_uncommitted_generation_invisible(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    idx = MinhashIndex(d)
    idx.commit(_ds(pd.DataFrame({"doc_id": [0], "text": ["one doc here now"]})),
               "doc_id", "text")
    k = MinhashIndex(d).n_keys
    # a crashed writer: directory without the _GEN marker
    os.makedirs(os.path.join(d, "gen-99"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"key": pa.array([123], type=pa.int64())}),
                   os.path.join(d, "gen-99", "keys-0000.parquet"))
    assert MinhashIndex(d).n_keys == k


def test_param_mismatch_refuses_to_open(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    MinhashIndex(d, bands=16).commit(
        _ds(pd.DataFrame({"doc_id": [0], "text": ["some text goes here"]})),
        "doc_id", "text")
    with pytest.raises(ValueError, match="incomparable"):
        MinhashIndex(d, bands=8)


def test_md5_mode_string_keys(ray_session, tmp_path):
    """The SQL-replayable key mode: string keys ride the same store."""
    docs = _corpus(20, seed=9)
    d = str(tmp_path / "idx")
    idx = MinhashIndex(d, hash_fn="md5", bands=8)
    idx.commit(_ds(pd.DataFrame({"doc_id": np.arange(20), "text": docs})),
               "doc_id", "text")
    out = (MinhashIndex(d, hash_fn="md5", bands=8)
           .screen(_ds(pd.DataFrame({"doc_id": [0, 1], "text": [docs[0], "zzz qqq"]})),
                   "doc_id", "text")
           .to_pandas().sort_values("doc_id"))
    assert out["n_hit_bands"].tolist()[0] == 8   # exact repost: all bands
    assert out["n_hit_bands"].tolist()[1] == 0
