"""Sorted-neighborhood pair generation (dedup/snm.py): brute-force
window parity, halo coverage across partition boundaries, pair
uniqueness, and the bounded-distance filter."""

import numpy as np
import pandas as pd

from data_quality_ray.dedup.snm import snm_pairs


def _brute(df, id_col, key_col, window, max_dist=None):
    from data_quality_ray.functions.matchers_vec import levenshtein_pairs

    r = df.sort_values([key_col, id_col], kind="mergesort").reset_index(drop=True)
    rows = []
    for i in range(len(r)):
        for j in range(i + 1, min(i + window, len(r))):
            lev = int(levenshtein_pairs(
                np.array([r[key_col].iloc[i]], object),
                np.array([r[key_col].iloc[j]], object))[0])
            if max_dist is None or lev <= max_dist:
                rows.append((r[id_col].iloc[i], r[id_col].iloc[j], lev))
    return (pd.DataFrame(rows, columns=["id_a", "id_b", "lev"])
            .astype({"lev": "int64"})
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def _mk(n, seed=0):
    rng = np.random.default_rng(seed)
    words = ["alpha", "alpah", "alphz", "beta", "betta", "gamma",
             "gamna", "delta", "delfa", "omega"]
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": [words[rng.integers(len(words))] + str(rng.integers(4))
              for _ in range(n)],
    })


def test_snm_matches_bruteforce(ray_session):
    import ray.data as rd

    df = _mk(60, seed=1)
    out = snm_pairs(rd.from_pandas(df).repartition(5), "id", "k",
                    window=4, n_parts=6)
    exp = _brute(df, "id", "k", window=4)
    pd.testing.assert_frame_equal(out, exp)


def test_snm_halo_covers_partition_boundaries(ray_session):
    import ray.data as rd

    # keys in sorted order → every window pair straddles some boundary
    # when n_parts is large relative to n
    df = pd.DataFrame({"id": np.arange(20, dtype=np.int64),
                       "k": [f"key{i:03d}" for i in range(20)]})
    out = snm_pairs(rd.from_pandas(df).repartition(4), "id", "k",
                    window=3, n_parts=7)
    exp = _brute(df, "id", "k", window=3)
    pd.testing.assert_frame_equal(out, exp)
    # each pair exactly once
    assert not out.duplicated(["id_a", "id_b"]).any()


def test_snm_max_dist_filters(ray_session):
    import ray.data as rd

    df = _mk(40, seed=2)
    all_pairs = snm_pairs(rd.from_pandas(df), "id", "k", window=5, n_parts=4)
    capped = snm_pairs(rd.from_pandas(df), "id", "k", window=5,
                       max_dist=2, n_parts=4)
    exp = (all_pairs[all_pairs["lev"] <= 2]
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(capped, exp)


def test_snm_tiny_input(ray_session):
    import ray.data as rd

    assert snm_pairs(rd.from_pandas(pd.DataFrame(
        {"id": [1], "k": ["x"]})), "id", "k").empty
    out = snm_pairs(rd.from_pandas(pd.DataFrame(
        {"id": np.array([1, 2], dtype=np.int64), "k": ["ab", "ac"]})),
        "id", "k", window=3)
    assert out.to_dict("records") == [{"id_a": 1, "id_b": 2, "lev": 1}]


def test_snm_multipass_union_and_agreement(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.snm import snm_multipass

    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "k": ["abcd", "abce", "zzzz", "qabc", "rabc", "mmmm"],
    })

    def add_rev(b):
        b = b.copy()
        b["rk"] = [v[::-1] for v in b["k"]]
        return b

    ds = rd.from_pandas(df).map_batches(add_rev, batch_format="pandas")
    out = snm_multipass(ds, "id", ["k", "rk"], window=2, max_dist=1)
    recs = {(r.id_a, r.id_b): (r.lev, r.n_passes)
            for r in out.itertuples()}
    # (abcd, abce): adjacent under BOTH sorts (forward and reversed
    # differ in last/first char → lev 1) — forward pass finds it;
    # (qabc, rabc): reversed keys cbaq/cbar adjacent → pass 2 finds it,
    # forward sort also places them adjacent (q < r) → 2 passes
    assert (0, 1) in recs
    assert (3, 4) in recs
    assert recs[(3, 4)][0] == 1
    # every pair normalized id_a < id_b and counted once per pass max
    assert (out["id_a"] < out["id_b"]).all()
    assert (out["n_passes"] <= 2).all()
