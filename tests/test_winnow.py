"""Winnowing fingerprints: rolling-hash kernel vs direct polynomial,
rightmost-min selection vs a naive loop, the winnowing guarantee (any
shared substring of length >= w + k - 1 yields a shared fingerprint),
and candidate pairing over a Ray Dataset."""

import numpy as np
import pandas as pd

from data_quality_ray.dedup.winnow import (
    _rk_gram_hashes,
    winnow_fingerprints,
    winnow_select,
)


def test_rolling_hash_matches_direct_polynomial():
    rng = np.random.RandomState(1)
    alphabet = list("abcdef ghé𝔘")
    for _ in range(25):
        s = "".join(rng.choice(alphabet, size=rng.randint(1, 50)))
        for k in (3, 5, 8):
            h = _rk_gram_hashes(s, k)
            cps = [ord(c) for c in s]
            m = len(cps) - k + 1
            exp = []
            for i in range(max(0, m)):
                v = 0
                for j in range(k):
                    v = (v * 1000003 + cps[i + j]) % (1 << 64)
                exp.append(v)
            assert h.tolist() == exp


def test_winnow_select_matches_naive_rightmost_min():
    rng = np.random.RandomState(2)
    for _ in range(300):
        n = rng.randint(0, 25)
        h = rng.randint(0, 8, size=n).astype(np.uint64)  # heavy ties
        w = rng.randint(1, 7)
        got = winnow_select(h, w).tolist()
        if n == 0:
            assert got == []
            continue
        ww = min(w, n)
        sel = set()
        for s0 in range(n - ww + 1):
            win = h[s0:s0 + ww]
            mn = win.min()
            sel.add(s0 + max(i for i in range(ww) if win[i] == mn))
        assert got == sorted(sel)


def test_winnowing_guarantee_shared_substring():
    # Schleimer et al. guarantee: a shared substring of length
    # >= w + k - 1 produces at least one shared (hash) fingerprint.
    k, w = 5, 4
    shared = "the quick brown fox jumps over"  # len 30 >= 8
    a = "prefix junk text " + shared + " alpha ending"
    b = "completely other start " + shared + " zzz"
    _, ha = winnow_fingerprints(a, k=k, w=w)
    _, hb = winnow_fingerprints(b, k=k, w=w)
    assert set(ha.tolist()) & set(hb.tolist())


def test_winnow_short_and_empty_texts():
    for t in ("", "abcd", None):  # fewer than k=5 chars -> no grams
        p, h = winnow_fingerprints(t, k=5, w=4)
        assert len(p) == 0 and len(h) == 0
    p, h = winnow_fingerprints("abcde", k=5, w=4)  # exactly one gram
    assert p.tolist() == [1] and len(h) == 1


def test_winnow_candidates_dataset(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.winnow import winnow_candidates

    base = "the quick brown fox jumps over the lazy dog again and again"
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [base,
                 "INTRO " + base + " OUTRO",   # containment pair with 0
                 "totally unrelated content about pyarrow datasets",
                 "short"],
    })
    out = winnow_candidates(rd.from_pandas(df).repartition(3), "doc_id",
                            "text", k=5, w=4, min_shared=3)
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert all(p in {(0, 1)} or 2 not in p for p in pairs)
    # md5 and stable hash modes select the same POSITIONS distribution-
    # free property is not guaranteed (different hash order), but both
    # must flag the planted containment pair
    out_md5 = winnow_candidates(rd.from_pandas(df).repartition(3), "doc_id",
                                "text", k=5, w=4, min_shared=3,
                                hash_fn="md5")
    assert (0, 1) in set(zip(out_md5["id_a"], out_md5["id_b"]))


def test_winnow_candidates_dataset_route_equals_pandas(ray_session):
    """output='dataset' (per-pair grouped sum + min_shared filter as one
    more keyed exchange, no driver pair frame) must equal the collected
    route on a corpus with real cross-bucket shared counts."""
    import ray.data as rd

    from data_quality_ray.dedup.winnow import winnow_candidates

    rng = np.random.default_rng(5)
    vocab = np.array([f"tok{i}" for i in range(400)])
    texts = [" ".join(vocab[rng.integers(0, 400, 40)]) for _ in range(150)]
    for i in range(0, 150, 10):       # planted containment pairs
        j = int(rng.integers(0, 150))
        texts[i] = texts[j] + " tail words here"
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64),
                       "text": texts})
    ds = rd.from_pandas(df).repartition(4)
    a = winnow_candidates(ds, "doc_id", "text", k=5, w=4, min_shared=2)
    b = (winnow_candidates(ds, "doc_id", "text", k=5, w=4, min_shared=2,
                           output="dataset").to_pandas()
         .sort_values(["id_a", "id_b"], kind="mergesort")
         .reset_index(drop=True))
    key = lambda d: sorted(map(tuple, d[["id_a", "id_b", "shared"]].to_numpy()))
    assert key(a) == key(b)
    assert len(a) > 0
