"""Vectorized pair-batch matcher kernels.

The scalar kernels in ``matchers.py`` are the semantics reference
(parity-pinned to the reference's AbstractAttributeMatcherTest table);
these compute the SAME scores for MANY string pairs at once, vectorized
across the pair axis — the generalization of ``levenshtein_pairs_fixed``
(one DP cell = one numpy op over all pairs) to variable-length strings,
plus Jaro / Jaro-Winkler. Used inside blocked self-joins
(``dedup/blocking.blocked_pairs``) where a block emits thousands of
pairs: per-pair Python costs ~10 µs/score; these cost ~L² numpy ops per
whole batch.

Null semantics match ``match_score`` (AbstractAttributeMatcher
.getMatchingWeight:60-80 — empty strings are nulls, isNullOrEmpty:323).
"""

from __future__ import annotations

import numpy as np

from .matchers import MATCHERS, match_score

# kernels with a vectorized pair-batch implementation
VEC_MATCHERS = {"EXACT", "EXACT_IGNORE_CASE", "LEVENSHTEIN", "JARO", "JARO_WINKLER"}


def _encode(strs, pad: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, Lmax) int32 code-point matrix (padded with ``pad`` — use
    DIFFERENT pads for the two sides so padding never matches) + lengths."""
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=len(strs))
    L = int(lens.max()) if len(lens) else 0
    out = np.full((len(strs), max(L, 1)), pad, dtype=np.int32)
    for i, s in enumerate(strs):
        if s:
            out[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int32)
    return out, lens


def levenshtein_pairs(a_strs, b_strs) -> np.ndarray:
    """Edit distances for n variable-length pairs: one full DP vectorized
    across the pair axis; each pair's answer is read off at its own
    (len_a, len_b) cell, so per-pair padding never leaks in."""
    n = len(a_strs)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    A, la = _encode(a_strs, pad=-1)
    B, lb = _encode(b_strs, pad=-2)
    La, Lb = A.shape[1], B.shape[1]
    res = np.empty(n, dtype=np.int64)
    res[la == 0] = lb[la == 0]
    prev = np.broadcast_to(np.arange(Lb + 1), (n, Lb + 1)).copy()
    for i in range(1, La + 1):
        cur = np.empty((n, Lb + 1), dtype=np.int64)
        cur[:, 0] = i
        sub = prev[:, :-1] + (A[:, i - 1][:, None] != B)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub[:, j - 1])
        prev = cur
        done = la == i
        if done.any():
            res[done] = cur[done, lb[done]]
    return res


def levenshtein_pairs_bounded(a_strs, b_strs, k: int) -> np.ndarray:
    """Edit distances CAPPED at ``k``: exact value where it is ≤ k, else
    ``k + 1``. Ukkonen diagonal band vectorized across the pair axis —
    only the 2k+1 cells within ``|i − j| ≤ k`` are computed per row, so
    the work is O(Lmax · k · n) instead of ``levenshtein_pairs``'s
    O(Lmax² · n): at k=2 over ~33-char strings that is ~6× fewer numpy
    ops (the fuzzy-join hot path). Cells are min-capped at k+1 each row
    (capping is monotone-safe), and the answer reads off each pair's own
    (len_a, len_b) diagonal."""
    n = len(a_strs)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if k < 0:
        raise ValueError("k must be >= 0")
    A, la = _encode(a_strs, pad=-1)
    B, lb = _encode(b_strs, pad=-2)
    La, Lb = A.shape[1], B.shape[1]
    big = np.int64(k + 1)
    res = np.full(n, big, dtype=np.int64)
    res[la == 0] = np.minimum(lb[la == 0], big)
    width = 2 * k + 1
    prev = np.full((n, width), big, dtype=np.int64)
    prev[:, k:] = np.arange(k + 1)  # row 0: cell (0, j) = j for j ≤ k
    readable = np.abs(la - lb) <= k
    for i in range(1, La + 1):
        cur = np.full((n, width), big, dtype=np.int64)
        for d in range(width):
            j = i + d - k
            if j < 0 or j > Lb:
                continue
            if j == 0:
                if i <= k:
                    cur[:, d] = i
                continue
            best = prev[:, d] + (A[:, i - 1] != B[:, j - 1])
            if d + 1 < width:
                np.minimum(best, prev[:, d + 1] + 1, out=best)
            if d > 0:
                np.minimum(best, cur[:, d - 1] + 1, out=best)
            np.minimum(best, big, out=cur[:, d])
        prev = cur
        done = (la == i) & readable
        if done.any():
            res[done] = cur[done, lb[done] - i + k]
    return res


def levenshtein_sim_pairs(a_strs, b_strs) -> np.ndarray:
    la = np.fromiter((len(s) for s in a_strs), dtype=np.int64, count=len(a_strs))
    lb = np.fromiter((len(s) for s in b_strs), dtype=np.int64, count=len(b_strs))
    mx = np.maximum(la, lb)
    d = levenshtein_pairs(a_strs, b_strs)
    return np.where(mx == 0, 1.0, 1.0 - d / np.maximum(mx, 1))


def jaro_pairs(a_strs, b_strs) -> np.ndarray:
    """Jaro similarity for n pairs — greedy window matching and the
    transposition count both vectorized across pairs (the (i, j) double
    loop runs over MAX lengths; each step is one boolean op per pair)."""
    n = len(a_strs)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    A, la = _encode(a_strs, pad=-1)
    B, lb = _encode(b_strs, pad=-2)
    La, Lb = A.shape[1], B.shape[1]
    w = np.maximum(la, lb) // 2 - 1
    matched_a = np.zeros((n, La), dtype=bool)
    matched_b = np.zeros((n, Lb), dtype=bool)
    for i in range(La):
        found = la <= i
        ji = np.arange(Lb)
        lo, hi = i - w, i + w + 1  # per-pair window
        for j in range(Lb):
            cand = (~found) & (j >= lo) & (j < hi) & (~matched_b[:, j]) & (A[:, i] == B[:, j])
            if cand.any():
                matched_b[:, j] |= cand
                matched_a[:, i] |= cand
                found |= cand
    m = matched_a.sum(axis=1)
    Mmax = int(m.max()) if n else 0
    t = np.zeros(n, dtype=np.int64)
    if Mmax:
        bufA = np.zeros((n, Mmax), dtype=np.int32)
        bufB = np.full((n, Mmax), -9, dtype=np.int32)
        r, c = np.nonzero(matched_a)
        bufA[r, (np.cumsum(matched_a, axis=1) - 1)[r, c]] = A[r, c]
        r, c = np.nonzero(matched_b)
        bufB[r, (np.cumsum(matched_b, axis=1) - 1)[r, c]] = B[r, c]
        t = ((bufA != bufB) & (np.arange(Mmax) < m[:, None])).sum(axis=1) // 2
    with np.errstate(divide="ignore", invalid="ignore"):
        j3 = (m / la + m / lb + (m - t) / m) / 3.0
    out = np.where(m == 0, 0.0, j3)
    out = np.where((la == 0) | (lb == 0), 0.0, out)
    eq = np.fromiter((a == b for a, b in zip(a_strs, b_strs)), dtype=bool, count=n)
    return np.where(eq, 1.0, out)


def jaro_winkler_pairs(a_strs, b_strs, p: float = 0.1) -> np.ndarray:
    j = jaro_pairs(a_strs, b_strs)
    n = len(a_strs)
    A, la = _encode(a_strs, pad=-1)
    B, lb = _encode(b_strs, pad=-2)
    prefix = np.zeros(n, dtype=np.int64)
    run = np.ones(n, dtype=bool)
    for i in range(min(4, A.shape[1], B.shape[1])):
        run &= (i < la) & (i < lb) & (A[:, i] == B[:, i])
        prefix += run
    return np.where(j > 0.7, j + prefix * p * (1 - j), j)


def batch_match_score(a_vals: np.ndarray, b_vals: np.ndarray, matcher="LEVENSHTEIN",
                      null_option: str = "nullMatchNull") -> np.ndarray:
    """``match_score`` over pair arrays. Vectorized kernels for the
    common record-linkage matchers; everything else (phonetics, LCS,
    Q-grams, CUSTOM callables) falls back to the scalar kernel with a
    per-distinct-pair memo."""
    n = len(a_vals)
    out = np.empty(n, dtype=np.float64)
    a_null = np.fromiter((v is None or v == "" for v in a_vals), dtype=bool, count=n)
    b_null = np.fromiter((v is None or v == "" for v in b_vals), dtype=bool, count=n)
    anynull = a_null | b_null
    if null_option == "nullMatchNull":
        out[anynull] = (a_null & b_null)[anynull].astype(np.float64)
    elif null_option == "nullMatchAll":
        out[anynull] = 1.0
    else:
        out[anynull] = 0.0
    live = ~anynull
    if not live.any():
        return out
    al = [str(v) for v in a_vals[live]]
    bl = [str(v) for v in b_vals[live]]
    if matcher == "EXACT":
        out[live] = np.fromiter((x == y for x, y in zip(al, bl)), dtype=np.float64, count=len(al))
    elif matcher == "EXACT_IGNORE_CASE":
        out[live] = np.fromiter((x.lower() == y.lower() for x, y in zip(al, bl)),
                                dtype=np.float64, count=len(al))
    elif matcher == "LEVENSHTEIN":
        out[live] = levenshtein_sim_pairs(al, bl)
    elif matcher == "JARO":
        out[live] = jaro_pairs(al, bl)
    elif matcher == "JARO_WINKLER":
        out[live] = jaro_winkler_pairs(al, bl)
    else:
        fn = MATCHERS[matcher] if isinstance(matcher, str) else matcher
        memo: dict = {}
        vals = np.empty(len(al), dtype=np.float64)
        for i, (x, y) in enumerate(zip(al, bl)):
            k = (x, y)
            v = memo.get(k)
            if v is None:
                v = memo[k] = float(fn(x, y))
            vals[i] = v
        out[live] = vals
    return out


def batch_match_score_ref_parity(n_samples: int = 300, seed: int = 0) -> bool:
    """Self-check helper used by tests: random pairs through both the
    scalar and batch kernels for every vectorized matcher."""
    rng = np.random.RandomState(seed)
    alphabet = list("abcdefgh ")
    pool = ["".join(rng.choice(alphabet, size=rng.randint(0, 12))) for _ in range(60)]
    pool += ["", None, "café", "ÉLÉMENT élan", "東京 都"]
    a = rng.choice(np.array(pool, dtype=object), size=n_samples)
    b = rng.choice(np.array(pool, dtype=object), size=n_samples)
    for m in sorted(VEC_MATCHERS):
        batch = batch_match_score(a, b, m)
        scal = np.array([match_score(x, y, m) for x, y in zip(a, b)])
        if not np.allclose(batch, scal, atol=1e-12):
            bad = np.nonzero(~np.isclose(batch, scal))[0][:5]
            raise AssertionError((m, [(a[i], b[i], batch[i], scal[i]) for i in bad]))
    return True
