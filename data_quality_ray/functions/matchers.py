"""Attribute matchers — string-pair similarity kernels ∈ [0,1].

Rebuild of the reference's attribute-matcher family
(dataquality-record-linkage constant/AttributeMatcherType.java:26-42,
attribute/*.java): EXACT, EXACT_IGNORE_CASE, LEVENSHTEIN, JARO,
JARO_WINKLER, Q_GRAMS, HAMMING, LCS, SOUNDEX, METAPHONE(simplified),
FINGERPRINTKEY. Null-handling options mirror
IAttributeMatcher.java:24-28 (nullMatchNull / nullMatchAll / nullMatchNone
— AbstractAttributeMatcher.getMatchingWeight:40-62).

These are per-pair scalar kernels meant to run *inside* blocked groups
(``groupby(block_key).map_groups``) where group sizes are bounded — never
as an unblocked cross join.

`levenshtein_distance` matches DuckDB's `levenshtein()` (plain edit
distance, unit costs) so DuckDB can act as the oracle.
"""

from __future__ import annotations

import numpy as np

from .text import fingerprint_key_one


def levenshtein_distance(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def levenshtein_pairs_fixed(a_codes: np.ndarray, b_codes: np.ndarray) -> np.ndarray:
    """Vectorized edit distance for MANY pairs of equal-fixed-length
    strings at once: ``a_codes``/``b_codes`` are (n_pairs, L) integer
    char-code matrices. One (L+1)×(L+1) DP run with every cell vectorized
    across the pair axis — used inside blocked self-joins where a block
    guarantees a common prefix (lev(p+a, p+b) == lev(a, b)), turning
    500k scalar DPs into ~L² numpy ops."""
    n, L = a_codes.shape
    prev = np.broadcast_to(np.arange(L + 1), (n, L + 1)).copy()
    for i in range(1, L + 1):
        cur = np.empty((n, L + 1), dtype=np.int64)
        cur[:, 0] = i
        ai = a_codes[:, i - 1][:, None]
        sub = prev[:, :-1] + (ai != b_codes)
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub[:, j - 1])
        prev = cur
    return prev[:, -1]


def levenshtein_sim(a: str, b: str) -> float:
    n = max(len(a), len(b))
    return 1.0 if n == 0 else 1.0 - levenshtein_distance(a, b) / n


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


def jaro_winkler(a: str, b: str, p: float = 0.1) -> float:
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * p * (1 - j)


def hamming_sim(a: str, b: str) -> float:
    if len(a) != len(b):
        return 0.0
    if not a:
        return 1.0
    return sum(x == y for x, y in zip(a, b)) / len(a)


def qgrams_sim(a: str, b: str, q: int = 3) -> float:
    def grams(s: str) -> dict:
        s = ("#" * (q - 1)) + s + ("#" * (q - 1))
        out: dict[str, int] = {}
        for i in range(len(s) - q + 1):
            g = s[i : i + q]
            out[g] = out.get(g, 0) + 1
        return out

    ga, gb = grams(a), grams(b)
    inter = sum(min(n, gb.get(g, 0)) for g, n in ga.items())
    total = sum(ga.values()) + sum(gb.values())
    return 2 * inter / total if total else 1.0


def lcs_sim(a: str, b: str) -> float:
    """Longest common SUBSTRING (contiguous, over code points) / max
    code-point length — LCSMatcher.getWeight + longestSubstr semantics
    (attribute/LCSMatcher.java; NOT the subsequence LCS). Vectorized DP:
    one numpy row per char of ``a``."""
    if not a or not b:
        return 1.0 if a == b else 0.0
    bb = np.array([ord(c) for c in b], dtype=np.int64)
    prev = np.zeros(len(bb), dtype=np.int64)
    shifted = np.zeros(len(bb), dtype=np.int64)
    best = 0
    for ca in a:
        eq = bb == ord(ca)
        shifted[0] = 0
        shifted[1:] = prev[:-1]
        cur = np.where(eq, shifted + 1, 0)
        m = int(cur.max())
        if m > best:
            best = m
        prev = cur
    return best / max(len(a), len(b))


def soundex(s: str) -> str:
    """Classic 4-char American Soundex."""
    s = "".join(c for c in s.upper() if c.isalpha())
    if not s:
        return ""
    codes = {**dict.fromkeys("BFPV", "1"), **dict.fromkeys("CGJKQSXZ", "2"),
             **dict.fromkeys("DT", "3"), "L": "4", **dict.fromkeys("MN", "5"), "R": "6"}
    out = s[0]
    prev = codes.get(s[0], "")
    for c in s[1:]:
        code = codes.get(c, "")
        if code and code != prev:
            out += code
        if c not in "HW":
            prev = code
    return (out + "000")[:4]


def exact(a: str, b: str) -> float:
    return 1.0 if a == b else 0.0


def exact_ignore_case(a: str, b: str) -> float:
    return 1.0 if (a or "").lower() == (b or "").lower() else 0.0


def soundex_sim(a: str, b: str) -> float:
    """difference(soundex(a), soundex(b)) / 4 — the reference's
    SoundexMatcher.getWeight (commons Soundex.difference), NOT a plain
    code-equality test. Letters outside A–Z make commons Soundex throw
    and the matcher catch → 0.0; replicated here."""
    from .phonetics import sc_difference

    for s in (a, b):
        if any(c.isalpha() and not ("A" <= c.upper() <= "Z") for c in s):
            return 0.0
    return sc_difference(soundex(a), soundex(b)) / 4.0


def fingerprint_sim(a: str, b: str) -> float:
    return 1.0 if fingerprint_key_one(a) == fingerprint_key_one(b) else 0.0


def _phonetic_sims():
    from .phonetics import double_metaphone_sim, metaphone_sim, soundex_fr_sim

    return metaphone_sim, double_metaphone_sim, soundex_fr_sim


_METAPHONE_SIM, _DOUBLE_METAPHONE_SIM, _SOUNDEX_FR_SIM = _phonetic_sims()

MATCHERS = {
    "EXACT": exact,
    "EXACT_IGNORE_CASE": exact_ignore_case,
    "LEVENSHTEIN": levenshtein_sim,
    "JARO": jaro,
    "JARO_WINKLER": jaro_winkler,
    "Q_GRAMS": qgrams_sim,
    "HAMMING": hamming_sim,
    "LCS": lcs_sim,
    "SOUNDEX": soundex_sim,
    # difference/max-code-length weights (MetaphoneMatcher.java:33-47,
    # DoubleMetaphoneMatcher.java:33-47, SoundexFRMatcher.java:52-63)
    "METAPHONE": _METAPHONE_SIM,
    "DOUBLE_METAPHONE": _DOUBLE_METAPHONE_SIM,
    "SOUNDEX_FR": _SOUNDEX_FR_SIM,
    "FINGERPRINTKEY": fingerprint_sim,
}


def match_score(a: str | None, b: str | None, matcher="LEVENSHTEIN", null_option="nullMatchNull") -> float:
    """Null semantics per AbstractAttributeMatcher.getMatchingWeight:60-80
    — the frame treats EMPTY strings as null too (isNullOrEmpty:323)."""
    a_null = a is None or a == ""
    b_null = b is None or b == ""
    if a_null or b_null:
        if null_option == "nullMatchNull":
            return 1.0 if (a_null and b_null) else 0.0
        if null_option == "nullMatchAll":
            return 1.0
        return 0.0
    fn = MATCHERS[matcher] if isinstance(matcher, str) else matcher  # CUSTOM = callable
    return float(fn(a, b))


def weighted_record_score(scores: np.ndarray, weights: np.ndarray) -> float:
    """SimpleVSRRecordMatcher weighted sum (record/SimpleVSRRecordMatcher.java:29-65)."""
    w = np.asarray(weights, dtype=np.float64)
    return float((np.asarray(scores) * w).sum() / w.sum())


def _hungarian(cost: np.ndarray) -> list[tuple[int, int]]:
    """Exact minimum-cost assignment (Jonker-style augmenting-path O(n³))
    for the small token matrices this is used on (≤ ~32 tokens). Pure
    numpy — the environment has no scipy."""
    cost = np.asarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    transposed = n_rows > n_cols
    if transposed:
        cost = cost.T
        n_rows, n_cols = n_cols, n_rows
    INF = float("inf")
    u = np.zeros(n_rows + 1)
    v = np.zeros(n_cols + 1)
    p = np.zeros(n_cols + 1, dtype=int)  # p[j] = row assigned to col j (1-based)
    way = np.zeros(n_cols + 1, dtype=int)
    for i in range(1, n_rows + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n_cols + 1, INF)
        used = np.zeros(n_cols + 1, dtype=bool)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n_cols + 1):
                if not used[j]:
                    cur = cost[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n_cols + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    pairs = [(int(p[j]) - 1, j - 1) for j in range(1, n_cols + 1) if p[j] != 0]
    return [(c, r) for r, c in pairs] if transposed else pairs


def tokenized_score(a: str | None, b: str | None, mode: str = "ANYORDER",
                    matcher="JARO_WINKLER") -> float:
    """Token-level matching modes (TokenizedResolutionMethod.java:7-10,
    AbstractAttributeMatcher.:149-187):

    - NO: plain whole-string match
    - SAMEPLACE: position-aligned token pairs, averaged
    - SAMEORDER: tokens joined in order then matched
    - ANYORDER: optimal token assignment (Hungarian) regardless of order
    """
    if a is None or b is None:
        return match_score(a, b, matcher)
    if mode == "NO":
        return match_score(a, b, matcher)
    ta, tb = a.split(), b.split()
    if not ta or not tb:
        return match_score(a, b, matcher)
    if mode == "SAMEORDER":
        return match_score(" ".join(ta), " ".join(tb), matcher)
    if mode == "SAMEPLACE":
        n = max(len(ta), len(tb))
        return sum(
            match_score(ta[i] if i < len(ta) else None, tb[i] if i < len(tb) else None, matcher)
            for i in range(n)
        ) / n
    # ANYORDER — maximize total pairwise similarity via exact assignment
    sim = np.array([[match_score(x, y, matcher) for y in tb] for x in ta])
    pairs = _hungarian(1.0 - sim)
    total = sum(sim[r, c] for r, c in pairs)
    return total / max(len(ta), len(tb))


def record_score(rec_a: dict, rec_b: dict, attrs: list[dict]) -> float:
    """One match rule over a record pair: weighted sum of per-attribute
    matcher scores, with per-attribute blocking thresholds — an attribute
    scoring below its ``block_threshold`` short-circuits the rule to 0
    (SimpleVSRRecordMatcher.java:29-46). Each attr:
    {column, matcher, weight?, null_option?, block_threshold?}."""
    scores, weights = [], []
    for a in attrs:
        s = match_score(rec_a.get(a["column"]), rec_b.get(a["column"]),
                        a.get("matcher", "LEVENSHTEIN"), a.get("null_option", "nullMatchNull"))
        if s < a.get("block_threshold", 0.0):
            return 0.0
        scores.append(s)
        weights.append(a.get("weight", 1.0))
    return weighted_record_score(np.array(scores), np.array(weights))


def combined_record_score(rec_a: dict, rec_b: dict, rules: list[dict]) -> tuple[float, int]:
    """CombinedRecordMatcher (record/CombinedRecordMatcher.java): ordered
    rules OR'd — the FIRST rule whose score reaches its match threshold
    wins. Returns (score, winning_rule_index) or (best_score, -1)."""
    best = 0.0
    for i, rule in enumerate(rules):
        s = record_score(rec_a, rec_b, rule["attributes"])
        if s >= rule.get("match_threshold", 0.85):
            return s, i
        best = max(best, s)
    return best, -1
