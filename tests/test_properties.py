"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just fixtures.

The central one: the vectorized short-circuit chain applied to a batch
must decide every row exactly as a row-at-a-time application (the
reference's per-record execution shape) — batching is an optimization,
never a semantic.
"""

import duckdb
from datetime import date
import numpy as np
from hypothesis import given, settings, strategies as st

from data_quality_ray.functions import matchers as M
from data_quality_ray.functions.text import unique_apply
from data_quality_ray.pipelines.quality_filter import build_image_chain
from data_quality_ray.profiling.sketches import HyperLogLog

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFFF),
    max_size=80,
)
texts_st = st.lists(st.one_of(st.none(), text_st), min_size=1, max_size=30)


@settings(max_examples=40, deadline=None)
@given(texts_st)
def test_chain_batch_equals_rowwise(values):
    engine = build_image_chain()
    batch = engine.apply(np.array(values, dtype=object))
    for i, v in enumerate(values):
        row = engine.apply(np.array([v], dtype=object))
        assert batch.verdict[i] == row.verdict[0], v
        assert batch.first_rule[i] == row.first_rule[0], v
        assert batch.values[i] == row.values[0], v


ascii_st = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20)


@settings(max_examples=60, deadline=None)
@given(ascii_st, ascii_st)
def test_levenshtein_matches_duckdb_random(a, b):
    con = duckdb.connect()
    exp = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
    assert M.levenshtein_distance(a, b) == exp


ascii_nonempty_st = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                            min_size=1, max_size=20)


@settings(max_examples=60, deadline=None)
@given(ascii_nonempty_st, ascii_nonempty_st)
def test_jaro_winkler_matches_duckdb_random(a, b):
    """Parity on non-empty strings. (Deliberate divergence on empties:
    DuckDB scores jaro_winkler('','') = 0; this matcher keeps identity
    semantics a==b → 1.0 like the reference's exact-equality fast path.)"""
    con = duckdb.connect()
    exp = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert abs(M.jaro_winkler(a, b) - exp) < 1e-9


@settings(max_examples=30, deadline=None)
@given(st.lists(ascii_st, min_size=0, max_size=200), st.integers(1, 5))
def test_hll_merge_partition_invariant(values, n_parts):
    """Merging per-partition HLLs == one HLL over everything, for any
    partitioning."""
    arr = np.array(values, dtype=object)
    whole = HyperLogLog(p=8)
    if len(arr):
        whole.update_array(arr)
    merged = HyperLogLog(p=8)
    for part in np.array_split(arr, n_parts):
        h = HyperLogLog(p=8)
        if len(part):
            h.update_array(part)
        merged.merge(h)
    assert merged.estimate() == whole.estimate()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), ascii_st), min_size=1, max_size=60))
def test_unique_apply_equals_direct_map(values):
    fn = lambda v: ("N" if v is None else v.upper() + "!")  # noqa: E731
    got = unique_apply(np.array(values, dtype=object), fn)
    assert got.tolist() == [fn(v) for v in values]


@settings(max_examples=40, deadline=None)
@given(ascii_st, ascii_st)
def test_matcher_bounds_and_symmetry(a, b):
    for name in ("LEVENSHTEIN", "JARO", "JARO_WINKLER", "Q_GRAMS", "LCS"):
        s = M.match_score(a, b, name)
        assert 0.0 <= s <= 1.0
        assert abs(s - M.match_score(b, a, name)) < 1e-9  # symmetric
        assert M.match_score(a, a, name) == 1.0


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
def test_scrub_chain_idempotent(s):
    """Applying the scrub chain twice equals once — a retried/reapplied
    scrub stage must never double-rewrite (task-retry safety)."""
    import numpy as np

    from data_quality_ray.rules import scrub as S

    def chain(v):
        a = np.array([v], dtype=object)
        return S.scrub_phone(S.scrub_ssn(S.scrub_email(S.scrub_toxic(a))))[0]

    once = chain(s)
    assert chain(once) == once


@given(st.dates(min_value=date(1900, 1, 1), max_value=date(2100, 12, 31)))
@settings(max_examples=200, deadline=None)
def test_chronology_round_trips(d):
    """Every chronology is an exact bijection on its domain."""
    from data_quality_ray.functions import chronology as CH

    for name, (to_fn, from_fn) in CH.CHRONOLOGIES.items():
        assert from_fn(*to_fn(d)) == d, name
    if d >= date(1868, 10, 23):
        era, y, m, dd = CH.to_japanese(d)
        assert CH.from_japanese(era, y, m, dd) == d


@given(st.dates(min_value=date(1912, 1, 1), max_value=date(2100, 12, 31)),
       st.sampled_from(["ThaiBuddhist", "Minguo", "Hijrah", "Japanese"]))
@settings(max_examples=150, deadline=None)
def test_chrono_converter_round_trip_property(d, chrono):
    """ISO → chronology string → ISO is the identity within each
    chronology's positive-era domain (pre-era dates render proleptic
    negative years the digit patterns can't re-parse — Java models those
    with distinct BEFORE eras; out of scope here)."""
    from data_quality_ray.functions.chronology import ChronoDateConverter

    iso = d.isoformat()
    out_pat = "yyyy-MM-dd G" if chrono == "Japanese" else "yyyy-MM-dd"
    fwd = ChronoDateConverter("yyyy-MM-dd", out_pat, "Iso", chrono)
    back = ChronoDateConverter(out_pat, "yyyy-MM-dd", chrono, "Iso")
    rendered = fwd.convert(iso)
    assert rendered not in ("", None)
    assert back.convert(rendered) == iso, (iso, chrono, rendered)


@given(st.lists(st.tuples(st.text(max_size=24), st.text(max_size=24)),
                min_size=1, max_size=60))
@settings(max_examples=40, deadline=None)
def test_batch_kernels_match_scalar_random_unicode(pairs):
    """Property: the vectorized pair kernels equal the scalar kernels on
    arbitrary unicode (astral planes included) for every vectorized
    matcher, including empty-as-null semantics."""
    from data_quality_ray.functions.matchers import match_score
    from data_quality_ray.functions.matchers_vec import VEC_MATCHERS, batch_match_score

    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    for m in sorted(VEC_MATCHERS):
        got = batch_match_score(a, b, m)
        exp = [match_score(x, y, m) for x, y in zip(a, b)]
        assert np.allclose(got, exp, atol=1e-12), m


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=2, max_size=80))
@settings(max_examples=40, deadline=None)
def test_hamming_pairs_property(vals):
    from data_quality_ray.dedup.simhash import hamming64, hamming64_pairs

    arr = np.array(vals, dtype=np.uint64)
    a, b = arr[:-1], arr[1:]
    got = hamming64_pairs(a, b)
    assert (got == [hamming64(int(x), int(y)) for x, y in zip(a, b)]).all()


@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=120),
       st.integers(min_value=2, max_value=5))
@settings(max_examples=40, deadline=None)
def test_kmv_merge_partition_invariant(values, n_parts):
    # the k-min set is partition-invariant: any split of the stream,
    # sketched and merged, equals the one-shot sketch
    from data_quality_ray.profiling.sketches import KMinValues

    import numpy as np

    one = KMinValues(k=16)
    one.update_array(np.array(values, dtype=object))
    merged = KMinValues(k=16)
    for i in range(n_parts):
        part = KMinValues(k=16)
        part.update_array(np.array(values[i::n_parts], dtype=object))
        merged.merge(part)
    assert (one.vals == merged.vals).all()


def test_kmv_jaccard_exact_when_k_covers():
    # k ≥ |union| → the sketch IS the union and jaccard is exact
    from data_quality_ray.profiling.sketches import KMinValues

    import numpy as np

    a = KMinValues(k=64)
    b = KMinValues(k=64)
    a.update_array(np.array([f"u{i}" for i in range(20)], dtype=object))
    b.update_array(np.array([f"u{i}" for i in range(10, 30)], dtype=object))
    n_both, k_eff = a.jaccard(b)
    assert (n_both, k_eff) == (10, 30)
