"""Operator-level tests: matchers (vs DuckDB), converters, datetime
patterns, email chain, nested analyzer, sampling determinism, minhash/
simhash/embedding dedup, standardization, survivorship, blocking."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_quality_ray.functions import matchers as M
from data_quality_ray.functions import converters as C
from data_quality_ray.functions.datetime_patterns import date_pattern_of, is_date_str, is_time_str
from data_quality_ray.functions.text import (
    acronym_one, fingerprint_key_one, pattern_fingerprint_one, word_pattern_one,
)
from data_quality_ray.functions.typeinfer import dominant_type, infer_type_one


# ---------------------------------------------------------------------------
# matchers
# ---------------------------------------------------------------------------

PAIRS = [("martha", "marhta"), ("kitten", "sitting"), ("abc", "abc"), ("", "x"),
         ("dixon", "dicksonx"), ("Customer#001", "Customer#100")]


def test_levenshtein_matches_duckdb():
    con = duckdb.connect()
    for a, b in PAIRS:
        exp = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert M.levenshtein_distance(a, b) == exp, (a, b)


def test_jaro_winkler_matches_duckdb():
    con = duckdb.connect()
    for a, b in PAIRS:
        exp = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert abs(M.jaro_winkler(a, b) - exp) < 1e-9, (a, b)


def test_matcher_family():
    assert M.exact("a", "a") == 1.0 and M.exact("a", "b") == 0.0
    assert M.exact_ignore_case("AbC", "abc") == 1.0
    assert M.hamming_sim("karolin", "kathrin") == pytest.approx(4 / 7)
    # longest common SUBSTRING semantics (LCSMatcher.java): "ab" → 2/6
    assert M.lcs_sim("abcdef", "abdf") == pytest.approx(2 / 6)
    assert 0 < M.qgrams_sim("night", "nacht") < 1
    assert M.soundex("Robert") == "R163" and M.soundex("Rupert") == "R163"
    assert M.soundex_sim("Robert", "Rupert") == 1.0
    assert M.fingerprint_sim("The Dog", "dog the") == 1.0


def test_null_options():
    assert M.match_score(None, None, "EXACT", "nullMatchNull") == 1.0
    assert M.match_score(None, "x", "EXACT", "nullMatchNull") == 0.0
    assert M.match_score(None, "x", "EXACT", "nullMatchAll") == 1.0
    assert M.match_score(None, None, "EXACT", "nullMatchNone") == 0.0
    # blanks are nulls to the matcher frame (isNullOrEmpty:323)
    assert M.match_score("", "", "EXACT", "nullMatchNull") == 1.0
    assert M.match_score("", "x", "EXACT", "nullMatchNull") == 0.0
    # CUSTOM matcher = plain callable
    assert M.match_score("aa", "ab", lambda a, b: 0.5) == 0.5


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------


def test_converters():
    assert C.trim(np.array(["  x  ", None], dtype=object)).tolist() == ["x", None]
    # default mode: only repeated whitespace collapses (reference semantics)
    assert C.erase_duplicate_chars(np.array(["a  b\t\tc", "aaabbbc"], dtype=object)).tolist() == \
        ["a b\tc", "aaabbbc"]
    assert C.erase_duplicate_chars(np.array(["011111123"], dtype=object), repeat_char="1").tolist() == ["0123"]
    assert C.collapse_all_repeats(np.array(["aaabbbc"], dtype=object)).tolist() == ["abc"]
    assert C.to_half_width(np.array(["ＡＢＣ１２３", "ｶﾞ"], dtype=object))[0] == "ABC123"
    assert C.convert_distance(np.array([1.0]), "MILE", "KILOMETER")[0] == pytest.approx(1.609344)
    assert C.convert_duration(np.array([2.0]), "HOUR", "MINUTE")[0] == 120.0
    from datetime import datetime

    con = duckdb.connect()
    for ts in (datetime(2020, 1, 1), datetime(1999, 12, 31, 12, 30, 15)):
        exp = con.execute("select julian(?::timestamp)", [ts]).fetchone()[0]
        assert C.julian_day(ts) == pytest.approx(exp, abs=1e-9)


# ---------------------------------------------------------------------------
# datetime patterns + type inference
# ---------------------------------------------------------------------------


def test_date_patterns():
    assert date_pattern_of("2020-08-17") == "yyyy-MM-dd"
    assert date_pattern_of("8/17/2020") == "M/d/yyyy"
    assert date_pattern_of("17.08.20") == "dd.MM.yy"
    assert date_pattern_of("January 5, 2020") == "MMMM d yyyy"
    assert date_pattern_of("20200817") == "yyyyMMdd"
    assert not is_date_str("not a date")
    assert not is_date_str("13/45/2020")  # fails strict parse
    assert not is_date_str("123")  # too short
    assert is_time_str("23:59:59") and is_time_str("9:30 PM") and not is_time_str("25:00")


def test_type_inference():
    cases = {"123": "INTEGER", "1,234,567": "INTEGER", "12.5%": "DOUBLE",
             "１２３": "INTEGER", "-3.14e2": "DOUBLE", "true": "BOOLEAN",
             "2020-01-01": "DATE", "10:30": "TIME", "hello": "STRING",
             "": "EMPTY", None: "EMPTY"}
    for v, t in cases.items():
        assert infer_type_one(v) == t, v
    assert dominant_type({"INTEGER": 6, "STRING": 4}) == "INTEGER"
    assert dominant_type({"INTEGER": 3, "DOUBLE": 3, "STRING": 4}) == "DOUBLE"
    # INTEGER+DOUBLE jointly cross the 0.5 threshold → folds to DOUBLE
    assert dominant_type({"INTEGER": 2, "STRING": 2, "DOUBLE": 1}) == "DOUBLE"
    assert dominant_type({"INTEGER": 1, "STRING": 2, "DATE": 2}) == "STRING"


def test_text_fingerprints():
    assert pattern_fingerprint_one("Talend 123") == "Aaaaaa 999"
    assert pattern_fingerprint_one("８Ａけカ中한") == "9Ahk" + "CG"
    assert word_pattern_one("John DOE-3") == "[Word] [WORD]-[number]"
    assert word_pattern_one("John DOE-3", ignore_case=True) == "[word] [word]-[number]"
    assert acronym_one("International Business Machines") == "IBM"
    assert fingerprint_key_one("  Müller,  Thomas ") == "muller thomas"


# ---------------------------------------------------------------------------
# email chain
# ---------------------------------------------------------------------------


def test_email_verify_chain():
    from data_quality_ray.rules.email import EmailVerify

    cfg = EmailVerify(blacklist_domains=frozenset({"spam.com"}))
    verdict, _ = cfg.verify(np.array(
        ["ok@example.com", "bad email", "x@spam.com", "y@site.zzz"], dtype=object))
    assert verdict.tolist() == ["VALID", "INVALID", "INVALID", "INVALID"]


def test_email_correction():
    from data_quality_ray.rules.email import EmailVerify

    cfg = EmailVerify(derive_local_part=True, first_name_pattern="f",
                      last_name_pattern="last", separator=".")
    verdict, suggestion = cfg.verify(
        np.array(["j.doe@corp.com", "wrong@corp.com"], dtype=object),
        first_names=np.array(["John", "Jane"], dtype=object),
        last_names=np.array(["Doe", "Doe"], dtype=object),
    )
    assert verdict.tolist() == ["VALID", "CORRECTED"]
    assert suggestion[1] == "j.doe@corp.com"


# ---------------------------------------------------------------------------
# nested analyzer (F5)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nested_table() -> pa.Table:
    rec = pa.array([{"a": "1", "b": 5}, {"a": "x", "b": None}, None,
                    {"a": "", "b": 7}] * 50)
    arr = pa.array([[{"x": "2020-01-01"}], [], [{"x": "notdate"}, {"x": "3"}], None] * 50)
    return pa.table({"rec": rec, "arr": arr})


def test_profile_nested(ray_session, nested_table):
    import ray.data as rd

    from data_quality_ray.profiling.nested import profile_nested

    res = profile_nested(rd.from_arrow(nested_table), ["rec", "arr"], batch_size=32)
    assert res["rec.a"]["type_counts"] == {"INTEGER": 50, "STRING": 50, "EMPTY": 50}
    assert res["rec.a"]["quality"]["null"] == 50
    assert res["rec.a"]["quality"]["empty"] == 50
    assert res["rec.b"]["dominant_type"] == "INT64"
    assert res["arr[].x"]["type_counts"] == {"DATE": 50, "STRING": 50, "INTEGER": 50}


def test_add_type_metadata(ray_session, nested_table):
    import ray.data as rd

    from data_quality_ray.profiling.nested import add_type_metadata

    out = add_type_metadata(rd.from_arrow(nested_table), ["rec"]).take(2)
    assert out[0]["rec__types"] == {"a": "INTEGER", "b": "INT64"}
    assert out[1]["rec__types"] == {"a": "STRING", "b": None}


# ---------------------------------------------------------------------------
# sampling determinism (F6): partition-count invariance
# ---------------------------------------------------------------------------


def test_reservoir_partition_invariance(ray_session):
    import ray.data as rd

    from data_quality_ray.sampling.reservoir import reservoir_sample

    df = pd.DataFrame({"id": np.arange(20_000), "val": [f"v{i}" for i in range(20_000)]})
    a = reservoir_sample(rd.from_pandas(df), ["id"], k=500, seed=7)
    b = reservoir_sample(rd.from_pandas(df).repartition(13), ["id"], k=500, seed=7)
    assert sorted(a["id"]) == sorted(b["id"])
    c = reservoir_sample(rd.from_pandas(df), ["id"], k=500, seed=8)
    assert sorted(a["id"]) != sorted(c["id"])  # seed changes the sample


def test_grouped_reservoir_exact_and_parity(ray_session):
    import duckdb
    import ray.data as rd

    from data_quality_ray.sampling.reservoir import grouped_reservoir_sample

    df = pd.DataFrame({"id": np.arange(6000),
                       "g": (np.arange(6000) % 7).astype(str)})
    a = grouped_reservoir_sample(rd.from_pandas(df).repartition(9),
                                 ["id"], "g", k=25, seed=42)
    ref = duckdb.sql("""
        SELECT g, id FROM (
            SELECT g, id, row_number() OVER (PARTITION BY g
                ORDER BY md5('42-' || id)) rn FROM df)
        WHERE rn <= 25 ORDER BY g, id""").df()
    got = a.sort_values(["g", "id"]).reset_index(drop=True)
    assert (got["id"].to_numpy() == ref["id"].to_numpy()).all()
    # dataset route: identical sample, fully distributed
    b = (grouped_reservoir_sample(rd.from_pandas(df).repartition(9),
                                  ["id"], "g", k=25, seed=42,
                                  output="dataset", n_buckets=8)
         .to_pandas().sort_values(["g", "id"]).reset_index(drop=True))
    assert (b["id"].to_numpy() == got["id"].to_numpy()).all()
    # short groups: a group smaller than k returns all of it
    small = pd.DataFrame({"id": [1, 2, 3], "g": ["x", "x", "y"]})
    s = grouped_reservoir_sample(rd.from_pandas(small), ["id"], "g", k=10)
    assert len(s) == 3


# ---------------------------------------------------------------------------
# minhash / simhash / embedding dedup
# ---------------------------------------------------------------------------


def test_minhash_finds_neardups(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.minhash import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    near = base.replace("lazy", "sleepy")
    other = "completely different text about database engines and query optimization at scale"
    rows = [{"id": 1, "text": base}, {"id": 2, "text": near}, {"id": 3, "text": other},
            {"id": 4, "text": base}] + [
        {"id": 10 + i, "text": f"unrelated document number {i} with its own unique words {i*7}"}
        for i in range(20)
    ]
    out = minhash_dedup(rd.from_items(rows), "id", "text", threshold=0.5)
    clusters = out.groupby("cluster")["id"].apply(set).tolist()
    assert {1, 2, 4} in clusters
    assert all(3 not in c for c in clusters)


def test_simhash(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.simhash import hamming64, simhash64, simhash_candidates

    a = "the quick brown fox jumps over the lazy dog tonight in the woods"
    b = a.replace("lazy", "sleepy")
    assert hamming64(simhash64(a), simhash64(b)) <= 12
    rows = [{"id": 1, "text": a}, {"id": 2, "text": b},
            {"id": 3, "text": "totally different content about spark and ray pipelines"}]
    pairs = simhash_candidates(rd.from_items(rows), "id", "text", hamming_threshold=12, n_blocks=16)
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} >= {(1, 2)}


def test_hamming_candidates_complete(ray_session):
    """Generic signature-column pairing == brute-force all-pairs (the
    pigeonhole full-recall guarantee), on clustered random signatures."""
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.dedup.simhash import hamming64_pairs, hamming_candidates

    rng = np.random.default_rng(21)
    base = rng.integers(0, 1 << 63, size=60, dtype=np.int64)
    sigs = base[rng.integers(0, 60, size=400)]
    flips = np.int64(1) << rng.integers(0, 64, size=400, dtype=np.int64)
    sigs = np.where(rng.random(400) < 0.5, sigs ^ flips, sigs)  # 1-bit variants
    df = pd.DataFrame({"id": np.arange(400), "sig": sigs})
    got = hamming_candidates(rd.from_pandas(df).repartition(6), "id", "sig",
                             hamming_threshold=3, n_blocks=4)
    ia, ib = np.triu_indices(400, k=1)
    d = hamming64_pairs(sigs[ia].view(np.uint64), sigs[ib].view(np.uint64))
    want = {(int(ia[i]), int(ib[i])) for i in np.flatnonzero(d <= 3)}
    assert {(r.id_a, r.id_b) for r in got.itertuples()} == want


def test_embedding_neardup(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.embedding import neardup_pairs_within

    rng = np.random.RandomState(0)
    v = rng.randn(8)
    rows = [
        {"id": 1, "vec": v.tolist(), "b": 0},
        {"id": 2, "vec": (v + 0.01 * rng.randn(8)).tolist(), "b": 0},
        {"id": 3, "vec": rng.randn(8).tolist(), "b": 0},
        {"id": 4, "vec": v.tolist(), "b": 1},  # same vector, other bucket → not compared
    ]
    out = neardup_pairs_within(rd.from_items(rows), "id", "vec", "b", threshold=0.99)
    assert [(r.id_a, r.id_b) for r in out.itertuples()] == [(1, 2)]


# ---------------------------------------------------------------------------
# standardization + survivorship + blocking
# ---------------------------------------------------------------------------


def test_standardize_broadcast(ray_session):
    import ray.data as rd

    from data_quality_ray.stages.standardize import standardize

    ds = rd.from_items([{"name": "Bob"}, {"name": "robert"}, {"name": "Robrt"}, {"name": "zz"}])
    out = standardize(ds, {"bob": "Robert", "robert": "Robert", "rob": "Robert"},
                      "name", fuzzy=True).to_pandas()
    got = dict(zip(out["name"], out["name_std"]))
    assert got["Bob"] == "Robert" and got["robert"] == "Robert"
    assert got["Robrt"] == "Robert"  # fuzzy fallback
    assert got["zz"] == "zz"  # no match → passthrough


def test_survivorship_rules(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.survivorship import golden_records

    rows = [
        {"gid": 1, "name": "Al", "score": 5.0, "city": "NY"},
        {"gid": 1, "name": "Albert", "score": 3.0, "city": "NY"},
        {"gid": 1, "name": "Ally", "score": 9.0, "city": "SF"},
        {"gid": 2, "name": None, "score": 1.0, "city": ""},
    ]
    out = golden_records(rd.from_items(rows), "gid",
                         {"name": "Longest", "score": "Largest", "city": "MostCommon"}).to_pandas()
    g1 = out[out.gid == 1].iloc[0]
    assert g1["name"] == "Albert" and g1["score"] == 9.0 and g1["city"] == "NY"
    g2 = out[out.gid == 2].iloc[0]
    assert g2["name"] is None and g2["score"] == 1.0


def test_blocking_and_grouping(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.blocking import add_block_key, record_group

    rows = [
        {"id": "r1", "name": "John Smith"},
        {"id": "r2", "name": "Jon Smith"},   # typo dup
        {"id": "r3", "name": "Jane Doe"},
        {"id": "r4", "name": "john smith"},  # case dup
    ]
    ds = add_block_key(rd.from_items(rows),
                       [{"column": "name", "pre": "LOWERCASE_REMOVE_DIACRITICS", "algo": "SOUNDEX"}])
    keyed = ds.to_pandas()
    assert keyed[keyed.id == "r1"]["block_key"].iloc[0] == keyed[keyed.id == "r2"]["block_key"].iloc[0]
    grouped = record_group(ds, "id", ["name"], "block_key",
                           matcher="JARO_WINKLER", threshold=0.85).to_pandas()
    gids = dict(zip(grouped["id"], grouped["gid"]))
    assert gids["r1"] == gids["r2"] == gids["r4"]
    assert gids["r3"] != gids["r1"]
    assert grouped[grouped.id == "r1"]["is_master"].iloc[0]


def test_combined_record_matcher():
    from data_quality_ray.functions.matchers import combined_record_score, record_score

    a = {"name": "john smith", "city": "springfield"}
    b = {"name": "jon smith", "city": "springfeld"}
    rules = [
        {"attributes": [{"column": "name", "matcher": "EXACT"}], "match_threshold": 1.0},
        {"attributes": [{"column": "name", "matcher": "JARO_WINKLER", "weight": 2.0},
                        {"column": "city", "matcher": "JARO_WINKLER"}], "match_threshold": 0.9},
    ]
    s, i = combined_record_score(a, b, rules)
    assert i == 1 and s >= 0.9  # first rule misses, second wins
    # per-attribute blocking threshold short-circuits the whole rule
    s2 = record_score(a, {"name": "zzzz", "city": "springfield"},
                      [{"column": "name", "matcher": "JARO_WINKLER", "block_threshold": 0.5},
                       {"column": "city", "matcher": "EXACT"}])
    assert s2 == 0.0


def test_convert_date_format():
    from data_quality_ray.functions.converters import convert_date_format

    out = convert_date_format(
        np.array(["8/17/2020", "17.08.2020", "January 5, 2020", "nope", None], dtype=object),
        "yyyy-MM-dd")
    assert out.tolist() == ["2020-08-17", "2020-08-17", "2020-01-05", "nope", None]


def test_standardize_record_multi_column(ray_session):
    import ray.data as rd

    from data_quality_ray.stages.standardize import standardize_record

    ds = rd.from_items([{"fn": "bob", "country": "u.s.a."}])
    out = standardize_record(ds, {"fn": {"bob": "Robert"}, "country": {"u.s.a.": "US"}}).to_pandas()
    assert out["fn_std"].iloc[0] == "Robert" and out["country_std"].iloc[0] == "US"


def test_date_patterns_extended():
    cases = {
        "2020-08-17T10:30:00Z": "yyyy-MM-dd'T'HH:mm:ssXXX",
        "2020-08-17T10:30:00+02:00": "yyyy-MM-dd'T'HH:mm:ssXXX",
        "5-Jan-20": "d-MMM-yy",
        "15-Mar-2021": "d-MMM-yyyy",
        "2021.3.15": "yyyy.M.d",
        "15 03 2021": "d M yyyy",
    }
    for v, exp in cases.items():
        assert date_pattern_of(v) == exp, v
    assert date_pattern_of("32-Jan-20") is None  # strict parse rejects


def test_tokenized_modes_and_hungarian():
    import itertools

    from data_quality_ray.functions.matchers import _hungarian, tokenized_score

    rng = np.random.RandomState(0)
    for _ in range(60):
        n, m = int(rng.randint(1, 6)), int(rng.randint(1, 6))
        cost = rng.rand(n, m)
        got = sum(cost[r, c] for r, c in _hungarian(cost))
        if n <= m:
            best = min(sum(cost[i, c] for i, c in enumerate(cols))
                       for cols in itertools.permutations(range(m), n))
        else:
            best = min(sum(cost[r, j] for j, r in enumerate(rows))
                       for rows in itertools.permutations(range(n), m))
        assert abs(got - best) < 1e-9
    assert tokenized_score("john smith", "smith john", "ANYORDER", "EXACT") == 1.0
    assert tokenized_score("john smith", "smith john", "SAMEPLACE", "EXACT") == 0.0
    assert tokenized_score("john smith", "john smith", "SAMEORDER", "EXACT") == 1.0
    assert tokenized_score("john adam smith", "smith john", "ANYORDER", "EXACT") == pytest.approx(2 / 3)


def test_levenshtein_pairs_fixed_vectorized():
    from data_quality_ray.functions.matchers import levenshtein_distance, levenshtein_pairs_fixed

    rng = np.random.RandomState(1)
    A = rng.randint(97, 123, size=(200, 5))
    B = rng.randint(97, 123, size=(200, 5))
    vec = levenshtein_pairs_fixed(A, B)
    for i in range(200):
        a = "".join(map(chr, A[i])); b = "".join(map(chr, B[i]))
        assert vec[i] == levenshtein_distance(a, b)


def test_chronology_conversions():
    from datetime import date, timedelta

    from data_quality_ray.functions import chronology as CH

    assert CH.to_thai_buddhist(date(2020, 1, 1)) == (2563, 1, 1)
    assert CH.to_minguo(date(2020, 1, 1)) == (109, 1, 1)
    assert CH.to_japanese(date(2019, 5, 1)) == ("Reiwa", 1, 5, 1)
    assert CH.to_japanese(date(2019, 4, 30)) == ("Heisei", 31, 4, 30)
    assert CH.convert_chronology(date(2020, 1, 1), "Japanese") == "Reiwa 2-01-01"
    assert CH.convert_chronology(date(2020, 1, 1), "ThaiBuddhist") == "2563-01-01"
    d = date(1950, 3, 7)
    for _ in range(300):
        assert CH.from_islamic(*CH.to_islamic(d)) == d
        assert CH.from_japanese(*CH.to_japanese(d)) == d
        d += timedelta(days=97)


def test_phone_region_metadata():
    from data_quality_ray.rules import phone as P

    assert P.is_valid("+1 415-555-2671")
    assert P.region_of("+1 415-555-2671") == "US"
    assert P.is_valid("+44 20 7946 0958") and P.region_of("+44 20 7946 0958") == "GB"
    assert P.is_valid("+33 1 42 68 53 00") and P.region_of("+33 1 42 68 53 00") == "FR"
    assert P.is_valid("01 42 68 53 00", "FR")  # national with trunk prefix
    assert P.format_e164("01 42 68 53 00", "FR") == "+33142685300"
    assert P.format_national("+33 1 42 68 53 00") == "0142685300"
    # possible but NOT valid: US number with 9 digits
    assert P.is_possible("415-555-267", "US")
    assert not P.is_valid("415-555-267", "US")
    assert not P.is_possible("12-34", "US")
    assert P.parse("garbage") is None


def test_phone_region_metadata_breadth():
    """Top-calling-code coverage (the reference spans libphonenumber's
    full metadata; this table carries the ~45 busiest regions)."""
    from data_quality_ray.rules import phone as P

    assert len(P.REGION_METADATA) >= 40
    vectors = [
        ("+52 55 1234 5678", "MX", True),
        ("+7 495 123 45 67", "RU", True),
        ("8 495 123 45 67", "RU", True),      # trunk '8' national form
        ("+82 2 312 3456", "KR", True),
        ("+31 20 123 4567", "NL", True),
        ("+47 21 23 45 67", "NO", True),
        ("+358 9 1234567", "FI", True),
        ("+351 21 123 4567", "PT", True),
        ("+852 2123 4567", "HK", True),
        ("+886 2 1234 5678", "TW", True),
        ("+971 4 123 4567", "AE", True),
        ("+972 2 123 4567", "IL", True),
        ("+27 11 123 4567", "ZA", True),
        ("+234 1 234 5678", "NG", True),
        ("+90 212 123 45 67", "TR", True),
        ("+65 6123 4567", "SG", True),
        ("+65 612 4567", "SG", False),        # 7 digits: invalid for SG
    ]
    for raw, region, valid in vectors:
        if raw.startswith("+"):
            assert P.region_of(raw) == region, raw
            assert P.is_valid(raw) == valid, raw
        else:
            assert P.is_valid(raw, region) == valid, raw
    assert P.format_e164("8 495 123 45 67", "RU") == "+74951234567"
    assert P.format_national("+7 495 123 45 67") == "84951234567"


def test_custom_date_patterns():
    """DataTypeAnalyzer.customDateTimePatterns: user Java-style patterns
    accepted ahead of the system inventory."""
    from data_quality_ray.functions.datetime_patterns import is_date_str
    from data_quality_ray.functions.typeinfer import infer_type_one

    exotic = "2021|07|15"  # not in any system inventory
    assert not is_date_str(exotic)
    assert is_date_str(exotic, ("yyyy|MM|dd",))
    assert infer_type_one(exotic) == "STRING"
    assert infer_type_one(exotic, ("yyyy|MM|dd",)) == "DATE"
    # custom patterns are strict: a mismatch falls back to system behavior
    assert infer_type_one("2021-07-15", ("yyyy|MM|dd",)) == "DATE"
    assert infer_type_one("not a date", ("yyyy|MM|dd",)) == "STRING"


def test_asof_join_semantics(ray_session):
    """asof_join vs a per-row reference: latest right row <= left ts per
    key; inner drops unmatched; left keeps them."""
    import ray.data as rd

    from data_quality_ray.functions.joins import asof_join

    left = pd.DataFrame({
        "k": [1, 1, 2, 3],
        "t": pd.to_datetime(["2020-01-05", "2020-01-01", "2020-06-01", "2020-01-01"]),
    })
    right = pd.DataFrame({
        "k": [1, 1, 2],
        "rt": pd.to_datetime(["2020-01-02", "2020-01-04", "2020-05-30"]),
        "v": [10.0, 20.0, 30.0],
    })
    out = asof_join(rd.from_pandas(left).repartition(2), rd.from_pandas(right),
                    by="k", left_on="t", right_on="rt", right_cols=["v"],
                    n_buckets=4).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    # (1, 01-01): no right row <= -> dropped (inner); (1, 01-05)->20; (2,...)->30; (3,...) dropped
    assert out[["k", "v"]].to_dict("records") == [{"k": 1, "v": 20.0}, {"k": 2, "v": 30.0}]
    out_l = asof_join(rd.from_pandas(left).repartition(2), rd.from_pandas(right),
                      by="k", left_on="t", right_on="rt", right_cols=["v"],
                      how="left", n_buckets=4).to_pandas()
    assert len(out_l) == 4 and out_l["v"].isna().sum() == 2


def test_asof_join_broadcast_equals_shuffle(ray_session):
    """The zero-shuffle broadcast as-of variant must equal the bucketed
    shuffle asof_join row-for-row, both modes, on random data with ties
    pre-aggregated away."""
    import ray.data as rd

    from data_quality_ray.functions.joins import asof_join, asof_join_broadcast

    rng = np.random.RandomState(2)
    left = pd.DataFrame({
        "k": rng.randint(0, 25, size=400),
        "t": rng.randint(0, 10_000, size=400).astype("int64"),
        "payload": np.arange(400),
    })
    right = (pd.DataFrame({
        "k": rng.randint(0, 25, size=300),
        "rt": rng.randint(0, 10_000, size=300).astype("int64"),
        "v": np.round(rng.uniform(0, 100, size=300), 3),
    }).groupby(["k", "rt"], as_index=False).agg(v=("v", "max")))
    for how in ("inner", "left"):
        a = asof_join(rd.from_pandas(left).repartition(3), rd.from_pandas(right),
                      by="k", left_on="t", right_on="rt", right_cols=["v"],
                      how=how, n_buckets=4).to_pandas()
        b = asof_join_broadcast(rd.from_pandas(left).repartition(3), right,
                                by="k", left_on="t", right_on="rt",
                                right_cols=["v"], how=how).to_pandas()
        key = ["k", "t", "payload"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_range_join(ray_session):
    import ray.data as rd

    from data_quality_ray.functions.joins import range_join

    rows = pd.DataFrame({"id": range(6), "x": [5, 15, 25, 99, 100, -1]})
    bands = pd.DataFrame({"lo": [0, 10, 20], "hi": [10, 20, 100], "name": ["a", "b", "c"]})
    out = range_join(rd.from_pandas(rows).repartition(2), bands, "x", "lo", "hi",
                     ["name"]).to_pandas().sort_values("id")
    assert out[["id", "name"]].to_dict("records") == [
        {"id": 0, "name": "a"}, {"id": 1, "name": "b"},
        {"id": 2, "name": "c"}, {"id": 3, "name": "c"}]
    outl = range_join(rd.from_pandas(rows), bands, "x", "lo", "hi", ["name"],
                      how="left").to_pandas()
    assert len(outl) == 6 and outl["name"].isna().sum() == 2
    with pytest.raises(ValueError):
        range_join(rd.from_pandas(rows),
                   pd.DataFrame({"lo": [0, 5], "hi": [10, 20], "name": ["a", "b"]}),
                   "x", "lo", "hi", ["name"])


def test_hash_join_semantics_and_broadcast_parity(ray_session):
    """hash_join vs a pandas reference (SQL null-key semantics, duplicate
    keys cross-product) for inner and left; broadcast_join must match the
    shuffle path row-for-row; multi-key join covered."""
    import ray.data as rd

    from data_quality_ray.functions.joins import broadcast_join, hash_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.randint(0, 30, size=500).astype("float64"),
        "payload": np.arange(500),
    })
    left.loc[rng.choice(500, 20, replace=False), "k"] = np.nan
    right = pd.DataFrame({
        "k": rng.randint(0, 40, size=200).astype("float64"),
        "v": np.round(rng.uniform(0, 10, size=200), 3),
    })
    right.loc[rng.choice(200, 10, replace=False), "k"] = np.nan

    def ref(how):
        r = right.dropna(subset=["k"])
        m = left.merge(r, on="k", how=how, sort=False)
        if how == "inner":
            m = m[m["k"].notna()]
        return m.sort_values(["payload", "v"]).reset_index(drop=True)

    for how in ("inner", "left"):
        got = hash_join(rd.from_pandas(left).repartition(3),
                        rd.from_pandas(right).repartition(2), on="k",
                        right_cols=["k", "v"], how=how, n_buckets=8) \
            .to_pandas().sort_values(["payload", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref(how), check_like=True)
        bc = broadcast_join(rd.from_pandas(left).repartition(3), right, on="k",
                            right_cols=["k", "v"], how=how) \
            .to_pandas().sort_values(["payload", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, got, check_like=True)

    # multi-key: (k1, k2) composite join
    l2 = pd.DataFrame({"k1": rng.randint(0, 5, 120), "k2": rng.randint(0, 5, 120),
                       "x": np.arange(120)})
    r2 = pd.DataFrame({"k1": rng.randint(0, 5, 60), "k2": rng.randint(0, 5, 60),
                       "y": rng.randint(0, 100, 60)})
    got2 = hash_join(rd.from_pandas(l2).repartition(2), rd.from_pandas(r2),
                     on=["k1", "k2"], right_cols=["k1", "k2", "y"],
                     n_buckets=4).to_pandas() \
        .sort_values(["x", "y"]).reset_index(drop=True)
    ref2 = l2.merge(r2, on=["k1", "k2"], how="inner", sort=False) \
        .sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, ref2, check_like=True)


def test_hash_join_salted_parity(ray_session):
    """salt=4 spreads hot keys across buckets but must reproduce the
    unsalted join exactly — heavily skewed key (80% one value), dup keys
    on both sides, inner and left."""
    import ray.data as rd

    from data_quality_ray.functions.joins import hash_join

    rng = np.random.RandomState(13)
    k = np.where(rng.rand(2000) < 0.8, 7, rng.randint(0, 50, 2000))
    left = pd.DataFrame({"k": k.astype("int64"), "payload": np.arange(2000)})
    right = pd.DataFrame({"k": np.repeat(np.arange(0, 50, 5), 3).astype("int64"),
                          "v": np.arange(30)})
    for how in ("inner", "left"):
        plain = hash_join(rd.from_pandas(left).repartition(3),
                          rd.from_pandas(right), on="k", right_cols=["k", "v"],
                          how=how, n_buckets=8) \
            .to_pandas().sort_values(["payload", "v"]).reset_index(drop=True)
        salted = hash_join(rd.from_pandas(left).repartition(3),
                           rd.from_pandas(right), on="k", right_cols=["k", "v"],
                           how=how, n_buckets=8, salt=4) \
            .to_pandas().sort_values(["payload", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(salted, plain, check_like=True)


def test_write_any_roundtrip(ray_session, tmp_path):
    """read_any/write_any roundtrip through csv and jsonl keeps rows and
    values; parquet path goes through write_partitioned."""
    import ray.data as rd

    from data_quality_ray.sources.io import read_any, write_any

    df = pd.DataFrame({"a": np.arange(50), "b": [f"s{i}" for i in range(50)]})
    for fmt in ("csv", "jsonl", "parquet"):
        out = str(tmp_path / f"rt_{fmt}")
        write_any(rd.from_pandas(df).repartition(3), out, fmt=fmt)
        back = read_any(out, fmt=fmt).to_pandas().sort_values("a").reset_index(drop=True)
        pd.testing.assert_frame_equal(back.astype({"a": "int64"}), df, check_like=True)


def test_semi_anti_join(ray_session):
    """semi/anti hash_join vs a pandas EXISTS/NOT-EXISTS reference: no
    duplication from duplicate right keys, null left keys kept by anti /
    dropped by semi, broadcast and salted variants match the shuffle
    path exactly."""
    import ray.data as rd

    from data_quality_ray.functions.joins import broadcast_join, hash_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame({
        "k": rng.randint(0, 25, size=400).astype("float64"),
        "payload": np.arange(400),
    })
    left.loc[rng.choice(400, 15, replace=False), "k"] = np.nan
    right = pd.DataFrame({"k": rng.randint(0, 40, size=300).astype("float64"),
                          "junk": np.arange(300)})
    right.loc[rng.choice(300, 10, replace=False), "k"] = np.nan

    present = set(right["k"].dropna())
    exists = left["k"].isin(present)
    refs = {"semi": left[exists], "anti": left[~exists]}

    for how, expect in refs.items():
        expect = expect.sort_values("payload").reset_index(drop=True)
        got = hash_join(rd.from_pandas(left).repartition(3),
                        rd.from_pandas(right).repartition(2), on="k",
                        right_cols=["k"], how=how, n_buckets=8) \
            .to_pandas().sort_values("payload").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, expect, check_like=True)
        bc = broadcast_join(rd.from_pandas(left).repartition(3), right,
                            on="k", right_cols=["k"], how=how) \
            .to_pandas().sort_values("payload").reset_index(drop=True)
        pd.testing.assert_frame_equal(bc, expect, check_like=True)
        salted = hash_join(rd.from_pandas(left).repartition(3),
                           rd.from_pandas(right), on="k", right_cols=["k"],
                           how=how, n_buckets=8, salt=4) \
            .to_pandas().sort_values("payload").reset_index(drop=True)
        pd.testing.assert_frame_equal(salted, expect, check_like=True)


def test_window_ops(ray_session):
    """window_ops vs a single-frame pandas reference: row_number, lag,
    lead with n=2, cumsum, cummax over a skewed partition key, across
    multiple blocks and buckets."""
    import ray.data as rd

    from data_quality_ray.functions.window import window_ops

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "key": np.concatenate([np.zeros(200, int), rng.randint(1, 20, 300)]),
        "t": rng.permutation(500),
        "x": np.round(rng.uniform(0, 100, 500), 3),
    })
    got = window_ops(rd.from_pandas(df).repartition(5), by="key", order_by="t",
                     ops={"rn": ("row_number",),
                          "prev_x": ("lag", "x"),
                          "next2_x": ("lead", "x", 2),
                          "run_x": ("cumsum", "x"),
                          "max_x": ("cummax", "x")},
                     n_buckets=7).to_pandas() \
        .sort_values(["key", "t"]).reset_index(drop=True)

    ref = df.sort_values(["key", "t"]).reset_index(drop=True)
    gb = ref.groupby("key", sort=False)
    ref["rn"] = (gb.cumcount() + 1).astype("int64")
    ref["prev_x"] = gb["x"].shift(1)
    ref["next2_x"] = gb["x"].shift(-2)
    ref["run_x"] = gb["x"].cumsum()
    ref["max_x"] = gb["x"].cummax()
    pd.testing.assert_frame_equal(got, ref, check_like=True)


def test_grouped_topk(ray_session):
    """grouped_topk vs a pandas nlargest reference: deterministic ties
    via the tie-break column, k larger than some group sizes, rank
    column correctness, multi-block input."""
    import ray.data as rd

    from data_quality_ray.profiling.groupagg import grouped_topk

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "g": rng.randint(0, 15, 400),
        "v": rng.randint(0, 20, 400).astype("float64"),  # heavy ties
        "id": np.arange(400),
    })
    got = grouped_topk(rd.from_pandas(df).repartition(4), keys="g",
                       order_by=["v", "id"], ascending=[False, True], k=5,
                       n_buckets=6).to_pandas() \
        .sort_values(["g", "rank"]).reset_index(drop=True)

    ref = df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
    ref = ref.groupby("g", sort=False).head(5).copy()
    ref["rank"] = (ref.groupby("g", sort=False).cumcount() + 1).astype("int64")
    ref = ref.sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_like=True)
    # every group capped at k and ranks are 1..n contiguous
    sizes = got.groupby("g")["rank"].agg(["max", "count"])
    assert (sizes["max"] == sizes["count"]).all() and (sizes["count"] <= 5).all()


def test_hash_join_outer_vs_duckdb(ray_session):
    """how='outer' vs DuckDB FULL JOIN: unmatched rows of BOTH sides and
    null-key rows on EITHER side survive unmatched; salt>1 rejected."""
    import duckdb
    import ray.data as rd

    from data_quality_ray.functions.joins import hash_join

    rng = np.random.RandomState(11)
    left = pd.DataFrame({
        "k": rng.randint(0, 25, size=300).astype("float64"),
        "payload": np.arange(300),
    })
    left.loc[rng.choice(300, 12, replace=False), "k"] = np.nan
    right = pd.DataFrame({
        "k": rng.randint(10, 40, size=150).astype("float64"),
        "v": np.round(rng.uniform(0, 10, size=150), 3),
    })
    right.loc[rng.choice(150, 6, replace=False), "k"] = np.nan

    got = hash_join(rd.from_pandas(left).repartition(3),
                    rd.from_pandas(right).repartition(2), on="k",
                    right_cols=["k", "v"], how="outer", n_buckets=8) \
        .to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql("""
        SELECT coalesce(l.k, r.k) AS k, l.payload, r.v
        FROM l FULL JOIN r ON l.k = r.k""").df()

    def canon(df):
        return (df.assign(payload=df["payload"].astype("float64"),
                          v=df["v"].astype("float64"))
                [["k", "payload", "v"]]
                .sort_values(["k", "payload", "v"], na_position="last")
                .reset_index(drop=True))

    # hash_join keeps the left key column; for right-only rows it carries
    # the right key (merge coalesces on=k)
    pd.testing.assert_frame_equal(canon(got), canon(exp))

    with pytest.raises(ValueError):
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                  right_cols=["k", "v"], how="outer", salt=4)


def test_weighted_reservoir(ray_session):
    """A-ES weighted sample: partition-count invariant, excludes
    non-positive weights, and over-represents heavy rows (the top-decile
    weights should far exceed their uniform share of the sample)."""
    import ray.data as rd

    from data_quality_ray.sampling.reservoir import weighted_reservoir_sample

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"id": np.arange(5000),
                       "w": rng.pareto(1.5, 5000) + 0.01})
    df.loc[:49, "w"] = 0.0  # excluded
    a = weighted_reservoir_sample(rd.from_pandas(df), ["id"], "w", k=400, seed=7)
    b = weighted_reservoir_sample(rd.from_pandas(df).repartition(11),
                                  ["id"], "w", k=400, seed=7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 400
    assert not set(a["id"]) & set(range(50))  # zero-weight rows never drawn
    heavy = set(df.nlargest(500, "w")["id"])  # top decile by weight
    frac = len(set(a["id"]) & heavy) / 400
    assert frac > 0.35  # uniform would give ~0.10


def test_reservoir_multicol_key_unambiguous():
    """('a-b','c') and ('a','b-c') must build DIFFERENT row keys (the old
    '-' joint collided them → identical digests → correlated selection)."""
    from data_quality_ray.sampling.reservoir import KEY_SEP, _row_key

    df = pd.DataFrame({"x": ["a-b", "a"], "y": ["c", "b-c"]})
    keys = _row_key(df, ["x", "y"]).tolist()
    assert keys[0] != keys[1]
    assert KEY_SEP not in "a-b" + "c"  # unit separator can't appear in values


def test_agg_join_parity_with_two_exchange_form(ray_session):
    """agg_join (fused single exchange) == grouped_aggregate + hash_join
    for inner/left/outer on random frames with duplicate and missing
    keys."""
    import ray.data as rd

    from data_quality_ray.functions.joins import agg_join, hash_join
    from data_quality_ray.profiling.groupagg import grouped_aggregate

    rng = np.random.RandomState(3)
    left = pd.DataFrame({"k": rng.randint(0, 30, 200),
                         "seg": rng.choice(["a", "b"], 200)})
    right = pd.DataFrame({"k": rng.randint(10, 45, 400),
                          "v": rng.uniform(0, 5, 400)})
    aggs = {"n": ("", "count"), "sv": ("v", "sum")}
    for how in ("inner", "left", "outer"):
        fused = agg_join(rd.from_pandas(left).repartition(3),
                         rd.from_pandas(right).repartition(2), on="k",
                         aggs=aggs, how=how, n_buckets=8).to_pandas()
        grp = grouped_aggregate(rd.from_pandas(right).repartition(2),
                                ["k"], aggs, final="shuffle")
        two = hash_join(rd.from_pandas(left).repartition(3), grp, on="k",
                        right_cols=["k", "n", "sv"], how=how,
                        n_buckets=8).to_pandas()

        def canon(df):
            df = df.astype({"n": "float64", "sv": "float64",
                            "k": "float64"})
            return df.sort_values(["k", "seg", "n", "sv"],
                                  na_position="last").reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(fused), canon(two), check_like=True)


def test_agg_join_null_right_keys_and_clash(ray_session):
    """SQL semantics under null right keys: the NULL group never MATCHES
    a left row (even a null-key left row), but under how='outer' it
    survives as one unmatched row — verified against DuckDB. Aggregate
    output names clashing with left columns raise like hash_join."""
    import duckdb
    import ray.data as rd

    from data_quality_ray.functions.joins import agg_join

    left = pd.DataFrame({"k": [1.0, 2.0, np.nan], "seg": ["a", "b", "c"]})
    right = pd.DataFrame({"k": [1.0, 1.0, np.nan, np.nan, 9.0],
                          "v": [10.0, 20.0, 5.0, 7.0, 1.0]})
    for how in ("inner", "left", "outer"):
        fused = agg_join(rd.from_pandas(left).repartition(2),
                         rd.from_pandas(right).repartition(3), on="k",
                         aggs={"n": ("", "count"), "sv": ("v", "sum")},
                         how=how, n_buckets=4).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        sql_how = {"inner": "JOIN", "left": "LEFT JOIN", "outer": "FULL JOIN"}[how]
        exp = con.execute(f"""
            SELECT k, l.seg, g.n, g.sv FROM l {sql_how}
            (SELECT k, count(*) AS n, sum(v) AS sv FROM r GROUP BY k) g
            USING (k)""").df()
        canon = lambda d: (d.reindex(columns=["k", "seg", "n", "sv"])
                           .astype({"k": "float64", "n": "float64", "sv": "float64"})
                           .sort_values(["k", "seg", "n", "sv"], na_position="last")
                           .reset_index(drop=True))
        pd.testing.assert_frame_equal(canon(fused), canon(exp), check_like=True)

    with pytest.raises(ValueError, match="clash"):
        agg_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                 aggs={"seg": ("v", "sum")})


def test_agg_join_all_null_sum_group(ray_session):
    """SQL sum over a group whose input column is entirely NULL is NULL,
    not 0 — including when the group's rows are split across right
    partitions (NaN partials must not poison groups with real values in
    other batches). Verified against DuckDB."""
    import duckdb
    import ray.data as rd

    from data_quality_ray.functions.joins import agg_join

    left = pd.DataFrame({"k": [1, 2, 3], "seg": ["a", "b", "c"]})
    # k=1: all-NULL v (split over 2 partitions) → sv NULL; k=2: NULL in one
    # partition + value in another → sv 7.0; k=3 absent from right
    right = pd.DataFrame({"k": [1, 1, 2, 2], "v": [np.nan, np.nan, np.nan, 7.0]})
    for how in ("inner", "left", "outer"):
        fused = agg_join(rd.from_pandas(left).repartition(2),
                         rd.from_pandas(right).repartition(4), on="k",
                         aggs={"n": ("", "count"), "sv": ("v", "sum")},
                         how=how, n_buckets=4).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        sql_how = {"inner": "JOIN", "left": "LEFT JOIN", "outer": "FULL JOIN"}[how]
        exp = con.execute(f"""
            SELECT k, l.seg, g.n, g.sv FROM l {sql_how}
            (SELECT k, count(*) AS n, sum(v) AS sv FROM r GROUP BY k) g
            USING (k)""").df()
        canon = lambda d: (d.reindex(columns=["k", "seg", "n", "sv"])
                           .astype({"k": "float64", "n": "float64", "sv": "float64"})
                           .sort_values(["k", "seg"], na_position="last")
                           .reset_index(drop=True))
        pd.testing.assert_frame_equal(canon(fused), canon(exp), check_like=True)


def test_agg_join_right_group_cols(ray_session):
    """right_group_cols: left JOIN (SELECT k, extra, aggs FROM r GROUP BY
    k, extra) — a one-to-many fused exchange — must match DuckDB for
    inner/left, including left rows with no match (probe-side pushdown
    for revenue_by_nation / rollup_revenue rides this)."""
    import duckdb
    import ray.data as rd

    from data_quality_ray.functions.joins import agg_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                         "seg": rng.choice(list("abc"), 20)})
    right = pd.DataFrame({"k": rng.integers(0, 25, 200).astype(np.int64),
                          "yr": rng.integers(2020, 2023, 200).astype(np.int64),
                          "v": rng.normal(100, 10, 200).round(3)})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how, sql_how in (("inner", "JOIN"), ("left", "LEFT JOIN")):
        fused = agg_join(rd.from_pandas(left).repartition(3),
                         rd.from_pandas(right).repartition(4), on="k",
                         aggs={"n": ("", "count"), "sv": ("v", "sum")},
                         how=how, n_buckets=4,
                         right_group_cols=["yr"]).to_pandas()
        exp = con.execute(f"""
            SELECT k, l.seg, g.yr, g.n, g.sv FROM l {sql_how}
            (SELECT k, yr, count(*) AS n, sum(v) AS sv FROM r
             GROUP BY k, yr) g USING (k)""").df()
        canon = lambda d: (d.reindex(columns=["k", "seg", "yr", "n", "sv"])
                           .astype({"k": "int64", "yr": "float64",
                                    "n": "float64", "sv": "float64"})
                           .round({"sv": 6})
                           .sort_values(["k", "seg", "yr"], na_position="last")
                           .reset_index(drop=True))
        pd.testing.assert_frame_equal(canon(fused), canon(exp), check_like=True)


def test_funnel_counts_matches_bruteforce(ray_session):
    # strictly-after first-reach chain vs a plain per-user python fold;
    # includes a user whose click precedes every view (must not convert)
    import ray.data as rd

    from data_quality_ray.functions.funnel import funnel_counts

    rng = np.random.RandomState(5)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 200, n),
        "ts": pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase", "other"], n),
    })
    # user 999: click strictly before its only view
    df = pd.concat([df, pd.DataFrame({
        "user_id": [999, 999],
        "ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
        "event_type": ["click", "view"],
    })], ignore_index=True)

    steps = ["view", "click", "purchase"]
    got = funnel_counts(rd.from_pandas(df).repartition(7),
                        "user_id", "ts", "event_type", steps)

    users, gaps = [], []
    reach = {}
    for s in steps:
        cur = {}
        for u, g in df[df["event_type"] == s].groupby("user_id"):
            if s == steps[0]:
                cur[u] = g["ts"].min()
            elif u in reach:
                after = g.loc[g["ts"] > reach[u], "ts"]
                if len(after):
                    cur[u] = after.min()
        users.append(len(cur))
        gaps.append(0.0 if s == steps[0] else
                    sum((cur[u] - reach[u]).total_seconds() for u in cur))
        reach = cur
    exp_avg = [0.0] + [round(g / u / 3600.0, 6) if u else 0.0
                       for g, u in zip(gaps[1:], users[1:])]
    assert got["users"].tolist() == users
    assert got["avg_hours_from_prev"].tolist() == pytest.approx(exp_avg, abs=1e-6)
    # the planted out-of-order user (click before its only view) stalls at
    # step 1: it never reaches the purchase step
    assert 999 not in reach
    assert got.loc[0, "users"] >= 1


def test_budget_cap_matches_bruteforce_and_routes(ray_session):
    # global digest-order cumsum vs a driver-side brute force, across a
    # partitioning that splits every group over many batches (the
    # monotone-prefilter correctness case), both output routes
    import ray.data as rd

    from data_quality_ray.sampling.budget import budget_cap
    from data_quality_ray.sampling.reservoir import _md5_hex

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "id": np.arange(1000),
        "grp": rng.choice(["a", "b", "c"], 1000),  # few groups, many batches
        "w": rng.randint(1, 50, 1000),
    })
    budget = 300

    exp = df.copy()
    exp["__rk"] = _md5_hex("42-" + exp["id"].astype(str))
    exp = exp.sort_values(["grp", "__rk"], kind="mergesort")
    exp["cum"] = exp.groupby("grp")["w"].cumsum()
    exp = (exp[exp["cum"] <= budget].drop(columns="__rk")
           .sort_values("id").reset_index(drop=True))
    assert len(exp) and len(exp) < len(df)

    ds = rd.from_pandas(df).repartition(16)
    got = (budget_cap(ds, ["id"], "grp", "w", budget)
           .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    got_ds = (budget_cap(ds, ["id"], "grp", "w", budget, output="dataset")
              .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_ds[got.columns], exp, check_dtype=False)

    # oversize first row: a group whose cheapest row exceeds the budget
    # keeps nothing from that group
    df2 = pd.DataFrame({"id": [1, 2], "grp": ["z", "z"], "w": [999, 999]})
    got2 = budget_cap(rd.from_pandas(df2), ["id"], "grp", "w", budget)
    assert len(got2) == 0


def test_json_column_ops(ray_session):
    # vectorized extraction + schema discovery over messy JSON: multi-key,
    # mixed types, missing keys, malformed strings, nulls
    import ray.data as rd

    from data_quality_ray.functions.jsoncol import json_extract_col, json_profile

    df = pd.DataFrame({"id": range(6), "props": [
        '{"k": 1, "name": "a"}',
        '{"k": 2}',
        '{"name": "b", "flag": true}',
        'not json',
        None,
        '{"k": -7, "ratio": 2.5}',
    ]})
    ds = rd.from_pandas(df).repartition(3)

    got = (json_extract_col(ds, "props", "$.k", "k").to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["k"].tolist() == pytest.approx([1, 2, None, None, None, -7],
                                              nan_ok=True) or \
        [None if pd.isna(v) else int(v) for v in got["k"]] == \
        [1, 2, None, None, None, -7]

    prof = json_profile(ds, "props")
    prof = prof.set_index("key")
    assert prof.loc["k", "n_present"] == 3
    assert prof.loc["name", "n_present"] == 2
    assert prof.loc["flag", "n_present"] == 1
    assert prof.loc["k", "min_num"] == -7.0 and prof.loc["k", "max_num"] == 2.0
    # type tallies: k has UBIGINT(1,2) and BIGINT(-7) variants per DuckDB
    ntype_cols = [c for c in prof.columns if c.startswith("n_") and c != "n_present"]
    assert prof.loc["name", ntype_cols].sum() == 2  # VARCHAR rows counted


def test_cohort_and_tumbling(ray_session):
    # week alignment (Monday start, DuckDB date_trunc parity), NaT rows,
    # users active across multiple weeks, offset gaps
    import duckdb
    import ray.data as rd

    from data_quality_ray.functions.cohort import (cohort_retention,
                                                   tumbling_aggregate)

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 4],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00",   # Monday — week boundary exactly
            "2024-01-07 23:59:59",   # same ISO week (Sunday)
            "2024-01-22 12:00:00",   # +3 weeks (gap week skipped)
            "2024-01-03 05:00:00",
            "2024-01-10 05:00:00",   # +1 week
            "2023-12-31 10:00:00",   # Sunday — prior ISO week
            None,                    # NaT dropped
            "2024-01-15 00:00:00",
        ]),
        "event_type": ["a", "a", "b", "a", "b", "a", "a", "b"],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
    })
    got = cohort_retention(rd.from_pandas(df).repartition(3), "user_id", "ts")
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w
                    FROM events WHERE ts IS NOT NULL),
        fw AS (SELECT user_id, min(w) AS cw FROM uw GROUP BY 1),
        j AS (SELECT uw.user_id, fw.cw, date_diff('day', fw.cw, uw.w)//7 AS off
              FROM uw JOIN fw USING (user_id)),
        c AS (SELECT cw, off, count(*) AS n_users FROM j GROUP BY 1,2),
        s AS (SELECT cw, n_users AS sz FROM c WHERE off = 0)
        SELECT CAST(c.cw AS TIMESTAMP) AS cohort_week, c.off AS week_offset,
               c.n_users, round(c.n_users / s.sz, 6) AS retention
        FROM c JOIN s USING (cw) ORDER BY 1, 2""").df()
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_dtype=False)
    # 2023-12-25 cohort (user 3), 2024-01-01 cohort offsets {0,1,2,3}
    assert got["week_offset"].max() == 3

    t = tumbling_aggregate(rd.from_pandas(df).repartition(3), "ts",
                           ["event_type"], "value", unit="day")
    wt = con.execute("""
        SELECT event_type, date_trunc('day', ts) AS window_start,
               count(*) AS n, round(sum(value),2) AS sum_value,
               round(avg(value),6) AS avg_value
        FROM events WHERE ts IS NOT NULL GROUP BY 1,2 ORDER BY 1,2""").df()
    pd.testing.assert_frame_equal(t, wt.astype(t.dtypes.to_dict()),
                                  check_dtype=False)


def _bpe_serial_reference(texts, n_merges):
    # independent tuple-based implementation: word freq -> iterative
    # (count pairs, argmax with lexicographic ties, exhaustive sweep)
    import collections
    freq = collections.Counter(
        w for t in texts for w in (t or "").lower().split() if w)
    words = {w: tuple(w) for w in freq}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += freq[w]
        if not counts:
            break
        a, b = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b))

        def sweep(syms):
            while True:
                out, i, changed = [], 0, False
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b); i += 2; changed = True
                    else:
                        out.append(syms[i]); i += 1
                syms = tuple(out)
                if not changed:
                    return syms
        words = {w: sweep(s) for w, s in words.items()}
    return merges, words, freq


def test_bpe_matches_serial_reference(ray_session):
    import collections
    import ray.data as rd

    from data_quality_ray.functions.bpe import (apply_merges_to_words,
                                                bpe_token_counts, train_bpe)

    rng = np.random.RandomState(5)
    vocab = ["lower", "low", "lowest", "newer", "new", "wider", "wide",
             "aaaa", "aaa", "banana", "bandana", "ana"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 9)))
             for _ in range(80)] + ["", None, "  low\tnew  "]
    ds = rd.from_pandas(pd.DataFrame({"text": pd.Series(texts, dtype=object)}))

    for n_merges in (5, 12):
        want_merges, want_words, freq = _bpe_serial_reference(texts, n_merges)
        got = train_bpe(ds.repartition(7), "text", n_merges)
        assert got == want_merges
        # vectorized apply == serial sweep tokenization, word by word
        uniq = sorted(want_words)
        toks = apply_merges_to_words(pd.Series(uniq, dtype=object), got)
        assert [tuple(t.split(" ")) for t in toks] == \
            [want_words[w] for w in uniq]
        # corpus token counts == reference fold
        want_counts = collections.Counter()
        for w, syms in want_words.items():
            for s in syms:
                want_counts[s] += freq[w]
        tc = bpe_token_counts(ds.repartition(3), "text", got)
        assert dict(zip(tc["token"], tc["n"])) == dict(want_counts)
        # partitioning invariance
        tc2 = bpe_token_counts(ds.repartition(11), "text", got)
        pd.testing.assert_frame_equal(tc, tc2)


def test_dihedral_canonical():
    from data_quality_ray.stages.image_ops import (D4_NAMES,
                                                   dihedral_canonical,
                                                   dihedral_variants)

    rng = np.random.RandomState(17)
    sigs = rng.randint(-2**63, 2**63, size=200, dtype=np.int64)

    # independent grid reference: unpack to an 8x8 cell grid (bit 8r+c),
    # apply the numpy image transform, repack
    def grid(h):
        u = np.uint64(np.array(h, dtype=np.int64).view(np.uint64))
        return np.array([(int(u) >> j) & 1 for j in range(64)]).reshape(8, 8)

    def pack(g):
        v = sum(int(b) << j for j, b in enumerate(g.ravel()))
        return np.uint64(v)

    transforms = {
        "identity": lambda g: g, "rot90": lambda g: np.rot90(g, 1),
        "rot180": lambda g: np.rot90(g, 2), "rot270": lambda g: np.rot90(g, 3),
        "flip_h": np.fliplr, "flip_v": np.flipud,
        "transpose": lambda g: g.T, "anti_transpose": lambda g: np.rot90(g, 2).T,
    }
    variants = dihedral_variants(sigs)
    for i in (0, 7, 42):
        g = grid(sigs[i])
        for t, name in enumerate(D4_NAMES):
            assert variants[i, t] == pack(transforms[name](g)), name

    # invariance: canonical(any variant) == canonical(original)
    canon = dihedral_canonical(sigs)
    for t in range(8):
        assert (dihedral_canonical(variants[:, t].view(np.int64)) ==
                canon).all()
    # canonical is itself one of the variants
    assert (canon.view(np.uint64) == variants.min(axis=1)).all()


def test_impute_column_strategies(ray_session):
    import ray.data as rd

    from data_quality_ray.stages.impute import impute_column

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", "c", "c", "d"],
        "v": [1.0, None, 3.0, 10.0, None, None, None, 5.0],
        "s": ["x", None, "x", "y", None, None, "z", None],
    })
    ds = rd.from_pandas(df).repartition(3)

    got = (impute_column(ds, "v", "mean", group_col="g").to_pandas()
           .sort_values(["g", "v"], na_position="last"))
    # a: mean(1,3)=2 fills the null; b: 10; c all-null stays null; d no nulls
    assert got.loc[got.g == "a", "v"].tolist() == [1.0, 2.0, 3.0]
    assert got.loc[got.g == "b", "v"].tolist() == [10.0, 10.0]
    assert got.loc[got.g == "c", "v"].isna().all()

    # global mean = mean of all non-null = (1+3+10+5)/4
    g2 = impute_column(ds, "v", "mean").to_pandas()
    assert g2["v"].fillna(-1).tolist().count(4.75) == 4

    # mode with smallest-value tie-break; const
    g3 = (impute_column(ds, "s", "mode", group_col="g").to_pandas()
          .sort_values("g"))
    assert g3.loc[g3.g == "a", "s"].tolist() == ["x", "x", "x"]
    assert g3.loc[g3.g == "c", "s"].tolist() == ["z", "z"]
    g4 = impute_column(ds, "s", "const", fill_value="?").to_pandas()
    assert (g4["s"].fillna("!") != "!").all() and (g4["s"] == "?").sum() == 4

    with pytest.raises(ValueError):
        impute_column(ds, "v", "median")


def test_grouped_regression_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from data_quality_ray.profiling.datarules import grouped_regression

    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "g": rng.choice(["p", "q", "r", "z"], size=500),
        "x": rng.normal(10, 3, size=500),
        "y": None,
    })
    df["y"] = 2.5 * df["x"] + rng.normal(0, 1, size=500)
    df.loc[df.index % 11 == 0, "x"] = np.nan      # null exclusion
    df.loc[df.g == "z", "x"] = 7.0                # zero variance -> NULLs
    got = grouped_regression(rd.from_pandas(df).repartition(5), ["g"],
                             "x", "y")
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT g, count(x + y) AS n,
               round(regr_slope(y, x), 6) AS slope,
               round(regr_intercept(y, x), 6) AS intercept,
               round(corr(x, y), 6) AS "corr"
        FROM t GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()),
                                  check_dtype=False, atol=1e-6)
    assert got.loc[got.g == "z", ["slope", "intercept", "corr"]].isna().all().all()


def test_cluster_safe_split_no_leakage(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.minhash import minhash_dedup
    from data_quality_ray.sampling.splits import cluster_safe_split

    rng = np.random.RandomState(31)
    words = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "jade"]
    rows = []
    for i in range(150):
        base = " ".join(rng.choice(words, size=10))
        rows.append((3 * i, base))
        rows.append((3 * i + 1, base))  # exact dup -> same cluster
        if rng.rand() < 0.5:
            toks = base.split(); toks[0] = rng.choice(words)
            rows.append((3 * i + 2, " ".join(toks)))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    ds = rd.from_pandas(df).repartition(5)

    out = cluster_safe_split(ds, "doc_id", "text", threshold=0.5,
                             hash_fn="md5").to_pandas()
    assert len(out) == len(df)
    # leakage property: every verified near-dup pair shares a split
    comp = minhash_dedup(ds, "doc_id", "text", threshold=0.5, hash_fn="md5")
    merged = comp.merge(out, on="doc_id")
    assert (merged.groupby("cluster_x")["split"].nunique() == 1).all()
    # ...and the cluster label IS what got split (the naive doc_id split
    # would scatter at least one planted dup pair across splits)
    naive = out.set_index("doc_id")
    from data_quality_ray.sampling.splits import assign_split
    naive_split = assign_split(out["doc_id"].to_numpy(),
                               {"train": .8, "valid": .1, "test": .1})
    leaked = (pd.DataFrame({"c": out["cluster"], "s": naive_split})
              .groupby("c")["s"].nunique() > 1).any()
    assert leaked  # the property the operator exists to prevent
    # all three splits non-empty at this size
    assert set(out["split"]) == {"train", "valid", "test"}


def test_kcenter_greedy_matches_bruteforce(ray_session):
    import ray.data as rd

    from data_quality_ray.similarity.kcenter import (ROUND_TO,
                                                     kcenter_assign,
                                                     kcenter_select)

    rng = np.random.RandomState(11)
    n, dim, k = 300, 8, 6
    ids = np.array([f"v{i:04d}" for i in range(n)])
    mat = rng.randn(n, dim)
    df = pd.DataFrame({"id": ids, "vec": list(mat)})
    ds = rd.from_pandas(df).repartition(5)

    centers = kcenter_select(ds, "id", "vec", k=k)
    # brute-force replay of the greedy trajectory
    chosen = [0]
    for _ in range(k - 1):
        d = np.round(np.sqrt(((mat[:, None, :] - mat[chosen][None, :, :]) ** 2)
                             .sum(-1)), ROUND_TO).min(axis=1)
        order = np.lexsort((ids, -d))
        chosen.append(order[0])
    assert list(centers["id"]) == list(ids[chosen])
    assert list(centers["sel_order"]) == list(range(k))

    out = kcenter_assign(ds, "id", "vec", centers).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    cs = np.sort(np.array(chosen))  # center ids ascending == sorted rows
    csort = np.array(sorted(chosen, key=lambda i: ids[i]))
    d = np.round(np.sqrt(((mat[:, None, :] - mat[csort][None, :, :]) ** 2)
                         .sum(-1)), ROUND_TO)
    ci = d.argmin(axis=1)
    assert list(out["center_id"]) == list(ids[csort][ci])
    assert np.allclose(out["dist"], d[np.arange(n), ci])
    assert out["is_center"].sum() == k
    # k-center property: max assignment distance shrinks as k grows
    small = kcenter_select(ds, "id", "vec", k=2)
    d2 = kcenter_assign(ds, "id", "vec", small).to_pandas()["dist"].max()
    assert out["dist"].max() <= d2


def test_range_partitioner_exact_and_tdigest(ray_session):
    import ray.data as rd

    from data_quality_ray.functions.partitioning import (
        add_range_partition, range_balance, range_split_points)

    rng = np.random.RandomState(3)
    # skewed: lognormal values, heavy right tail
    vals = np.round(np.exp(rng.randn(20000) * 1.5), 4)
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(8)

    splits = range_split_points(ds, "v", 8, mode="exact")
    assert (np.diff(splits) >= 0).all()
    bal = range_balance(ds, "v", 8, mode="exact")
    # exact quantile_disc split points keep every partition within one
    # duplicate-run of n/8
    assert len(bal) == 8
    assert bal["n"].sum() == len(vals)
    assert bal["n"].max() <= 1.05 * len(vals) / 8 + 1
    # ranges are disjoint and ordered
    assert (bal["lo"].to_numpy()[1:] > bal["hi"].to_numpy()[:-1]).all()

    # tdigest mode: same assignment machinery, balance within rank error
    td_splits = range_split_points(ds, "v", 8, mode="tdigest")
    parts = add_range_partition(ds, "v", td_splits).to_pandas()
    cnt = parts.groupby("part_id").size()
    assert cnt.max() <= 1.10 * len(vals) / 8
    # equal-to-split values go LEFT (the x > v rule)
    one = add_range_partition(
        rd.from_pandas(pd.DataFrame({"v": [float(splits[0])]})), "v",
        splits).to_pandas()
    assert one["part_id"].iloc[0] == 0


def test_skeleton_fold_confusables():
    from data_quality_ray.functions.confusables import skeleton_series

    s = pd.Series([
        "РаyРаl",          # Cyrillic а in PayPal + Cyrillic Р
        "hello​world",            # zero-width space stripped
        "ｈｅｌｌｏ",  # fullwidth hello
        "samе",                   # Cyrillic е
        None,
    ])
    out = skeleton_series(s)
    assert out[0] == "paypal"
    assert out[1] == "helloworld"
    assert out[2] == "hello"
    assert out[3] == "same"
    assert pd.isna(out[4])


def test_fuzzy_decontaminate_flags_paraphrases(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.decontaminate import fuzzy_decontaminate

    rng = np.random.RandomState(23)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    bench_rows, corpus_rows = [], []
    for i in range(10):
        t = " ".join(rng.choice(words, size=12))
        bench_rows.append((1000 + i, t))
        if i < 4:  # light paraphrase -> contaminated
            toks = t.split(); toks[-1] = "omega"
            corpus_rows.append((i, " ".join(toks)))
    for i in range(4, 40):  # unrelated corpus docs
        corpus_rows.append((i, " ".join(rng.choice(words[:3], size=3)) + f" unique{i}"))
    corpus = rd.from_pandas(pd.DataFrame(corpus_rows, columns=["doc_id", "text"])).repartition(3)
    bench = rd.from_pandas(pd.DataFrame(bench_rows, columns=["doc_id", "text"])).repartition(2)

    out = fuzzy_decontaminate(corpus, bench, "doc_id", "text",
                              threshold=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 40
    got = set(out[out["contaminated"]]["doc_id"])
    assert {0, 1, 2, 3} <= got
    # paraphrase matches point at their bench source
    m = out.set_index("doc_id")["match_id"]
    assert all(m[i] == 1000 + i for i in range(4))
    # clean rows carry a null match
    assert out[~out["contaminated"]]["match_id"].isna().all()


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from data_quality_ray.functions.intervals import interval_join

    rng = np.random.RandomState(5)
    L = pd.DataFrame({"lid": np.arange(200, dtype="int64"),
                      "start": rng.randint(0, 10000, 200).astype("int64")})
    L["end"] = L["start"] + rng.randint(0, 500, 200)
    R = pd.DataFrame({"rid": np.arange(50, dtype="int64"),
                      "start": rng.randint(0, 10000, 50).astype("int64")})
    R["end"] = R["start"] + rng.randint(0, 800, 50)

    out = interval_join(rd.from_pandas(L).repartition(4),
                        rd.from_pandas(R).repartition(3),
                        "start", "end", band_width=256).to_pandas()
    m = L.merge(R, how="cross", suffixes=("", "_b"))
    keep = (np.maximum(m["start"], m["start_b"])
            <= np.minimum(m["end"], m["end_b"]))
    want = m[keep].copy()
    want["overlap"] = (np.minimum(want["end"], want["end_b"])
                       - np.maximum(want["start"], want["start_b"]))
    a = out.sort_values(["lid", "rid"]).reset_index(drop=True) \
        [["lid", "rid", "overlap"]].astype("int64")
    b = want.sort_values(["lid", "rid"]).reset_index(drop=True) \
        [["lid", "rid", "overlap"]].astype("int64")
    pd.testing.assert_frame_equal(a, b)
    # single-band attribution: each overlapping pair appears exactly once
    assert not out.duplicated(["lid", "rid"]).any()
    # touching endpoints count (closed intervals), disjoint do not
    one = interval_join(
        rd.from_pandas(pd.DataFrame({"start": [0], "end": [10]})),
        rd.from_pandas(pd.DataFrame({"start": [10, 11], "end": [20, 21]})),
        band_width=4).to_pandas()
    assert len(one) == 1 and one["overlap"].iloc[0] == 0


def test_hamming_store_exact_and_pruned(ray_session, tmp_path):
    import ray.data as rd

    from data_quality_ray.dedup.simhash import hamming64_pairs
    from data_quality_ray.state.hamming_store import (
        build_hamming_store, hamming_store_matches, hamming_store_scan_stats)

    rng = np.random.RandomState(13)
    n = 2000
    ids = np.array([f"s{i:05d}" for i in range(n)])
    sigs = rng.randint(-2**62, 2**62, size=n).astype(np.int64)
    # plant 1-bit and 2-bit edits of sig 0
    sigs[1] = np.int64(np.uint64(sigs[0]) ^ np.uint64(1 << 5))
    sigs[2] = np.int64(np.uint64(sigs[0]) ^ np.uint64((1 << 9) | (1 << 44)))
    sigs[3] = np.int64(np.uint64(sigs[0]) ^ np.uint64((1 << 1) | (1 << 2) | (1 << 3)))
    ds = rd.from_pandas(pd.DataFrame({"id": ids, "sig": sigs})).repartition(4)

    store = str(tmp_path / "hstore")
    build_hamming_store(ds, store, "id", "sig")
    out = hamming_store_matches(store, ids[:1], sigs[:1], radius=2)
    # brute-force ground truth
    d = hamming64_pairs(np.full(n, sigs[0]).view(np.uint64), sigs.view(np.uint64))
    want = set(ids[d <= 2])
    assert set(out["id"]) == want and {"s00000", "s00001", "s00002"} <= want
    assert "s00003" not in set(out["id"])  # 3 bits > radius
    stats = hamming_store_scan_stats(store, sigs[:1])
    assert 0 < stats["rows_scanned"] < stats["rows_total"]
    assert stats["dirs_probed"] <= 4


def test_video_frame_dedup_collapses_exact_not_near(ray_session):
    out = __import__("__ray_entry__").video_frame_dedup("/root/testdata/sf0.001")
    k = out.set_index("video_id")["keeper_id"]
    # planted exact duplicate collapses onto its original...
    assert k["vid500000000"] == "vid000000000"
    # ...the one-frame near-duplicate does not
    assert k["vid700000017"] == "vid700000017"
    # keepers are group minima
    assert (out.groupby("sig")["keeper_id"].nunique() == 1).all()
    assert (out.groupby("sig")["video_id"].min() ==
            out.groupby("sig")["keeper_id"].first()).all()


def test_pagerank_matches_numpy_reference(ray_session):
    import ray.data as rd

    from data_quality_ray.functions.graph import RANK_ROUND, pagerank

    # star + chain: hub must out-rank leaves
    e = pd.DataFrame({"src": ["h", "h", "h", "a", "b", "c", "c", "d"],
                      "dst": ["a", "b", "c", "h", "h", "h", "d", "c"],
                      "w": [1, 2, 1, 1, 2, 1, 3, 3]})
    got = pagerank(rd.from_pandas(e).repartition(3), damping=0.85, rounds=5)

    nodes = np.sort(e["src"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    od = e.groupby("src")["w"].sum()
    r = np.full(len(nodes), round(1 / len(nodes), RANK_ROUND))
    for _ in range(5):
        m = np.zeros(len(nodes))
        for s, dd, w in e.itertuples(index=False):
            m[idx[dd]] += r[idx[s]] * w / od[s]
        r = np.round(0.15 / len(nodes) + 0.85 * m, RANK_ROUND)
    assert list(got["node"]) == list(nodes)
    assert np.allclose(got["rank"], r, atol=1e-9)
    g = got.set_index("node")["rank"]
    assert g["h"] > g["a"] and g["h"] > g["b"]
    assert abs(got["rank"].sum() - 1.0) < 0.01


def test_fs_em_separates_planted_matches():
    """EM on a synthetic pattern table where 10% of pairs agree on
    everything: the fitted model must put all-agree at high posterior
    and all-disagree at low, with monotone weights."""
    import itertools

    from data_quality_ray.dedup.fellegi_sunter import fs_em

    bits = ["a", "b", "c"]
    rows = []
    rng = np.random.RandomState(2)
    for pat in itertools.product([0, 1], repeat=3):
        k = sum(pat)
        # matches concentrate agreement; non-matches disagreement
        n = int(1000 * (0.1 * (0.95 ** k * 0.05 ** (3 - k))
                        + 0.9 * (0.2 ** k * 0.8 ** (3 - k))) * 8) + 1
        rows.append(dict(zip(bits, pat), n=n))
    pat_df = pd.DataFrame(rows)
    m, u, p, scored = fs_em(pat_df, bits, rounds=10)
    s = scored.set_index(bits)
    assert s.loc[(1, 1, 1), "posterior"] > 0.9
    assert s.loc[(0, 0, 0), "posterior"] < 0.1
    assert s.loc[(1, 1, 1), "weight"] > s.loc[(0, 0, 0), "weight"]
    assert (m > u).all()          # agreement more likely among matches
    assert 0 < p < 1


def test_global_row_number_matches_window(ray_session):
    import ray.data as rd

    from data_quality_ray.functions.partitioning import global_row_number

    rng = np.random.RandomState(8)
    # heavy ties: values drawn from a tiny set
    df = pd.DataFrame({"id": np.arange(5000, dtype="int64"),
                       "v": rng.choice([1.5, 2.5, 2.5, 7.0, 9.9], 5000)})
    ds = rd.from_pandas(df).repartition(6)
    for asc, mode in ((True, "exact"), (False, "exact"), (False, "tdigest")):
        out = global_row_number(ds, "v", "id", n_parts=8, ascending=asc,
                                mode=mode).to_pandas()
        want = df.sort_values(["v", "id"], ascending=[asc, True]) \
            .reset_index(drop=True)
        want["rn"] = np.arange(1, len(df) + 1)
        got = out.sort_values("rn").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["id", "v", "rn"]],
                                      want[["id", "v", "rn"]],
                                      check_dtype=False)


def test_pca_matches_numpy_and_reconstructs(ray_session):
    import ray.data as rd

    from data_quality_ray.similarity.pca import (covariance, pca_fit,
                                                 pca_project)

    rng = np.random.RandomState(21)
    # planted rank-2 structure + small noise
    basis = rng.randn(2, 16)
    mat = rng.randn(400, 2) @ basis + rng.randn(400, 16) * 0.05 + 3.0
    df = pd.DataFrame({"id": np.arange(400, dtype="int64"),
                       "vec": list(mat)})
    ds = rd.from_pandas(df).repartition(5)

    cov, mu, n = covariance(ds, "vec")
    assert n == 400
    want_cov = np.cov(mat, rowvar=False, bias=True)
    assert np.allclose(cov, want_cov, atol=1e-9)
    assert np.allclose(mu, mat.mean(axis=0))

    comps, evals, mu2 = pca_fit(ds, "vec", k=2)
    w, v = np.linalg.eigh(want_cov)
    assert np.allclose(np.sort(evals)[::-1], np.sort(w)[-2:][::-1],
                       atol=1e-9)
    # top-2 components capture the planted structure
    assert evals.sum() / np.trace(want_cov) > 0.95

    proj = pca_project(ds, "id", "vec", comps, mu2).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    got = np.stack(proj["pca"].to_numpy())
    assert np.allclose(got, (mat - mu2) @ comps.T, atol=1e-9)
    # reconstruction error ≈ dropped-eigenvalue mass
    recon = got @ comps + mu2
    err = ((mat - recon) ** 2).sum() / len(mat)
    assert err < 0.1


def test_caption_search_matches_bruteforce(ray_session):
    import ray.data as rd

    from data_quality_ray.stages.alignment import (D, _SHIFTS, caption_search,
                                                   md5_hash64, tokenize)

    rng = np.random.RandomState(33)
    n = 500
    ids = np.array([f"im{i:05d}" for i in range(n)])
    ph = rng.randint(-2**62, 2**62, size=n).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"image_id": ids, "phash": ph})) \
        .repartition(4)
    queries = {"a": "red red fox", "b": "blue sky"}
    out = caption_search(ds, queries, k=7)

    for qid, text in queries.items():
        toks = tokenize(text)
        vec = np.zeros(D)
        h = {t: int(x) % D for t, x in
             zip(dict.fromkeys(toks),
                 md5_hash64(np.array(list(dict.fromkeys(toks)), dtype=object)))}
        for t in toks:
            vec[h[t]] += 1.0
        bits = ((ph.astype(np.uint64)[:, None] >> _SHIFTS) & np.uint64(1)) \
            .astype(np.float64)
        score = np.round((vec @ (bits * 2 - 1).T)
                         / (np.sqrt((vec * vec).sum()) * 8.0), 6)
        order = np.lexsort((ids, -score))[:7]
        mine = out[out["query_id"] == qid]
        assert list(mine["image_id"]) == list(ids[order])
        assert np.allclose(mine["alignment"], score[order])
        assert list(mine["rank"]) == list(range(1, 8))


def test_seeded_shuffle_rank_deterministic_and_complete(ray_session):
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.functions.partitioning import seeded_shuffle_rank

    def _ds(frame, blocks):
        return rd.from_pandas(frame).repartition(blocks)

    df = pd.DataFrame({"k": range(500)})
    a = seeded_shuffle_rank(_ds(df, blocks=6), "k", seed=7).to_pandas()
    b = seeded_shuffle_rank(_ds(df, blocks=1), "k", seed=7).to_pandas()
    # exact permutation, partition-invariant
    assert sorted(a["rank"]) == list(range(1, 501))
    m = a.sort_values("k")["rank"].to_numpy()
    assert (m == b.sort_values("k")["rank"].to_numpy()).all()
    # a different seed produces a different order
    c = seeded_shuffle_rank(_ds(df, blocks=6), "k", seed=8).to_pandas()
    assert (c.sort_values("k")["rank"].to_numpy() != m).any()
    # matches the md5-low-64 contract directly
    from data_quality_ray.profiling.sketches import md5_hash64
    h = md5_hash64(("7-" + df["k"].astype(str)).to_numpy())
    ref = pd.DataFrame({"k": df["k"], "h": h}).sort_values(["h", "k"])
    ref["rank"] = range(1, 501)
    assert (ref.sort_values("k")["rank"].to_numpy() == m).all()


def test_scd2_collapse_runs_and_intervals(ray_session):
    import pandas as pd
    import ray.data as rd

    from data_quality_ray.functions.scd import scd2_collapse

    df = pd.DataFrame({
        "k":  [1, 1, 1, 1, 2, 2, 3],
        "t":  [1, 2, 3, 4, 1, 2, 1],
        "st": ["A", "A", "B", "A", None, None, "C"],
    })
    out = (scd2_collapse(rd.from_pandas(df).repartition(3), "k", "t", ["st"])
           .to_pandas().sort_values(["k", "valid_from"]).reset_index(drop=True))
    k1 = out[out["k"] == 1]
    assert list(k1["st"]) == ["A", "B", "A"]          # A-run, B, A again
    assert list(k1["n_rows"]) == [2, 1, 1]
    assert list(k1["valid_from"]) == [1, 3, 4]
    assert list(k1["valid_to"].fillna(-1)) == [3, 4, -1]
    assert list(k1["is_current"]) == [False, False, True]
    k2 = out[out["k"] == 2]                            # null == null: one run
    assert len(k2) == 1 and k2["n_rows"].iloc[0] == 2
    assert out[out["k"] == 3]["is_current"].all()
