"""URL canonicalization / registered-domain / URL policies
(functions/urls.py): kernel semantics vs hand-derived expectations,
Ray-path dedup collapse and per-domain caps."""

import pandas as pd
import pytest

from data_quality_ray.functions import urls as U


def _ds(df, blocks=4):
    import ray.data as rd

    return rd.from_pandas(df).repartition(blocks)


def test_url_parts_canonicalization():
    u = pd.Series([
        "HTTP://WWW.Sub.Example.CO.UK:80/p/3/?utm_source=x&b=2&a=1#frag",
        "https://example.com:443/",
        "https://example.com",
        "not a url",
        None,
        "ftp://Files.example.com/a/b//",
        "https://www.example.com/p?x=&ref=abc&z=9&y=2",
        "  http://a.com/path  ",
    ])
    got = U.url_parts(u)["url_canon"].tolist()
    assert got[0] == "http://sub.example.co.uk/p/3?a=1&b=2"
    assert got[1] == "https://example.com" == got[2]
    assert pd.isna(got[3]) and pd.isna(got[4])
    assert got[5] == "ftp://files.example.com/a/b"
    # empty-VALUED params survive; tracking (ref=) drops; params sort
    assert got[6] == "https://example.com/p?x=&y=2&z=9"
    assert got[7] == "http://a.com/path"  # surrounding whitespace


def test_registered_domains():
    h = pd.Series(["sub.example.co.uk", "a.b.example.com", "example.com",
                   "localhost", None])
    got = U.registered_domains(h).tolist()
    assert got[0] == "example.co.uk"
    assert got[1] == "example.com" == got[2]
    assert got[3] == "localhost"
    assert pd.isna(got[4])


def test_url_dedup_collapses_variants(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "url": [
            "https://Example.com/a/?utm_source=x&k=1",
            "HTTPS://WWW.example.COM:443/a?k=1&fbclid=zz",   # == id 1
            "https://example.com/b",
            "nota url",                                      # invalid: dropped
        ],
    })
    out = U.url_dedup(_ds(df, blocks=2), "url", "id").to_pandas()
    assert sorted(out["id"].tolist()) == [1, 3]
    assert (out.loc[out["id"] == 1, "url_canon"].iloc[0]
            == "https://example.com/a?k=1")


def test_domain_cap_and_partition_invariance(ray_session):
    df = pd.DataFrame({
        "id": range(40),
        "url": ["https://d%d.example.com/p/%d" % (i % 2, i) for i in range(40)],
    })
    out = U.domain_cap(_ds(df, blocks=5), "url", "id", cap=3)
    # d0./d1.example.com share ONE registered domain → one cap bucket
    assert len(out) == 3
    assert set(out["domain"]) == {"example.com"}
    out2 = U.domain_cap(_ds(df, blocks=1), "url", "id", cap=3)
    assert sorted(out["id"]) == sorted(out2["id"])  # partition-invariant


def test_domain_cap_groups_by_registered_domain(ray_session):
    # two hosts under one registered domain share a single cap bucket
    df = pd.DataFrame({
        "id": range(10),
        "url": ["https://%s.shared.co.uk/x/%d" % ("a" if i % 2 else "b", i)
                for i in range(10)],
    })
    out = U.domain_cap(_ds(df, blocks=3), "url", "id", cap=4)
    assert len(out) == 4
    assert set(out["domain"]) == {"shared.co.uk"}


def test_strip_html_contract():
    from data_quality_ray.functions.html import strip_html

    s = pd.Series([
        '<html><SCRIPT src="x">alert("<b>hi</b>")</scRipt><p>A&amp;lt;B</p></html>',
        "<style>p { x: '>' }</style>before <br/> after",
        "no markup &quot;quoted&quot; &#39;q&#39; &nbsp;done",
        None,
    ])
    got = strip_html(s).tolist()
    assert got[0] == "A&lt;B"          # &amp; decodes LAST
    assert got[1] == "before after"
    assert got[2] == "no markup \"quoted\" 'q' done"
    assert pd.isna(got[3])


def test_lang_mix_on_multiline_docs(ray_session, tmp_path):
    # the sf fixture text is single-line, so lang_mix_docs is trivial
    # there; pin the per-line semantics on genuinely mixed docs by
    # writing a tiny documents.parquet and running the REAL query
    from data_quality_ray.pipelines.queries import lang_mix_docs

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat is near the house\nel perro corre en la casa\n"
                 "the end is here with this",
                 "der hund ist nicht auf dem haus\n   \nder mann und die frau",
                 "   "],  # only-blank lines → doc drops out entirely
    })
    df.to_parquet(tmp_path / "documents.parquet")
    out = lang_mix_docs(str(tmp_path))
    assert list(out["doc_id"]) == [1, 2]
    d1 = out[out["doc_id"] == 1].iloc[0]
    assert d1["lang_doc"] == "en"
    assert d1["n_lines"] == 3 and d1["n_offlang"] == 1
    assert d1["mix_ratio"] == 0.333333
    d2 = out[out["doc_id"] == 2].iloc[0]          # blank middle line skipped
    assert d2["lang_doc"] == "de"
    assert d2["n_lines"] == 2 and d2["n_offlang"] == 0


def test_nfc_normalize_series():
    import unicodedata

    from data_quality_ray.functions.confusables import nfc_normalize_series

    s = pd.Series(["café", "zöe", "plain", None, "́alone"])
    got = nfc_normalize_series(s).tolist()
    assert got[0] == "café" and len(got[0]) == 4
    assert got[1] == "zöe"
    assert got[2] == "plain"
    assert got[4] == unicodedata.normalize("NFC", "́alone")
    assert got[3] is None or pd.isna(got[3])
