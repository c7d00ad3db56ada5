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
