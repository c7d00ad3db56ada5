"""table_diff (snapshot CDC), fuzzy_join (two-table linkage), and
grouping_sets — distributed results vs brute-force pandas/DuckDB truth."""

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.functions.diff import table_diff
from data_quality_ray.dedup.linkage import fuzzy_join
from data_quality_ray.profiling.groupagg import grouping_sets


def _ds(df, n_blocks=4):
    import ray.data as rd

    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % n_blocks)])


@pytest.fixture()
def snapshots():
    rng = np.random.default_rng(7)
    n = 500
    old = pd.DataFrame({
        "k": np.arange(n),
        "a": rng.integers(0, 5, n),
        "b": rng.choice(["x", "y", None], n),
        "c": np.where(rng.random(n) < 0.1, np.nan, rng.random(n).round(3)),
    })
    new = old.copy()
    # mutate: change a for k%7==0, b for k%11==0, delete k%13==0, add fresh
    new.loc[new["k"] % 7 == 0, "a"] += 100
    new.loc[new["k"] % 11 == 0, "b"] = "z"
    new = new[new["k"] % 13 != 0]
    added = pd.DataFrame({"k": np.arange(n, n + 20), "a": 1, "b": "w",
                          "c": 0.5})
    new = pd.concat([new, added], ignore_index=True)
    return old, new


def _expect_diff(old, new, include_unchanged=False):
    m = old.merge(new, on="k", how="outer", suffixes=("_o", "_n"),
                  indicator=True)
    rows = []
    for _, r in m.iterrows():
        if r["_merge"] == "right_only":
            rows.append((r["k"], "added", ""))
        elif r["_merge"] == "left_only":
            rows.append((r["k"], "removed", ""))
        else:
            ch = [c for c in ("a", "b", "c")
                  if not ((pd.isna(r[f"{c}_o"]) and pd.isna(r[f"{c}_n"]))
                          or r[f"{c}_o"] == r[f"{c}_n"])]
            st = "changed" if ch else "unchanged"
            if ch or include_unchanged:
                rows.append((r["k"], st, ",".join(ch)))
    return (pd.DataFrame(rows, columns=["k", "status", "changed_cols"])
            .sort_values("k").reset_index(drop=True).astype({"k": "int64"}))


def test_table_diff_matches_bruteforce(ray_session, snapshots):
    old, new = snapshots
    got = (table_diff(_ds(old), _ds(new), key="k", compare_cols=["a", "b", "c"])
           .to_pandas().sort_values("k").reset_index(drop=True)
           .astype({"k": "int64"}))
    exp = _expect_diff(old, new)
    pd.testing.assert_frame_equal(got, exp)
    # null==null counts as unchanged: rows where only NaN c on both sides
    assert not got["changed_cols"].str.contains("c").any()


def test_table_diff_include_unchanged(ray_session, snapshots):
    old, new = snapshots
    got = (table_diff(_ds(old), _ds(new), key="k", compare_cols=["a", "b", "c"],
                      include_unchanged=True)
           .to_pandas().sort_values("k").reset_index(drop=True)
           .astype({"k": "int64"}))
    exp = _expect_diff(old, new, include_unchanged=True)
    pd.testing.assert_frame_equal(got, exp)
    # every key present exactly once
    assert got["k"].is_unique
    assert len(got) == len(set(old["k"]) | set(new["k"]))


def test_table_diff_rejects_duplicate_keys(ray_session):
    old = pd.DataFrame({"k": [1, 1], "a": [1, 2]})
    new = pd.DataFrame({"k": [1], "a": [1]})
    with pytest.raises(Exception, match="not unique"):
        table_diff(_ds(old, 1), _ds(new, 1), key="k",
                   compare_cols=["a"]).to_pandas()


@pytest.fixture()
def linkage_tables():
    rng = np.random.default_rng(11)
    adjs = ["small", "red", "blue", "hot", "large"]
    nouns = ["ring", "bolt", "gear", "gizmo", "widget", "belt"]
    names = [f"{rng.choice(adjs)} {rng.choice(nouns)}" for _ in range(300)]
    right = pd.DataFrame({"rid": np.arange(300), "name": names})
    lnames = [n[:-1] if i % 4 == 0 else n for i, n in enumerate(names[:200])]
    left = pd.DataFrame({"lid": np.arange(1000, 1200), "name": lnames})
    for df in (left, right):
        df["block"] = df["name"].str.split(" ").str[0]
    return left, right


def _lev(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_fuzzy_join_matches_bruteforce(ray_session, linkage_tables):
    left, right = linkage_tables
    got = (fuzzy_join(_ds(left), _ds(right), left_key="lid", right_key="rid",
                      left_col="name", right_col="name", block_col="block",
                      max_distance=2)
           .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True))
    rows = []
    for _, l in left.iterrows():
        for _, r in right.iterrows():
            if l["block"] == r["block"]:
                d = _lev(l["name"], r["name"])
                if d <= 2:
                    rows.append((l["lid"], r["rid"], d))
    exp = (pd.DataFrame(rows, columns=["lid", "rid", "dist"])
           .sort_values(["lid", "rid"]).reset_index(drop=True)
           .astype({"lid": "int64", "rid": "int64", "dist": "int64"}))
    pd.testing.assert_frame_equal(got.astype(exp.dtypes.to_dict()), exp)
    assert len(got) > 0


def test_fuzzy_join_chunking_parity(ray_session, linkage_tables):
    left, right = linkage_tables
    kw = dict(left_key="lid", right_key="rid", left_col="name",
              right_col="name", block_col="block", max_distance=1)
    big = (fuzzy_join(_ds(left), _ds(right), pair_chunk=2_000_000, **kw)
           .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True))
    tiny = (fuzzy_join(_ds(left), _ds(right), pair_chunk=7, **kw)
            .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(big, tiny)


def test_fuzzy_join_min_score(ray_session, linkage_tables):
    left, right = linkage_tables
    got = (fuzzy_join(_ds(left), _ds(right), left_key="lid", right_key="rid",
                      left_col="name", right_col="name", block_col="block",
                      matcher="JARO_WINKLER", min_score=0.97)
           .to_pandas())
    from data_quality_ray.functions.matchers import match_score

    for _, r in got.sample(min(len(got), 25), random_state=0).iterrows():
        lname = left.loc[left["lid"] == r["lid"], "name"].iloc[0]
        rname = right.loc[right["rid"] == r["rid"], "name"].iloc[0]
        assert abs(match_score(lname, rname, "JARO_WINKLER") - r["score"]) < 1e-9
        assert r["score"] >= 0.97


def test_grouping_sets_matches_pandas_cube(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"s": rng.choice(["F", "O", "P"], 400),
                       "p": rng.choice(["1-A", "2-B"], 400),
                       "v": rng.random(400)})
    got = grouping_sets(_ds(df), ["s", "p"],
                        {"rev": ("v", "sum"), "n": ("", "count")})
    frames = []
    for keys in [["s", "p"], ["s"], ["p"], []]:
        if keys:
            part = df.groupby(keys).agg(rev=("v", "sum"),
                                        n=("v", "size")).reset_index()
        else:
            part = pd.DataFrame({"rev": [df["v"].sum()], "n": [len(df)]})
        for d in ("s", "p"):
            if d not in keys:
                part[d] = "ALL"
        frames.append(part[["s", "p", "rev", "n"]])
    exp = (pd.concat(frames, ignore_index=True)
           .sort_values(["s", "p"]).reset_index(drop=True))
    got = got.sort_values(["s", "p"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.assign(rev=got["rev"].round(9), n=got["n"].astype("int64")),
        exp.assign(rev=exp["rev"].round(9), n=exp["n"].astype("int64")))


def test_grouping_sets_explicit_sets_and_sentinels(ray_session):
    df = pd.DataFrame({"s": ["a", "a", "b"], "y": [1, 2, 2], "v": [1.0, 2.0, 4.0]})
    out = grouping_sets(_ds(df, 1), ["s", "y"], {"rev": ("v", "sum")},
                        sets=[("s", "y"), ("s",), ()], sentinels={"y": -1})
    # rollup shape: detail + per-s + grand
    assert len(out) == 3 + 2 + 1
    grand = out[(out["s"] == "ALL") & (out["y"] == -1)]
    assert float(grand["rev"].iloc[0]) == 7.0
    with pytest.raises(ValueError, match="not a subset"):
        grouping_sets(_ds(df, 1), ["s"], {"rev": ("v", "sum")}, sets=[("zz",)])


def test_levenshtein_pairs_bounded_parity():
    from data_quality_ray.functions.matchers_vec import (
        levenshtein_pairs, levenshtein_pairs_bounded)

    rng = np.random.default_rng(11)
    alpha = list("abcde")
    a = np.array(["".join(rng.choice(alpha, rng.integers(0, 12)))
                  for _ in range(800)], dtype=object)
    b = np.array(["".join(rng.choice(alpha, rng.integers(0, 12)))
                  for _ in range(800)], dtype=object)
    exact = levenshtein_pairs(a, b)
    for k in (0, 1, 2, 3, 7):
        got = levenshtein_pairs_bounded(a, b, k)
        assert (got == np.minimum(exact, k + 1)).all(), k
    assert levenshtein_pairs_bounded(np.array([], dtype=object),
                                     np.array([], dtype=object), 2).size == 0


def test_fuzzy_join_null_block_joins_nothing(ray_session):
    import ray.data as rd

    L = rd.from_pandas(pd.DataFrame({"lk": [1, 2], "name": ["abc", "abd"],
                                     "blk": ["a", None]}))
    R = rd.from_pandas(pd.DataFrame({"rk": [9, 8], "name": ["abc", "abx"],
                                     "blk": [None, "a"]}))
    out = fuzzy_join(L, R, "lk", "rk", "name", "name", "blk",
                     max_distance=2).to_pandas()
    # NULL blocks on either side join nothing (SQL equi-join semantics)
    assert out.to_dict("records") == [{"lk": 1, "rk": 8, "dist": 1}]


def test_grouping_sets_keeps_null_dim_group(ray_session):
    df = pd.DataFrame({"a": ["x", None, "x", None], "b": ["p"] * 4,
                       "m": [1.0, 2.0, 4.0, 8.0]})
    out = grouping_sets(_ds(df, 2), ["a", "b"], {"s": ("m", "sum"),
                                                 "n": ("m", "count")})
    grand = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert grand["s"].iloc[0] == 15.0 and grand["n"].iloc[0] == 4
    nullg = out[(out["a"] == "<NULL>") & (out["b"] == "p")]
    assert nullg["s"].iloc[0] == 10.0 and nullg["n"].iloc[0] == 2
