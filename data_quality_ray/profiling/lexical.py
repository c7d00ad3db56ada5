"""Corpus lexical-diversity and novelty metrics.

Curation signals over the token stream that the per-doc heuristics
(rules/heuristics.py) can't see: type-token ratio / hapax rate per
corpus slice (template-generated or boilerplate-heavy sources score
low), and per-document n-gram novelty (what fraction of a doc's
shingles appear here FIRST — near-zero novelty marks recombined or
memorized content; the same first-seen-owner algebra as exact dedup's
keep-first, applied to shingles instead of whole docs).

Tokenization shares the repo-wide whitespace contract
(``text.split()`` ↔ SQL ``string_split_regex(text, '\\s+')`` with
empties filtered), so both metrics replay exactly in DuckDB.

Scale shape: everything is (key → count/min) grouped folds. The
token/shingle key spaces are unbounded, so the folds run through
``grouped_aggregate(final="auto")`` — driver merge below the measured
partial-row gate, hash-bucketed shuffle above it; per-group outputs are
bounded by slice/doc counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .groupagg import grouped_aggregate

__all__ = ["ttr_by_group", "ngram_novelty"]


def ttr_by_group(ds, group_col: str, text_col: str) -> pd.DataFrame:
    """Type-token ratio and hapax rate per group from ONE
    (group, token) → count exchange: n_tokens = Σ counts, n_distinct =
    #keys, n_hapax = #keys with count 1; ttr = distinct/total, hapax
    share of the vocabulary = hapax/distinct.
    → (group, n_tokens, n_distinct, n_hapax, ttr, hapax_ratio)."""
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks, grps = [], []
        for g, v in zip(b[group_col], b[text_col]):
            t = (v or "").split()
            toks.extend(t)
            grps.extend([g] * len(t))
        return pd.DataFrame({"grp": grps, "token": toks})

    counts = grouped_aggregate(
        ds.select_columns([group_col, text_col]).map_batches(
            explode, batch_format="pandas"),
        ["grp", "token"], {"n": ("token", "count")}, final="auto")
    if not isinstance(counts, pd.DataFrame):  # shuffle path at scale
        counts = counts.to_pandas()
    g = counts.groupby("grp", sort=False)
    out = pd.DataFrame({
        "n_tokens": g["n"].sum().astype(np.int64),
        "n_distinct": g.size().astype(np.int64),
        "n_hapax": g["n"].agg(lambda s: int((s == 1).sum())).astype(np.int64),
    }).reset_index(names=group_col)
    out["ttr"] = out["n_distinct"] / out["n_tokens"]
    out["hapax_ratio"] = out["n_hapax"] / out["n_distinct"]
    return out.sort_values(group_col).reset_index(drop=True)


def ngram_novelty(ds, id_col: str, text_col: str, n: int = 3) -> pd.DataFrame:
    """Per-document novelty: the fraction of the doc's DISTINCT word
    n-grams whose corpus-wide FIRST owner (min id) is this doc. Two
    grouped folds over the exploded (id, gram) pairs — min-id per gram
    (first-seen ownership, exactly the keep-first algebra of
    dedup/exact.py applied to shingles) and distinct-gram count per
    doc — then one bounded per-doc merge. Docs with fewer than ``n``
    tokens have no shingles and are omitted (SQL parity).
    → (id, n_distinct, n_novel, novelty)."""
    def explode(b: pd.DataFrame) -> pd.DataFrame:
        ids, grams = [], []
        for i, v in zip(b[id_col], b[text_col]):
            t = (v or "").split()
            if len(t) < n:
                continue
            uniq = set(" ".join(t[j:j + n]) for j in range(len(t) - n + 1))
            grams.extend(uniq)
            ids.extend([i] * len(uniq))
        return pd.DataFrame({"id": ids, "gram": grams})

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pandas").materialize()

    first = grouped_aggregate(pairs, ["gram"], {"fd": ("id", "min")},
                              final="auto")
    if isinstance(first, pd.DataFrame):
        novel = (first.groupby("fd", sort=False).size().rename("n_novel")
                 .reset_index().rename(columns={"fd": "id"}))
    else:  # shuffle path: second grouped fold, never the gram table on
        # the driver
        novel = grouped_aggregate(first, ["fd"], {"n_novel": ("fd", "count")},
                                  final="driver").rename(columns={"fd": "id"})

    per_doc = grouped_aggregate(pairs, ["id"],
                                {"n_distinct": ("gram", "count")},
                                final="driver")
    out = per_doc.merge(novel, on="id", how="left")
    out["n_novel"] = out["n_novel"].fillna(0).astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    out["novelty"] = out["n_novel"] / out["n_distinct"]
    return (out.rename(columns={"id": id_col})
            .sort_values(id_col).reset_index(drop=True))
