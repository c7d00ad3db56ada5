"""Survivorship — per-group golden-record resolution.

Rebuilds dataquality-survivorship's rule functions
(model/RuleDefinition.java:195-221: ExcludeValues, Expression, FillEmpty,
Largest, Longest, MatchRegex, MostAncient, MostCommon, MostComplete,
MostRecent, RemoveDuplicate, Shortest, Smallest, SurviveAs) as plain
column reducers — no rule engine, just a closure per rule config —
executed per group inside ``groupby(gid).map_groups`` (the Drools
``runSession(Object[][])`` analog, SurvivorshipManager.java:286).

Every reducer is deterministic: ties break on the smallest value (or the
first in a stable sort), so reruns produce identical golden records.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _nonnull(s: pd.Series) -> pd.Series:
    return s[s.notna() & (s.astype(str).str.strip() != "")]


def largest(s: pd.Series):
    v = _nonnull(s)
    return v.max() if len(v) else None


def smallest(s: pd.Series):
    v = _nonnull(s)
    return v.min() if len(v) else None


def longest(s: pd.Series):
    v = _nonnull(s).astype(str)
    if not len(v):
        return None
    return v.iloc[np.lexsort((v.to_numpy(), -v.str.len().to_numpy()))[0]]


def shortest(s: pd.Series):
    v = _nonnull(s).astype(str)
    if not len(v):
        return None
    return v.iloc[np.lexsort((v.to_numpy(), v.str.len().to_numpy()))[0]]


def most_common(s: pd.Series):
    """Highest frequency; ties → smallest value (deterministic)."""
    v = _nonnull(s)
    if not len(v):
        return None
    counts = v.value_counts()
    top = counts[counts == counts.max()].index
    return sorted(top)[0]


def most_recent(s: pd.Series):
    return largest(s)


def most_ancient(s: pd.Series):
    return smallest(s)


def match_regex_first(s: pd.Series, pattern: str):
    rx = re.compile(pattern)
    v = _nonnull(s).astype(str)
    hits = v[v.map(lambda x: bool(rx.match(x)))]
    return sorted(hits)[0] if len(hits) else None


def exclude_values(s: pd.Series, excluded: set):
    v = _nonnull(s)
    v = v[~v.isin(excluded)]
    return sorted(v)[0] if len(v) else None


def fill_empty(s: pd.Series, default):
    v = _nonnull(s)
    return sorted(v)[0] if len(v) else default


def most_complete(df: pd.DataFrame):
    """Row-level: the row with the most non-empty fields (ties → first in
    stable order) — survives as the base record."""
    filled = df.notna().sum(axis=1) + (df.astype(str).apply(lambda c: c.str.strip() != "").sum(axis=1))
    return df.loc[filled.idxmax()]


RULE_FUNCTIONS = {
    "Largest": largest,
    "Smallest": smallest,
    "Longest": longest,
    "Shortest": shortest,
    "MostCommon": most_common,
    "MostRecent": most_recent,
    "MostAncient": most_ancient,
}


def golden_records(ds, group_col: str, rules: dict[str, str | tuple]) -> pd.DataFrame:
    """One golden record per group. ``rules``: column → rule name (or
    (name, param) for MatchRegex / ExcludeValues / FillEmpty).
    Returns DataFrame with group_col + resolved columns."""

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        out = {group_col: [g[group_col].iloc[0]]}
        for col, rule in rules.items():
            if isinstance(rule, tuple):
                name, param = rule
                if name == "MatchRegex":
                    out[col] = [match_regex_first(g[col], param)]
                elif name == "ExcludeValues":
                    out[col] = [exclude_values(g[col], set(param))]
                elif name == "FillEmpty":
                    out[col] = [fill_empty(g[col], param)]
                else:
                    raise KeyError(name)
            else:
                out[col] = [RULE_FUNCTIONS[rule](g[col])]
        return pd.DataFrame(out)

    return ds.groupby(group_col).map_groups(resolve, batch_format="pandas")
