"""Declarative schema/data contracts — the expectation-suite layer over
the rule machinery (reference analog: the per-column quality analyzers
of dataquality-common §2.2, generalized to a TABLE contract a producer
and consumer agree on).

A contract is ``{column: {rule: param, ...}}`` with rules:

- ``not_null``: True — nulls are violations
- ``min`` / ``max``: numeric closed bounds (violation when outside;
  nulls don't count against bounds)
- ``allowed``: list of permitted values (nulls not counted)
- ``regex``: full-match pattern for string columns (nulls not counted)
- ``unique``: True — violations = n_non_null − n_distinct

Everything except ``unique`` folds in ONE stateless counting pass
(per-batch partial → driver sum, fixed width = #rules); ``unique``
columns share ONE combined hash-bucketed distinct exchange
(``distinct_counts_combined``) — never a driver-side value set.
→ (column, rule, n_violations, n) one row per declared rule.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_ROW_RULES = ("not_null", "min", "max", "allowed", "regex")


def contract_check(ds, spec: dict[str, dict]) -> pd.DataFrame:
    """Evaluate the contract; see module docstring. Rules are emitted in
    (column, rule) declaration order with deterministic sorting."""
    for col, rules in spec.items():
        for r in rules:
            if r not in _ROW_RULES + ("unique",):
                raise ValueError(f"{col}: unknown contract rule {r!r}")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for col, rules in spec.items():
            s = b[col]
            nulls = s.isna()
            out.append((col, "__n", len(s)))
            out.append((col, "__n_null", int(nulls.sum())))
            for rule, param in rules.items():
                if rule == "not_null":
                    v = int(nulls.sum())
                elif rule == "min":
                    v = int((pd.to_numeric(s, errors="coerce") < param).sum())
                elif rule == "max":
                    v = int((pd.to_numeric(s, errors="coerce") > param).sum())
                elif rule == "allowed":
                    v = int((~s.isin(param) & ~nulls).sum())
                elif rule == "regex":
                    pat = re.compile(param)
                    ok = s.astype("string").str.fullmatch(pat)
                    v = int((~ok.fillna(True)).sum())
                else:
                    continue  # unique: handled by the distinct exchange
                out.append((col, rule, v))
        return pd.DataFrame(out, columns=["column", "rule", "v"])

    from .groupagg import grouped_aggregate

    tallies = grouped_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["column", "rule"], {"v": ("v", "sum")})
    t = tallies.set_index(["column", "rule"])["v"]

    uniq_cols = [c for c, r in spec.items() if r.get("unique")]
    distinct = {}
    if uniq_cols:
        from .datarules import distinct_counts_combined

        distinct = distinct_counts_combined(ds.select_columns(uniq_cols),
                                            uniq_cols)

    rows = []
    for col, rules in spec.items():
        n = int(t.get((col, "__n"), 0))
        for rule in rules:
            if rule == "unique":
                viol = (n - int(t.get((col, "__n_null"), 0))
                        - int(distinct.get(col, 0)))
            else:
                viol = int(t.get((col, rule), 0))
            rows.append((col, rule, viol, n))
    return (pd.DataFrame(rows,
                         columns=["column", "rule", "n_violations", "n"])
            .sort_values(["column", "rule"], kind="mergesort")
            .reset_index(drop=True))
