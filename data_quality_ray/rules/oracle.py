"""Row-by-row oracle for the quality-filter chain.

The ground-truth labeller: applies the same rule chain one record at a
time (the reference's per-record ``analyze(String...)`` execution shape,
Analyzer.java:28-57), independently of Ray batching/short-circuit
compaction. The distributed pipeline must agree with this oracle at
F1 ≥ 0.99 on keep/drop plus exact scrubbed-caption equality (north rule);
because both derive from the same deterministic rule definitions the
expected agreement is exact.
"""

from __future__ import annotations

import numpy as np

from .core import RuleEngine


def oracle_labels(values, engine: RuleEngine, aux: dict | None = None):
    """Label each value individually → (keep: bool[], first_rule: str[],
    scrubbed: str[]). One engine.apply() call per row."""
    values = np.asarray(values, dtype=object)
    n = len(values)
    keep = np.zeros(n, dtype=bool)
    first_rule = np.empty(n, dtype=object)
    scrubbed = np.empty(n, dtype=object)
    for i in range(n):
        row_aux = {k: np.asarray(v, dtype=object)[i : i + 1] for k, v in (aux or {}).items()}
        res = engine.apply(values[i : i + 1], aux=row_aux or None)
        keep[i] = res.verdict[0] != "DROP"
        first_rule[i] = res.first_rule[0]
        scrubbed[i] = res.values[0]
    return keep, first_rule, scrubbed
