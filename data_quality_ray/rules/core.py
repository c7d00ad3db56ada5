"""Rule protocol + short-circuit chain engine.

Re-expresses the reference's chain-of-checkers validation pipeline
(dataquality-email api/EmailVerify.java:33-203):

- an ordered list of checkers; evaluation short-circuits on the first
  checker that decides a value (EmailVerify.java:120-150) — here "rule k
  only sees rows still undecided" (the mask is *compacted*, so skipped rows
  cost nothing);
- a correction surface (EmailVerify.getSuggestedEmail:158-173 /
  LocalPartColumnContentCheckerImpl.java:99-140): scrub rules rewrite the
  value in place and mark it CORRECTED;
- verdicts mirror EmailVerifyResult.java:19-27 (VALID→KEEP,
  INVALID→DROP, CORRECTED→CORRECTED);
- per-rule tallies mirror ValueQualityStatistics.java:31-106 (counts +
  capped invalid-value samples; `merge` is the mergeCounts:92-97 analog so
  partition tallies combine into run totals).

Everything operates on numpy object arrays of strings — one call per Arrow
batch, vectorized inside each rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

KEEP, DROP, CORRECTED = "KEEP", "DROP", "CORRECTED"
NO_RULE = ""
SAMPLE_CAP = 10


@dataclass
class DropRule:
    """A named vectorized predicate: True → drop the row, attributing
    ``name`` as its first (deciding) rule. Set ``use_aux=True`` for rules
    that also read side columns (fn(values, aux: dict[str, ndarray]))."""

    name: str
    fn: "callable"  # (values[, aux]) -> np.ndarray[bool]
    use_aux: bool = False

    def __call__(self, values: np.ndarray, aux: dict | None = None) -> np.ndarray:
        out = self.fn(values, aux) if self.use_aux else self.fn(values)
        return np.asarray(out, dtype=bool)


@dataclass
class ScrubRule:
    """A named vectorized rewriter: returns new values; rows whose value
    changed are marked CORRECTED (first changing scrub wins attribution)."""

    name: str
    fn: "callable"  # (values: np.ndarray[object]) -> np.ndarray[object]

    def __call__(self, values: np.ndarray) -> np.ndarray:
        return np.asarray(self.fn(values), dtype=object)


@dataclass
class RuleTally:
    """Mergeable per-rule hit statistics (ValueQualityStatistics analog)."""

    counts: dict[str, int] = field(default_factory=dict)
    samples: dict[str, list[str]] = field(default_factory=dict)
    total: int = 0
    kept: int = 0
    dropped: int = 0
    corrected: int = 0

    def add(self, rule: str, n: int, sample_values: list[str]) -> None:
        self.counts[rule] = self.counts.get(rule, 0) + n
        s = self.samples.setdefault(rule, [])
        if len(s) < SAMPLE_CAP:
            s.extend(sample_values[: SAMPLE_CAP - len(s)])

    def merge(self, other: "RuleTally") -> "RuleTally":
        # ValueQualityStatistics.mergeCounts:92-97 analog.
        for r, n in other.counts.items():
            self.counts[r] = self.counts.get(r, 0) + n
        for r, s in other.samples.items():
            mine = self.samples.setdefault(r, [])
            mine.extend(s[: max(0, SAMPLE_CAP - len(mine))])
        self.total += other.total
        self.kept += other.kept
        self.dropped += other.dropped
        self.corrected += other.corrected
        return self

    def to_row(self) -> dict:
        return {
            "total": self.total,
            "kept": self.kept,
            "dropped": self.dropped,
            "corrected": self.corrected,
            "rule_hits": dict(sorted(self.counts.items())),
        }


@dataclass
class ChainResult:
    verdict: np.ndarray  # object: KEEP/DROP/CORRECTED
    first_rule: np.ndarray  # object: rule name or ""
    values: np.ndarray  # object: (possibly rewritten) values
    tally: RuleTally


class RuleEngine:
    """Ordered drop rules then scrub rules, with short-circuit semantics."""

    def __init__(self, drop_rules: list[DropRule], scrub_rules: list[ScrubRule]):
        self.drop_rules = drop_rules
        self.scrub_rules = scrub_rules

    def rule_matrix(self, values: np.ndarray,
                    aux: dict[str, np.ndarray] | None = None
                    ) -> dict[str, np.ndarray]:
        """Every drop rule evaluated INDEPENDENTLY on every row (no
        short-circuit) — the ablation view: which rules would each row
        trip on its own. ``apply``'s first_rule only attributes the
        chain-order first hit; tuning a chain needs the full matrix
        (sole-reason drops = rows a rule removal would rescue). All
        rules must be null-robust (they are — the chain's empty rule
        otherwise shields them)."""
        values = np.asarray(values, dtype=object)
        out = {}
        for rule in self.drop_rules:
            sub_aux = ({k: np.asarray(v) for k, v in (aux or {}).items()}
                       if rule.use_aux else None)
            out[rule.name] = np.asarray(rule(values, sub_aux), dtype=bool)
        return out

    def apply(self, values: np.ndarray, aux: dict[str, np.ndarray] | None = None) -> ChainResult:
        n = len(values)
        values = np.asarray(values, dtype=object)
        verdict = np.full(n, KEEP, dtype=object)
        first_rule = np.full(n, NO_RULE, dtype=object)
        out_values = values.copy()
        tally = RuleTally(total=n)

        undecided_idx = np.arange(n)
        for rule in self.drop_rules:
            if len(undecided_idx) == 0:
                break
            sub = values[undecided_idx]
            sub_aux = {k: np.asarray(v)[undecided_idx] for k, v in (aux or {}).items()} if rule.use_aux else None
            hit = rule(sub, sub_aux)
            hit_idx = undecided_idx[hit]
            if len(hit_idx):
                verdict[hit_idx] = DROP
                first_rule[hit_idx] = rule.name
                tally.add(rule.name, len(hit_idx), [str(v) for v in values[hit_idx[:SAMPLE_CAP]]])
            undecided_idx = undecided_idx[~hit]

        # scrub rules run (in order) only on surviving rows
        for rule in self.scrub_rules:
            if len(undecided_idx) == 0:
                break
            sub = out_values[undecided_idx]
            new = rule(sub)
            changed = new != sub
            ch_idx = undecided_idx[changed]
            if len(ch_idx):
                out_values[ch_idx] = new[changed]
                newly = ch_idx[verdict[ch_idx] == KEEP]
                verdict[ch_idx] = CORRECTED
                first_rule[newly] = rule.name
                tally.add(rule.name, len(ch_idx), [str(v) for v in values[ch_idx[:SAMPLE_CAP]]])

        tally.kept = int(np.sum(verdict == KEEP))
        tally.dropped = int(np.sum(verdict == DROP))
        tally.corrected = int(np.sum(verdict == CORRECTED))
        return ChainResult(verdict, first_rule, out_values, tally)
