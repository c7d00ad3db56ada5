"""Rule registry — the user-extension surface.

The reference lets callers extend every chain: custom ``IEmailChecker``s
(EmailVerify.addChecker, email/api/EmailVerify.java:101-107), custom
matchers (AttributeMatcherType.CUSTOM), user regexes, custom date
patterns, survivorship expressions. The rebuild equivalent (SURVEY.md §2
"User-extension surface"): a named-rule registry plus config-driven chain
assembly, so a pipeline is just data:

    @register_drop_rule("max_emoji")
    def max_emoji(values, *, limit=3): ...

    engine = build_chain_from_config([
        {"rule": "empty"},
        {"rule": "length", "params": {"min_len": 10, "max_len": 200}},
        {"rule": "max_emoji", "params": {"limit": 2}},
        {"rule": "scrub_email", "kind": "scrub"},
    ])

Built-in heuristics/scrubbers register themselves on import.
"""

from __future__ import annotations

import functools

from . import heuristics as H
from . import scrub as S
from .core import DropRule, RuleEngine, ScrubRule

_DROP_RULES: dict[str, callable] = {}
_SCRUB_RULES: dict[str, callable] = {}


def register_drop_rule(name: str, fn=None):
    """Register a vectorized drop predicate (decorator or direct call)."""
    if fn is not None:
        _DROP_RULES[name] = fn
        return fn

    def deco(f):
        _DROP_RULES[name] = f
        return f

    return deco


def register_scrub_rule(name: str, fn=None):
    if fn is not None:
        _SCRUB_RULES[name] = fn
        return fn

    def deco(f):
        _SCRUB_RULES[name] = f
        return f

    return deco


def available_rules() -> dict[str, list[str]]:
    return {"drop": sorted(_DROP_RULES), "scrub": sorted(_SCRUB_RULES)}


def build_chain_from_config(config: list[dict]) -> RuleEngine:
    """Ordered chain from a config list. Each entry:
    {rule: name, kind?: "drop"|"scrub" (default drop), params?: {...},
     as?: display-name}. Order in the list IS evaluation order (first
    failure wins attribution)."""
    drops: list[DropRule] = []
    scrubs: list[ScrubRule] = []
    for entry in config:
        name = entry["rule"]
        kind = entry.get("kind", "scrub" if name in _SCRUB_RULES and name not in _DROP_RULES else "drop")
        params = entry.get("params", {})
        label = entry.get("as", name)
        if kind == "drop":
            fn = _DROP_RULES[name]
            drops.append(DropRule(label, functools.partial(fn, **params) if params else fn))
        else:
            fn = _SCRUB_RULES[name]
            scrubs.append(ScrubRule(label, functools.partial(fn, **params) if params else fn))
    return RuleEngine(drops, scrubs)


# ---- built-ins ------------------------------------------------------------

register_drop_rule("empty", H.empty_mask)
register_drop_rule("length", H.length_mask)
register_drop_rule("junk_numeric", H.junk_numeric_mask)
register_drop_rule("symbol_ratio", H.symbol_ratio_mask)
register_drop_rule("repetition", H.repetition_mask)
register_drop_rule("char_run", H.char_run_mask)
register_drop_rule("stopword_density", H.stopword_density_mask)
register_scrub_rule("scrub_email", S.scrub_email)
register_scrub_rule("scrub_ssn", S.scrub_ssn)
register_scrub_rule("scrub_phone", S.scrub_phone)
register_scrub_rule("scrub_toxic", S.scrub_toxic)
