"""Type inference over string values — vectorized.

Re-expresses the reference's per-value type inference
(dataquality-statistics type/TypeInferenceUtils.java:28-224): integer /
double regexes that accept full-width digits ０-９, US/EU grouping,
scientific notation and trailing percent; boolean; empty; date/time via the
datetime pattern manager. Column dominant type uses the 0.5 threshold with
INTEGER folding into DOUBLE (type/DataTypeOccurences.java:41-90).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from .datetime_patterns import is_date_str, is_time_str

# Mirrors TypeInferenceUtils.java:28-45 semantics: optional sign, ASCII or
# full-width digits, optional US (1,234,567) or EU (1.234.567) grouping,
# optional exponent, optional trailing '%'.
_D = "0-9０-９"
INTEGER_RE = re.compile(rf"^[-+]?(?:[{_D}]+|[{_D}]{{1,3}}(?:,[{_D}]{{3}})+)%?$")
DOUBLE_RE = re.compile(
    rf"^[-+]?(?:"
    rf"(?:[{_D}]+|[{_D}]{{1,3}}(?:,[{_D}]{{3}})+)(?:\.[{_D}]*)?"
    rf"|(?:[{_D}]{{1,3}}(?:\.[{_D}]{{3}})+)(?:,[{_D}]*)?"
    rf"|\.[{_D}]+"
    rf")(?:[eE][-+]?[{_D}]+)?%?$"
)
_BOOL = {"true", "false"}

TYPES = ("BOOLEAN", "INTEGER", "DOUBLE", "DATE", "TIME", "STRING", "EMPTY")


def is_empty(v: str | None) -> bool:
    return v is None or v.strip() == ""


def is_integer(v: str) -> bool:
    return bool(v) and bool(INTEGER_RE.match(v))


def is_double(v: str) -> bool:
    return bool(v) and bool(DOUBLE_RE.match(v)) and not INTEGER_RE.match(v)


def is_boolean(v: str) -> bool:
    return v is not None and v.strip().lower() in _BOOL


def infer_type_one(v: str | None) -> str:
    """DataTypeEnum-style verdict for one value (TypeInferenceUtils.getDataType)."""
    if is_empty(v):
        return "EMPTY"
    v = v.strip()
    if is_boolean(v):
        return "BOOLEAN"
    if INTEGER_RE.match(v):
        return "INTEGER"
    if DOUBLE_RE.match(v):
        return "DOUBLE"
    if is_date_str(v):
        return "DATE"
    if is_time_str(v):
        return "TIME"
    return "STRING"


def infer_types(values: np.ndarray) -> np.ndarray:
    """Vectorized type verdicts with per-distinct memoization."""
    from .text import unique_apply

    return unique_apply(values.astype(object), infer_type_one)


def dominant_type(counts: Counter | dict[str, int], threshold: float = 0.5) -> str:
    """Column dominant type (DataTypeOccurences.java:41-90): the most
    frequent non-empty type if its share of non-empty values ≥ threshold;
    INTEGER folds into DOUBLE when DOUBLE present and the union crosses the
    threshold; else STRING."""
    counts = {t: int(n) for t, n in counts.items() if n}
    total = sum(n for t, n in counts.items() if t != "EMPTY")
    if total == 0:
        return "EMPTY"
    best = max((t for t in counts if t != "EMPTY"), key=lambda t: (counts[t], t))
    if counts[best] / total >= threshold:
        return best
    numeric = counts.get("INTEGER", 0) + counts.get("DOUBLE", 0)
    if counts.get("DOUBLE", 0) > 0 and numeric / total >= threshold:
        return "DOUBLE"
    return "STRING"
