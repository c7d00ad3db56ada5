"""Scalar converters — vectorized batch kernels.

Rebuilds dataquality-converters:
- StringTrimmer (converters/StringTrimmer.java:26-126)
- DuplicateCharEraser (converters/DuplicateCharEraser.java:25-64)
- CharWidthConverter full↔half width (converters/character/CharWidthConverter.java:16-43)
- DistanceConverter / DurationConverter factor tables
  (converters/DistanceConverter.java:36-68, DurationConverter.java:31-106)
- JulianDayConverter (converters/JulianDayConverter.java:41-160) —
  matches DuckDB's ``julian()`` for the oracle.
"""

from __future__ import annotations

import re
import unicodedata
from datetime import datetime

import numpy as np

# reference default pattern (DuplicateCharEraser.java:46): repeated
# whitespace-ish sequences only — any \s, NEL, Unicode Z category, or the
# two-char CRLF unit; char mode collapses just the given char/substring
_DUP_WS_RE = re.compile(
    "([" "\\s" "\u0085\u00a0\u1680\u180e\u2000-\u200a"
    "\u2028\u2029\u202f\u205f\u3000" "]|\r\n)" "\\1+"
)
_DUP_ANY_RE = re.compile(r"(.)\1+", re.DOTALL)


def trim(values, chars: str | None = None) -> np.ndarray:
    return np.array([None if v is None else v.strip(chars) for v in np.asarray(values, dtype=object)],
                    dtype=object)


def erase_duplicate_chars(values, repeat_char: str | None = None) -> np.ndarray:
    """DuplicateCharEraser.removeRepeatedChar semantics
    (converters/DuplicateCharEraser.java:21-64, validated against
    DuplicateCharEraserTest):

    - default: collapse repeated WHITESPACE sequences only ('a  b' →
      'a b', repeated CRLF → one CRLF); letters are untouched
    - ``repeat_char``: collapse runs of exactly that char/substring
      (case-sensitive)
    - ``repeat_char="*"``-style any-char collapse: pass ``repeat_char=...``
      per char, or use ``collapse_all`` for the dedup heuristic
    """
    if repeat_char is None:
        rx, repl = _DUP_WS_RE, r"\1"
    else:
        rx = re.compile("(" + re.escape(repeat_char) + r")\1+")
        repl = r"\1"
    return np.array(
        [None if v is None else rx.sub(repl, v) for v in np.asarray(values, dtype=object)],
        dtype=object,
    )


def collapse_all_repeats(values) -> np.ndarray:
    """'aaabbb' → 'ab' — the aggressive any-char collapse used by the
    caption repetition heuristics (not the reference default)."""
    return np.array(
        [None if v is None else _DUP_ANY_RE.sub(r"\1", v) for v in np.asarray(values, dtype=object)],
        dtype=object,
    )


def to_half_width(values) -> np.ndarray:
    """Full→half width via NFKC (kana-aware like CharWidthConverter)."""
    return np.array(
        [None if v is None else unicodedata.normalize("NFKC", v) for v in np.asarray(values, dtype=object)],
        dtype=object,
    )


# metres per unit (DistanceConverter factor table)
DISTANCE_FACTORS = {
    "MILLIMETER": 0.001, "CENTIMETER": 0.01, "DECIMETER": 0.1, "METER": 1.0,
    "DEKAMETER": 10.0, "HECTOMETER": 100.0, "KILOMETER": 1000.0,
    "INCH": 0.0254, "FOOT": 0.3048, "YARD": 0.9144, "MILE": 1609.344,
    "NAUTICAL_MILE": 1852.0, "LIGHT_YEAR": 9.46073047258e15,
}

# milliseconds per unit (DurationConverter factor table)
DURATION_FACTORS = {
    "MILLISECOND": 1.0, "SECOND": 1000.0, "MINUTE": 60_000.0, "HOUR": 3_600_000.0,
    "DAY": 86_400_000.0, "WEEK": 604_800_000.0, "MONTH": 2_629_800_000.0,
    "YEAR": 31_557_600_000.0,
}


def convert_distance(values, from_unit: str, to_unit: str) -> np.ndarray:
    f = DISTANCE_FACTORS[from_unit] / DISTANCE_FACTORS[to_unit]
    return np.asarray(values, dtype=np.float64) * f


def convert_duration(values, from_unit: str, to_unit: str) -> np.ndarray:
    f = DURATION_FACTORS[from_unit] / DURATION_FACTORS[to_unit]
    return np.asarray(values, dtype=np.float64) * f


_JULIAN_EPOCH_OFFSET = 1721425.0  # DuckDB's julian(): day count from midnight (no 12:00 shift)


def julian_day(ts: datetime) -> float:
    """Julian day number of a (UTC-naive) timestamp; matches DuckDB julian()."""
    frac = (ts.hour * 3600 + ts.minute * 60 + ts.second + ts.microsecond / 1e6) / 86400.0
    return ts.toordinal() + _JULIAN_EPOCH_OFFSET + frac


def julian_days(values) -> np.ndarray:
    """Vectorized fast path for datetime64 input (the hot batch shape) —
    integer microsecond arithmetic, no Python datetime materialization."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.datetime64):
        us = arr.astype("datetime64[us]").astype(np.int64)
        return us / 86400e6 + (719163 + _JULIAN_EPOCH_OFFSET)
    return np.array([julian_day(v) for v in values], dtype=np.float64)


_JAVA_TO_STRPTIME = {
    "yyyy": "%Y", "yy": "%y", "MMMM": "%B", "MMM": "%b", "MM": "%m",
    "dd": "%d", "HH": "%H", "mm": "%M", "ss": "%S", "M": "%m", "d": "%d",
}
_JAVA_TOKEN_RE = re.compile("|".join(sorted(_JAVA_TO_STRPTIME, key=len, reverse=True)))


def _java_fmt_to_strptime(fmt: str) -> str:
    # single-pass tokenized substitution (sequential str.replace would
    # re-substitute the 'd' inside an emitted '%d')
    return _JAVA_TOKEN_RE.sub(lambda m: _JAVA_TO_STRPTIME[m.group(0)], fmt)


def convert_date_format(values, out_format: str = "yyyy-MM-dd") -> np.ndarray:
    """Re-render recognized date strings in ``out_format`` (Java-style
    pattern letters); unrecognized values pass through unchanged
    (DateCalendarConverter.convert:178 shape, ISO chronology only — the
    Hijrah/Japanese/Minguo chronologies need locale tables we don't ship)."""
    from datetime import datetime

    from .datetime_patterns import DATE_PATTERNS, date_pattern_of
    from .text import unique_apply

    by_name = {name: fmt for _, fmt, name in DATE_PATTERNS}
    out_fmt = _java_fmt_to_strptime(out_format)

    def conv(v):
        if v is None:
            return None
        pat = date_pattern_of(v)
        if pat is None:
            return v
        try:
            probe = (v.replace("T", " ") if "T" in v and " " not in v else v).replace(",", "")
            fmt = by_name[pat].replace("T", " ")
            return datetime.strptime(probe, fmt).strftime(out_fmt)
        except (KeyError, ValueError):
            # recognized by a non-strptime recognizer (textual foreign
            # month, era form) — pass through unchanged
            return v

    return unique_apply(np.asarray(values, dtype=object), conv)
