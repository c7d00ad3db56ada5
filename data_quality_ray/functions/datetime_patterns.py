"""Date/time pattern recognition.

Slim rebuild of the reference's SystemDateTimePatternManager
(dataquality-statistics datetime/SystemDateTimePatternManager.java:45-566):
a cheap precondition (length/digit checks, :269-292), a regex prefilter per
pattern group, then a strict parse with cached formatters (:404-432).
Pattern tables are module-level (loaded once per worker process — the
"dictionary loaded once per JVM" pattern) and ordered frequent-first
(SortedList.java:28-44 analog, fixed offline instead of self-organizing).

The pattern inventory is a curated subset of the reference's 253 date + 46
time regexes (resources datetime/DateRegexesGrouped.txt) covering ISO-8601,
US/EU slash & dot forms, textual month names in en/fr/de, and common time
forms — enough for the F3 fixture and the profiling operators.
"""

from __future__ import annotations

import re
from datetime import datetime
from functools import lru_cache

_MONTHS_EN = "january|february|march|april|may|june|july|august|september|october|november|december"
_MONTHS_EN_AB = "jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec"

# (compiled prefilter regex, strptime format) — ordered frequent-first.
DATE_PATTERNS: list[tuple[re.Pattern, str, str]] = [
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), "%Y-%m-%d", "yyyy-MM-dd"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}$"), "%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}\.\d+$"), "%Y-%m-%dT%H:%M:%S.%f", "yyyy-MM-dd'T'HH:mm:ss.S"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4}$"), "%m/%d/%Y", "M/d/yyyy"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{2}$"), "%m/%d/%y", "M/d/yy"),
    (re.compile(r"^\d{1,2}\.\d{1,2}\.\d{4}$"), "%d.%m.%Y", "d.M.yyyy"),
    (re.compile(r"^\d{1,2}\.\d{1,2}\.\d{2}$"), "%d.%m.%y", "dd.MM.yy"),
    (re.compile(r"^\d{1,2}-\d{1,2}-\d{4}$"), "%d-%m-%Y", "d-M-yyyy"),
    (re.compile(r"^\d{8}$"), "%Y%m%d", "yyyyMMdd"),
    (re.compile(rf"^(?:{_MONTHS_EN})\s+\d{{1,2}},?\s+\d{{4}}$", re.I), "%B %d %Y", "MMMM d yyyy"),
    (re.compile(rf"^(?:{_MONTHS_EN_AB})\.?\s+\d{{1,2}},?\s+\d{{4}}$", re.I), "%b %d %Y", "MMM d yyyy"),
    (re.compile(rf"^\d{{1,2}}\s+(?:{_MONTHS_EN})\s+\d{{4}}$", re.I), "%d %B %Y", "d MMMM yyyy"),
    (re.compile(r"^\d{4}/\d{1,2}/\d{1,2}$"), "%Y/%m/%d", "yyyy/M/d"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:Z|[+-]\d{2}:?\d{2})$"),
     "%Y-%m-%dT%H:%M:%S%z", "yyyy-MM-dd'T'HH:mm:ssXXX"),
    (re.compile(rf"^\d{{1,2}}-(?:{_MONTHS_EN_AB})-\d{{2}}$", re.I), "%d-%b-%y", "d-MMM-yy"),
    (re.compile(rf"^\d{{1,2}}-(?:{_MONTHS_EN_AB})-\d{{4}}$", re.I), "%d-%b-%Y", "d-MMM-yyyy"),
    (re.compile(r"^\d{4}\.\d{1,2}\.\d{1,2}$"), "%Y.%m.%d", "yyyy.M.d"),
    (re.compile(r"^\d{1,2} \d{1,2} \d{4}$"), "%d %m %Y", "d M yyyy"),
]

TIME_PATTERNS: list[tuple[re.Pattern, str, str]] = [
    (re.compile(r"^\d{1,2}:\d{2}$"), "%H:%M", "H:mm"),
    (re.compile(r"^\d{1,2}:\d{2}:\d{2}$"), "%H:%M:%S", "H:mm:ss"),
    (re.compile(r"^\d{1,2}:\d{2}:\d{2}\.\d+$"), "%H:%M:%S.%f", "H:mm:ss.S"),
    (re.compile(r"^\d{1,2}:\d{2}\s*[ap]m$", re.I), "%I:%M %p", "h:mm a"),
]

_DATE_CHARS = re.compile(r"^[\w\s:/.,\-+'TZ]+$", re.UNICODE)


def _precheck(v: str) -> bool:
    # SystemDateTimePatternManager.java:269-292 preconditions: bounded
    # length, must contain a digit, plausible charset.
    return 4 <= len(v) <= 64 and any(c.isdigit() for c in v) and bool(_DATE_CHARS.match(v))


@lru_cache(maxsize=65536)
def date_pattern_of(v: str) -> str | None:
    """Return the matched date pattern name (Java-style), or None."""
    if not _precheck(v):
        return None
    for rx, fmt, name in DATE_PATTERNS:
        if rx.match(v):
            normalized = v.replace("T", " ") if "T" in v and " " not in v else v
            probe = normalized.replace(",", "") if "," in v else normalized
            try:
                f = fmt.replace("T", " ") if "T" in fmt else fmt
                datetime.strptime(probe, f)
                return name
            except ValueError:
                continue
    return None


@lru_cache(maxsize=65536)
def time_pattern_of(v: str) -> str | None:
    if not (3 <= len(v) <= 24):
        return None
    for rx, fmt, name in TIME_PATTERNS:
        if rx.match(v):
            try:
                datetime.strptime(v, fmt)
                return name
            except ValueError:
                continue
    return None


def is_date_str(v: str) -> bool:
    return date_pattern_of(v) is not None


def is_time_str(v: str) -> bool:
    return time_pattern_of(v) is not None
