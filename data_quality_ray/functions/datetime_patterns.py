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

# multi-language month names → month number (the reference pins 45 locales;
# we ship the en/fr/de/es sets its date fixtures exercise)
MONTH_NAMES: dict[str, int] = {}
for i, names in enumerate([
    ["january", "jan", "janvier", "januar", "enero", "ene"],
    ["february", "feb", "février", "fevrier", "februar", "febrero"],
    ["march", "mar", "mars", "märz", "maerz", "marzo"],
    ["april", "apr", "avril", "abril"],
    ["may", "mai", "mayo"],
    ["june", "jun", "juin", "juni", "junio"],
    ["july", "jul", "juillet", "juli", "julio"],
    ["august", "aug", "août", "aout", "agosto", "ago"],
    ["september", "sep", "sept", "septembre", "septiembre"],
    ["october", "oct", "octobre", "oktober", "octubre"],
    ["november", "nov", "novembre", "noviembre"],
    ["december", "dec", "décembre", "decembre", "dezember", "diciembre", "dic"],
], start=1):
    names_it = [["gennaio", "gen"], ["febbraio"], ["marzo"], ["aprile"], ["maggio", "mag"],
                ["giugno", "giu"], ["luglio", "lug"], ["agosto"], ["settembre", "set"],
                ["ottobre", "ott"], ["novembre"], ["dicembre"]][i - 1]
    names = list(names) + names_it
    for n in names:
        MONTH_NAMES[n] = i
_MONTH_ANY = "|".join(sorted(MONTH_NAMES, key=len, reverse=True))
_TEXTUAL_DMY = re.compile(rf"^(\d{{1,2}})\.?\s+({_MONTH_ANY})\.?\s+(\d{{4}})$", re.I)
_TEXTUAL_MDY = re.compile(rf"^({_MONTH_ANY})\.?\s+(\d{{1,2}}),?\s+(\d{{4}})$", re.I)
# textual month with -, / or . separators, 2- or 4-digit year:
# 'd-MMM-yyyy', '22/Mar/99', 'Mar.22.1999'
_TEXTUAL_D_M_Y = re.compile(
    rf"^(\d{{1,2}})([-/.])({_MONTH_ANY})\2(\d{{2}}|\d{{4}})$", re.I)
_TEXTUAL_M_D_Y = re.compile(
    rf"^({_MONTH_ANY})([-/.])(\d{{1,2}})\2(\d{{2}}|\d{{4}})$", re.I)

# weekday names (en/fr/de/es/it + English abbreviations) — the EEEE/EEE
# decoration
WEEKDAY_NAMES = frozenset(
    "monday tuesday wednesday thursday friday saturday sunday "
    "mon tue wed thu fri sat sun "
    "lundi mardi mercredi jeudi vendredi samedi dimanche "
    "montag dienstag mittwoch donnerstag freitag samstag sonntag "
    "lunes martes miércoles miercoles jueves viernes sábado sabado domingo "
    "lunedì lunedi martedì martedi mercoledì mercoledi giovedì giovedi "
    "venerdì venerdi sabato domenica".split()
)
_WEEKDAY_ANY = "|".join(sorted(WEEKDAY_NAMES, key=len, reverse=True))
_WEEKDAY_PREFIX_RE = re.compile(rf"^(?:{_WEEKDAY_ANY}),?\s+", re.I)
_CJK_DATE_RE = re.compile(r"^(\d{4})年(\d{1,2})月(\d{1,2})日(?:\s*星期[一二三四五六日天])?$")
# unix ctime: 'Mon Mar 22 05:06:07 CET 1999'
_CTIME_RE = re.compile(
    rf"^(?:{_WEEKDAY_ANY}) ({_MONTH_ANY}) (\d{{1,2}}) (\d{{2}}:\d{{2}}:\d{{2}}) [A-Z]{{2,5}} (\d{{4}})$",
    re.I)
# trailing zone-id / offset decorations on date(-time) values
_ZONE_ID_RE = re.compile(r"\[\w+(?:/\w+)*\]$")
_TRAIL_OFFSET_RE = re.compile(r"(?:[+-]\d{2}(?::?\d{2})?|Z)$")
_ORDINAL_DATE_RE = re.compile(r"^(\d{4})-(\d{3})$")
_ISO_WEEK_RE = re.compile(r"^(\d{4})-?W(\d{2})-?(\d)$")

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
    # EU slash AFTER the US form: '26/1/1969' fails the strict %m/%d parse
    # and falls through to here ('1/2/1969'-style stays US — reference order)
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4}$"), "%d/%m/%Y", "d/M/yyyy"),
    (re.compile(r"^\d{1,2}-\d{1,2}-\d{4}$"), "%m-%d-%Y", "M-d-yyyy"),
    (re.compile(r"^\d{4}-\d{1,2}-\d{1,2}$"), "%Y-%m-%d", "yyyy-M-d"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}:\d{2}$"), "%m/%d/%Y %H:%M:%S", "M/d/yyyy HH:mm:ss"),
    (re.compile(r"^\d{1,2}/\d{1,2}/\d{4} \d{1,2}:\d{2}:\d{2} [AP]M$", re.I), "%m/%d/%Y %I:%M:%S %p", "M/d/yyyy hh:mm:ss a"),
    (re.compile(r"^\d{4}-\d{2}-\d{2} AD$"), "__era__", "yyyy-MM-dd G"),
    # two-digit-year SHORT-style forms (DateSampleTable groups). The
    # reference supports the PADDED EU dd/MM/yy but documents non-padded
    # d/M/yy as unsupported (ListOfInvalidDates '26/1/69') — the \d{2}
    # quantifiers preserve exactly that split.
    (re.compile(r"^\d{2}/\d{2}/\d{2}$"), "%d/%m/%y", "dd/MM/yy"),
    (re.compile(r"^\d{2}-\d{2}-\d{2}$"), "%y-%m-%d", "yy-MM-dd"),
    (re.compile(r"^\d{2}/\d{2}/\d{2}$"), "%y/%m/%d", "yy/MM/dd"),
    (re.compile(r"^\d{2}-\d{1,2}-\d{1,2}$"), "%y-%m-%d", "yy-M-d"),
    (re.compile(r"^\d{2}\.\d{2}\.\d{2}$"), "%y.%m.%d", "yy.MM.dd"),
    (re.compile(r"^\d{1,2}-\d{1,2}-\d{2}$"), "%m-%d-%y", "M-d-yy"),
    (re.compile(r"^\d{1,2}-\d{1,2}-\d{2}$"), "%d-%m-%y", "d-M-yy"),
    (re.compile(r"^\d{2}\.\d{1,2}\.\d{1,2}$"), "%y.%m.%d", "yy.M.d"),
    (re.compile(r"^\d{2}\.\d{1,2}\.\d{1,2}$"), "%y.%d.%m", "yy.d.M"),
    (re.compile(r"^\d{4}\.\d{1,2}\.\d{1,2}$"), "%Y.%d.%m", "yyyy.d.M"),
    (re.compile(r"^\d{2}\. \d{1,2}\. \d{1,2}$"), "%y. %m. %d", "yy. M. d"),
    (re.compile(r"^\d{4}\. \d{1,2}\. \d{1,2}$"), "%Y. %m. %d", "yyyy. M. d"),
    (re.compile(r"^\d{1,2}\.\d{1,2}\.\d{4}$"), "%m.%d.%Y", "M.d.yyyy"),
]

TIME_PATTERNS: list[tuple[re.Pattern, str, str]] = [
    (re.compile(r"^\d{1,2}:\d{2}$"), "%H:%M", "H:mm"),
    (re.compile(r"^\d{1,2}:\d{2}:\d{2}$"), "%H:%M:%S", "H:mm:ss"),
    (re.compile(r"^\d{1,2}:\d{2}:\d{2}\.\d+$"), "%H:%M:%S.%f", "H:mm:ss.S"),
    (re.compile(r"^\d{1,2}:\d{2}\s*[ap]m$", re.I), "%I:%M %p", "h:mm a"),
]

_DATE_CHARS = re.compile(r"^[\w\s:/.,\-+'TZ\[\]]+$", re.UNICODE)


def _precheck(v: str) -> bool:
    # SystemDateTimePatternManager.java:269-292 preconditions: bounded
    # length, must contain a digit, plausible charset.
    return 4 <= len(v) <= 64 and any(c.isdigit() for c in v) and bool(_DATE_CHARS.match(v))


def _try_textual(v: str) -> str | None:
    """Multi-language textual month forms: 'd MONTH yyyy' / 'MONTH d yyyy'
    / 'd-MMM-yyyy' plus the CJK yyyy年M月d日 form."""
    from datetime import date

    def pivot(year: str) -> int:  # strptime %y pivot: 69 → 1969, 68 → 2068
        y = int(year)
        if len(year) == 4:
            return y
        return 2000 + y if y < 69 else 1900 + y

    for rx, name, order in ((_TEXTUAL_DMY, "d MMMM yyyy", "dmy"),
                            (_TEXTUAL_MDY, "MMMM d yyyy", "mdy")):
        m = rx.match(v)
        if m:
            g = m.groups()
            day, mon, year = (g[0], g[1], g[2]) if order == "dmy" else (g[1], g[0], g[2])
            month = MONTH_NAMES.get(mon.lower())
            if month is None:
                continue
            try:
                date(pivot(year), month, int(day))
                return name
            except ValueError:
                continue
    for rx, order in ((_TEXTUAL_D_M_Y, "dmy"), (_TEXTUAL_M_D_Y, "mdy")):
        m = rx.match(v)
        if m:
            g = m.groups()  # (a, sep, b, year)
            day, mon = (g[0], g[2]) if order == "dmy" else (g[2], g[0])
            month = MONTH_NAMES.get(mon.lower())
            if month is None:
                continue
            try:
                date(pivot(g[3]), month, int(day))
                ml = "MMM" if len(mon) <= 3 else "MMMM"
                yl = "yyyy" if len(g[3]) == 4 else "yy"
                sep = g[1]
                return (f"d{sep}{ml}{sep}{yl}" if order == "dmy" else f"{ml}{sep}d{sep}{yl}")
            except ValueError:
                continue
    m = _CJK_DATE_RE.match(v)
    if m:
        try:
            date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
            return "yyyy'年'M'月'd'日'"
        except ValueError:
            pass
    m = _ORDINAL_DATE_RE.match(v)
    if m and 1 <= int(m.group(2)) <= 366:
        return "yyyy-DDD"
    m = _ISO_WEEK_RE.match(v)
    if m and 1 <= int(m.group(2)) <= 53 and 1 <= int(m.group(3)) <= 7:
        return "YYYY'W'wc" if "-" not in v else "YYYY-'W'w-c"
    return None


def _try_core_pattern(v: str, rx, fmt: str, name: str) -> str | None:
    """One (regex prefilter, strict parse) probe — the loop body of the
    reference's isFoundRegex + validateWithPattern pair."""
    if not rx.match(v):
        return None
    if fmt == "__era__":
        try:
            datetime.strptime(v[:-3], "%Y-%m-%d")
            return name
        except ValueError:
            return None
    normalized = v.replace("T", " ") if "T" in v and " " not in v else v
    probe = normalized.replace(",", "") if "," in v else normalized
    try:
        f = fmt.replace("T", " ") if "T" in fmt else fmt
        datetime.strptime(probe, f)
        return name
    except ValueError:
        return None


def _date_core(v: str) -> str | None:
    if v.endswith(".") and re.match(r"^\d", v):  # Hungarian-style '1999.03.22.'
        inner = _date_core(v[:-1])
        if inner is not None and "." in inner:
            return inner + "."
    for rx, fmt, name in DATE_PATTERNS:
        hit = _try_core_pattern(v, rx, fmt, name)
        if hit is not None:
            return hit
    return _try_textual(v)


class SortedList(list):
    """The reference's self-organizing frequency list
    (statistics/type/SortedList.java:28-44): entries are [value, freq]
    pairs kept sorted by descending frequency via adjacent swaps on
    increment (swap is sufficient because one increment changes the
    frequency by exactly 1)."""

    def add_new_value(self, value) -> None:
        self.append([value, 0])

    def increment(self, found_index: int) -> None:
        self[found_index][1] += 1
        f = self[found_index][1]
        j = found_index - 1
        while j >= 0 and self[j][1] < f:
            j -= 1
        if j + 1 != found_index:
            self[j + 1], self[found_index] = self[found_index], self[j + 1]


class FrequentFirstDateRecognizer:
    """Per-analyzer frequent-pattern cache for BOOLEAN date recognition
    (SystemDateTimePatternManager.getDateTimePatterns:323-381 with its
    SortedList cache). Only the any-match decision goes through the
    reordered probe — it is order-invariant by construction; pattern
    ATTRIBUTION (``date_pattern_of``) stays on the deterministic
    fixed-order path so ambiguous values resolve identically everywhere.
    """

    def __init__(self):
        self.cache = SortedList()
        self._cached_names: set[str] = set()
        self._by_name = {name: (rx, fmt, name) for rx, fmt, name in DATE_PATTERNS}

    def is_date(self, v: str | None) -> bool:
        if v is None or not _precheck(v):
            return False
        s = v.strip()
        for i in range(len(self.cache)):
            if _try_core_pattern(s, *self.cache[i][0]) is not None:
                self.cache.increment(i)
                return True
        name = date_pattern_of(v)
        if name is None:
            return False
        core = self._by_name.get(name)
        if core is not None and name not in self._cached_names:
            self.cache.add_new_value(core)
            self._cached_names.add(name)
        return True


@lru_cache(maxsize=65536)
def date_pattern_of(v: str) -> str | None:
    """Return the matched date pattern name (Java-style), or None.

    Composition mirrors the reference's 253-group inventory
    (DateRegexesGrouped.txt): [weekday] DATE-CORE [TIME-TAIL], where the
    weekday decoration is a multilingual EEEE token and the time tail is
    anything ``time_pattern_of`` accepts (itself decoration-aware)."""
    if not _precheck(v):
        return None
    s = v.strip()
    suffix = ""
    m = _ZONE_ID_RE.search(s)
    if m:  # '…[Europe/Paris]' zone-id decoration
        s = s[: m.start()].rstrip()
        suffix = " VV"
    # comma decimal fraction (',SSS' groups) → dot, leaving list commas alone
    s = re.sub(r"(\d),(\d{3})(?=\D|$)", r"\1.\2", s)
    m = _CTIME_RE.match(s)
    if m:
        from datetime import date as _date

        month = MONTH_NAMES.get(m.group(1).lower())
        try:
            if month:
                _date(int(m.group(4)), month, int(m.group(2)))
                if time_pattern_of(m.group(3)):
                    return "EEE MMM dd HH:mm:ss z yyyy"
        except ValueError:
            pass
    prefix = ""
    m = _WEEKDAY_PREFIX_RE.match(s)
    if m:
        s = s[m.end():]
        prefix = "EEEE "
    core = _date_core(s)
    if core is not None:
        return prefix + core + suffix
    # bare trailing offset on a date ('19990322+0100', '1999-03-22+01:00')
    m = _TRAIL_OFFSET_RE.search(s)
    if m and _date_core(s[: m.start()].rstrip()) is not None:
        return prefix + _date_core(s[: m.start()].rstrip()) + " X" + suffix
    # date + time tail (either order): find a split where both recognize
    pos = [i for i, c in enumerate(s) if c == " "]
    for i in pos:
        d, t = s[:i], s[i + 1:]
        dname = _date_core(d)
        if dname is not None:
            tname = time_pattern_of(t)
            if tname is not None:
                return f"{prefix}{dname} {tname}{suffix}"
        dname = _date_core(t)  # time-first forms: '05:06 22/03/99'
        if dname is not None:
            tname = time_pattern_of(d)
            if tname is not None:
                return f"{prefix}{tname} {dname}{suffix}"
    return None


# Time decorations the reference's 46 locale patterns carry around the
# core H:mm[:ss] (TimeSampleTable.txt): am/pm markers (incl. Chinese
# 上午/下午), timezone names (CET/MEZ/...), o'clock / Uhr tokens, UTC
# offsets, dot or CJK (时/時/分/秒) separators, French "5 h 06".
_TIME_AMPM_RE = re.compile(r"(?:^|(?<=[ 上下]))(?:[AP]M)(?=$|[ ])", re.I)
_TIME_CJK_AMPM_RE = re.compile(r"^[上下]午")
_TIME_TZ_RE = re.compile(r"(?<=[ ])[A-Z]{2,5}(?=$|[ ])")
_TIME_OFFSET_RE = re.compile(r"[+-]\d{2}(?::?\d{2})?$")
_TIME_TOKENS_RE = re.compile(r"\b(?:o'?'?clock|Uhr)\b", re.I)
_TIME_CJK_RE = re.compile(r"^(\d{1,2})[时時](\d{1,2})分(?:(\d{1,2})秒)?$")
_TIME_FRH_RE = re.compile(r"^(\d{1,2}) h (\d{2})$")
# colon form may carry fractional seconds; dot-separated form may not
# (else '1.2.3.4' would pass)
_TIME_CORE_RE = re.compile(
    r"^(\d{1,2}):(\d{2})(?::(\d{2})(?:\.\d{1,9})?)?$"
    r"|^(\d{1,2})\.(\d{2})(?:\.(\d{2})(?:\.\d{3,9})?)?$"
)


@lru_cache(maxsize=65536)
def time_pattern_of(v: str) -> str | None:
    if not (3 <= len(v) <= 40):
        return None
    s = v.strip()
    parts = []
    if s.endswith(":"):  # locale forms with a dangling separator ('05:06:')
        s = s[:-1]
    m = re.search(r"\.([A-Z]{2})$", s)
    if m and m.group(1) not in ("AM", "PM"):
        # dot-attached locale day-period marker ('5.06.PD')
        s = s[: m.start()]
        parts.append("a")
    if _TIME_CJK_AMPM_RE.match(s):
        s = s[2:].strip()
        parts.append("a")
    if _TIME_AMPM_RE.search(s):
        s = _TIME_AMPM_RE.sub("", s).strip()
        parts.append("a")
    if _TIME_TOKENS_RE.search(s):
        s = _TIME_TOKENS_RE.sub("", s).strip()
    m = _TIME_OFFSET_RE.search(s)
    if m:
        s = s[: m.start()].strip()
        parts.append("X")
    if _TIME_TZ_RE.search(s):
        s = _TIME_TZ_RE.sub("", s).strip()
        parts.append("z")
        m = re.search(r"\.([A-Z]{2})$", s)  # '.PD' marker was tz-shadowed
        if m and m.group(1) not in ("AM", "PM"):
            s = s[: m.start()]
            if "a" not in parts:
                parts.append("a")
    # a second am/pm may follow the tz ("5:06:07 CET AM")
    if _TIME_AMPM_RE.search(" " + s):
        s = _TIME_AMPM_RE.sub("", " " + s).strip()
        if "a" not in parts:
            parts.append("a")
    s = re.sub(r"\s{2,}", " ", s).strip()
    cjk = _TIME_CJK_RE.match(s)
    if cjk:
        h, mi, sec = cjk.groups()
    else:
        fr = _TIME_FRH_RE.match(s)
        if fr:
            h, mi, sec = fr.group(1), fr.group(2), None
        else:
            core = _TIME_CORE_RE.match(s)
            if not core:
                return None
            g = core.groups()
            h, mi, sec = (g[0], g[1], g[2]) if g[0] is not None else (g[3], g[4], g[5])
    if not (0 <= int(h) <= 23 and 0 <= int(mi) <= 59 and (sec is None or 0 <= int(sec) <= 59)):
        return None
    if "a" in parts and not 0 <= int(h) <= 12:
        return None
    name = ("h" if "a" in parts else "H") + ":mm" + (":ss" if sec is not None else "")
    return " ".join([name] + sorted(set(parts)))


@lru_cache(maxsize=256)
def _custom_strptime(java_pattern: str) -> str:
    from .converters import _java_fmt_to_strptime

    return _java_fmt_to_strptime(java_pattern)


def matches_custom_pattern(v: str, java_pattern: str) -> bool:
    """Strict parse against ONE user-supplied Java-style pattern
    (SystemDateTimePatternManager custom-pattern path:434-447)."""
    try:
        datetime.strptime(v.strip(), _custom_strptime(java_pattern))
        return True
    except (ValueError, re.error):
        return False


def is_date_str(v: str, custom_patterns: tuple[str, ...] = ()) -> bool:
    """Date recognition; ``custom_patterns`` (user Java-style patterns,
    DataTypeAnalyzer.customDateTimePatterns:42) are tried first."""
    if custom_patterns and any(matches_custom_pattern(v, p) for p in custom_patterns):
        return True
    return date_pattern_of(v) is not None


def is_time_str(v: str) -> bool:
    return time_pattern_of(v) is not None
