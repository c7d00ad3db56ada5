"""Calendar chronology conversions.

Rebuilds DateCalendarConverter's non-ISO chronologies
(converters/DateCalendarConverter.java:43-178,
datetime/ChronologyParameterManager.java:1-141) from public calendar
arithmetic:

- Thai Buddhist: ISO year + 543
- Minguo (ROC):  ISO year − 1911
- Japanese eras: era table (Meiji/Taishō/Shōwa/Heisei/Reiwa start dates)
- Islamic (tabular): the arithmetic 30-year-cycle civil calendar
  (11 leap years per 30; epoch JDN 1948440) — the deterministic variant
  java.time's HijrahChronology approximates with sighting tables.

All functions operate on ``datetime.date`` and are exact inverses of each
other where round-trips are defined.
"""

from __future__ import annotations

from datetime import date

# (era name, start date) — newest first
JAPANESE_ERAS = [
    ("Reiwa", date(2019, 5, 1)),
    ("Heisei", date(1989, 1, 8)),
    ("Showa", date(1926, 12, 25)),
    ("Taisho", date(1912, 7, 30)),
    ("Meiji", date(1868, 10, 23)),
]


def to_thai_buddhist(d: date) -> tuple[int, int, int]:
    return d.year + 543, d.month, d.day


def from_thai_buddhist(year: int, month: int, day: int) -> date:
    return date(year - 543, month, day)


def to_minguo(d: date) -> tuple[int, int, int]:
    return d.year - 1911, d.month, d.day


def from_minguo(year: int, month: int, day: int) -> date:
    return date(year + 1911, month, day)


def to_japanese(d: date) -> tuple[str, int, int, int]:
    for era, start in JAPANESE_ERAS:
        if d >= start:
            return era, d.year - start.year + 1, d.month, d.day
    raise ValueError(f"{d} predates the Meiji era")


def from_japanese(era: str, year: int, month: int, day: int) -> date:
    starts = dict(JAPANESE_ERAS)
    return date(starts[era].year + year - 1, month, day)


# --- tabular Islamic (civil) calendar --------------------------------------

_ISLAMIC_EPOCH_JDN = 1948440  # 1 Muharram 1 AH (civil epoch, Friday)
_LEAP_YEARS_30 = {2, 5, 7, 10, 13, 16, 18, 21, 24, 26, 29}


def _islamic_year_days(y: int) -> int:
    return 355 if ((y - 1) % 30 + 1) in _LEAP_YEARS_30 else 354


def _islamic_month_days(y: int, m: int) -> int:
    if m == 12:
        return 30 if _islamic_year_days(y) == 355 else 29
    return 30 if m % 2 == 1 else 29


def _date_to_jdn(d: date) -> int:
    return d.toordinal() + 1721425


def _jdn_to_date(jdn: int) -> date:
    return date.fromordinal(jdn - 1721425)


def to_islamic(d: date) -> tuple[int, int, int]:
    """Gregorian → tabular Islamic (y, m, d)."""
    days = _date_to_jdn(d) - _ISLAMIC_EPOCH_JDN  # 0-based day count from 1.1.1 AH
    cycles, rem = divmod(days, 10631)  # 30-year cycle = 10631 days
    y = cycles * 30 + 1
    while rem >= _islamic_year_days(y):
        rem -= _islamic_year_days(y)
        y += 1
    m = 1
    while rem >= _islamic_month_days(y, m):
        rem -= _islamic_month_days(y, m)
        m += 1
    return y, m, rem + 1


def from_islamic(year: int, month: int, day: int) -> date:
    days = (year - 1) // 30 * 10631
    for y in range((year - 1) // 30 * 30 + 1, year):
        days += _islamic_year_days(y)
    for m in range(1, month):
        days += _islamic_month_days(year, m)
    return _jdn_to_date(_ISLAMIC_EPOCH_JDN + days + day - 1)


CHRONOLOGIES = {
    "ThaiBuddhist": (to_thai_buddhist, from_thai_buddhist),
    "Minguo": (to_minguo, from_minguo),
    "Hijrah": (to_islamic, from_islamic),
}


# ---------------------------------------------------------------------------
# DateCalendarConverter: pattern × chronology × locale re-rendering
# (converters/DateCalendarConverter.java:43-200; vectors from
# DateCalendarConverterTest.java)
# ---------------------------------------------------------------------------

import re as _re

_MONTHS_ABBR = {
    "en": ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct",
           "Nov", "Dec"],
    "fr": ["janv.", "févr.", "mars", "avr.", "mai", "juin", "juil.", "août",
           "sept.", "oct.", "nov.", "déc."],
    "zh": ["1月", "2月", "3月", "4月", "5月", "6月", "7月", "8月", "9月", "10月",
           "11月", "12月"],
}

# era display names per chronology: (full, narrow) and ja-locale full
_ERA_NAMES = {
    "Iso": {"full": "AD", "narrow": "A"},
    "Hijrah": {"full": "AH", "narrow": "AH"},
    "Minguo": {"full": "Minguo", "narrow": "Minguo"},
    "ThaiBuddhist": {"full": "BE", "narrow": "BE"},
}
_JP_ERA_NARROW = {"Meiji": "M", "Taisho": "T", "Showa": "S", "Heisei": "H", "Reiwa": "R"}
_JP_ERA_JA = {"Meiji": "明治", "Taisho": "大正", "Showa": "昭和", "Heisei": "平成",
              "Reiwa": "令和"}

_PATTERN_TOKEN_RE = _re.compile(r"(G+|y+|u+|M+|d+|.)")


def _tokenize(pattern: str) -> list[str]:
    return _PATTERN_TOKEN_RE.findall(pattern)


_TOKEN_RX = {
    "yyyy": r"(\d{4})", "yyy": r"(\d{3,4})", "yy": r"(\d{2})", "y": r"(\d{1,4})",
    "uuuu": r"(\d{4})", "u": r"(\d{1,4})",
    "MM": r"(\d{2})", "M": r"(\d{1,2})",
    "dd": r"(\d{2})", "d": r"(\d{1,2})",
}


class ChronoDateConverter:
    """convert(s): parse ``s`` with the input pattern under the input
    chronology, re-render under the output chronology/pattern/locale.
    Unparseable input → "" (DateCalendarConverter.convert:160-178);
    null/blank input → unchanged.

    Japanese year-of-era input WITHOUT an era field resolves to Heisei —
    the reference's own vectors fix this interpretation (JAPANESE_STR
    "0008-10-29" ↔ 1996-10-29, JAPANESE_STR_1 "0031-04-30" ↔ 2019-04-30).
    """

    def __init__(self, in_pattern: str = "yyyy-MM-dd", out_pattern: str | None = None,
                 in_chronology: str = "Iso", out_chronology: str = "Iso",
                 in_locale: str = "en", out_locale: str = "en"):
        self.in_chronology = in_chronology
        self.out_chronology = out_chronology
        self.in_pattern = in_pattern
        self.out_pattern = out_pattern if out_pattern is not None else (
            "yyyy-MM-dd G" if out_chronology == "Japanese" else "yyyy-MM-dd")
        self.in_locale, self.out_locale = in_locale, out_locale
        self._in_tokens = _tokenize(self.in_pattern)
        self._out_tokens = _tokenize(self.out_pattern)
        rx, groups = [], []
        for t in self._in_tokens:
            if t in _TOKEN_RX:
                rx.append(_TOKEN_RX[t])
                groups.append(t[0])
            elif t[0] == "M" and len(t) >= 3:
                rx.append(r"([^\s/]+)")
                groups.append("MMM")
            elif t[0] == "G":
                rx.append(r"(\S+)")
                groups.append("G")
            else:
                rx.append(_re.escape(t))
        self._in_rx = _re.compile("".join(rx) + r"\Z")
        self._in_groups = groups

    # -- parse ---------------------------------------------------------------

    def _parse(self, s: str) -> date | None:
        m = self._in_rx.match(s.strip())
        if not m:
            return None
        fields: dict[str, object] = {}
        gi = 0
        for g in self._in_groups:
            gi += 1
            fields[g] = m.group(gi)
        try:
            y = int(fields.get("y", fields.get("u", 0)))
            mo = int(fields["M"]) if "M" in fields else self._month_from_name(
                str(fields["MMM"]), self.in_locale)
            d = int(fields["d"])
            era = fields.get("G")
            return self._to_iso(y, mo, d, era)
        except (KeyError, ValueError, TypeError):
            return None

    def _month_from_name(self, name: str, locale: str) -> int:
        months = _MONTHS_ABBR.get(locale, _MONTHS_ABBR["en"])
        return months.index(name) + 1

    def _to_iso(self, y: int, m: int, d: int, era) -> date | None:
        c = self.in_chronology
        try:
            if c == "Iso":
                return date(y, m, d)
            if c == "Japanese":
                era_name = None
                if era:
                    rev = {v: k for k, v in _JP_ERA_NARROW.items()}
                    rev.update({v: k for k, v in _JP_ERA_JA.items()})
                    era_name = rev.get(str(era), str(era))
                    if era_name not in dict(JAPANESE_ERAS):
                        return None
                else:
                    era_name = "Heisei"
                out = from_japanese(era_name, y, m, d)
                # strict: year-of-era must fall inside the era's range
                if to_japanese(out)[0] != era_name:
                    return None
                return out
            to_fn, from_fn = CHRONOLOGIES[c]
            return from_fn(y, m, d)
        except ValueError:
            return None

    # -- render --------------------------------------------------------------

    def _render(self, iso: date) -> str:
        c = self.out_chronology
        era_name = None
        if c == "Iso":
            y, mo, d = iso.year, iso.month, iso.day
        elif c == "Japanese":
            era_name, y, mo, d = to_japanese(iso)
        else:
            y, mo, d = CHRONOLOGIES[c][0](iso)
        out = []
        for t in self._out_tokens:
            k = t[0]
            if k in "yu":
                out.append(str(y % 100).zfill(2) if len(t) == 2 else str(y).zfill(len(t)))
            elif k == "M":
                if len(t) >= 3:
                    out.append(_MONTHS_ABBR.get(self.out_locale, _MONTHS_ABBR["en"])[mo - 1])
                else:
                    out.append(str(mo).zfill(len(t)))
            elif k == "d":
                out.append(str(d).zfill(len(t)))
            elif k == "G":
                narrow = len(t) >= 5
                if c == "Japanese":
                    if self.out_locale == "ja":
                        out.append(_JP_ERA_JA[era_name])
                    else:
                        out.append(_JP_ERA_NARROW[era_name] if narrow else era_name)
                else:
                    names = _ERA_NAMES[c]
                    out.append(names["narrow"] if narrow else names["full"])
            else:
                out.append(t)
        return "".join(out)

    def convert(self, s: str | None) -> str | None:
        if s is None or s.strip() == "":
            return s
        # the reference substitutes y→u in the input pattern (strict
        # resolver, DateCalendarConverter.java:137-139) BEFORE its
        # same-pattern short-circuit, so the short-circuit only fires for
        # patterns without 'y' (or with an era field)
        eff_in = self.in_pattern if "G" in self.in_pattern else self.in_pattern.replace("y", "u")
        if self.in_chronology == self.out_chronology and eff_in == self.out_pattern:
            return s
        iso = self._parse(s)
        return self._render(iso) if iso is not None else ""

    _PROCESS_MEMO: dict = {}  # (config, value) results shared across batches

    def convert_values(self, values):
        """Vectorized over a column, memoized per distinct value PER
        WORKER PROCESS (a date column has few distinct values; per-batch
        memoization alone re-converts them once per batch)."""
        import numpy as np

        cfg = (self.in_pattern, self.out_pattern, self.in_chronology,
               self.out_chronology, self.in_locale, self.out_locale)
        memo = ChronoDateConverter._PROCESS_MEMO.setdefault(cfg, {})
        vals = np.asarray(values, dtype=object)
        out = np.empty(len(vals), dtype=object)
        get = memo.get
        for i, v in enumerate(vals):
            r = get(v, memo)
            if r is memo:  # sentinel: not cached
                r = memo[v] = self.convert(v)
            out[i] = r
        return out


def convert_chronology(d: date, chronology: str) -> str:
    """Render an ISO date in another chronology as 'y-m-d' (or
    'Era y-m-d' for Japanese) — the DateCalendarConverter output shape."""
    if chronology == "Japanese":
        era, y, m, dd = to_japanese(d)
        return f"{era} {y}-{m:02d}-{dd:02d}"
    to_fn, _ = CHRONOLOGIES[chronology]
    y, m, dd = to_fn(d)
    return f"{y}-{m:02d}-{dd:02d}"
