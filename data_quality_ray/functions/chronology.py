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

from datetime import date, timedelta

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


def convert_chronology(d: date, chronology: str) -> str:
    """Render an ISO date in another chronology as 'y-m-d' (or
    'Era y-m-d' for Japanese) — the DateCalendarConverter output shape."""
    if chronology == "Japanese":
        era, y, m, dd = to_japanese(d)
        return f"{era} {y}-{m:02d}-{dd:02d}"
    to_fn, _ = CHRONOLOGIES[chronology]
    y, m, dd = to_fn(d)
    return f"{y}-{m:02d}-{dd:02d}"
