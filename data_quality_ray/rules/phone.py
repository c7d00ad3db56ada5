"""Phone parsing/validation with per-region metadata.

Rebuilds the PhoneNumberHandlerBase surface
(dataquality-phone PhoneNumberHandlerBase.java:37-311) without
libphonenumber (absent in this environment): a compact public metadata
table (country code, national-number length range, trunk prefix) for the
major regions backs the reference's API split:

- ``is_possible``  — plausible digit count (isPossiblePhoneNumber:103)
- ``is_valid``     — matches the region's national numbering plan length
                     after trunk-prefix stripping (isValidPhoneNumber:78)
- ``parse``        — (region, country_code, national) (parseToPhoneNumber:54)
- ``format_e164`` / ``format_international`` / ``format_national``
  (formatE164:120, formatInternational:136, formatNational:152)
- ``region_of``    — region from a +CC number (country extraction :261-311)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# region → (country code, min/max national significant digits, trunk prefix)
# public ITU-T E.164 numbering-plan facts for the top calling codes (the
# reference gets these from libphonenumber's metadata, absent here)
REGION_METADATA: dict[str, tuple[str, int, int, str]] = {
    "US": ("1", 10, 10, ""),
    "CA": ("1", 10, 10, ""),
    "GB": ("44", 9, 10, "0"),
    "FR": ("33", 9, 9, "0"),
    "DE": ("49", 10, 11, "0"),
    "JP": ("81", 9, 10, "0"),
    "CN": ("86", 10, 11, "0"),
    "IN": ("91", 10, 10, "0"),
    "AU": ("61", 9, 9, "0"),
    "ES": ("34", 9, 9, ""),
    "IT": ("39", 9, 10, ""),
    "BR": ("55", 10, 11, "0"),
    "MX": ("52", 10, 10, ""),
    "RU": ("7", 10, 10, "8"),
    "KR": ("82", 8, 10, "0"),
    "NL": ("31", 9, 9, "0"),
    "SE": ("46", 7, 9, "0"),
    "NO": ("47", 8, 8, ""),
    "DK": ("45", 8, 8, ""),
    "FI": ("358", 5, 10, "0"),
    "PL": ("48", 9, 9, ""),
    "PT": ("351", 9, 9, ""),
    "CH": ("41", 9, 9, "0"),
    "AT": ("43", 4, 11, "0"),
    "BE": ("32", 8, 9, "0"),
    "IE": ("353", 7, 9, "0"),
    "NZ": ("64", 8, 10, "0"),
    "SG": ("65", 8, 8, ""),
    "HK": ("852", 8, 8, ""),
    "TW": ("886", 8, 9, "0"),
    "TH": ("66", 8, 9, "0"),
    "ID": ("62", 8, 11, "0"),
    "MY": ("60", 7, 9, "0"),
    "PH": ("63", 8, 10, "0"),
    "VN": ("84", 9, 10, "0"),
    "TR": ("90", 10, 10, "0"),
    "SA": ("966", 8, 9, "0"),
    "AE": ("971", 8, 9, "0"),
    "IL": ("972", 8, 9, "0"),
    "EG": ("20", 8, 10, "0"),
    "ZA": ("27", 9, 9, "0"),
    "NG": ("234", 7, 10, "0"),
    "AR": ("54", 10, 10, "0"),
    "CL": ("56", 8, 9, ""),
    "CO": ("57", 10, 10, "0"),
}
_CC_TO_REGION: dict[str, str] = {}
for _r, (_cc, *_rest) in REGION_METADATA.items():
    _CC_TO_REGION.setdefault(_cc, _r)  # first region wins (US for +1)

_STRIP_RE = re.compile(r"[ .\-()/]")


@dataclass
class PhoneNumber:
    region: str
    country_code: str
    national: str


def _digits(value: str) -> str:
    return _STRIP_RE.sub("", value)


def parse(value: str | None, default_region: str = "US") -> PhoneNumber | None:
    """parseToPhoneNumber analog. None when not even possible."""
    if not value:
        return None
    s = _digits(value.strip())
    if s.startswith("+"):
        rest = s[1:]
        if not rest.isdigit():
            return None
        for cc_len in (1, 2, 3):
            cc = rest[:cc_len]
            if cc in _CC_TO_REGION:
                return PhoneNumber(_CC_TO_REGION[cc], cc, rest[cc_len:])
        return None
    if not s.isdigit():
        return None
    meta = REGION_METADATA.get(default_region)
    if meta is None:
        return None
    cc, lo, hi, trunk = meta
    if trunk and s.startswith(trunk) and lo <= len(s) - len(trunk) <= hi:
        s = s[len(trunk):]
    elif s.startswith(cc) and lo <= len(s) - len(cc) <= hi:
        s = s[len(cc):]
    return PhoneNumber(default_region, cc, s)


def is_possible(value: str | None, default_region: str = "US") -> bool:
    """Plausible digit count only (isPossiblePhoneNumber analog)."""
    p = parse(value, default_region)
    return p is not None and 5 <= len(p.national) <= 15 and p.national.isdigit()


def is_valid(value: str | None, default_region: str = "US") -> bool:
    """National length matches the region's numbering plan
    (isValidPhoneNumber analog — stricter than is_possible)."""
    p = parse(value, default_region)
    if p is None or not p.national.isdigit():
        return False
    meta = REGION_METADATA.get(p.region)
    if meta is None:
        return False
    _, lo, hi, _ = meta
    return lo <= len(p.national) <= hi


def format_e164(value: str | None, default_region: str = "US") -> str | None:
    p = parse(value, default_region)
    return None if p is None else f"+{p.country_code}{p.national}"


def format_international(value: str | None, default_region: str = "US") -> str | None:
    p = parse(value, default_region)
    return None if p is None else f"+{p.country_code} {p.national}"


def format_national(value: str | None, default_region: str = "US") -> str | None:
    p = parse(value, default_region)
    if p is None:
        return None
    trunk = REGION_METADATA.get(p.region, ("", 0, 0, ""))[3]
    return trunk + p.national


def region_of(value: str | None, default_region: str = "US") -> str | None:
    p = parse(value, default_region)
    return None if p is None else p.region
