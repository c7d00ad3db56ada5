"""Phonetic encoders for record-linkage matchers and blocking keys.

Implementations follow the published algorithms as shipped by
commons-codec (the reference's dependency) so reference test vectors hold:

- ``metaphone``: Lawrence Philips' 1990 Metaphone, commons-codec rules,
  default max code length 4 (MetaphoneMatcher.java:31).
- ``double_metaphone``: Philips' 2000 Double Metaphone (primary +
  alternate codes), commons-codec control flow, max length 4
  (DoubleMetaphoneMatcher.java:33).
- ``cologne_phonetic``: Kölner Phonetik (Postel 1969), commons-codec
  semantics (AlgoBox.colognePhonetic, windowkey/AlgoBox.java:394).
- ``soundex_fr``: the Sun "Soundex2" French soundex as vendored by the
  reference (contribs/algorithm/SoundexFR.java:80-210).
- ``sc_difference``: SoundexUtils.difference — count of positions whose
  characters agree; the shared similarity numerator
  (DoubleMetaphoneMatcher.java:46, SoundexFRMatcher.java:62).
"""

from __future__ import annotations

import unicodedata

_VOWELS_DM = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY", "IB", "IL",
                                     "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


def sc_difference(a: str, b: str) -> int:
    """commons SoundexUtils.difference: matching chars at equal positions."""
    return sum(1 for x, y in zip(a, b) if x == y)


# ---------------------------------------------------------------------------
# Metaphone (1990)
# ---------------------------------------------------------------------------

_FRONTV = "EIY"
_VARSON = "CSPTG"
_VOWELS_M = "AEIOU"


def metaphone(txt: str | None, max_len: int = 4) -> str:
    if not txt:
        return ""
    if len(txt) == 1:
        return txt.upper()
    inwd = txt.upper()

    # initial-two-letter exceptions
    first, second = inwd[0], inwd[1]
    if first in "KGP" and second == "N":
        local = inwd[1:]
    elif first == "A" and second == "E":
        local = inwd[1:]
    elif first == "W" and second == "R":
        local = inwd[1:]
    elif first == "W" and second == "H":
        local = "W" + inwd[2:]
    elif first == "X":
        local = "S" + inwd[1:]
    else:
        local = inwd

    wdsz = len(local)
    code: list[str] = []
    n = 0

    def prev_is(i, c):
        return i > 0 and local[i - 1] == c

    def next_is(i, c):
        return i + 1 < wdsz and local[i + 1] == c

    def is_last(i):
        return i == wdsz - 1

    def vowel_at(i):
        return 0 <= i < wdsz and local[i] in _VOWELS_M

    def region(i, s):
        return local[i : i + len(s)] == s

    while len(code) < max_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):
            n += 1
            continue
        if symb in _VOWELS_M:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev_is(n, "M") and is_last(n)):
                code.append("B")
        elif symb == "C":
            if prev_is(n, "S") and not is_last(n) and local[n + 1] in _FRONTV:
                pass  # SCI, SCE, SCY
            elif region(n, "CIA"):
                code.append("X")
            elif not is_last(n) and local[n + 1] in _FRONTV:
                code.append("S")
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and not vowel_at(2):
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if n + 1 < wdsz - 1 and next_is(n, "G") and local[n + 2] in _FRONTV:
                code.append("J")
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = (is_last(n + 1) and next_is(n, "H")) or (
                not is_last(n + 1) and next_is(n, "H") and not vowel_at(n + 2)
            ) or (n > 0 and (region(n, "GN") or region(n, "GNED")))
            if not silent:
                hard = prev_is(n, "G")
                if not is_last(n) and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if not (is_last(n) or (n > 0 and local[n - 1] in _VARSON)):
                if vowel_at(n + 1):
                    code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not prev_is(n, "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if not is_last(n) and vowel_at(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_len])


# ---------------------------------------------------------------------------
# Double Metaphone (2000) — primary + alternate
# ---------------------------------------------------------------------------


class _DMResult:
    def __init__(self, max_len: int):
        self.max_len = max_len
        self.primary: list[str] = []
        self.alternate: list[str] = []

    def append(self, pri: str, alt: str | None = None):
        self.append_primary(pri)
        self.append_alternate(pri if alt is None else alt)

    def append_primary(self, s: str):
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str):
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    @property
    def complete(self) -> bool:
        return len(self.primary) >= self.max_len and len(self.alternate) >= self.max_len


def _contains(value: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(value):
        return False
    return value[start : start + length] in criteria


def _char_at(value: str, index: int) -> str:
    if index < 0 or index >= len(value):
        return "\0"
    return value[index]


def _is_vowel_dm(ch: str) -> bool:
    return ch in _VOWELS_DM


def double_metaphone(value: str | None, max_len: int = 4,
                     alternate: bool = False) -> str | None:
    """Primary (or alternate) Double Metaphone code; None for null/blank
    input (commons cleanInput semantics — the matcher maps that to 0)."""
    if value is None:
        return None
    value = value.strip()
    if not value:
        return None
    value = value.upper()
    slavo = ("W" in value) or ("K" in value) or ("CZ" in value) or ("WITZ" in value)
    index = 1 if value.startswith(_SILENT_START) else 0
    result = _DMResult(max_len)

    length = len(value)
    while not result.complete and index <= length - 1:
        ch = value[index]
        if ch in _VOWELS_DM:
            if index == 0:
                result.append("A")
            index += 1
        elif ch == "B":
            result.append("P")
            index += 2 if _char_at(value, index + 1) == "B" else 1
        elif ch == "Ç":
            result.append("S")
            index += 1
        elif ch == "C":
            index = _dm_c(value, result, index)
        elif ch == "D":
            index = _dm_d(value, result, index)
        elif ch == "F":
            result.append("F")
            index += 2 if _char_at(value, index + 1) == "F" else 1
        elif ch == "G":
            index = _dm_g(value, result, index, slavo)
        elif ch == "H":
            index = _dm_h(value, result, index)
        elif ch == "J":
            index = _dm_j(value, result, index, slavo)
        elif ch == "K":
            result.append("K")
            index += 2 if _char_at(value, index + 1) == "K" else 1
        elif ch == "L":
            index = _dm_l(value, result, index)
        elif ch == "M":
            result.append("M")
            index += 2 if _dm_m0(value, index) else 1
        elif ch == "N":
            result.append("N")
            index += 2 if _char_at(value, index + 1) == "N" else 1
        elif ch == "Ñ":
            result.append("N")
            index += 1
        elif ch == "P":
            index = _dm_p(value, result, index)
        elif ch == "Q":
            result.append("K")
            index += 2 if _char_at(value, index + 1) == "Q" else 1
        elif ch == "R":
            index = _dm_r(value, result, index, slavo)
        elif ch == "S":
            index = _dm_s(value, result, index, slavo)
        elif ch == "T":
            index = _dm_t(value, result, index)
        elif ch == "V":
            result.append("F")
            index += 2 if _char_at(value, index + 1) == "V" else 1
        elif ch == "W":
            index = _dm_w(value, result, index)
        elif ch == "X":
            index = _dm_x(value, result, index)
        elif ch == "Z":
            index = _dm_z(value, result, index, slavo)
        else:
            index += 1
    return "".join(result.alternate if alternate else result.primary)


def _dm_c(value, result, index):
    if _dm_c0(value, index):
        result.append("K")
        return index + 2
    if index == 0 and _contains(value, index, 6, "CAESAR"):
        result.append("S")
        return index + 2
    if _contains(value, index, 2, "CH"):
        return _dm_ch(value, result, index)
    if _contains(value, index, 2, "CZ") and not _contains(value, index - 2, 4, "WICZ"):
        result.append("S", "X")
        return index + 2
    if _contains(value, index + 1, 3, "CIA"):
        result.append("X")
        return index + 3
    if _contains(value, index, 2, "CC") and not (index == 1 and _char_at(value, 0) == "M"):
        return _dm_cc(value, result, index)
    if _contains(value, index, 2, "CK", "CG", "CQ"):
        result.append("K")
        return index + 2
    if _contains(value, index, 2, "CI", "CE", "CY"):
        if _contains(value, index, 3, "CIO", "CIE", "CIA"):
            result.append("S", "X")
        else:
            result.append("S")
        return index + 2
    result.append("K")
    if _contains(value, index + 1, 2, " C", " Q", " G"):
        return index + 3
    if _contains(value, index + 1, 1, "C", "K", "Q") and \
            not _contains(value, index + 1, 2, "CE", "CI"):
        return index + 2
    return index + 1


def _dm_c0(value, index):
    if _contains(value, index, 4, "CHIA"):
        return True
    if index <= 1:
        return False
    if _is_vowel_dm(_char_at(value, index - 2)):
        return False
    if not _contains(value, index - 1, 3, "ACH"):
        return False
    c = _char_at(value, index + 2)
    return (c != "I" and c != "E") or _contains(value, index - 2, 6, "BACHER", "MACHER")


def _dm_cc(value, result, index):
    if _contains(value, index + 2, 1, "I", "E", "H") and \
            not _contains(value, index + 2, 2, "HU"):
        if (index == 1 and _char_at(value, index - 1) == "A") or \
                _contains(value, index - 1, 5, "UCCEE", "UCCES"):
            result.append("KS")
        else:
            result.append("X")
        return index + 3
    result.append("K")
    return index + 2


def _dm_ch(value, result, index):
    if index > 0 and _contains(value, index, 4, "CHAE"):
        result.append("K", "X")
        return index + 2
    if _dm_ch0(value, index):
        result.append("K")
        return index + 2
    if _dm_ch1(value, index):
        result.append("K")
        return index + 2
    if index > 0:
        if _contains(value, 0, 2, "MC"):
            result.append("K")
        else:
            result.append("X", "K")
    else:
        result.append("X")
    return index + 2


def _dm_ch0(value, index):
    if index != 0:
        return False
    if not _contains(value, index + 1, 5, "HARAC", "HARIS") and \
            not _contains(value, index + 1, 3, "HOR", "HYM", "HIA", "HEM"):
        return False
    if _contains(value, 0, 5, "CHORE"):
        return False
    return True


def _dm_ch1(value, index):
    return (_contains(value, 0, 4, "VAN ", "VON ") or _contains(value, 0, 3, "SCH") or
            _contains(value, index - 2, 6, "ORCHES", "ARCHIT", "ORCHID") or
            _contains(value, index + 2, 1, "T", "S") or
            ((_contains(value, index - 1, 1, "A", "O", "U", "E") or index == 0) and
             (_contains(value, index + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE) or
              index + 1 == len(value) - 1)))


def _dm_d(value, result, index):
    if _contains(value, index, 2, "DG"):
        if _contains(value, index + 2, 1, "I", "E", "Y"):
            result.append("J")
            return index + 3
        result.append("TK")
        return index + 2
    if _contains(value, index, 2, "DT", "DD"):
        result.append("T")
        return index + 2
    result.append("T")
    return index + 1


def _dm_g(value, result, index, slavo):
    if _char_at(value, index + 1) == "H":
        return _dm_gh(value, result, index)
    if _char_at(value, index + 1) == "N":
        if index == 1 and _is_vowel_dm(_char_at(value, 0)) and not slavo:
            result.append("KN", "N")
        elif not _contains(value, index + 2, 2, "EY") and \
                _char_at(value, index + 1) != "Y" and not slavo:
            result.append("N", "KN")
        else:
            result.append("KN")
        return index + 2
    if _contains(value, index + 1, 2, "LI") and not slavo:
        result.append("KL", "L")
        return index + 2
    if index == 0 and (_char_at(value, index + 1) == "Y" or
                       _contains(value, index + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        result.append("K", "J")
        return index + 2
    if (_contains(value, index + 1, 2, "ER") or _char_at(value, index + 1) == "Y") and \
            not _contains(value, 0, 6, "DANGER", "RANGER", "MANGER") and \
            not _contains(value, index - 1, 1, "E", "I") and \
            not _contains(value, index - 1, 3, "RGY", "OGY"):
        result.append("K", "J")
        return index + 2
    if _contains(value, index + 1, 1, "E", "I", "Y") or \
            _contains(value, index - 1, 4, "AGGI", "OGGI"):
        if _contains(value, 0, 4, "VAN ", "VON ") or _contains(value, 0, 3, "SCH") or \
                _contains(value, index + 1, 2, "ET"):
            result.append("K")
        elif _contains(value, index + 1, 3, "IER"):
            result.append("J")
        else:
            result.append("J", "K")
        return index + 2
    if _char_at(value, index + 1) == "G":
        result.append("K")
        return index + 2
    result.append("K")
    return index + 1


def _dm_gh(value, result, index):
    if index > 0 and not _is_vowel_dm(_char_at(value, index - 1)):
        result.append("K")
        return index + 2
    if index == 0:
        if _char_at(value, index + 2) == "I":
            result.append("J")
        else:
            result.append("K")
        return index + 2
    if (index > 1 and _contains(value, index - 2, 1, "B", "H", "D")) or \
            (index > 2 and _contains(value, index - 3, 1, "B", "H", "D")) or \
            (index > 3 and _contains(value, index - 4, 1, "B", "H")):
        return index + 2
    if index > 2 and _char_at(value, index - 1) == "U" and \
            _contains(value, index - 3, 1, "C", "G", "L", "R", "T"):
        result.append("F")
    elif index > 0 and _char_at(value, index - 1) != "I":
        result.append("K")
    return index + 2


def _dm_h(value, result, index):
    if (index == 0 or _is_vowel_dm(_char_at(value, index - 1))) and \
            _is_vowel_dm(_char_at(value, index + 1)):
        result.append("H")
        return index + 2
    return index + 1


def _dm_j(value, result, index, slavo):
    if _contains(value, index, 4, "JOSE") or _contains(value, 0, 4, "SAN "):
        if (index == 0 and _char_at(value, index + 4) == " ") or \
                len(value) == 4 or _contains(value, 0, 4, "SAN "):
            result.append("H")
        else:
            result.append("J", "H")
        return index + 1
    if index == 0 and not _contains(value, index, 4, "JOSE"):
        result.append("J", "A")
    elif _is_vowel_dm(_char_at(value, index - 1)) and not slavo and \
            (_char_at(value, index + 1) == "A" or _char_at(value, index + 1) == "O"):
        result.append("J", "H")
    elif index == len(value) - 1:
        result.append("J", " ")
    elif not _contains(value, index + 1, 1, *_L_T_K_S_N_M_B_Z) and \
            not _contains(value, index - 1, 1, "S", "K", "L"):
        result.append("J")
    return index + 2 if _char_at(value, index + 1) == "J" else index + 1


def _dm_l(value, result, index):
    if _char_at(value, index + 1) == "L":
        if _dm_l0(value, index):
            result.append_primary("L")
        else:
            result.append("L")
        return index + 2
    result.append("L")
    return index + 1


def _dm_l0(value, index):
    if index == len(value) - 3 and \
            _contains(value, index - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return (_contains(value, len(value) - 2, 2, "AS", "OS") or
            _contains(value, len(value) - 1, 1, "A", "O")) and \
        _contains(value, index - 1, 4, "ALLE")


def _dm_m0(value, index):
    if _char_at(value, index + 1) == "M":
        return True
    return _contains(value, index - 1, 3, "UMB") and \
        (index + 1 == len(value) - 1 or _contains(value, index + 2, 2, "ER"))


def _dm_p(value, result, index):
    if _char_at(value, index + 1) == "H":
        result.append("F")
        return index + 2
    result.append("P")
    return index + 2 if _contains(value, index + 1, 1, "P", "B") else index + 1


def _dm_r(value, result, index, slavo):
    if index == len(value) - 1 and not slavo and \
            _contains(value, index - 2, 2, "IE") and \
            not _contains(value, index - 4, 2, "ME", "MA"):
        result.append_alternate("R")
    else:
        result.append("R")
    return index + 2 if _char_at(value, index + 1) == "R" else index + 1


def _dm_s(value, result, index, slavo):
    if _contains(value, index - 1, 3, "ISL", "YSL"):
        return index + 1
    if index == 0 and _contains(value, index, 5, "SUGAR"):
        result.append("X", "S")
        return index + 1
    if _contains(value, index, 2, "SH"):
        if _contains(value, index + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            result.append("S")
        else:
            result.append("X")
        return index + 2
    if _contains(value, index, 3, "SIO", "SIA") or _contains(value, index, 4, "SIAN"):
        if slavo:
            result.append("S")
        else:
            result.append("S", "X")
        return index + 3
    if (index == 0 and _contains(value, index + 1, 1, "M", "N", "L", "W")) or \
            _contains(value, index + 1, 1, "Z"):
        result.append("S", "X")
        return index + 2 if _contains(value, index + 1, 1, "Z") else index + 1
    if _contains(value, index, 2, "SC"):
        return _dm_sc(value, result, index)
    if index == len(value) - 1 and _contains(value, index - 2, 2, "AI", "OI"):
        result.append_alternate("S")
    else:
        result.append("S")
    return index + 2 if _contains(value, index + 1, 1, "S", "Z") else index + 1


def _dm_sc(value, result, index):
    if _char_at(value, index + 2) == "H":
        if _contains(value, index + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(value, index + 3, 2, "ER", "EN"):
                result.append("X", "SK")
            else:
                result.append("SK")
        else:
            if index == 0 and not _is_vowel_dm(_char_at(value, 3)) and \
                    _char_at(value, 3) != "W":
                result.append("X", "S")
            else:
                result.append("X")
    elif _contains(value, index + 2, 1, "I", "E", "Y"):
        result.append("S")
    else:
        result.append("SK")
    return index + 3


def _dm_t(value, result, index):
    if _contains(value, index, 4, "TION"):
        result.append("X")
        return index + 3
    if _contains(value, index, 3, "TIA", "TCH"):
        result.append("X")
        return index + 3
    if _contains(value, index, 2, "TH") or _contains(value, index, 3, "TTH"):
        if _contains(value, index + 2, 2, "OM", "AM") or \
                _contains(value, 0, 4, "VAN ", "VON ") or _contains(value, 0, 3, "SCH"):
            result.append("T")
        else:
            result.append("0", "T")
        return index + 2
    result.append("T")
    return index + 2 if _contains(value, index + 1, 1, "T", "D") else index + 1


def _dm_w(value, result, index):
    if _contains(value, index, 2, "WR"):
        result.append("R")
        return index + 2
    if index == 0 and (_is_vowel_dm(_char_at(value, index + 1)) or
                       _contains(value, index, 2, "WH")):
        if _is_vowel_dm(_char_at(value, index + 1)):
            result.append("A", "F")
        else:
            result.append("A")
        return index + 1
    if (index == len(value) - 1 and _is_vowel_dm(_char_at(value, index - 1))) or \
            _contains(value, index - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") or \
            _contains(value, 0, 3, "SCH"):
        result.append_alternate("F")
        return index + 1
    if _contains(value, index, 4, "WICZ", "WITZ"):
        result.append("TS", "FX")
        return index + 4
    return index + 1


def _dm_x(value, result, index):
    if index == 0:
        result.append("S")
        return index + 1
    if not (index == len(value) - 1 and
            (_contains(value, index - 3, 3, "IAU", "EAU") or
             _contains(value, index - 2, 2, "AU", "OU"))):
        result.append("KS")
    return index + 2 if _contains(value, index + 1, 1, "C", "X") else index + 1


def _dm_z(value, result, index, slavo):
    if _char_at(value, index + 1) == "H":
        result.append("J")
        return index + 2
    if _contains(value, index + 1, 2, "ZO", "ZI", "ZA") or \
            (slavo and index > 0 and _char_at(value, index - 1) != "T"):
        result.append("S", "TS")
    else:
        result.append("S")
    return index + 2 if _char_at(value, index + 1) == "Z" else index + 1


# ---------------------------------------------------------------------------
# Kölner Phonetik (Cologne phonetic)
# ---------------------------------------------------------------------------

_COLOGNE_PRE = str.maketrans({"Ä": "A", "Ö": "O", "Ü": "U", "ß": "S"})


def cologne_phonetic(text: str | None) -> str | None:
    if text is None:
        return None
    word = text.upper().translate(_COLOGNE_PRE)
    chars = [c for c in word if "A" <= c <= "Z"]
    n = len(chars)
    codes: list[str] = []
    for i, c in enumerate(chars):
        nxt = chars[i + 1] if i + 1 < n else "\0"
        prev = chars[i - 1] if i > 0 else "\0"
        if c in "AEIJOUY":
            code = "0"
        elif c == "B":
            code = "1"
        elif c == "P":
            code = "3" if nxt == "H" else "1"
        elif c in "DT":
            code = "8" if nxt in "CSZ" else "2"
        elif c in "FVW":
            code = "3"
        elif c in "GKQ":
            code = "4"
        elif c == "C":
            if i == 0:
                code = "4" if nxt in "AHKLOQRUX" else "8"
            elif prev in "SZ":
                code = "8"
            elif nxt in "AHKOQUX":
                code = "4"
            else:
                code = "8"
        elif c == "X":
            code = "8" if prev in "CKQ" else "48"
        elif c == "L":
            code = "5"
        elif c in "MN":
            code = "6"
        elif c == "R":
            code = "7"
        elif c in "SZ":
            code = "8"
        else:  # H and anything else: no code
            continue
        codes.append(code)
    flat = "".join(codes)
    # collapse consecutive duplicates, then drop non-leading zeros
    out = []
    for i, c in enumerate(flat):
        if i > 0 and flat[i - 1] == c:
            continue
        if c == "0" and out:
            continue
        out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# SoundexFR (Soundex2) — contribs/algorithm/SoundexFR.java
# ---------------------------------------------------------------------------

_FR_G1_IN = ["GUI", "GUE", "GA", "GO", "GU", "CA", "CO", "CU", "Q", "CC", "CK"]
_FR_G1_OUT = ["KI", "KE", "KA", "KO", "K", "KA", "KO", "KU", "K", "K", "K"]
_FR_G2_IN = ["MAC", "ASA", "KN", "PF", "SCH", "PH"]
_FR_G2_OUT = ["MCC", "AZA", "NN", "FF", "SSS", "FF"]


def _strip_mark(ch: str) -> str:
    d = unicodedata.normalize("NFD", ch)
    base = "".join(c for c in d if not unicodedata.combining(c))
    return base if base else ch


def soundex_fr(s: str | None) -> str | None:
    if s is None:
        return None
    t = s.strip()
    if len(t) == 0:
        return "    "
    t = t.upper()
    if len(t) == 1:
        return t + "   "
    # drop non-letters; strip diacritics for chars beyond U+00BF
    word = []
    for ch in t:
        if not ch.isalpha():
            continue
        word.append(_strip_mark(ch) if ord(ch) > 191 else ch)
    t = "".join(word)
    for a, b in zip(_FR_G1_IN, _FR_G1_OUT):
        t = t.replace(a, b)
    # replace vowels E,I,O,U (appearing at position >= 1) with A — the
    # reference's String.replace replaces EVERY occurrence incl. index 0
    for i in range(1, len(t)):
        if t[i] in "EIOU":
            t = t.replace(t[i], "A")
    for a, b in zip(_FR_G2_IN, _FR_G2_OUT):
        t = t.replace(a, b)
    # remove H unless preceded by C or S
    w: list[str] = []
    for ch in t:
        if ch == "H" and not (w and w[-1] in "CS"):
            continue
        w.append(ch)
    # remove Y unless preceded by A
    w2: list[str] = []
    for ch in w:
        if ch == "Y" and not (w2 and w2[-1] == "A"):
            continue
        w2.append(ch)
    if not w2:
        return "    "
    if w2[-1] in "ATDS":
        w2.pop()
    # remove As except leading
    w3 = w2[:1] + [c for c in w2[1:] if c != "A"]
    # collapse successive duplicates
    w4: list[str] = []
    for ch in w3:
        if w4 and w4[-1] == ch:
            continue
        w4.append(ch)
    return ("".join(w4) + "    ")[:4]


# ---------------------------------------------------------------------------
# matcher weights (difference / max code length, numeric special case)
# ---------------------------------------------------------------------------


def _code_weight(code1: str | None, code2: str | None, a: str, b: str) -> float:
    if code1 is None or code2 is None:
        return 0.0
    max_len = max(len(code1), len(code2))
    if max_len == 0:
        return 1.0 if a.lower() == b.lower() else 0.0
    return sc_difference(code1, code2) / max_len


def metaphone_sim(a: str, b: str) -> float:
    return _code_weight(metaphone(a), metaphone(b), a, b)


def double_metaphone_sim(a: str, b: str) -> float:
    return _code_weight(double_metaphone(a), double_metaphone(b), a, b)


def soundex_fr_sim(a: str, b: str) -> float:
    c1, c2 = soundex_fr(a), soundex_fr(b)
    if c1 is None or c2 is None:
        return 1.0 if c1 is c2 else 0.0
    return sc_difference(c1, c2) / 4.0
