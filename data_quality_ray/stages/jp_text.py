"""Japanese text stages — tokenization, transliteration, number
normalization.

Rebuilds dataquality-text-japanese's model-per-worker pattern
(tokenization/TextTokenizerBase.java:19-56 — Kuromoji dictionaries loaded
lazily once per JVM). The Kuromoji-equivalent morphological dictionary is
NOT available in this environment, so:

- ``JapaneseTokenizerStage`` is the real Ray-side plumbing (actor-pool
  map_batches, dictionary loaded once in ``__init__``) around a
  clearly-marked STUB segmenter: it falls back to charset-boundary
  segmentation (splits at script changes — kanji/hiragana/katakana/
  latin/digit) instead of lattice-based morphological analysis. Swap
  ``_segment`` for a real tokenizer (fugashi/SudachiPy) in production.
- ``transliterate_kana`` is real: katakana→hiragana is a fixed codepoint
  shift (U+30A1-U+30F6 → U+3041-U+3096), hiragana→romaji via the standard
  Hepburn table (public knowledge).
- ``normalize_japanese_numbers`` is real for the common kanji-numeral
  forms (JapaneseNumberNormalizer.normalizeNumber:72 semantics).
"""

from __future__ import annotations

import re

import pandas as pd

_KATA_TO_HIRA = {cp: cp - 0x60 for cp in range(0x30A1, 0x30F7)}

_HEPBURN = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "を": "wo", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
}

_KANJI_DIGITS = {"〇": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5,
                 "六": 6, "七": 7, "八": 8, "九": 9}
_KANJI_UNITS = {"十": 10, "百": 100, "千": 1000}
_KANJI_MYRIADS = {"万": 10_000, "億": 100_000_000}
_KANJI_NUM_RE = re.compile("[〇一二三四五六七八九十百千万億]+")

_SCRIPT_RE = re.compile(
    r"[一-鿿]+|[぀-ゟ]+|[゠-ヿー]+|[A-Za-z]+|[0-9０-９]+"
)


def kata_to_hira(s: str) -> str:
    return s.translate(_KATA_TO_HIRA)


_SMALL_Y = {"ゃ": "a", "ゅ": "u", "ょ": "o"}


def hira_to_romaji(s: str) -> str:
    """Hepburn romanization of hiragana/katakana with yōon (きょ→kyo,
    しゃ→sha) and sokuon (って→tte) contraction."""
    out: list[str] = []
    sokuon = False
    for c in kata_to_hira(s):
        if c == "っ":
            sokuon = True
            continue
        if c in _SMALL_Y and out and out[-1].endswith("i"):
            prev = out[-1]
            if prev.endswith(("shi", "chi", "ji")):
                out[-1] = prev[:-1] + _SMALL_Y[c]  # shi+ょ → sho
            else:
                out[-1] = prev[:-1] + "y" + _SMALL_Y[c]  # ki+ょ → kyo
            continue
        r = _HEPBURN.get(c, c)
        if sokuon and r and r[0].isalpha():
            r = r[0] + r
            sokuon = False
        out.append(r)
    return "".join(out)


def normalize_japanese_number(s: str) -> str:
    """Replace kanji numerals with arabic: '三千五百' → '3500'."""

    def parse(num: str) -> int:
        total = 0
        section = 0
        digit = 0
        for c in num:
            if c in _KANJI_DIGITS:
                digit = _KANJI_DIGITS[c]
            elif c in _KANJI_UNITS:
                section += (digit or 1) * _KANJI_UNITS[c]
                digit = 0
            elif c in _KANJI_MYRIADS:
                total += (section + digit or 1) * _KANJI_MYRIADS[c]
                section = digit = 0
        return total + section + digit

    return _KANJI_NUM_RE.sub(lambda m: str(parse(m.group(0))), s)


def _segment(text: str) -> list[str]:
    """STUB segmenter (see module doc): script-boundary segmentation, not
    morphological analysis. Replace with a real tokenizer in production."""
    return _SCRIPT_RE.findall(text)


class JapaneseTokenizerStage:
    """Actor-pool stage: ``tokens`` column of segmented Japanese text.
    Dictionary/model resources load once per actor in ``__init__``."""

    def __init__(self):
        try:  # real tokenizer if one is ever available in the image
            from fugashi import Tagger  # type: ignore

            self._tagger = Tagger()
            self._mode = "fugashi"
        except ImportError:
            self._tagger = None
            self._mode = "stub"

    def tokenize(self, text: str) -> list[str]:
        if self._tagger is not None:
            return [w.surface for w in self._tagger(text)]
        return _segment(text or "")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["tokens"] = [self.tokenize(t) for t in batch["text"]]
        return batch


def tokenize_japanese(ds, concurrency: int | tuple = 2):
    return ds.map_batches(JapaneseTokenizerStage, batch_format="pandas",
                          concurrency=concurrency)
