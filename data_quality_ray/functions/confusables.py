"""Homoglyph skeleton folding: map visually-confusable characters onto
their ASCII skeleton so lookalike spam/duplicate text collapses under
exact dedup (the Unicode TR39 "skeleton" idea reduced to the common
Cyrillic/Greek/fullwidth lookalikes plus zero-width stripping).

ONE constant drives both engines: the Python translate table and the SQL
``translate(lower(text), FROM, TO)`` replay are built from the same
``_PAIRS``/``_DELETE`` tuples (the shared-constants oracle rule), so a
rule change cannot desynchronize them.
"""

from __future__ import annotations

import pandas as pd

# (confusable, ascii skeleton) — Cyrillic and Greek lowercase lookalikes
# plus fullwidth latin; applied AFTER lower(), so only lowercase forms
# need rows here
_PAIRS = (
    ("а", "a"), ("е", "e"), ("о", "o"), ("р", "p"), ("с", "c"),
    ("х", "x"), ("у", "y"), ("і", "i"), ("ѕ", "s"), ("ј", "j"),
    ("ԁ", "d"), ("ɡ", "g"), ("ο", "o"), ("ν", "v"), ("ϲ", "c"),
) + tuple((chr(0xFF41 + i), chr(ord("a") + i)) for i in range(26))

# invisible characters removed outright (zero-width family + BOM)
_DELETE = ("​", "‌", "‍", "⁠", "﻿")

SKELETON_FROM = "".join(p[0] for p in _PAIRS) + "".join(_DELETE)
SKELETON_TO = "".join(p[1] for p in _PAIRS)

_TABLE = {ord(f): ord(t) for f, t in _PAIRS} | {ord(d): None for d in _DELETE}


def skeleton_series(texts: pd.Series) -> pd.Series:
    """Vectorized skeleton fold: lower → confusable map → invisible
    strip. Matches SQL ``translate(lower(text), SKELETON_FROM,
    SKELETON_TO)`` byte for byte."""
    return texts.str.lower().str.translate(_TABLE)


def add_skeleton(ds, text_col: str, out_col: str = "skeleton"):
    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = skeleton_series(b[text_col])
        return b

    return ds.map_batches(f, batch_format="pandas")


def nfc_normalize_series(texts: pd.Series) -> pd.Series:
    """Unicode NFC canonical composition — run BEFORE any hash-keyed
    dedup so canonically-equal strings (composed vs combining-mark
    forms) collapse to one key. Memoized over each batch's unique axis
    (``unique_apply``); bit-identical to DuckDB ``nfc_normalize``.
    Nulls propagate."""
    import unicodedata

    from .text import unique_apply

    import numpy as np

    def one(v):
        return unicodedata.normalize("NFC", v) if isinstance(v, str) else v

    return pd.Series(unique_apply(np.asarray(texts, dtype=object), one),
                     index=texts.index)


def add_nfc(ds, text_col: str, out_col: str = "text_nfc"):
    """Streaming stage: append the NFC-composed column (zero shuffle)."""

    def f(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = nfc_normalize_series(b[text_col])
        return b

    return ds.map_batches(f, batch_format="pandas")
