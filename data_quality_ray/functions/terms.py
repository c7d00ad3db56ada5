"""Dictionary-term validity — the WordNet analog.

Rebuilds dataquality-wordnet (WordNetDictionary.isValidTerm:112,
getInstance:46 — dictionary loaded once per JVM): a broadcast word set
probed per token, vectorized. The same broadcast-set pattern backs the
stopword-density rule and the slur lexicon.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# a small built-in English lexicon (public common words) — stand-in for a
# real WordNet index; pass your own set for production use
DEFAULT_LEXICON = frozenset(
    """the a an and or of in on at to for with from by is are was were be been
    dog cat house tree water fire earth air sun moon star sky sea river
    mountain road city town man woman child day night time year hand eye
    photo image picture view close small large bright dark old young red
    green blue park street field beach garden market bridge forest harbor
    tower boat window train running walking playing sitting standing""".split()
)


def is_valid_term(term: str, lexicon: frozenset = DEFAULT_LEXICON) -> bool:
    """WordNetDictionary.isValidTerm analog (case-insensitive)."""
    return bool(term) and term.lower() in lexicon


def term_validity_ratio(values, lexicon: frozenset = DEFAULT_LEXICON) -> np.ndarray:
    """Per-document ratio of tokens found in the lexicon."""
    out = np.zeros(len(values), dtype=np.float64)
    for i, v in enumerate(np.asarray(values, dtype=object)):
        if not v:
            continue
        toks = [t.lower() for t in _TOKEN_RE.findall(v)]
        if toks:
            out[i] = sum(1 for t in toks if t in lexicon) / len(toks)
    return out


class TermValidityStage:
    """Actor stage: broadcast lexicon loaded once per actor; appends
    ``term_valid_ratio``."""

    def __init__(self, lexicon_ref=None, column: str = "text"):
        if lexicon_ref is None:
            self.lexicon = DEFAULT_LEXICON
        else:
            from .broadcast import cached_get

            self.lexicon = cached_get(lexicon_ref)
        self.column = column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["term_valid_ratio"] = term_validity_ratio(
            batch[self.column].to_numpy(dtype=object), self.lexicon
        )
        return batch


def term_validity(ds, column: str = "text", lexicon: frozenset | None = None,
                  concurrency: int | tuple = 2):
    import ray

    ref = ray.put(frozenset(lexicon)) if lexicon is not None else None
    return ds.map_batches(
        TermValidityStage,
        fn_constructor_kwargs={"lexicon_ref": ref, "column": column},
        batch_format="pandas",
        concurrency=concurrency,
    )
