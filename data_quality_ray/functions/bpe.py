"""Byte-pair-encoding (BPE) subword tokenizer: distributed training and
application (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units" — public algorithm, implemented from
scratch).

Scale shape — the classic two-level trick that makes BPE train on any
corpus size: the corpus collapses to its WORD-FREQUENCY table first
(one distributed exchange; distinct words, not tokens, bound the state —
cap with ``min_count`` at web scale), and the merge loop then runs over
that compressed table on the driver (every published BPE trainer works
this way; the corpus is never re-scanned per merge round). Application
is a stateless broadcast pass: per batch, merges apply VECTORIZED over
the batch's UNIQUE words (``pandas.str.replace`` across the word axis —
words repeat heavily, so the unique axis is tiny vs rows).

Merge semantics (shared bit-for-bit by the learner, the apply pass and
the SQL oracle's recursive-CTE replay): words are spaced symbol strings
``" a b c "``; one merge ``(a, b) → ab`` is the literal replacement of
``" a b "`` with ``" ab "`` repeated until absent (leftmost
non-overlapping per pass), and merges apply strictly in rank order —
the sequential Sennrich application. Ties in the learner break to the
lexicographically smallest pair, so training is deterministic under any
partitioning.

Reference precedent: none (the reference has no tokenizer); core
LLM-training-pipeline operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..profiling.groupagg import grouped_aggregate

_WS = None  # compiled lazily (regex import kept out of worker cold path)


def _words(texts) -> list[str]:
    import re
    global _WS
    if _WS is None:
        _WS = re.compile(r"\s+")
    out = []
    for t in texts:
        out.extend(w for w in _WS.split((t or "").lower()) if w)
    return out


def _spaced(word: str) -> str:
    return " " + " ".join(word) + " "


def word_counts(ds, text_col: str, min_count: int = 1) -> pd.DataFrame:
    """Distributed word-frequency table: per-batch counts →
    `grouped_aggregate(final="auto")` (driver at/below the measured
    partial-row gate, bucketed shuffle above). → (word, n)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = _words(b[text_col].to_numpy(dtype=object))
        if not w:
            return pd.DataFrame({"word": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        uniq, cnt = np.unique(np.array(w, dtype=object), return_counts=True)
        return pd.DataFrame({"word": uniq, "n": cnt.astype("int64")})

    out = grouped_aggregate(ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas"), ["word"], {"n": ("n", "sum")},
        final="auto")
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out[out["n"] >= min_count]
    return out.sort_values("word", kind="mergesort").reset_index(drop=True)


def _merge_spaced(s: str, a: str, b: str) -> str:
    pat, rep = f" {a} {b} ", f" {a}{b} "
    while pat in s:
        s = s.replace(pat, rep)
    return s


def learn_bpe(word_freq: pd.DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Merge loop over the word-frequency table (driver-side by design —
    the table IS the compressed corpus). Each round: count adjacent
    symbol pairs weighted by word frequency, take the most frequent
    (ties → lexicographically smallest pair), fuse it exhaustively.
    Returns merges in rank order."""
    words = [_spaced(w) for w in word_freq["word"]]
    freqs = word_freq["n"].to_numpy()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, f in zip(words, freqs):
            syms = s.split()
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + int(f)
        if not counts:
            break
        # highest count, lexicographically smallest pair on ties —
        # deterministic under any partitioning
        a, b = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((a, b))
        words = [_merge_spaced(s, a, b) if f" {a} {b} " in s else s
                 for s in words]
    return merges


def train_bpe(ds, text_col: str, n_merges: int,
              min_count: int = 1) -> list[tuple[str, str]]:
    """Distributed word count → driver merge learning. → rank-ordered
    merges."""
    return learn_bpe(word_counts(ds, text_col, min_count), n_merges)


def apply_merges_to_words(words: pd.Series, merges) -> pd.Series:
    """Vectorized sequential application: one `str.replace` pass per
    merge ACROSS the word axis, looped until that merge is absent."""
    s = words.map(_spaced)
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        mask = s.str.contains(pat, regex=False)
        while mask.any():
            s.loc[mask] = s.loc[mask].str.replace(pat, rep, regex=False)
            mask = s.str.contains(pat, regex=False)
    return s.str.strip()


def bpe_token_counts(ds, text_col: str, merges,
                     min_count: int = 1) -> pd.DataFrame:
    """Corpus token-frequency table under the learned merges: per batch
    the UNIQUE words tokenize vectorized, token counts weight by word
    multiplicity; partials merge on the driver (token vocab ≤ distinct
    symbols + n_merges — fixed size). → (token, n) ordered by
    (-n, token)."""
    import ray

    from ..functions.broadcast import cached_get

    ref = ray.put(list(merges))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mg = cached_get(ref)
        w = _words(b[text_col].to_numpy(dtype=object))
        if not w:
            return pd.DataFrame({"token": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        uniq, cnt = np.unique(np.array(w, dtype=object), return_counts=True)
        toks = apply_merges_to_words(pd.Series(uniq, dtype=object), mg)
        df = pd.DataFrame({"tok": toks.str.split(" "), "n": cnt})
        df = df.explode("tok")
        out = df.groupby("tok", sort=False)["n"].sum().reset_index()
        out.columns = ["token", "n"]
        out["n"] = out["n"].astype("int64")
        return out

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("token", sort=True)["n"].sum().reset_index()
    agg = agg[agg["n"] >= min_count]
    agg["n"] = agg["n"].astype("int64")
    return (agg.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True))
