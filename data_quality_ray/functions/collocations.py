"""Bigram collocation mining by pointwise mutual information — the
classical corpus-linguistics screen (Church-Hanks PMI) for
multi-word-expression discovery over a document corpus.

Shape: each batch emits unigram and bigram COUNT partials only
(pandas explode + shifted-adjacency masking — no Python loop over
docs); the merge rides grouped_aggregate's measured-size auto gate
(driver merge at small vocab, bucketed shuffle above), and the final
PMI ranking is computed on the surviving >= min_count pairs. Totals
(tokens, bigrams) are two scalars folded from the same partials.

Tokenization contract: whitespace runs, empties dropped — byte-for-byte
the heavy_hitter_tokens_docs contract, so the SQL replay is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["bigram_pmi"]


def bigram_pmi(ds, text_col: str, min_count: int = 5, k: int = 50) -> pd.DataFrame:
    """→ top-``k`` rows (a, b, n, pmi) with n >= min_count, ordered by
    (pmi desc, a, b); pmi = ln((n/T_bi) / ((n_a/T_uni)·(n_b/T_uni)))
    rounded to 6 BEFORE ranking."""
    from ..profiling.groupagg import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].str.split()
        flat = toks.explode().dropna()
        if flat.empty:
            return pd.DataFrame({"kind": pd.Series(dtype=object),
                                 "a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64)})
        words = flat.to_numpy()
        docs = flat.index.to_numpy()
        uni = (pd.Series(words).value_counts().rename("n")
               .rename_axis("a").reset_index())
        uni["kind"] = "u"
        uni["b"] = ""
        same = docs[:-1] == docs[1:]
        bg = pd.DataFrame({"a": words[:-1][same], "b": words[1:][same]})
        bcnt = (bg.groupby(["a", "b"], sort=False).size().rename("n")
                .reset_index())
        bcnt["kind"] = "b"
        return pd.concat([uni[["kind", "a", "b", "n"]],
                          bcnt[["kind", "a", "b", "n"]]], ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").materialize()
    uni = grouped_aggregate(
        parts.map_batches(lambda x: x[x["kind"] == "u"][["a", "n"]],
                          batch_format="pandas"),
        ["a"], {"n": ("n", "sum")}, final="auto")
    bi = grouped_aggregate(
        parts.map_batches(lambda x: x[x["kind"] == "b"][["a", "b", "n"]],
                          batch_format="pandas"),
        ["a", "b"], {"n": ("n", "sum")}, final="auto")
    if not isinstance(uni, pd.DataFrame):
        uni = uni.to_pandas()

    t_uni = int(uni["n"].sum())
    sup = dict(zip(uni["a"].to_numpy(), uni["n"].to_numpy()))

    def score(pdf: pd.DataFrame, t_bi: int) -> pd.DataFrame:
        pdf = pdf[pdf["n"] >= min_count].copy()
        if pdf.empty:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64),
                                 "pmi": pd.Series(dtype=np.float64)})
        n = pdf["n"].to_numpy(dtype=np.float64)
        na = pdf["a"].map(sup).to_numpy(dtype=np.float64)
        nb = pdf["b"].map(sup).to_numpy(dtype=np.float64)
        pdf["pmi"] = np.round(
            np.log((n / t_bi) / ((na / t_uni) * (nb / t_uni))), 6)
        return (pdf.sort_values(["pmi", "a", "b"],
                                ascending=[False, True, True])
                .head(k)[["a", "b", "n", "pmi"]])

    if isinstance(bi, pd.DataFrame):
        t_bi = int(bi["n"].sum())
        return score(bi, t_bi).reset_index(drop=True)
    # dataset path: materialize once (consumed twice below — the lazy
    # re-execution trap), total fold, then per-block top-k + driver merge
    bi = bi.materialize()
    t_bi = int(sum(b["n"].sum() for b in bi.iter_batches(
        batch_size=65536, batch_format="pandas")))
    local = bi.map_batches(lambda x: score(x, t_bi),
                           batch_format="pandas").to_pandas()
    return (local.sort_values(["pmi", "a", "b"],
                              ascending=[False, True, True])
            .head(k).reset_index(drop=True))
