"""BM25 full-text top-k search over a document Dataset — the lexical
sibling of the embedding ANN in ``similarity/knn.py`` (Robertson &
Sparck Jones probabilistic relevance; the Lucene-practical variant with
the non-negative ``ln(1 + (N-df+.5)/(df+.5))`` idf).

Scale shape (the whole point): corpus statistics are needed only for the
QUERY vocabulary, which is tiny and fixed, so there is no global
inverted index and no shuffle at all —

  pass 1 (stats): one ``map_batches`` fold emitting a fixed-size partial
     per batch — (batch doc count, batch token count, df counts over the
     query vocab) — merged on the driver; driver state = |query vocab|.
  pass 2 (score): broadcast (df, N, avgdl) once; each batch scores its
     docs against every query vectorized over the vocab-hit matrix and
     emits only its LOCAL top-k per query; the driver merges n_batches×k
     candidate rows — never a full score materialization.

Both passes stream; adding queries grows the broadcast, never the
shuffle. Tokenizer contract (shared with the SQL oracle):
``[a-z0-9]+`` runs of the lower-cased text.

Reference precedent: none (the reference has no search); this is part of
the beyond-reference similarity-search surface alongside knn.py.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

K1 = 1.2
B = 0.75

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def bm25_tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower()) if isinstance(text, str) else []


def _query_vocab(queries: dict[str, str]) -> list[str]:
    vocab = set()
    for q in queries.values():
        vocab.update(bm25_tokens(q))
    return sorted(vocab)


def corpus_stats(ds, text_col: str, vocab: list[str]):
    """One streaming fold → (N docs, total tokens, df per vocab term).
    Docs with zero tokens still count toward N (they can never match but
    dilute avgdl the same way the SQL oracle's aggregate sees them —
    parity requires agreeing on this)."""
    import pyarrow as pa

    v_index = {t: i for i, t in enumerate(vocab)}

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        df = np.zeros(len(vocab), dtype=np.int64)
        n_tok = 0
        for t in texts:
            toks = bm25_tokens(t)
            n_tok += len(toks)
            seen = {v_index[x] for x in set(toks) if x in v_index}
            for i in seen:
                df[i] += 1
        return pa.table({"n_docs": pa.array([len(texts)], type=pa.int64()),
                         "n_tokens": pa.array([n_tok], type=pa.int64()),
                         "df": pa.array([df.tolist()],
                                        type=pa.list_(pa.int64()))})

    n_docs = n_tokens = 0
    df = np.zeros(len(vocab), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=256, batch_format="pyarrow"):
        n_docs += int(np.sum(b["n_docs"].to_numpy()))
        n_tokens += int(np.sum(b["n_tokens"].to_numpy()))
        for row in b["df"].to_pylist():
            df += np.asarray(row, dtype=np.int64)
    return n_docs, n_tokens, df


def bm25_topk(ds, id_col: str, text_col: str, queries: dict[str, str],
              k: int = 10, k1: float = K1, b: float = B,
              round_to: int | None = 6) -> pd.DataFrame:
    """→ (query_id, id_col, score, rank) — top-``k`` docs per query by
    BM25, rank 1-based by (rounded score desc, id asc); ``round_to``
    rounds BEFORE ranking so the order is reproducible across engines
    (float64 sum-order differences live far below 6 dp)."""
    import ray

    from ..functions.broadcast import cached_get

    vocab = _query_vocab(queries)
    n_docs, n_tokens, df = corpus_stats(ds, text_col, vocab)
    if n_docs == 0 or not vocab:
        return pd.DataFrame({"query_id": [], id_col: [], "score": [], "rank": []})
    avgdl = n_tokens / n_docs
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))
    # per-query weight row over the vocab: idf where the query uses the
    # term (distinct-term BM25 — query-side multiplicity ignored, as in
    # Lucene), 0 elsewhere
    qids = sorted(queries)
    qw = np.zeros((len(qids), len(vocab)), dtype=np.float64)
    v_index = {t: i for i, t in enumerate(vocab)}
    for r, qid in enumerate(qids):
        for t in set(bm25_tokens(queries[qid])):
            if t in v_index:
                qw[r, v_index[t]] = idf[v_index[t]]
    ref = ray.put((v_index, qw, avgdl, k1, b))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        vi, qw_, avgdl_, k1_, b_ = cached_get(ref)
        texts = batch[text_col].to_numpy()
        ids = batch[id_col].to_numpy()
        tf = np.zeros((len(texts), len(vi)), dtype=np.float64)
        dl = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = bm25_tokens(t)
            dl[i] = len(toks)
            for x in toks:
                j = vi.get(x)
                if j is not None:
                    tf[i, j] += 1.0
        # sat[i,j] = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
        denom = tf + k1_ * (1 - b_ + b_ * dl / avgdl_)[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            sat = np.where(tf > 0, tf * (k1_ + 1) / denom, 0.0)
        scores = sat @ qw_.T  # (docs, queries)
        out = []
        for r in range(scores.shape[1]):
            col = scores[:, r]
            hit = np.nonzero(col > 0)[0]
            if len(hit) > k:  # local top-k only
                hit = hit[np.argpartition(-col[hit], k - 1)[:k]]
            out.append(pd.DataFrame({"__q": r, id_col: ids[hit],
                                     "score": col[hit]}))
        if not out:
            return pd.DataFrame({"__q": pd.Series(dtype=np.int64),
                                 id_col: ids[:0], "score": pd.Series(dtype=float)})
        return pd.concat(out, ignore_index=True)

    cand = ds.map_batches(score_batch, batch_format="pandas",
                          batch_size=1024).to_pandas()
    if round_to is not None:
        cand["score"] = cand["score"].round(round_to)
    cand = cand.sort_values(["__q", "score", id_col],
                            ascending=[True, False, True], kind="mergesort")
    cand["rank"] = cand.groupby("__q").cumcount() + 1
    cand = cand[cand["rank"] <= k].reset_index(drop=True)
    cand["query_id"] = np.asarray(qids, dtype=object)[cand["__q"].to_numpy()]
    return cand[["query_id", id_col, "score", "rank"]]
