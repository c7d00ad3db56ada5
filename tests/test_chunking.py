"""Sliding-window chunker (functions/chunking.py)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.functions.chunking import (CHECKSUM_MOD, chunk_batch,
                                                 sliding_chunks)


def _h(tok: str) -> int:
    return int.from_bytes(hashlib.md5(tok.encode()).digest()[8:],
                          "little") % CHECKSUM_MOD


def _brute(doc_id, text, window, stride):
    toks = text.split()
    t = len(toks)
    if t == 0:
        return []
    last_k = (max(t - window, 0) + stride - 1) // stride
    rows = []
    for k in range(last_k + 1):
        chunk = toks[k * stride: k * stride + window]
        cs = sum((i + 1) * _h(tok) for i, tok in enumerate(chunk))
        rows.append((doc_id, k, k * stride, len(chunk), cs))
    return rows


@pytest.mark.parametrize("window,stride", [(8, 8), (8, 5), (16, 4)])
def test_chunk_batch_vs_brute(window, stride):
    rng = np.random.default_rng(5)
    texts = [" ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"],
                                 size=rng.integers(0, 40)))
             for _ in range(25)]
    b = pd.DataFrame({"doc_id": np.arange(25, dtype=np.int64),
                      "text": texts})
    got = chunk_batch(b, "doc_id", "text", window, stride)
    want = [r for i, tx in enumerate(texts)
            for r in _brute(i, tx, window, stride)]
    assert list(map(tuple, got.to_numpy())) == want


def test_chunk_coverage_and_overlap():
    # every token position is covered; consecutive chunks overlap W-S
    b = pd.DataFrame({"doc_id": [1], "text": [" ".join(f"t{i}"
                                                       for i in range(100))]})
    out = chunk_batch(b, "doc_id", "text", 16, 12)
    spans = list(zip(out["start_tok"], out["start_tok"] + out["n_toks"]))
    covered = set()
    for lo, hi in spans:
        covered |= set(range(lo, hi))
    assert covered == set(range(100))
    assert all(b0 - a1 == 12 for (a1, _), (b0, _) in zip(spans, spans[1:]))
    # final chunk reaches the end exactly once
    assert spans[-1][1] == 100


def test_sliding_chunks_dataset(ray_session):
    import ray.data as rd

    b = pd.DataFrame({"doc_id": [0, 1, 2],
                      "text": ["one two three four five", "", None]})
    out = sliding_chunks(rd.from_pandas(b), "doc_id", "text",
                         window=3, stride=2).to_pandas()
    # only doc 0 produces chunks: starts 0 and 2
    assert out["doc_id"].tolist() == [0, 0]
    assert out["start_tok"].tolist() == [0, 2]
    assert out["n_toks"].tolist() == [3, 3]


def test_sliding_chunks_rejects_gaps():
    with pytest.raises(ValueError):
        sliding_chunks(None, "doc_id", "text", window=8, stride=9)
