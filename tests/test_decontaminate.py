"""Decontamination vs a brute-force Python-set reference: hit counts,
fractions, verdicts; zero-gram docs anywhere in the batch; short docs
(the <k single-gram convention shared with minhash shingles)."""

import numpy as np
import pandas as pd

from data_quality_ray.dedup.decontaminate import (
    benchmark_gram_hashes, decontaminate)
from data_quality_ray.dedup.minhash import shingle_strings


def _brute(texts, bench_texts, k, threshold):
    bench = set()
    for t in bench_texts:
        bench.update(shingle_strings(t, k))
    rows = []
    for t in texts:
        g = set(shingle_strings(t, k))
        hits = len(g & bench)
        frac = np.floor(hits / max(len(g), 1) * 1e6 + 0.5) / 1e6
        rows.append((len(g), hits, frac, frac >= threshold))
    return rows


def test_decontaminate_matches_brute(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 30)))
             for _ in range(200)]
    texts[7] = ""          # zero grams mid-batch
    texts[120] = "   "     # whitespace-only
    texts[3] = "one two"   # < k -> single joined gram
    bench_texts = texts[::13]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(7)
    bench = benchmark_gram_hashes(
        rd.from_pandas(pd.DataFrame({"text": bench_texts})), "text", k=4)
    out = (decontaminate(ds, "text", "doc_id", bench, k=4, threshold=0.25)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _brute(texts, bench_texts, 4, 0.25)
    for i, (ng, nh, fr, cont) in enumerate(exp):
        r = out.iloc[i]
        assert (r["n_grams"], r["n_hits"]) == (ng, nh), i
        assert r["contam_frac"] == fr and bool(r["contaminated"]) == cont, i
    # benchmark members are fully contaminated; empty docs are clean
    assert out.loc[out["doc_id"] % 13 == 0].pipe(
        lambda d: (d.loc[d["n_grams"] > 0, "contam_frac"] == 1.0).all())
    assert out.loc[7, "n_grams"] == 0 and not out.loc[7, "contaminated"]


def test_empty_benchmark(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e", "f g h i j"]})
    out = decontaminate(rd.from_pandas(df), "text", "doc_id",
                        np.empty(0, dtype=np.uint64), k=2).to_pandas()
    assert (out["n_hits"] == 0).all() and not out["contaminated"].any()
