"""Cross-document line operators: global paragraph dedup and CCNet-style
boilerplate removal (dedup/lines.py) vs driver-side references."""

import numpy as np
import pandas as pd


def _corpus():
    rng = np.random.RandomState(3)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for i in range(60):
        lines = [" ".join(rng.choice(vocab, size=3)) for _ in range(rng.randint(1, 8))]
        if i % 7 == 0:
            lines.append("shared footer line")     # boilerplate
        if i % 3 == 0:
            lines.append("")                       # empty line content
        docs.append("\n".join(lines))
    docs[10] = docs[4]        # doc 10 fully duplicates doc 4
    return pd.DataFrame({"doc_id": np.arange(60), "text": docs})


def test_paragraph_dedup_matches_reference(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.lines import paragraph_dedup

    df = _corpus()
    got = paragraph_dedup(rd.from_pandas(df).repartition(4), "doc_id", "text") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    seen, rows = set(), []
    for r in df.itertuples():   # first-seen order = (doc_id, line idx)
        kept = []
        for ln in r.text.split("\n"):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        if kept:
            rows.append((r.doc_id, len(kept), "\n".join(kept)))
    ref = pd.DataFrame(rows, columns=["doc_id", "n_kept", "text"])
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "n_kept": "int64"}),
        ref.astype({"doc_id": "int64", "n_kept": "int64"}), check_like=True)
    # the fully-duplicate doc dropped out
    assert 10 not in got["doc_id"].to_numpy()


def test_remove_boilerplate_matches_reference(ray_session):
    import ray.data as rd

    from data_quality_ray.dedup.lines import line_doc_frequency, remove_boilerplate

    df = _corpus()
    min_docs = 5
    got = remove_boilerplate(rd.from_pandas(df).repartition(4), "doc_id",
                             "text", min_docs) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    freq = {}
    for r in df.itertuples():
        for ln in set(r.text.split("\n")):
            freq[ln] = freq.get(ln, 0) + 1
    bad = {ln for ln, n in freq.items() if n >= min_docs}
    assert "shared footer line" in bad and "" in bad
    rows = []
    for r in df.itertuples():
        parts = r.text.split("\n")
        kept = [p for p in parts if p not in bad]
        rows.append((r.doc_id, len(parts), len(parts) - len(kept), "\n".join(kept)))
    ref = pd.DataFrame(rows, columns=["doc_id", "n_lines", "n_removed", "text"])
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in ["doc_id", "n_lines", "n_removed"]}),
        ref.astype({c: "int64" for c in ["doc_id", "n_lines", "n_removed"]}),
        check_like=True)

    # distinct-doc frequency operator agrees with the driver-side count
    fr = line_doc_frequency(rd.from_pandas(df).repartition(3), "doc_id",
                            "text").to_pandas()
    assert dict(zip(fr["line"], fr["n_docs"].astype(int))) == freq
