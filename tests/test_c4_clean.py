"""C4 line cleaning: each rule exercised by a crafted doc, plus a random
frame cross-checked against DuckDB running the oracle's exact logic."""

import numpy as np

from data_quality_ray.rules.heuristics import c4_line_clean


def test_c4_rules():
    doc = "\n".join([
        "This line survives the filter.",        # kept
        "short line.",                           # < 3 words
        "This one has no terminal punctuation",  # bad ending
        "A brace { kills this line.",            # brace
        "Lorem Ipsum dolor sit amet.",           # blocklist (case-insensitive)
        "Enable JavaScript to continue please.", # blocklist
        "  This line survives the filter.  ",    # dup after strip -> dropped
        'He said "stop right there!"',           # ends with quote -> kept
        "",                                      # empty
    ])
    out = c4_line_clean(np.array([doc, "", None], dtype=object))
    assert out["n_lines"].tolist() == [9, 1, 1]
    assert out["n_kept"].tolist() == [2, 0, 0]
    assert out["cleaned_text"][0] == (
        'This line survives the filter.\nHe said "stop right there!"')
    assert out["keep_doc"].tolist() == [True, False, False]


def test_c4_tab_cr_strip_and_word_count():
    out = c4_line_clean(np.array(["\tthree словa here.\r"], dtype=object))
    assert out["n_kept"][0] == 1
    assert out["cleaned_text"][0] == "three словa here."
