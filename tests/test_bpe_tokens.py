"""BPE-style pre-tokenizer: Python re vs DuckDB RE2 parity on the SHARED
pattern string (the oracle contract), and semantic spot checks."""

import duckdb
import numpy as np
import pandas as pd

from data_quality_ray.functions.text import (
    BPE_NUM_PATTERN,
    BPE_SPACE_PATTERN,
    BPE_TOKEN_PATTERN,
    BPE_WORD_PATTERN,
    bpe_token_stats,
    bpe_tokens_one,
)


def test_bpe_tokens_semantics():
    assert bpe_tokens_one("Hello world") == ["Hello", " world"]
    assert bpe_tokens_one("it's 42!") == ["it", "'s", " 42", "!"]
    assert bpe_tokens_one("we'll don't") == ["we", "'ll", " don", "'t"]
    assert bpe_tokens_one("") == []
    assert bpe_tokens_one(None) == []
    # unicode letters land in the symbol-run class (ASCII-word tokenizer)
    assert bpe_tokens_one("éé ok") == ["éé", " ok"]


def test_bpe_stats_match_duckdb_on_adversarial_probes():
    probes = ["Hello world, it's 42 time!", "", None, "   pad", "Camel99x",
              "don't you'll we're I'm we've he'd isn't a'b''",
              "émoji ünïcode 文字", "tabs\tnl\nvtab\x0bff\x0c cr\r",
              "1234 56.78 -9", "!!!???...:;", "' quote s", "x" * 300]
    py = bpe_token_stats(np.array(probes, dtype=object))
    df = pd.DataFrame({"doc_id": range(len(probes)), "text": probes})

    def q(p):
        return p.replace("'", "''")

    sql = f"""
    WITH t AS (SELECT doc_id, coalesce(text, '') AS s FROM df),
    tok AS (SELECT doc_id, regexp_extract_all(s, '{q(BPE_TOKEN_PATTERN)}') AS toks FROM t)
    SELECT doc_id, len(toks) AS n_tokens,
      len(list_filter(toks, x -> regexp_matches(x, '^{q(BPE_WORD_PATTERN)}$'))) AS n_word,
      len(list_filter(toks, x -> regexp_matches(x, '^{q(BPE_NUM_PATTERN)}$'))) AS n_num,
      len(list_filter(toks, x -> regexp_matches(x, '^{q(BPE_SPACE_PATTERN)}$'))) AS n_space
    FROM tok ORDER BY doc_id"""
    o = duckdb.sql(sql).df()
    for k in ("n_tokens", "n_word", "n_num", "n_space"):
        np.testing.assert_array_equal(o[k].to_numpy().astype(np.int64), py[k])
