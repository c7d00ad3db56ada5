"""Sequence packing: offset math vs a naive cumsum, multi-block prefix
sums, slice-partition and chunk-capacity invariants, zero-token docs."""

import numpy as np
import pandas as pd
import pytest

from data_quality_ray.functions.packing import (
    assemble_sequences, default_token_fn, offset_columns, pack_assignments,
    pack_offsets)


def test_offset_columns_math():
    n = np.array([5, 0, 3, 4, 10, 0, 1])
    c = offset_columns(n, off=2, chunk_size=4, prefix="")
    np.testing.assert_array_equal(c["start"], [2, 7, 7, 10, 14, 24, 24])
    np.testing.assert_array_equal(c["chunk_first"], [0, 1, 1, 2, 3, 6, 6])
    # doc 0: tokens 2..6 -> chunks 0-1; doc 2: tokens 7..9 -> chunks 1-2;
    # doc 3: tokens 10..13 -> chunks 2-3; doc 4: tokens 14..23 -> chunks 3-5
    np.testing.assert_array_equal(c["n_chunks"], [2, 0, 2, 2, 3, 0, 1])
    np.testing.assert_array_equal(c["chunk_last"], [1, 0, 2, 3, 5, 5, 6])
    assert len(offset_columns(np.zeros(0, np.int64), 0, 4, "")["start"]) == 0


def test_pack_offsets_multiblock(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(7)
    n = rng.integers(0, 50, size=2000).astype(np.int64)
    df = pd.DataFrame({"i": np.arange(2000), "n_tok": n})
    ds = rd.from_pandas(df).repartition(13)
    out = pack_offsets(ds, "n_tok", 128).to_pandas().sort_values("i")
    exp = offset_columns(n, 0, 128, "pack_")
    for k, v in exp.items():
        np.testing.assert_array_equal(out[k].to_numpy(), v, err_msg=k)
    with pytest.raises(ValueError):
        pack_offsets(ds, "n_tok", 0)


def test_pack_assignments_invariants(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(3)
    n = rng.integers(0, 40, size=500).astype(np.int64)
    C = 64
    ds = rd.from_pandas(pd.DataFrame({"i": np.arange(500), "n_tok": n})).repartition(5)
    a = pack_assignments(ds, "n_tok", C, id_cols=["i"]).to_pandas()
    # each doc's slices partition [0, n) contiguously
    per = a.sort_values(["i", "chunk_id"]).groupby("i")
    for i, g in per:
        assert g["tok_start"].iloc[0] == 0 and g["tok_end"].iloc[-1] == n[i]
        assert (g["tok_start"].to_numpy()[1:] == g["tok_end"].to_numpy()[:-1]).all()
        assert (g["chunk_id"].diff().dropna() == 1).all()
    # zero-token docs emit no assignment
    assert set(a["i"]) == set(np.flatnonzero(n > 0))
    # every chunk except the last holds exactly C tokens
    sizes = (a["tok_end"] - a["tok_start"]).groupby(a["chunk_id"]).sum()
    assert (sizes.iloc[:-1] == C).all() and sizes.iloc[-1] <= C
    assert sizes.sum() == n.sum()
    # chunk ids are dense 0..last
    np.testing.assert_array_equal(sizes.index.to_numpy(),
                                  np.arange(len(sizes)))


def test_assemble_sequences_physical(ray_session):
    """Assembled chunks == slicing the naive concatenated token stream."""
    import ray.data as rd
    rng = np.random.default_rng(9)
    n = rng.integers(0, 30, size=300).astype(np.int64)
    C = 128
    ds = rd.from_pandas(pd.DataFrame({"i": np.arange(300), "n_tok": n})).repartition(9)
    out = (assemble_sequences(ds, "n_tok", C, id_col="i", n_buckets=5,
                              return_tokens=True)
           .to_pandas().sort_values("chunk_id").reset_index(drop=True))
    stream = np.concatenate([default_token_fn(np.full(k, i, np.int64),
                                              np.arange(k, dtype=np.int64))
                             for i, k in enumerate(n) if k] or
                            [np.zeros(0, np.int64)])
    n_chunks = -(-len(stream) // C)
    assert len(out) == n_chunks
    np.testing.assert_array_equal(out["chunk_id"], np.arange(n_chunks))
    for c in range(n_chunks):
        exp = stream[c * C:(c + 1) * C]
        got = np.asarray(out.loc[c, "tokens"])
        np.testing.assert_array_equal(got, exp, err_msg=f"chunk {c}")
        assert out.loc[c, "n_tok"] == len(exp)
        assert out.loc[c, "tok_sum"] == exp.sum()
        assert out.loc[c, "first_tok"] == exp[0]
        assert out.loc[c, "last_tok"] == exp[-1]
