"""Product quantization (similarity/pq.py): train/encode/ADC-search vs a
local numpy reference, partition invariance, and compression sanity."""

import numpy as np
import pandas as pd

from data_quality_ray.similarity.pq import (ROUND_TO, _encode_block,
                                            pq_encode, pq_topk, pq_train)


def _vectors(n=400, d=32, seed=5):
    rng = np.random.default_rng(seed)
    # clustered data so codebooks are meaningful
    centers = rng.normal(size=(8, d))
    x = centers[rng.integers(0, 8, n)] + 0.1 * rng.normal(size=(n, d))
    return pd.DataFrame({"vec_id": np.arange(n),
                         "embedding": list(x.astype(np.float64))})


def _ds(df, n_blocks=4):
    import ray.data as rd

    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % n_blocks)])


def _ref_train(df, m, ksub, iters):
    """Serial reference with the same determinism contract."""
    x = np.stack(df.sort_values("vec_id")["embedding"].to_numpy())[:ksub]
    dsub = x.shape[1] // m
    books = np.round(x.reshape(ksub, m, dsub).transpose(1, 0, 2), ROUND_TO)
    allx = np.stack(df["embedding"].to_numpy())
    sub = allx.reshape(len(allx), m, dsub)
    for _ in range(iters):
        codes = _encode_block(allx, books)
        for j in range(m):
            for c in range(ksub):
                members = sub[codes[:, j] == c, j, :]
                if len(members):
                    books[j, c] = np.round(members.mean(axis=0), ROUND_TO)
    return books


def test_pq_train_matches_reference_and_partition_invariant(ray_session):
    df = _vectors()
    m, ksub, iters = 4, 8, 2
    ref = _ref_train(df, m, ksub, iters)
    got = pq_train(_ds(df, 4), "vec_id", "embedding", m=m, ksub=ksub, iters=iters)
    assert got.shape == (m, ksub, df["embedding"][0].shape[0] // m)
    np.testing.assert_allclose(got, ref, atol=2e-6)  # quantized each round
    got2 = pq_train(_ds(df, 7), "vec_id", "embedding", m=m, ksub=ksub, iters=iters)
    np.testing.assert_array_equal(got, got2)  # blocking-invariant


def test_pq_encode_matches_block_kernel(ray_session):
    df = _vectors(n=200)
    books = pq_train(_ds(df), "vec_id", "embedding", m=4, ksub=8, iters=1)
    enc = (pq_encode(_ds(df), "vec_id", "embedding", books)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    x = np.stack(df["embedding"].to_numpy())
    ref = _encode_block(x, books)
    for j in range(4):
        assert (enc[f"c{j}"].to_numpy() == ref[:, j]).all()
    assert enc[[f"c{j}" for j in range(4)]].to_numpy().max() < 8


def test_pq_topk_adc_matches_brute_force(ray_session):
    df = _vectors(n=300)
    m, ksub = 4, 8
    books = pq_train(_ds(df), "vec_id", "embedding", m=m, ksub=ksub, iters=2)
    codes = pq_encode(_ds(df), "vec_id", "embedding", books)
    q = df["embedding"][0]
    got = pq_topk(codes, "vec_id", books, q, k=10)
    # brute-force ADC reference
    x = np.stack(df["embedding"].to_numpy())
    c = _encode_block(x, books)
    dsub = x.shape[1] // m
    lut = ((q.reshape(m, dsub)[:, None, :] - books) ** 2).sum(-1)
    adc = np.round(lut[np.arange(m)[None, :], c].sum(axis=1), ROUND_TO)
    ref = (pd.DataFrame({"vec_id": df["vec_id"], "adc": adc})
           .sort_values(["adc", "vec_id"], kind="mergesort").head(10)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # the query's own code word should rank it at/near the top
    assert got["vec_id"].iloc[0] == 0 or 0 in set(got["vec_id"])


def test_pq_compresses_and_recalls_cluster(ray_session):
    """On tightly clustered data PQ quantizes same-cluster points to the
    same codes (ADC ties break by id), so the right recall notion is
    cluster-level: every top-k hit should share the query's true
    cluster."""
    rng = np.random.default_rng(9)
    d, n = 32, 500
    centers = rng.normal(size=(8, d))
    labels = rng.integers(0, 8, n)
    x = centers[labels] + 0.1 * rng.normal(size=(n, d))
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": list(x.astype(np.float64))})
    books = pq_train(_ds(df), "vec_id", "embedding", m=8, ksub=16, iters=2)
    codes = pq_encode(_ds(df), "vec_id", "embedding", books)
    for qi in (0, 100, 250):
        got = pq_topk(codes, "vec_id", books, x[qi], k=10)
        assert (labels[got["vec_id"].to_numpy()] == labels[qi]).all()


def test_ivfpq_store_roundtrip(ray_session, tmp_path):
    import os

    from data_quality_ray.similarity.pq import (build_ivfpq_store,
                                                ivfpq_topk_store,
                                                normalize_batch)

    df = _vectors(n=400, seed=13)
    store = str(tmp_path / "ivfpq")
    cent, books = build_ivfpq_store(_ds(df), store, "vec_id", "embedding",
                                    n_lists=4, m=4, ksub=8, iters=1)
    assert cent.shape[0] == 4 and books.shape == (4, 8, 8)
    assert os.path.exists(os.path.join(store, "_pq_books.npy"))
    q = df["embedding"][7]
    # nprobe == n_lists scans everything → pure-ADC reference over
    # normalized vectors must match exactly
    got, stats = ivfpq_topk_store(store, "vec_id", q, k=10, nprobe=4)
    assert stats["rows_scanned"] == stats["rows_total"] == 400
    x = normalize_batch(np.stack(df["embedding"].to_numpy()))
    c = _encode_block(x, books)
    qn = normalize_batch(np.asarray(q, dtype=np.float64)[None, :])[0]
    lut = ((qn.reshape(4, 8)[:, None, :] - books) ** 2).sum(-1)
    adc = np.round(lut[np.arange(4)[None, :], c].sum(axis=1), ROUND_TO)
    ref = (pd.DataFrame({"vec_id": df["vec_id"], "adc": adc})
           .sort_values(["adc", "vec_id"], kind="mergesort").head(10)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # pruned probe reads strictly fewer rows and keeps high self-recall
    pruned, pstats = ivfpq_topk_store(store, "vec_id", q, k=10, nprobe=1)
    assert 0 < pstats["rows_scanned"] < pstats["rows_total"]
    assert 7 in set(pruned["vec_id"])  # the query's own row survives pruning


def test_ivfpq_residual_store_matches_reference(ray_session, tmp_path):
    from data_quality_ray.similarity.pq import (build_ivfpq_store,
                                                ivfpq_topk_store,
                                                normalize_batch)

    df = _vectors(n=400, seed=21)
    store = str(tmp_path / "ivfpq_res")
    cent, books = build_ivfpq_store(_ds(df), store, "vec_id", "embedding",
                                    n_lists=4, m=4, ksub=8, iters=2,
                                    residual=True)
    q = df["embedding"][11]
    got, stats = ivfpq_topk_store(store, "vec_id", q, k=10, nprobe=4)
    assert stats["rows_scanned"] == stats["rows_total"] == 400
    # in-memory residual-ADC reference
    x = normalize_batch(np.stack(df["embedding"].to_numpy()))
    assign = np.argmax(
        (x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12))
        @ cent.T, axis=1)
    r = x - cent[assign]
    c = _encode_block(r, books)
    qn = normalize_batch(np.asarray(q, dtype=np.float64)[None, :])[0]
    rows = []
    for lst in range(4):
        mask = assign == lst
        if not mask.any():
            continue
        qr = (qn - cent[lst]).reshape(4, 8)
        lut = ((qr[:, None, :] - books) ** 2).sum(-1)
        adc = np.round(lut[np.arange(4)[None, :], c[mask]].sum(axis=1), ROUND_TO)
        rows.append(pd.DataFrame({"vec_id": df["vec_id"].to_numpy()[mask],
                                  "adc": adc}))
    ref = (pd.concat(rows, ignore_index=True)
           .sort_values(["adc", "vec_id"], kind="mergesort").head(10)
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, ref)
    # residual encoding separates same-list neighbours: the query's own
    # row must win at full probe
    assert got["vec_id"].iloc[0] == 11
