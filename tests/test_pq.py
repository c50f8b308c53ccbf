"""Product quantization: recall against exact search, compression
shape, determinism, and batching invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.similarity import (
    pq_topk_rerank,
    cosine_topk,
    pq_encode,
    pq_topk,
    pq_train,
)


import pyarrow as pa


def _corpus(n=2000, dim=64, seed=11):
    rng = np.random.default_rng(seed)
    # clustered corpus (PQ's favorable-and-typical regime)
    centers = rng.normal(0, 1, (20, dim))
    x = centers[rng.integers(0, 20, n)] + rng.normal(0, 0.25, (n, dim))
    # explicit list<float> layout — the testdata embeddings shape
    # (from_pandas would tensor-ize ndarray cells)
    offs = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int64)).cast(pa.int32())
    emb = pa.ListArray.from_arrays(offs, pa.array(
        x.reshape(-1).astype(np.float32), pa.float32()))
    tab = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": emb})
    return x, tab


def test_pq_recall_vs_exact():
    x, df = _corpus()
    ds = ray.data.from_arrow(df).repartition(4)
    books = pq_train(x[:512], m=8, k=32, iters=12)
    codes = pq_encode(ds, books).materialize()
    q = x[7]
    # exact L2 oracle (ADC approximates L2; a cosine oracle would mix
    # in ranking disagreement that has nothing to do with quantization).
    # PQ's honest contract is CANDIDATE recall at a shortlist — raw
    # ADC@10 on this tight fixture measures only 0.2 (quantization
    # error ~ within-cluster neighbor gaps), which is exactly why
    # pq_topk_rerank exists.
    exact = set(np.argsort(((x - q[None, :]) ** 2).sum(axis=1))[:10].tolist())
    cand = set(pq_topk(codes, books, q, k=50)["vec_id"])
    recall = len(exact & cand) / 10
    assert recall >= 0.7, recall  # measured 0.8 at shortlist 50


def test_pq_code_shape_and_determinism():
    x, df = _corpus(n=300)
    books = pq_train(x[:128], m=4, k=16)
    assert books.shape == (4, 16, 16)
    a = pq_encode(ray.data.from_arrow(df).repartition(3), books).to_pandas()
    b = pq_encode(ray.data.from_arrow(df).repartition(7), books).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    for i in range(len(a)):
        code = np.asarray(a["pq_code"].iloc[i])
        assert code.shape == (4,) and code.dtype == np.uint8  # 64 floats -> 4 bytes
        np.testing.assert_array_equal(code, np.asarray(b["pq_code"].iloc[i]))


def test_pq_adc_matches_reconstruction_distance():
    """ADC distance == exact distance to the RECONSTRUCTED vector —
    the PQ identity that makes the lookup-table search correct."""
    x, df = _corpus(n=200)
    books = pq_train(x[:128], m=4, k=16)
    codes = pq_encode(ray.data.from_arrow(df), books).materialize()
    codes_df = codes.to_pandas()
    q = x[3]
    top = pq_topk(codes, books, q, k=5)
    m, kc, sub = books.shape
    for _, row in top.iterrows():
        code = np.asarray(
            codes_df.loc[codes_df["vec_id"] == row["vec_id"], "pq_code"].iloc[0])
        recon = np.concatenate([books[j][code[j]] for j in range(m)])
        assert abs(((recon - q) ** 2).sum() - row["adc"]) < 1e-9


def test_pq_rejects_indivisible_dim():
    with pytest.raises(ValueError):
        pq_train(np.zeros((10, 65)), m=4)


def test_pq_rerank_recovers_exact_topk():
    x, df = _corpus()
    ds = ray.data.from_arrow(df).repartition(4)
    books = pq_train(x[:512], m=8, k=32, iters=12)
    codes = pq_encode(ds, books).materialize()
    q = x[7]
    exact = np.argsort(((x - q[None, :]) ** 2).sum(axis=1))[:10].tolist()
    got = pq_topk_rerank(codes, ds, books, q, k=10, shortlist=100)
    recall = len(set(exact) & set(got["vec_id"])) / 10
    assert recall >= 0.9, recall


def test_ivfpq_exact_when_probing_all():
    """With n_probe == n_centroids the IVF prune is a no-op, so IVF-PQ
    must return exactly what flat PQ+rerank returns; with a generous
    shortlist that equals exact L2 top-k on this fixture."""
    from video_features_ray.stages.similarity import (
        build_ivf_codebook,
        ivf_assign,
        ivfpq_topk,
    )

    x, df = _corpus(n=1000)
    ds = ray.data.from_arrow(df).repartition(4)
    ivf_cb = build_ivf_codebook(x[:256], n_centroids=8)
    books = pq_train(x[:256], m=8, k=32)
    codes = pq_encode(ds, books)
    buckets = ivf_assign(ds, ivf_cb).select_columns(["vec_id", "ivf_bucket"])
    from video_features_ray.stages.joins import hash_join
    index = hash_join(codes, buckets, on="vec_id", num_buckets=4).materialize()
    q = x[5]
    got = ivfpq_topk(index, ds, ivf_cb, books, q, k=10, n_probe=8,
                     shortlist=200)
    exact = np.argsort(((x - q[None, :]) ** 2).sum(axis=1))[:10].tolist()
    assert set(got["vec_id"]) == set(exact)


def test_ivfpq_pruned_recall():
    from video_features_ray.stages.similarity import (
        build_ivf_codebook,
        ivf_assign,
        ivfpq_topk,
    )
    from video_features_ray.stages.joins import hash_join

    x, df = _corpus(n=1000)
    ds = ray.data.from_arrow(df).repartition(4)
    ivf_cb = build_ivf_codebook(x[:256], n_centroids=8)
    books = pq_train(x[:256], m=8, k=32)
    index = hash_join(pq_encode(ds, books),
                      ivf_assign(ds, ivf_cb).select_columns(["vec_id", "ivf_bucket"]),
                      on="vec_id", num_buckets=4).materialize()
    q = x[5]
    got = ivfpq_topk(index, ds, ivf_cb, books, q, k=10, n_probe=3,
                     shortlist=100)
    exact = set(np.argsort(((x - q[None, :]) ** 2).sum(axis=1))[:10].tolist())
    recall = len(exact & set(got["vec_id"])) / 10
    assert recall >= 0.7, recall  # query's own cluster is in the probe set
