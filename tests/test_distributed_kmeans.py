"""Distributed Lloyd k-means vs the single-process reference from the
same deterministic init — the iterative-algorithm pattern pinned."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.stages.similarity import distributed_kmeans


def _fixture(n=600, dim=8, seed=13):
    rng = np.random.default_rng(seed)
    # 3 separated blobs so convergence is meaningful
    centers = rng.standard_normal((3, dim)) * 8
    mat = np.concatenate([centers[i] + rng.standard_normal((n // 3, dim))
                          for i in range(3)])
    off = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
    emb = pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                   pa.array(mat.astype(np.float32).reshape(-1),
                                            pa.float32()))
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)), "embedding": emb})
    return t, mat.astype(np.float64)


def _single_process_lloyd(mat, ids, k, iters):
    from video_features_ray.functions.sketches import duckdb_hash_int64

    ids = np.asarray(ids, np.int64)
    # mirror bottom_k_sample's (hash(id), id)-order init
    order = np.lexsort((ids, duckdb_hash_int64(ids)))[:k]
    cent = mat[order].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = mat[m].mean(axis=0)
    return cent


def test_distributed_matches_single_process():
    t, mat = _fixture()
    # float32 storage roundtrip: the distributed path reads float32 cells
    mat32 = mat.astype(np.float32).astype(np.float64)
    want = _single_process_lloyd(mat32, np.arange(len(mat)), k=3, iters=8)
    got = distributed_kmeans(ray.data.from_arrow(t).repartition(6),
                             dim=8, n_centroids=3, iters=8)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_partition_invariant():
    t, _ = _fixture(seed=21)
    a = distributed_kmeans(ray.data.from_arrow(t).repartition(2),
                           dim=8, n_centroids=3, iters=5)
    b = distributed_kmeans(ray.data.from_arrow(t).repartition(13),
                           dim=8, n_centroids=3, iters=5)
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_clusters_actually_separate():
    """k over-provisioned (6 for 3 blobs) so the deterministic md5 init
    can't strand a blob in a local optimum — every point then sits near
    some centroid (blob std = 1)."""
    t, mat = _fixture(seed=5)
    cent = distributed_kmeans(ray.data.from_arrow(t).repartition(4),
                              dim=8, n_centroids=6, iters=10)
    # 8-d radial distance from a unit-std blob center: mean ~sqrt(8)=2.8,
    # so 5.5 is a ~+4 sigma envelope
    d = np.sqrt(((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)).min(axis=1)
    assert (d < 5.5).mean() > 0.99, (d < 5.5).mean()
