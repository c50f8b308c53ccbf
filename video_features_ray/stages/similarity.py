"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
(``ray.put``), every batch does one float64 matmul against it, emits its
LOCAL top-k, and a final tiny global top-k merges the per-batch partials
(no full-dataset sort: the wide data never shuffles, only B×k candidate
rows move).

Scale path: IVF-style coarse quantization — a k-means-ish codebook
(seeded, trained on a driver-side sample) assigns each vector to a
centroid bucket at write time; queries probe only the nearest
``n_probe`` buckets. Bucketing is a stateless map; the probe is a
pruned read (filter on the bucket column) followed by the same
brute-force kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col, dim: int) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, dim), dtype=np.float64)
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    off = col.offsets.to_numpy(zero_copy_only=False)
    start = off[0]
    return flat[start : start + len(col) * dim].reshape(len(col), dim)


def cosine_topk(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Top-k rows by cosine similarity to ``query`` (single query vector).

    Returns a small pandas frame (id, cosine, rank) — driver-side merge
    of per-batch partial top-ks.
    """
    dim = len(query)
    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    q = q / qn
    qref = ray.put(q)

    def _partial(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        mat = _to_matrix(batch[vec_col], dim)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qv) / norms
        if len(sims) > k:
            idx = np.argpartition(-sims, k)[:k]
        else:
            idx = np.arange(len(sims))
        ids = batch[id_col].take(pa.array(idx)).combine_chunks()
        return pa.table({id_col: ids, "cosine": pa.array(sims[idx], type=pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    top = partials.sort("cosine", descending=True).limit(k).to_pandas()
    top = top.sort_values(["cosine", id_col], ascending=[False, True]).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def build_ivf_codebook(sample: np.ndarray, n_centroids: int = 16, iters: int = 10,
                       seed: int = 42) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample → (C, dim) codebook."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    cent = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def distributed_kmeans(
    ds: "ray.data.Dataset",
    dim: int,
    n_centroids: int = 16,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd's k-means — the iterative-algorithm pattern on
    Ray Data: per iteration, broadcast the centroids once (``ray.put``),
    every batch emits ONE (k×dim sums, k counts) partial, the driver
    reduces k×dim floats and updates. Data never moves; only O(k·dim)
    partials per block per iteration do.

    Deterministic: init = the ``n_centroids`` vectors with smallest
    md5(id) (the engine's consistent-sample rule), and the update is a
    sum of per-batch float64 partials. Matches single-process Lloyd
    from the same init to float tolerance (test-pinned).
    """
    from ..functions.sketches import bottom_k_sample

    sample = bottom_k_sample(ds, id_col, k=n_centroids)
    cent = np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])

    for _ in range(iters):
        ref = ray.put(cent)

        def _partial(batch: pa.Table) -> pa.Table:
            cb = ray.get(ref)
            mat = _to_matrix(batch[vec_col], dim)
            d = ((mat[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            k = len(cb)
            sums = np.zeros((k, dim), np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.binary()),
                "counts": pa.array([counts.tobytes()], pa.binary()),
            })

        parts = ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
        k = len(cent)
        tot = np.zeros((k, dim), np.float64)
        cnt = np.zeros(k, np.int64)
        for sraw, craw in zip(parts["sums"], parts["counts"]):
            tot += np.frombuffer(sraw, np.float64).reshape(k, dim)
            cnt += np.frombuffer(craw, np.int64)
        nonzero = cnt > 0
        cent = cent.copy()
        cent[nonzero] = tot[nonzero] / cnt[nonzero, None]
    return cent


def ivf_assign(ds: "ray.data.Dataset", codebook: np.ndarray,
               vec_col: str = "embedding") -> "ray.data.Dataset":
    """Stateless map adding ``ivf_bucket`` — the write-time coarse index."""
    ref = ray.put(np.asarray(codebook, dtype=np.float64))
    dim = codebook.shape[1]

    def _assign(batch: pa.Table) -> pa.Table:
        cb = ray.get(ref)
        mat = _to_matrix(batch[vec_col], dim)
        d = ((mat[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column("ivf_bucket", pa.array(d.argmin(axis=1).astype(np.int32)))

    return ds.map_batches(_assign, batch_format="pyarrow", zero_copy_batch=True)


def ivf_topk(
    ds_with_buckets: "ray.data.Dataset",
    codebook: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Probe only the n_probe nearest centroid buckets, then brute-force."""
    import pyarrow.compute as pc

    q = np.asarray(query, dtype=np.float64)
    d = ((codebook - q[None, :]) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(d)[:n_probe]).astype(np.int32)

    def _prune(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["ivf_bucket"], value_set=pa.array(probe)))

    pruned = ds_with_buckets.map_batches(_prune, batch_format="pyarrow", zero_copy_batch=True)
    return cosine_topk(pruned, query, k=k, id_col=id_col, vec_col=vec_col)
