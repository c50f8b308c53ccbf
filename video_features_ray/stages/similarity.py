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
            # deterministic boundary: keep EVERY row tied with the k-th
            # similarity, then break ties by id — plain argpartition
            # keeps whichever tied rows block order presents (pq_topk
            # got this right first; same rule here)
            kth = np.partition(sims, len(sims) - k)[len(sims) - k]
            cand = np.flatnonzero(sims >= kth)
            ids_np = batch[id_col].to_numpy(zero_copy_only=False)
            pick = (pd.DataFrame({"s": sims[cand], "i": ids_np[cand]})
                    .sort_values(["s", "i"], ascending=[False, True])
                    .index.to_numpy()[:k])
            idx = cand[pick]
        else:
            idx = np.arange(len(sims))
        ids = batch[id_col].take(pa.array(idx)).combine_chunks()
        return pa.table({id_col: ids, "cosine": pa.array(sims[idx], type=pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow", zero_copy_batch=True)
    top = (partials.sort(["cosine", id_col], descending=[True, False])
           .limit(k).to_pandas())
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


def pq_train(sample: np.ndarray, m: int = 4, k: int = 16, iters: int = 10,
             seed: int = 42) -> np.ndarray:
    """Product-quantization codebooks from a driver-side training
    sample: the vector splits into ``m`` equal subspaces, each with its
    own ``k``-centroid Lloyd codebook.  Returns ``(m, k, dim//m)``.
    Training on a hash-spread SAMPLE is the standard scale practice
    (the full corpus only streams through encode/search, never
    training); the sample is bounded driver memory by construction."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if k > 256:
        raise ValueError(f"k={k} exceeds uint8 code range (max 256)")
    sub = dim // m
    return np.stack([
        build_ivf_codebook(sample[:, j * sub:(j + 1) * sub], n_centroids=k,
                           iters=iters, seed=seed + j)
        for j in range(m)
    ])


def pq_encode(ds: "ray.data.Dataset", codebooks: np.ndarray,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> "ray.data.Dataset":
    """Stateless encode pass: each vector becomes ``m`` uint8 codes
    (dim·4 bytes → m bytes, e.g. 64-dim float → 4 bytes at m=4) — the
    compressed representation that lets an index hold 10⁹+ vectors in
    worker memory.  One vectorized argmin per subspace per batch."""
    ref = ray.put(np.asarray(codebooks, dtype=np.float64))
    m, k, sub = codebooks.shape
    dim = m * sub

    def _encode(batch: pa.Table) -> pa.Table:
        cb = ray.get(ref)
        mat = _to_matrix(batch[vec_col], dim)
        n = len(mat)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            x = mat[:, j * sub:(j + 1) * sub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
            d = -2.0 * (x @ cb[j].T) + (cb[j] ** 2).sum(axis=1)[None, :]
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        flat = pa.array(codes.reshape(-1), type=pa.uint8())
        offs = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int64)).cast(pa.int32())
        return pa.table({id_col: batch[id_col],
                         "pq_code": pa.ListArray.from_arrays(offs, flat)})

    return ds.map_batches(_encode, batch_format="pyarrow", zero_copy_batch=True)


def pq_topk(codes: "ray.data.Dataset", codebooks: np.ndarray,
            query: np.ndarray, k: int = 10,
            id_col: str = "vec_id") -> pd.DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query builds
    one (m × k_codes) lookup table of exact subspace distances, each
    batch SUMS table lookups per code — no float vectors move or decode.
    Same driver-merge shape as :func:`cosine_topk` (B×k rows)."""
    m, kc, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    lut = np.stack([
        ((codebooks[j] - q[j * sub:(j + 1) * sub][None, :]) ** 2).sum(axis=1)
        for j in range(m)
    ])  # (m, kc)
    lref = ray.put(lut)

    def _partial(batch: pa.Table) -> pa.Table:
        tab = ray.get(lref)
        col = batch["pq_code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            # empty slice of the REAL id column keeps block schemas
            # consistent when id_col is not int64
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "adc": pa.array([], pa.float64())})
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            flat = col.values.to_numpy(zero_copy_only=False)
            start = col.offsets[0].as_py()
            codes = flat[start:start + n * m].reshape(n, m)
        else:
            # codes that round-tripped through a pandas stage (e.g. the
            # hash_join with the IVF bucket column) arrive as Ray's
            # tensor extension / object cells instead of list<uint8>
            codes = np.asarray(
                col.to_numpy(zero_copy_only=False).tolist(), dtype=np.uint8)
        d = tab[np.arange(m)[None, :], codes].sum(axis=1)
        # deterministic boundary: ADC ties broken by id (argpartition
        # alone would keep whichever tied rows block order presents)
        ids_np = batch[id_col].to_numpy(zero_copy_only=False)
        order = pd.DataFrame({"d": d, "i": ids_np}).sort_values(
            ["d", "i"], kind="mergesort").index[:k].to_numpy()
        ids = batch[id_col].take(pa.array(order)).combine_chunks()
        return pa.table({id_col: ids,
                         "adc": pa.array(d[order], type=pa.float64())})

    partials = codes.map_batches(_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
    top = partials.sort(["adc", id_col]).limit(k).to_pandas()
    top = top.sort_values(["adc", id_col]).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def pq_topk_rerank(
    codes: "ray.data.Dataset",
    vectors: "ray.data.Dataset",
    codebooks: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """The standard two-stage PQ search: ADC over compressed codes
    produces a ``shortlist`` of candidates (cheap, whole-corpus), then
    the shortlist's ORIGINAL vectors are fetched and exactly re-ranked
    by L2 — quantization error only costs recall if a true neighbor
    misses the shortlist (measured 1.0 recall@10 at shortlist=100 on
    the clustered fixture where raw ADC@10 gives 0.2).  The re-rank
    touches ≤ shortlist float vectors: a broadcast-filter over the
    vector table, never a scan to the driver."""
    import pyarrow.compute as pc

    cand = pq_topk(codes, codebooks, query, k=shortlist, id_col=id_col)
    ids = pa.array(np.sort(cand[id_col].to_numpy()))

    def _pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=ids))

    picked = vectors.map_batches(_pick, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    dim = len(query)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in picked[vec_col]]) if len(picked) else \
        np.empty((0, dim))
    d = ((mat - np.asarray(query, dtype=np.float64)[None, :]) ** 2).sum(axis=1)
    picked = picked.assign(l2=d).sort_values(["l2", id_col]).head(k)
    out = picked[[id_col, "l2"]].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def ivfpq_topk(
    codes_with_buckets: "ray.data.Dataset",
    vectors: "ray.data.Dataset",
    ivf_codebook: np.ndarray,
    pq_codebooks: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF-PQ: the billion-vector composition — coarse IVF prune
    (``n_probe`` of C buckets scanned), ADC over 8-byte codes inside
    the probed buckets, exact re-rank of the shortlist.  Input is the
    write-time index: ``pq_encode(...)`` joined with ``ivf_assign``'s
    bucket column (build once, reuse per query).  Per query the scan
    touches ~n_probe/C of the code table and ``shortlist`` float
    vectors — nothing else moves."""
    import pyarrow.compute as pc

    q = np.asarray(query, dtype=np.float64)
    d = ((ivf_codebook - q[None, :]) ** 2).sum(axis=1)
    probe = np.sort(np.argsort(d)[:n_probe]).astype(np.int32)

    def _prune(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["ivf_bucket"],
                                     value_set=pa.array(probe)))

    pruned = codes_with_buckets.map_batches(_prune, batch_format="pyarrow",
                                            zero_copy_batch=True)
    return pq_topk_rerank(pruned, vectors, pq_codebooks, query, k=k,
                          shortlist=shortlist, id_col=id_col, vec_col=vec_col)


def knn_label_accuracy(
    ds: "ray.data.Dataset",
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Leave-one-out 1-NN label accuracy over an embedding column —
    the embedding-quality eval (does nearest-neighbor structure
    predict the label?).

    Plan: each input block packs its (ids, labels, L2-normalized
    f64 vectors) into ONE object-store cell; an actor pool assembles
    the corpus matrix from those block refs in ``__init__`` (the
    cosine_pairs discipline — the driver never holds a vector) and
    streams the same blocks back through as queries, computing one
    (batch × corpus) matmul per batch with the self-column masked.
    Ties break toward the smallest neighbor id (corpus columns are
    id-sorted, argmax takes the first maximum), mirroring the
    oracle's ``ORDER BY sim DESC, id``.  Output: per label n /
    correct / accuracy (one mirrored division).

    Scale bound (documented): every actor holds the full N×dim f64
    matrix — fine to ~10⁷ rows at dim 64 (~5 GB); past that switch to
    the row-block × col-block task grid exactly as cosine_pairs does.
    """
    from .joins import partial_agg

    def _pack(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[vec_col], dim).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = batch[label_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "ids": pa.array([ids.tobytes()], pa.binary()),
            "labels": pa.array([labels.tobytes()], pa.binary()),
            "mat": pa.array([np.ascontiguousarray(mat).tobytes()],
                            pa.binary())})

    packed = ds.map_batches(_pack, batch_format="pyarrow").materialize()
    refs = packed.to_arrow_refs()

    class _Nn:
        def __init__(self):
            tables = ray.get(list(refs))
            ids, labels, mats = [], [], []
            for t in tables:
                for i in range(len(t)):
                    ids.append(np.frombuffer(t["ids"][i].as_py(),
                                             np.int64))
                    labels.append(np.frombuffer(t["labels"][i].as_py(),
                                                np.int64))
                    m = np.frombuffer(t["mat"][i].as_py(), np.float64)
                    mats.append(m.reshape(-1, dim))
            all_ids = np.concatenate(ids)
            order = np.argsort(all_ids, kind="stable")  # tie rule: id asc
            self.ids = all_ids[order]
            self.labels = np.concatenate(labels)[order]
            self.mat = np.concatenate(mats)[order].T    # dim × N

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.frombuffer(batch["ids"][0].as_py(), np.int64)
            labels = np.frombuffer(batch["labels"][0].as_py(), np.int64)
            q = np.frombuffer(batch["mat"][0].as_py(),
                              np.float64).reshape(-1, dim)
            sims = q @ self.mat                        # batch × N
            pos = np.searchsorted(self.ids, ids)
            hit = (pos < len(self.ids)) & (self.ids[
                np.minimum(pos, len(self.ids) - 1)] == ids)
            sims[np.flatnonzero(hit),
                 pos[hit]] = -np.inf                   # mask self
            nn = np.argmax(sims, axis=1)               # first max = min id
            correct = (self.labels[nn] == labels).astype(np.int64)
            return pa.table({"label": pa.array(labels),
                             "c": pa.array(correct)})

    scored = packed.map_batches(_Nn, batch_format="pyarrow",
                                batch_size=1, concurrency=(1, 4))
    agg = partial_agg(scored, ["label"], sums=["c"],
                      combine="driver").to_pandas()
    agg = agg.sort_values("label").reset_index(drop=True)
    n = agg["n"].astype(np.int64).to_numpy()
    c = agg["sum_c"].astype(np.int64).to_numpy()
    return pd.DataFrame({"label": agg["label"].astype(np.int64),
                         "n": n, "correct": c,
                         "accuracy": c.astype(np.float64)
                         / n.astype(np.float64)})
