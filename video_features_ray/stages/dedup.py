"""Deduplication operators over the ``documents`` table.

The reference only has exact work-key dedup (unique-stem assertion,
``utils/utils.py:91-92``) and skip-if-exists idempotency
(``base_extractor.py:95-127``); a 100 TB training-data pipeline needs the
full family. All variants follow the same scale shape:

- content hash / sketch computed VECTORIZED per batch (stateless map),
- ONE ``groupby`` over the (much smaller) hash/bucket space,
- candidate verification inside the group.

Exact dedup keeps the minimum doc_id per content hash (deterministic
winner). MinHash-LSH: shingle → k minhashes → b bands of r rows →
groupby (band, band_hash) → candidate pairs → Jaccard verify. SimHash:
64-bit hyperplane sign sketch over shingle hashes; near-dup = identical
band of the simhash. N-gram Jaccard verifies candidate pairs exactly.
Embedding cosine near-dup buckets by random-hyperplane LSH over a
``list<float>`` column and verifies cosine within buckets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_M61 = (1 << 61) - 1


def _md5_hex(texts) -> list[str]:
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex of the text — matches DuckDB ``md5(text)`` exactly."""
    return batch.append_column(
        "content_hash", pa.array(_md5_hex(batch[text_col].to_pylist()), type=pa.string())
    )


def exact_dedup(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Hash-partition on content hash, keep min id per group + dupe count.

    Scale: the hash is computed per batch (map); each batch pre-combines
    (one row per hash per batch); the shuffle moves skinny partials
    bucketed so the outer Ray groupby sees ``num_buckets`` groups, and
    the per-hash combine is one vectorized pandas groupby per bucket
    (Ray's per-group aggregate state is O(#groups) Python objects —
    pathological when most hashes are unique).
    """

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, text_col]].copy()
        df["content_hash"] = _md5_hex(df[text_col].tolist())
        g = df.groupby("content_hash", sort=False).agg(
            keep_id=(id_col, "min"), n_dupes=(id_col, "size")).reset_index()
        h = pd.util.hash_pandas_object(g["content_hash"], index=False).to_numpy()
        g["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return g

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("content_hash", sort=False).agg(
            keep_id=("keep_id", "min"), n_dupes=("n_dupes", "sum")).reset_index()

    return (
        ds.map_batches(_partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(_final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

_POLY_B = np.uint64(1099511628211)  # FNV prime


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64-style finalizer — spreads rolling-hash bits."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char-shingle 64-bit hashes — fully vectorized: one
    utf-32 decode + k shifted multiply-adds + a mix finalizer (a
    per-shingle cryptographic hash costs ~500 Python hash calls per
    document and dominated the MinHash stage)."""
    if not text:
        return np.array([_mix64(np.array([np.uint64(0)]))[0]], dtype=np.uint64)
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cps)
    if n < k:
        h = np.uint64(0)
        for c in cps:
            h = h * _POLY_B + c
        return _mix64(np.array([h], dtype=np.uint64))
    m = n - k + 1
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            h = h * _POLY_B + cps[j : j + m]
    return np.unique(_mix64(h))


class MinHasher:
    """Stateful per-actor minhash: the (a, b) parameter matrix is built
    once per actor (reference analogue: per-process model load,
    ``extract_i3d.py:171-209``)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k)
        # (a*h + b) mod M61 per permutation; vectorized outer product
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_M61)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts]) if texts else np.empty((0, self.num_perm), dtype=np.uint64)
        flat = sigs.reshape(-1).astype(np.uint64)
        offsets = np.arange(0, (len(texts) + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        sig_col = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.uint64()))
        return pa.table({self.id_col: batch[self.id_col], "minhash": sig_col})


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """documents → candidate near-dup pairs via banded minhash LSH.

    Pipeline: MinHasher actor pool → explode (band_id, band_hash, id)
    rows → groupby band bucket → emit pairs within bucket. Pairs are
    emitted once per (band, pair) then distinct-ed by a second tiny
    groupby. At scale the band groupby is the only wide op and its rows
    are 3 small ints.
    """
    rows_per_band = num_perm // bands

    def _bands(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.string()), "band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.string())})
        sigs = np.stack([np.asarray(x, dtype=np.uint64) for x in batch["minhash"].to_pylist()])
        ids = batch[id_col].to_pylist()
        out_ids, out_band, out_hash = [], [], []
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            for i in range(n):
                out_ids.append(ids[i])
                out_band.append(b)
                out_hash.append(hashlib.blake2b(seg[i].tobytes(), digest_size=8).hexdigest())
        return pa.table({id_col: pa.array(out_ids), "band_id": pa.array(out_band, pa.int32()),
                         "band_hash": pa.array(out_hash)})

    num_buckets = 16

    def _bucketize(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(batch["band_hash"].to_pylist()), index=False).to_numpy()
        return batch.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    def _pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # most (band, hash) cells are singletons — filter to actual
        # collisions first, Python-loop only over colliding cells
        dup = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        a, b = [], []
        for _, g in dup.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(g[id_col].tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i]); b.append(ids[j])
        out = pd.DataFrame({"id_a": a, "id_b": b})
        # dedupe within bucket; cross-bucket dupes impossible for the
        # SAME band, but the same pair can collide in different bands →
        # final tiny distinct below
        return out.drop_duplicates()

    sigs = ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   text_col=text_col, id_col=id_col),
        concurrency=concurrency,
    )
    banded = sigs.map_batches(_bands, batch_format="pyarrow").map_batches(
        _bucketize, batch_format="pyarrow")
    pairs = banded.groupby("_bucket").map_groups(_pairs_bucket, batch_format="pandas")

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], sort=False).size().rename("n_bands").reset_index()
        return g

    # candidate pairs are few; one final combine over a single bucket
    return pairs.repartition(1).map_batches(_distinct, batch_format="pandas")


def jaccard_verify_pairs(
    pairs_df: pd.DataFrame, texts: dict[str, str], shingle_k: int = 5, threshold: float = 0.5
) -> pd.DataFrame:
    """Exact n-gram Jaccard over candidate pairs (driver-side or inside a
    map over pair partitions with a broadcast text lookup)."""
    out = []
    for ia, ib in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa = set(_shingle_hashes(texts.get(ia, ""), shingle_k).tolist())
        sb = set(_shingle_hashes(texts.get(ib, ""), shingle_k).tolist())
        inter = len(sa & sb)
        union = len(sa | sb) or 1
        j = inter / union
        if j >= threshold:
            out.append((ia, ib, j))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(text: str, shingle_k: int = 5) -> np.uint64:
    """64-bit simhash over shingle hashes (majority vote per bit)."""
    h = _shingle_hashes(text, shingle_k)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return out


def add_simhash(batch: pa.Table, text_col: str = "text", shingle_k: int = 5) -> pa.Table:
    sh = np.array([simhash64(t or "", shingle_k) for t in batch[text_col].to_pylist()], dtype=np.uint64)
    return batch.append_column("simhash", pa.array(sh.astype(np.int64).view(np.uint64), type=pa.uint64()))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_candidates(
    ds: "ray.data.Dataset",
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    seed: int = 42,
    cosine_threshold: float = 0.95,
) -> "ray.data.Dataset":
    """Random-hyperplane LSH: sign-pattern bucket → verify cosine in bucket.

    The hyperplane matrix is broadcast into a stateless map closure
    (small, deterministic); the only shuffle is the bucket groupby.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes)).astype(np.float32)

    def _bucket(batch: pa.Table) -> pa.Table:
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.stack([np.asarray(v, dtype=np.float32) for v in col.to_pylist()]) if len(batch) else np.empty((0, dim), np.float32)
        signs = (mat @ planes) > 0
        code = (signs.astype(np.uint32) << np.arange(num_planes, dtype=np.uint32)[None, :]).sum(axis=1)
        return pa.table({id_col: batch[id_col], "lsh_bucket": pa.array(code.astype(np.int64)),
                         vec_col: col})

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=df[id_col].dtype),
                                 "id_b": pd.Series([], dtype=df[id_col].dtype),
                                 "cosine": pd.Series([], dtype="float64")})
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sim = mat @ mat.T
        ids = df[id_col].to_numpy()
        ii, jj = np.triu_indices(len(df), k=1)
        mask = sim[ii, jj] >= cosine_threshold
        return pd.DataFrame({"id_a": np.minimum(ids[ii[mask]], ids[jj[mask]]),
                             "id_b": np.maximum(ids[ii[mask]], ids[jj[mask]]),
                             "cosine": sim[ii[mask], jj[mask]]})

    return (
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lsh_bucket")
        .map_groups(_verify, batch_format="pandas")
    )
