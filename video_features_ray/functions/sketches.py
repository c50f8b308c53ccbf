"""Mergeable sketches + deterministic sampling — scale aggregates.

The reference has no sketches (SURVEY §2.6); a 100 TB pipeline needs
approximate distinct counts and consistent samples. All follow the
partial-per-batch → tiny-merge shape (sketches are designed mergeable):

- ``HyperLogLog``        — p-bit register HLL for distinct counts;
  one serialized register array per batch, max-merged.
- ``bottom_k_sample``    — deterministic "consistent sample": keep the
  k rows with the smallest ``hash(key)`` (bit-exact DuckDB replica) —
  per-batch partial bottom-k,
  driver merge. Unlike reservoir sampling it is deterministic,
  mergeable, and reproducible in SQL (``ORDER BY hash(key) LIMIT k``).
- ``token_frequencies``  — dense-vector aggregation: each batch emits a
  ``bincount`` over the fixed vocab (49408 ints ≈ 0.4 MB), partials
  sum elementwise; top-k on the driver. Moves O(vocab) per block —
  never O(tokens).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.sequences import _codepoints_batch
from ..specs import VOCAB_SIZE
from ..stages.dedup import _GOLD, _POLY_B, _mix64


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        """h: uint64 hashes."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros + 1 via an EXACT integer floor-log2
        # shift cascade (float64 log2 rounds values within half an ULP
        # below a power of two UP, understating the rank by one)
        v = rest.copy()  # sentinel bit guarantees v != 0
        fl = np.zeros(len(h), dtype=np.uint8)
        for shift in (32, 16, 8, 4, 2, 1):
            m = v >= (np.uint64(1) << np.uint64(shift))
            fl[m] += np.uint8(shift)
            v = np.where(m, v >> np.uint64(shift), v)
        lz = (np.uint8(63) - fl) + np.uint8(1)
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)


def _hash_values(col, with_valid: bool = False):
    """uint64 hash per element of an Arrow column, fully vectorized:
    integers go through a splitmix64 finalizer; strings through a
    whole-string polynomial prefix-sum hash (O(total chars), no
    per-row Python — the round-1 per-row blake2b was the HLL hot loop).

    ``with_valid=True`` additionally returns the per-row validity mask:
    NULL rows still get a (placeholder) hash so the output stays
    row-aligned, but callers with SQL semantics must drop or mask them —
    ``COUNT(DISTINCT)`` ignores NULLs and a NULL key never matches in a
    join. (Round-2 bug: a nullable int column promoted to float64+NaN
    and the NaN bit pattern was hashed as a real key.)
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(col)
    valid = (np.ones(len(col), dtype=bool) if col.null_count == 0
             else col.is_valid().to_numpy(zero_copy_only=False))
    if pa.types.is_integer(col.type):
        filled = col.fill_null(0) if col.null_count else col
        v = filled.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        h = _mix64(v)
        return (h, valid) if with_valid else h
    flat, off = _codepoints_batch(col)
    n = len(flat)
    cp = flat.astype(np.uint64)
    with np.errstate(over="ignore"):
        binv = np.uint64(pow(int(_POLY_B), -1, 1 << 64))
        b_pows = np.empty(n + 1, np.uint64)
        b_pows[0] = 1
        if n:
            np.cumprod(np.full(n, _POLY_B, np.uint64), out=b_pows[1:])
        binv_pows = np.empty(max(n, 1), np.uint64)
        binv_pows[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, binv, np.uint64), out=binv_pows[1:])
        P = np.zeros(n + 1, np.uint64)
        if n:
            np.cumsum(cp * binv_pows[:n], out=P[1:])
        last = np.maximum(off[1:] - 1, 0)
        h = b_pows[last] * (P[off[1:]] - P[off[:-1]])
    h = _mix64(h)
    return (h, valid) if with_valid else h


def approx_distinct(ds: "ray.data.Dataset", col: str, p: int = 12) -> float:
    """Distributed HLL distinct count: one register array per batch,
    max-merge on the driver (registers are 4 KB at p=12)."""

    def _partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        h, valid = _hash_values(batch[col], with_valid=True)
        hll.add_hashes(h[valid])  # COUNT(DISTINCT) ignores NULLs
        return pa.table({"registers": pa.array([hll.registers.tobytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    merged = HyperLogLog(p)
    for raw in parts["registers"]:
        other = HyperLogLog(p)
        other.registers = np.frombuffer(raw, dtype=np.uint8).copy()
        merged = merged.merge(other)
    return merged.estimate()


def duckdb_hash_int64(v) -> np.ndarray:
    """Bit-exact numpy replica of DuckDB's ``hash(BIGINT)`` (the public
    murmur64 finalizer: xor-shift / multiply alternation) — pinned
    against duckdb over negatives, ±2^63 and the 2^32 boundary in
    ``tests/test_vectorized_kernels.py``. Lets deterministic sampling
    sort by a VECTORIZED key whose SQL oracle is native
    (``ORDER BY hash(col)``), replacing the round-2 per-row
    ``hashlib.md5`` hot loop."""
    x = np.ascontiguousarray(np.asarray(v, dtype=np.int64)).view(np.uint64).copy()
    c = np.uint64(0xD6E8FEB86659FD93)
    s = np.uint64(32)
    with np.errstate(over="ignore"):
        x ^= x >> s
        x *= c
        x ^= x >> s
        x *= c
        x ^= x >> s
    return x


def bottom_k_sample(ds: "ray.data.Dataset", key_col: str, k: int) -> pd.DataFrame:
    """Deterministic consistent sample: k rows with smallest
    ``(hash(key), key)`` over an INTEGER key column.

    Per-batch partial bottom-k (only k rows leave each batch; the hash
    is one vectorized murmur pass), driver merge. SQL-equivalent:
    ``ORDER BY hash(key), key LIMIT k`` (DuckDB-native — bit-identical
    via :func:`duckdb_hash_int64`).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        h = duckdb_hash_int64(keys)
        order = np.lexsort((keys, h))[:k]
        out = batch.take(pa.array(order))
        return out.append_column("_h", pa.array(h[order], pa.uint64()))

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["_h", key_col], kind="mergesort").head(k)
    return parts.drop(columns=["_h"]).reset_index(drop=True)


#: priorities use hash % 2^53 so the uint64 -> double cast is EXACT on
#: both the numpy and the DuckDB side (beyond 2^53 the two would round)
_PRI_BASIS = 1 << 53


def weighted_bottom_k_sample(ds: "ray.data.Dataset", key_col: str,
                             weight_col: str, k: int) -> pd.DataFrame:
    """Deterministic weight-proportional sample: k rows with smallest
    priority ``(hash(key) % 2^53) / weight`` — heavier rows draw
    smaller priorities more often, so selection probability rises with
    weight, and the draw is a pure function of the key (consistent
    across runs and partitionings, like :func:`bottom_k_sample`).

    Exactness: the modulo keeps the hash inside double's exact-integer
    range and the single IEEE division is correctly rounded, so the
    priority is bit-identical to DuckDB's
    ``CAST(hash(key) % 9007199254740992 AS DOUBLE) / weight``.
    Rows with NULL or non-positive weight are excluded (mirror with
    ``WHERE weight > 0`` in SQL). Per-batch partial bottom-k, driver
    merges k × #blocks candidate rows.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(w) & (w > 0)
        h = duckdb_hash_int64(keys) % np.uint64(_PRI_BASIS)
        pri = np.where(ok, h.astype(np.float64) / w, np.inf)
        order = np.lexsort((keys, pri))
        order = order[ok[order]][:k]
        out = batch.take(pa.array(order))
        return out.append_column("_pri", pa.array(pri[order], pa.float64()))

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["_pri", key_col], kind="mergesort").head(k)
    return parts.drop(columns=["_pri"]).reset_index(drop=True)


class DDSketch:
    """DDSketch-style mergeable quantile sketch (public algorithm:
    Masson, Rim & Lee, VLDB'19): log-spaced buckets with index
    ``ceil(log_γ(x))``, γ = (1+α)/(1-α) — every returned quantile is
    within RELATIVE error α of the true value. Deterministic, mergeable
    (bucket counts add), vectorized. Handles positives, negatives
    (mirrored store) and zeros; unbounded range unlike the exact
    frequency-partial quantile, which needs quantized values."""

    def __init__(self, alpha: float = 0.01):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._lg = np.log(self.gamma)
        self.pos: dict[int, int] = {}
        self.neg: dict[int, int] = {}
        self.zero = 0
        self.n = 0

    def add(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float64)
        x = x[np.isfinite(x)]   # nulls/NaN/inf: excluded like SQL aggregates
        self.n += len(x)
        self.zero += int((x == 0).sum())
        for store, vals in ((self.pos, x[x > 0]), (self.neg, -x[x < 0])):
            if len(vals) == 0:
                continue
            idx = np.ceil(np.log(vals) / self._lg).astype(np.int64)
            ks, cs = np.unique(idx, return_counts=True)
            for k, c in zip(ks.tolist(), cs.tolist()):
                store[k] = store.get(k, 0) + int(c)

    def merge(self, other: "DDSketch") -> "DDSketch":
        assert abs(self.alpha - other.alpha) < 1e-12
        out = DDSketch(self.alpha)
        for mine, theirs, tgt in ((self.pos, other.pos, out.pos),
                                  (self.neg, other.neg, out.neg)):
            for k, c in mine.items():
                tgt[k] = tgt.get(k, 0) + c
            for k, c in theirs.items():
                tgt[k] = tgt.get(k, 0) + c
        out.zero = self.zero + other.zero
        out.n = self.n + other.n
        return out

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        rank = max(int(np.ceil(q * self.n)), 1)
        cum = 0
        for k in sorted(self.neg, reverse=True):   # most-negative first
            cum += self.neg[k]
            if cum >= rank:
                return -2 * self.gamma ** k / (self.gamma + 1)
        cum += self.zero
        if cum >= rank:
            return 0.0
        for k in sorted(self.pos):
            cum += self.pos[k]
            if cum >= rank:
                return 2 * self.gamma ** k / (self.gamma + 1)
        return 0.0  # pragma: no cover

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.alpha, self.pos, self.neg, self.zero, self.n))

    @staticmethod
    def from_bytes(raw: bytes) -> "DDSketch":
        alpha, pos, neg, zero, n = pickle.loads(raw)
        out = DDSketch(alpha)
        out.pos, out.neg, out.zero, out.n = pos, neg, zero, n
        return out


def approx_quantile(ds: "ray.data.Dataset", col: str, qs,
                    alpha: float = 0.01) -> dict[float, float]:
    """Distributed DDSketch: one serialized sketch per batch (sparse —
    O(log-range/α) buckets), driver merge, quantiles with relative
    error ≤ α. The unbounded-value counterpart of
    ``grouped_quantile_disc``."""

    def _partial(batch: pa.Table) -> pa.Table:
        sk = DDSketch(alpha)
        sk.add(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([sk.to_bytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    merged = DDSketch(alpha)
    for raw in parts["sketch"]:  # accumulate in place — no per-partial copies
        other = DDSketch.from_bytes(raw)
        for mine, theirs in ((merged.pos, other.pos), (merged.neg, other.neg)):
            for k, c in theirs.items():
                mine[k] = mine.get(k, 0) + c
        merged.zero += other.zero
        merged.n += other.n
    return {float(q): merged.quantile(q) for q in qs}


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan, public algorithm):
    (depth × width) counters, each row indexed by an independent hash;
    estimate = min over rows. NEVER underestimates; overestimates by
    ≤ ε·N (ε = e/width) with probability 1-δ (δ = e^-depth). Mergeable
    by elementwise add — the unbounded-key counterpart of the dense
    ``token_frequencies`` bincount (which needs a bounded vocab)."""

    def __init__(self, width: int = 1 << 16, depth: int = 4):
        self.width = width
        self.depth = depth
        self.counts = np.zeros((depth, width), dtype=np.int64)
        self.n = 0

    def _rows(self, h: np.ndarray) -> np.ndarray:
        # NOTE: no lazy imports here — this method runs inside Ray
        # workers, where the package is shipped by-value (a worker
        # process can't re-import video_features_ray when the driver
        # launched from a foreign cwd)
        with np.errstate(over="ignore"):
            return np.stack([
                (_mix64(h + np.uint64(d) * _GOLD) % np.uint64(self.width)).astype(np.int64)
                for d in range(self.depth)
            ])

    def add_hashes(self, h: np.ndarray, weights: np.ndarray | None = None) -> None:
        w = np.ones(len(h), np.int64) if weights is None else np.asarray(weights, np.int64)
        self.n += int(w.sum())
        pos = self._rows(h)
        for d in range(self.depth):
            np.add.at(self.counts[d], pos[d], w)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._rows(h)
        est = self.counts[0][pos[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.counts[d][pos[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.width == other.width and self.depth == other.depth
        out = CountMinSketch(self.width, self.depth)
        out.counts = self.counts + other.counts
        out.n = self.n + other.n
        return out


def cms_counts(ds: "ray.data.Dataset", col: str,
               width: int = 1 << 16, depth: int = 4) -> CountMinSketch:
    """Distributed count-min build: one (depth×width) int64 partial per
    batch, elementwise driver merge."""

    def _partial(batch: pa.Table) -> pa.Table:
        cms = CountMinSketch(width, depth)
        h, valid = _hash_values(batch[col], with_valid=True)
        cms.add_hashes(h[valid])  # NULL is not a key
        return pa.table({"counts": pa.array([cms.counts.tobytes()], pa.binary()),
                         "n": pa.array([int(valid.sum())], pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = CountMinSketch(width, depth)
    for raw, n in zip(parts["counts"], parts["n"]):
        out.counts += np.frombuffer(raw, dtype=np.int64).reshape(depth, width)
        out.n += int(n)
    return out


class BloomFilter:
    """Mergeable Bloom filter over uint64 hashes: double hashing
    (pos_i = h1 + i·h2 mod n_bits), bits in a uint64 word array, OR to
    merge. All add/contains paths are vectorized."""

    def __init__(self, n_bits: int = 1 << 23, k: int = 4):
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = k
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # no lazy imports: runs inside Ray workers (see _rows above)
        h1 = h
        h2 = _mix64(h) | np.uint64(1)
        with np.errstate(over="ignore"):
            return np.stack([
                ((h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)).astype(np.int64)
                for i in range(self.k)
            ])                                      # (k, n)

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._positions(h).reshape(-1)
        np.bitwise_or.at(self.words, pos >> 6,
                         np.uint64(1) << (pos & np.int64(63)).astype(np.uint64))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            p = pos[i]
            bit = (self.words[p >> 6] >> (p & np.int64(63)).astype(np.uint64)) & np.uint64(1)
            hit &= bit.astype(bool)
        return hit

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        out = BloomFilter(self.n_bits, self.k)
        out.words = self.words | other.words
        return out


def build_bloom(ds: "ray.data.Dataset", col: str,
                n_bits: int = 1 << 23, k: int = 4) -> BloomFilter:
    """Distributed build: one bitmap partial per batch (n_bits/8 bytes —
    1 MB at the default), OR-merged on the driver. No false negatives
    ever; false-positive rate ≈ (1 - e^{-k·n/m})^k."""

    def _partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, k)
        h, valid = _hash_values(batch[col], with_valid=True)
        bf.add_hashes(h[valid])  # NULL keys never match a join
        return pa.table({"bits": pa.array([bf.words.tobytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    out = BloomFilter(n_bits, k)
    for raw in parts["bits"]:
        out.words |= np.frombuffer(raw, dtype=np.uint64)
    return out


def bloom_prefilter(ds: "ray.data.Dataset", col: str, bloom: BloomFilter):
    """Drop rows whose key is definitely absent from the filter —
    broadcast the bitmap once (``ray.put``), test per batch. Lossless
    for inner/semi joins (no false negatives; false positives are
    dropped by the join itself); NEVER use before left/anti joins."""
    import ray as _ray

    ref = _ray.put((bloom.words, bloom.n_bits, bloom.k))

    class _Filter:
        def __init__(self):
            words, n_bits, k = _ray.get(ref)
            self.bf = BloomFilter(n_bits, k)
            self.bf.words = words

        def __call__(self, batch: pa.Table) -> pa.Table:
            h, valid = _hash_values(batch[col], with_valid=True)
            # NULL keys can never match an inner/semi join — dropping them
            # here is lossless (and required: a placeholder hash could
            # otherwise collide into a spurious keep)
            keep = self.bf.contains_hashes(h) & valid
            return batch.filter(pa.array(keep))

    return ds.map_batches(_Filter, batch_format="pyarrow", concurrency=(1, 8))


def stratified_bottom_k(
    ds: "ray.data.Dataset", group_col: str, key_col: str, k: int,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Deterministic stratified sample: per GROUP, the k rows with the
    smallest ``(hash(key), key)`` over an INTEGER key. Per-batch local
    per-group bottom-k → hash-bucket by group (a group lives in one
    bucket, so bucket-local bottom-k is exact) → driver concat of ≤
    groups × k rows.
    SQL: ``row_number() OVER (PARTITION BY g ORDER BY hash(key), key) <= k``
    (DuckDB-native; bit-identical via :func:`duckdb_hash_int64`).
    """

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=duckdb_hash_int64(df[key_col].to_numpy()))
        df = df.sort_values(["_h", key_col], kind="mergesort")
        out = df.groupby(group_col, sort=False).head(k)
        hg = pd.util.hash_pandas_object(out[group_col], index=False).to_numpy()
        return out.assign(_bucket=(hg % np.uint64(num_buckets)).astype(np.int32))

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", key_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k).drop(columns=["_bucket"])

    parts = (ds.map_batches(_local, batch_format="pandas")
             .groupby("_bucket")
             .map_groups(_bucket, batch_format="pandas"))
    out = parts.to_pandas().sort_values([group_col, "_h", key_col], kind="mergesort")
    return out.drop(columns=["_h"]).reset_index(drop=True)


def token_frequencies(ds: "ray.data.Dataset", top_k: int = 50,
                      vocab_size: int = VOCAB_SIZE) -> pd.DataFrame:
    """Corpus token histogram via dense bincount partials.

    Each batch ships one fixed-size int64 vector (vocab_size ≈ 49408 →
    0.4 MB) regardless of token volume; the driver sums the vectors and
    takes top_k (ties broken by token id). The shuffle-free analogue of
    ``unnest → groupby token``.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        off = col.offsets.to_numpy(zero_copy_only=False)
        flat = flat[off[0] : off[-1]] if len(off) else flat[:0]
        counts = np.bincount(flat, minlength=vocab_size).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    total = np.zeros(vocab_size, dtype=np.int64)
    for raw in parts["counts"]:
        total += np.frombuffer(raw, dtype=np.int64)
    order = np.lexsort((np.arange(vocab_size), -total))
    order = order[total[order] > 0][:top_k]  # never report unseen tokens
    return pd.DataFrame({
        "token": order.astype(np.int64),
        "n": total[order],
    }).sort_values(["n", "token"], ascending=[False, True]).reset_index(drop=True)


def cms_estimate(cms: CountMinSketch, values) -> np.ndarray:
    """Point estimates for an Arrow/iterable of keys."""
    h = _hash_values(pa.array(values) if not isinstance(
        values, (pa.Array, pa.ChunkedArray)) else values)
    return cms.estimate_hashes(h)
