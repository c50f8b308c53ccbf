"""Deduplication operators over the ``documents`` table.

The reference only has exact work-key dedup (unique-stem assertion,
``utils/utils.py:91-92``) and skip-if-exists idempotency
(``base_extractor.py:95-127``); a 100 TB training-data pipeline needs the
full family. All variants follow the same scale shape:

- content hash / sketch computed VECTORIZED per batch (stateless map —
  no per-row or per-char Python in any kernel),
- ONE ``groupby`` over the (much smaller) hash/bucket space,
- candidate verification inside the group.

Exact dedup keeps the minimum doc_id per content hash (deterministic
winner). MinHash-LSH: shingle → k minhashes → b bands of r rows →
groupby (band, band_hash) → candidate pairs → Jaccard verify. SimHash:
64-bit majority-vote sketch over distinct shingle hashes. N-gram
Jaccard verifies candidate pairs exactly (distributed stage with a
broadcast text lookup — valid while candidates ≪ corpus). Embedding
cosine near-dup buckets by MULTI-TABLE random-hyperplane LSH over a
``list<float>`` column and verifies cosine within buckets, splitting
any bucket above a size cap with extra hyperplanes so no single task
ever does an unbounded O(n²) verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..sources.sequences import _codepoints_batch

_M61 = (1 << 61) - 1
_GOLD = np.uint64(0x9E3779B97F4A7C15)


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


def distinct_count_per_group(
    ds: "ray.data.Dataset", group_col: str, value_col: str,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """EXACT COUNT(DISTINCT value) per group, shuffle-light: per-batch
    distinct (group, value) pairs → hash-bucket BY VALUE (a value's
    duplicates across batches all land in one bucket, so the per-bucket
    distinct is globally exact) → per-bucket distinct + count per group
    → tiny per-group sum of bucket counts.

    NULL values are excluded (SQL ``COUNT(DISTINCT)`` semantics). Known
    caveat: a group whose values are ALL NULL emits no row at all,
    where SQL would emit ``(group, 0)`` — callers needing that row must
    left-join the group list."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        # SQL COUNT(DISTINCT v) excludes NULLs; pandas drop_duplicates
        # would keep one NaN row per group and over-count by 1
        g = df[[group_col, value_col]].dropna(subset=[value_col]).drop_duplicates()
        h = pd.util.hash_pandas_object(g[value_col], index=False).to_numpy()
        g = g.assign(_bucket=(h % np.uint64(num_buckets)).astype(np.int32))
        return g

    def _bucket_count(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[group_col, value_col]].drop_duplicates()
        return (d.groupby(group_col, sort=False).size()
                .rename("n_distinct").reset_index())

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(group_col, sort=False)["n_distinct"].sum()
               .astype(np.int64).reset_index())
        return out

    counts = (ds.map_batches(_partial, batch_format="pandas")
              .groupby("_bucket")
              .map_groups(_bucket_count, batch_format="pandas"))
    # bucket counts are ≤ groups × buckets rows — one tiny driver combine
    return ray.data.from_pandas(_final(counts.to_pandas()))


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


def _batch_shingle_hashes(
    texts, k: int = 5, distinct: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """k-char-shingle 64-bit hashes for EVERY row of a string column at
    once → (flat uint64 hashes, int64 row offsets).

    One utf-32 decode of the concatenated batch, then k masked
    multiply-adds (Horner) over the flat codepoint array — no per-row
    Python. Rows shorter than k hash their whole text as one shingle;
    empty rows contribute the single hash mix64(0) (matching the
    round-1 per-row kernel bit-for-bit). ``distinct=True`` dedups
    shingles within each row (lexsort + boundary mask — still no
    per-row loop); use it where duplicate shingles would double-vote
    (simhash), skip it where they can't matter (minhash min).
    """
    flat, offsets = _codepoints_batch(texts)
    lens = np.diff(offsets)
    n_rows = len(lens)
    if n_rows == 0:
        return np.zeros(0, np.uint64), np.zeros(1, np.int64)
    cp = flat.astype(np.uint64)
    counts = np.maximum(lens - k + 1, 1)
    sh_off = np.concatenate(([0], np.cumsum(counts)))
    total = int(sh_off[-1])
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    local = np.arange(total, dtype=np.int64) - sh_off[:-1][row_of]
    start = offsets[:-1][row_of] + local
    span = np.minimum(lens, k)[row_of]
    with np.errstate(over="ignore"):
        h = np.zeros(total, np.uint64)
        for j in range(k):
            m = span > j
            h[m] = h[m] * _POLY_B + cp[start[m] + j]
        h = _mix64(h)
    if not distinct:
        return h, sh_off
    order = np.lexsort((h, row_of))
    hs, rs = h[order], row_of[order]
    keep = np.ones(total, bool)
    keep[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    h2, r2 = hs[keep], rs[keep]
    off2 = np.concatenate(([0], np.cumsum(np.bincount(r2, minlength=n_rows))))
    return h2, off2.astype(np.int64)


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Single-text convenience wrapper: distinct sorted shingle hashes."""
    h, _ = _batch_shingle_hashes(pa.array([text or ""], pa.string()), k, distinct=True)
    return h


class MinHasher:
    """Stateful per-actor minhash: the (a, b) parameter matrix is built
    once per actor (reference analogue: per-process model load,
    ``extract_i3d.py:171-209``). The whole batch is hashed in one
    vectorized pass; permutations are processed in blocks so peak
    memory stays ~``perm_block × total_shingles × 8`` bytes."""

    _PERM_BLOCK = 16

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        # odd multipliers: (a*h + b) mod 2^64 is then a BIJECTION on
        # uint64 (multiply-shift family) — a valid minhash permutation
        # with free wraparound, no per-element modulo in the hot loop
        # (the round-1 % M61 was ~half the stage's CPU)
        self.a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        """Single-text signature (num_perm uint64s)."""
        return self.signatures(pa.array([text or ""], pa.string()))[0]

    def signatures(self, texts) -> np.ndarray:
        """(n_rows, num_perm) uint64 signature matrix for a string column."""
        h, sh_off = _batch_shingle_hashes(texts, self.k)
        n_rows = len(sh_off) - 1
        sigs = np.empty((self.num_perm, n_rows), np.uint64)
        if n_rows == 0:
            return sigs.T
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perm, self._PERM_BLOCK):
                p1 = min(p0 + self._PERM_BLOCK, self.num_perm)
                vals = h[None, :] * self.a[p0:p1, None] + self.b[p0:p1, None]
                sigs[p0:p1] = np.minimum.reduceat(vals, sh_off[:-1], axis=1)
        return sigs.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch[self.text_col])
        n = len(batch)
        flat = np.ascontiguousarray(sigs).reshape(-1)
        offsets = np.arange(0, (n + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        sig_col = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                           pa.array(flat, type=pa.uint64()))
        # canonical STRING ids: the whole candidate/verify family keys
        # on this column, and a raw int64 doc_id would silently fail to
        # match the string-cast docs side in jaccard_verify_joined
        return pa.table({self.id_col: batch[self.id_col].cast(pa.string()),
                         "minhash": sig_col})


def _fixed_list_matrix(col, width: int, dtype) -> np.ndarray:
    """fixed-width list column → (n, width) ndarray, zero-copy values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.values.to_numpy(zero_copy_only=False)
    start = off[0]
    return vals[start : start + (len(off) - 1) * width].reshape(-1, width).astype(dtype, copy=False)


def band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, num_perm) signature matrix → (n, bands) uint64 band hashes:
    a vectorized polynomial fold over each band's rows + mix (replaces
    the round-1 per-row blake2b — identical collision behavior at 64
    bits, ~1000× fewer Python calls)."""
    n, num_perm = sigs.shape
    r = num_perm // bands
    out = np.empty((n, bands), np.uint64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            h = np.full(n, np.uint64(b) * _GOLD, np.uint64)
            seg = sigs[:, b * r : (b + 1) * r]
            for j in range(r):
                h = h * _POLY_B + seg[:, j]
            out[:, b] = _mix64(h)
    return out


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
    num_buckets: int = 16,
    cell_cap: int = 256,
) -> "ray.data.Dataset":
    """documents → candidate near-dup pairs via banded minhash LSH.

    ``cell_cap``: collision cells bigger than this emit a connectivity
    CHAIN (s-1 pairs) instead of all pairs (s(s-1)/2) — bounding the
    worst-case task like the embedding LSH's bucket cap; the cell's
    connected component is preserved for downstream clustering.
    Chain/verify recall interaction (documented limitation): when the
    chain pairs are later Jaccard-VERIFIED (``neardup_dedup``), one
    middle link below the threshold disconnects chain members whose
    direct pairs would have passed — so the capped path can split a
    cluster the uncapped path keeps. The cap only engages on cells
    > ``cell_cap`` (boilerplate-degenerate corpora); if that recall
    matters, re-run candidates on the capped cells' members with more
    bands, or re-chain the verified survivors of each oversized cell.

    Pipeline: MinHasher actor pool → explode (band_id, band_hash, id)
    rows → groupby band bucket → emit pairs within colliding cells →
    bucketed distinct (pairs hash-partition by (id_a, id_b); no
    single-task global distinct). At scale the band groupby is the only
    wide op and its rows are 3 small ints.
    """
    if num_perm % bands:
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}) "
            "— the trailing permutations would be silently dropped")

    def _bands_fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.string()),
                             "band_id": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.uint64()),
                             "_bucket": pa.array([], pa.int32())})
        sigs = _fixed_list_matrix(batch["minhash"], num_perm, np.uint64)
        bh = band_hashes(sigs, bands)
        take = np.repeat(np.arange(n, dtype=np.int64), bands)
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        flat_bh = bh.reshape(-1)
        bucket = (flat_bh % np.uint64(num_buckets)).astype(np.int32)
        return pa.table({
            id_col: batch[id_col].take(pa.array(take)),
            "band_id": pa.array(band_id),
            "band_hash": pa.array(flat_bh),
            "_bucket": pa.array(bucket),
        })

    def _pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # most (band, hash) cells are singletons — filter to actual
        # collisions first, Python-loop only over colliding cells
        dup = df[df.duplicated(["band_id", "band_hash"], keep=False)]
        a, b = [], []
        for _, g in dup.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(set(g[id_col].tolist()))
            if len(ids) > cell_cap:
                # a degenerate cell (boilerplate corpus) would emit
                # O(s²) pairs in one task; a CHAIN over the sorted ids
                # keeps every member connected (downstream verify +
                # clustering recovers the component) at s-1 pairs
                for i in range(len(ids) - 1):
                    a.append(ids[i]); b.append(ids[i + 1])
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i]); b.append(ids[j])
        out = pd.DataFrame({"id_a": pd.Series(a, dtype=object),
                            "id_b": pd.Series(b, dtype=object)})
        # keep the per-bucket collision COUNT (a plain drop_duplicates
        # collapsed multi-band collisions, deflating n_bands)
        out = (out.groupby(["id_a", "id_b"], sort=False).size()
               .rename("n_local").reset_index())
        if len(out):
            h = (pd.util.hash_pandas_object(out["id_a"], index=False).to_numpy()
                 * _GOLD
                 + pd.util.hash_pandas_object(out["id_b"], index=False).to_numpy())
            out["_pb"] = (h % np.uint64(num_buckets)).astype(np.int32)
        else:
            out["_pb"] = pd.Series([], dtype=np.int32)
        return out

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["id_a", "id_b"], sort=False)["n_local"].sum()
                .astype(np.int64).rename("n_bands").reset_index())

    sigs = ds.map_batches(
        MinHasher, batch_format="pyarrow",
        fn_constructor_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                                   text_col=text_col, id_col=id_col),
        concurrency=concurrency,
        # bound peak memory: a perm-block holds perm_block × total_shingles
        # uint64s, so keep total_shingles per batch ~500k chars
        batch_size=1024,
    )
    banded = sigs.map_batches(_bands_fn, batch_format="pyarrow")
    pairs = banded.groupby("_bucket").map_groups(_pairs_bucket, batch_format="pandas")
    # a pair found in several bands hashes to ONE (_pb) bucket → the
    # per-bucket groupby is a true global distinct, no repartition(1)
    return (pairs.groupby("_pb")
            .map_groups(_distinct, batch_format="pandas"))


def _pair_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """THE Jaccard semantics (distinct shingles, zero-union sentinel)
    — one definition shared by the broadcast and joined verifiers so
    they cannot drift apart."""
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter or 1
    return inter / union


def jaccard_verify_pairs(
    pairs_df: pd.DataFrame, texts: dict[str, str], shingle_k: int = 5, threshold: float = 0.5
) -> pd.DataFrame:
    """Exact shingle-set Jaccard over candidate pairs (vectorized
    per-pair via sorted-array intersection)."""
    ids = sorted({*pairs_df["id_a"], *pairs_df["id_b"]})
    missing = [i for i in ids if i not in texts]
    if missing:
        # a silent "" would shingle two missing texts identically and
        # VERIFY the pair at jaccard=1.0 — deleting unrelated docs
        raise KeyError(
            f"texts lookup missing {len(missing)} candidate ids "
            f"(first: {missing[:3]})")
    tcol = pa.array([texts[i] for i in ids], pa.string())
    h, off = _batch_shingle_hashes(tcol, shingle_k, distinct=True)
    sets = {i: h[off[j]: off[j + 1]] for j, i in enumerate(ids)}
    out = []
    for ia, ib in zip(pairs_df["id_a"], pairs_df["id_b"]):
        j = _pair_jaccard(sets[ia], sets[ib])
        if j >= threshold:
            out.append((ia, ib, j))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])


def jaccard_verify_stage(
    pairs: "ray.data.Dataset", texts_df: pd.DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.5, concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Distributed exact-Jaccard verify: the text lookup is ray.put ONCE
    and each actor reads it zero-copy (valid while the candidate side's
    referenced texts fit the object store — candidates ≪ corpus; at
    100 TB pre-join pairs with their texts by id instead)."""
    import ray

    # string keys to match the MinHasher's canonical string ids
    lookup_ref = ray.put(dict(zip(texts_df[id_col].astype(str),
                                  texts_df[text_col])))

    class _Verify:
        def __init__(self):
            self.texts = ray.get(lookup_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                  "id_b": pd.Series([], dtype=object),
                                  "jaccard": pd.Series([], dtype="float64")})
            if len(df) == 0:
                return empty
            out = jaccard_verify_pairs(df, self.texts, shingle_k, threshold)
            # typed empty keeps block schemas identical (an all-float64
            # empty frame would clash with string id columns elsewhere)
            return out if len(out) else empty

    return pairs.map_batches(_Verify, batch_format="pandas", concurrency=concurrency)


def jaccard_verify_joined(
    pairs: "ray.data.Dataset", docs: "ray.data.Dataset",
    id_col: str = "doc_id", text_col: str = "text",
    shingle_k: int = 5, threshold: float = 0.5,
    num_buckets: int = 16,
    pairs_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Fully-distributed exact-Jaccard verify: candidate pairs are
    hash-JOINED with their texts (one shuffle per side), then verified
    per batch — neither the pair set nor any text lookup ever touches
    the driver. This is the 100 TB shape the broadcast-lookup
    :func:`jaccard_verify_stage` documents as its scale-up path (use
    the broadcast variant when candidates ≪ corpus; this one always).

    ``pairs_schema``: the candidate set's Arrow schema when the caller
    knows it — the docs sides' schemas are fixed (string id + text), so
    with it neither join ever calls ``Dataset.schema()`` (which can
    execute the upstream pipeline's first block just for inference)."""
    from .joins import hash_join

    def _side(col_id: str, col_text: str):
        def _fn(batch: pa.Table) -> pa.Table:
            return pa.table({col_id: batch[id_col].cast(pa.string()),
                             col_text: batch[text_col]})
        return _fn

    docs_a = docs.map_batches(_side("id_a", "text_a"), batch_format="pyarrow")
    docs_b = docs.map_batches(_side("id_b", "text_b"), batch_format="pyarrow")
    sch_a = pa.schema([("id_a", pa.string()), ("text_a", pa.string())])
    sch_b = pa.schema([("id_b", pa.string()), ("text_b", pa.string())])
    # j1's schema = pairs cols + text_a (hash_join appends right non-key
    # cols; id_a is the key, so only text_a lands). pairs_schema may be
    # a ray.data.Schema wrapper — consume it via .names/.types (all
    # TaggedUnion reads) and skip the fix-up when any type isn't Arrow.
    j1_schema = None
    if pairs_schema is not None and all(
            isinstance(t, pa.DataType) for t in pairs_schema.types):
        j1_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(pairs_schema.names,
                                            pairs_schema.types)]
            + [pa.field("text_a", pa.string())])
    j1 = hash_join(pairs, docs_a, on="id_a", num_buckets=num_buckets,
                   schemas=(pairs_schema, sch_a))
    j2 = hash_join(j1, docs_b, on="id_b", num_buckets=num_buckets,
                   schemas=(j1_schema, sch_b))

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                              "id_b": pd.Series([], dtype=object),
                              "jaccard": pd.Series([], dtype="float64")})
        if len(df) == 0:
            return empty
        ha, offa = _batch_shingle_hashes(
            pa.array(df["text_a"].fillna("").tolist(), pa.string()),
            shingle_k, distinct=True)
        hb, offb = _batch_shingle_hashes(
            pa.array(df["text_b"].fillna("").tolist(), pa.string()),
            shingle_k, distinct=True)
        out = []
        ids_a = df["id_a"].tolist()
        ids_b = df["id_b"].tolist()
        for i in range(len(df)):
            j = _pair_jaccard(ha[offa[i]: offa[i + 1]],
                              hb[offb[i]: offb[i + 1]])
            if j >= threshold:
                out.append((ids_a[i], ids_b[i], j))
        return (pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"])
                if out else empty)

    return j2.map_batches(_verify, batch_format="pandas")


def cluster_pairs_distributed(
    pairs: "ray.data.Dataset",
    id_a: str = "id_a",
    id_b: str = "id_b",
    num_buckets: int = 16,
    max_rounds: int = 64,
) -> "ray.data.Dataset":
    """Distributed connected components over near-dup pairs via
    HASH-TO-MIN (Rastogi, Machanavajjhala, Chitnis & Das Sarma,
    ICDE'13 — public algorithm, O(log n) rounds): each node keeps a
    cluster set C(v) (init {v} ∪ neighbors); per round every node sends
    min(C(v)) to all of C(v) and C(v) to min(C(v)); at convergence the
    component's min holds the whole component and every other member
    holds exactly {min}.

    Physical plan per round: ONE bucketed groupby computes per-node mins
    and emits messages (a node never splits across buckets, so the min
    is global), a second bucketed groupby dedups the new state, and a
    tiny partial-sum signature decides convergence — the driver only
    ever holds (row-count, hash-sum) scalars, never a pair. This
    replaces the round-2 driver union-find whose memory was O(verified
    pairs) (the 100 TB failure mode on boilerplate-heavy corpora).

    Returns a Dataset ``(doc_id, root)`` with one row per NON-ROOT
    member (root = min id of its component). Task memory is bounded by
    the largest single component (its min node's C set), which any
    representation of "component → winner" must materialize somewhere.
    """

    def _bucket_of(s: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(s, index=False).to_numpy()
        return (h % np.uint64(num_buckets)).astype(np.int32)

    def _init(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[id_a], df[id_b]
        out = pd.DataFrame({
            "node": pd.concat([a, b, a, b], ignore_index=True),
            "member": pd.concat([b, a, a, b], ignore_index=True),
        }).drop_duplicates()
        out["_bucket"] = _bucket_of(out["node"])
        return out

    def _gen(df: pd.DataFrame) -> pd.DataFrame:
        # entry dedup (messages from several source buckets), then emit
        df = df[["node", "member"]].drop_duplicates()
        mins = df.groupby("node", sort=False)["member"].transform("min")
        out = pd.DataFrame({
            "node": pd.concat([df["member"], mins], ignore_index=True),
            "member": pd.concat([mins, df["member"]], ignore_index=True),
        }).drop_duplicates()
        out["_bucket"] = _bucket_of(out["node"])
        return out

    def _dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["node", "member"])

    def _sig_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (pd.util.hash_pandas_object(df["node"], index=False).to_numpy()
             * _GOLD
             + pd.util.hash_pandas_object(df["member"], index=False).to_numpy())
        with np.errstate(over="ignore"):
            s = np.uint64(h.sum(dtype=np.uint64)) if len(h) else np.uint64(0)
        return pd.DataFrame({"n": [len(df)], "s": [s]})

    def _signature(state: "ray.data.Dataset") -> tuple:
        parts = state.map_batches(_sig_partial, batch_format="pandas").to_pandas()
        if parts.empty:            # zero input pairs: no blocks ever emitted
            return 0, 0
        with np.errstate(over="ignore"):
            s = np.uint64(parts["s"].to_numpy(dtype=np.uint64).sum(dtype=np.uint64))
        return int(parts["n"].sum()), int(s)

    state = (pairs.map_batches(_init, batch_format="pandas")
             .groupby("_bucket").map_groups(_dedup, batch_format="pandas")
             .materialize())
    sig = _signature(state)
    for _ in range(max_rounds):
        state = (state.groupby("_bucket").map_groups(_gen, batch_format="pandas")
                 .groupby("_bucket").map_groups(_dedup, batch_format="pandas")
                 .materialize())
        new_sig = _signature(state)
        if new_sig == sig:
            break
        sig = new_sig
    else:  # pragma: no cover — hash-to-min converges in O(log n) rounds
        raise RuntimeError(f"hash-to-min did not converge in {max_rounds} rounds")

    def _emit(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["node"] != df["member"]]
        a, b = d["node"].to_numpy(), d["member"].to_numpy()
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"doc_id": hi, "root": lo}).drop_duplicates()
        out["_db"] = _bucket_of(out["doc_id"])
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_id", "root"])[["doc_id", "root"]]

    return (state.map_batches(_emit, batch_format="pandas")
            .groupby("_db").map_groups(_final, batch_format="pandas"))


def cluster_pairs(pairs_df: pd.DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> pd.DataFrame:
    """Connected components over verified near-dup pairs → (doc_id, root)
    with root = MIN id of the component (the deterministic winner).

    Union-find with path compression on the DRIVER: the input is the
    VERIFIED pair set, which is O(near-dups) ≪ corpus by construction
    (candidates were banded, capped, and Jaccard-verified upstream) —
    the same bounded-small-side assumption as a broadcast join. For a
    pathological corpus where pairs rival the corpus, switch to
    iterative min-label propagation (log-round joins) instead.
    """
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs_df[id_a], pairs_df[id_b]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "root"])


def neardup_dedup(
    ds: "ray.data.Dataset",
    texts_df: pd.DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    concurrency=(1, 4),
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """End-to-end near-duplicate dedup: banded-LSH candidates →
    distributed exact-Jaccard verify → DISTRIBUTED connected components
    (hash-to-min) → a Dataset with one row per NON-WINNER doc
    ``(doc_id, keep_id)`` (keep_id = min id of its cluster). Filtering a
    corpus = anti-join against the returned doc_ids.

    Scale shape (round 3): no step materializes pairs, texts, or
    components on the driver — the verify joins pairs with their texts
    (``jaccard_verify_joined``) and clustering is log-round hash-to-min
    (``cluster_pairs_distributed``), so a boilerplate-heavy corpus where
    near-dups ≈ corpus still runs with bounded driver memory.

    ``texts_df``: optional pre-materialized (id, text) lookup — when
    given, the broadcast verify (``jaccard_verify_stage``) is used
    instead of the join (cheaper while candidates ≪ corpus).
    """
    cand = minhash_lsh_candidates(ds, num_perm=num_perm, bands=bands,
                                  text_col=text_col, id_col=id_col,
                                  concurrency=concurrency,
                                  num_buckets=num_buckets)
    # materialize: the lazy candidate DAG would otherwise RE-RUN for the
    # verify pass (blocks stay in the object store — never the driver)
    cand = cand.materialize()
    if cand.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                          "keep_id": pd.Series([], dtype=object)}))
    if texts_df is not None:
        verified = jaccard_verify_stage(cand, texts_df, id_col=id_col,
                                        text_col=text_col, threshold=threshold,
                                        concurrency=concurrency)
    else:
        verified = jaccard_verify_joined(cand, ds, id_col=id_col,
                                         text_col=text_col, threshold=threshold,
                                         num_buckets=num_buckets,
                                         pairs_schema=cand.schema())
    verified = verified.materialize()
    if verified.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                          "keep_id": pd.Series([], dtype=object)}))
    comp = cluster_pairs_distributed(verified, num_buckets=num_buckets)
    return comp.map_batches(
        lambda df: df.rename(columns={"root": "keep_id"}),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def batch_simhash64(texts, shingle_k: int = 5) -> np.ndarray:
    """64-bit simhash per row (majority vote over DISTINCT shingle
    hashes), one bit-matrix reduction for the whole batch: unpack all
    shingle hashes to a (total, 64) sign matrix, sum per row with a
    cumsum sliced at row offsets, pack the positive bits."""
    h, off = _batch_shingle_hashes(texts, shingle_k, distinct=True)
    n_rows = len(off) - 1
    if n_rows == 0:
        return np.zeros(0, np.uint64)
    # process ROW blocks so the transient (shingles, 64) sign matrix is
    # bounded (~65 B/shingle at int8) — the unblocked matrix was
    # ~512 B/shingle and OOM'd on long-document batches; a single giant
    # doc can still exceed the cap (one row minimum per block)
    MAX_SHINGLES = 1_000_000
    ar64 = np.arange(64, dtype=np.uint64)
    out = np.zeros(n_rows, np.uint64)
    r0 = 0
    while r0 < n_rows:
        r1 = r0 + 1
        while r1 < n_rows and off[r1 + 1] - off[r0] <= MAX_SHINGLES:
            r1 += 1
        hs = h[off[r0]: off[r1]]
        o = (off[r0: r1 + 1] - off[r0])
        signs = ((hs[:, None] >> ar64[None, :]) & np.uint64(1)).astype(np.int8)
        signs *= 2
        signs -= 1
        votes = np.add.reduceat(signs, o[:-1], axis=0, dtype=np.int64)
        out[r0:r1] = ((votes > 0).astype(np.uint64)
                      << ar64[None, :]).sum(axis=1, dtype=np.uint64)
        r0 = r1
    return out


def simhash64(text: str, shingle_k: int = 5) -> np.uint64:
    """Single-text convenience wrapper around :func:`batch_simhash64`."""
    return batch_simhash64(pa.array([text], pa.string()), shingle_k)[0]


def add_simhash(batch: pa.Table, text_col: str = "text", shingle_k: int = 5) -> pa.Table:
    sh = batch_simhash64(batch[text_col], shingle_k)
    return batch.append_column("simhash", pa.array(sh, type=pa.uint64()))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy<2 has no bitwise_count)."""
    if len(x) == 0:
        return np.zeros(0, np.int64)
    return np.unpackbits(
        np.ascontiguousarray(x)[:, None].view(np.uint8), axis=1
    ).sum(axis=1).astype(np.int64)


def hamming_neardup_candidates(
    ds: "ray.data.Dataset",
    id_col: str,
    hash_col: str,
    hamming_max: int = 3,
    bands: int = 4,
    num_buckets: int = 16,
    cell_cap: int = 256,
) -> "ray.data.Dataset":
    """Banded Hamming near-dup candidate pairs over a PRECOMPUTED
    64-bit hash column (simhash, image dHash, any locality-preserving
    sketch): split each hash into ``bands`` equal bit-bands → rows
    agreeing EXACTLY on any band collide → per-cell pairs
    (chain-capped) → vectorized Hamming verify ≤ ``hamming_max`` →
    bucketed distinct.

    Pigeonhole completeness: a pair within Hamming distance ≤ bands-1
    must agree on at least one band, so recall is EXACTLY 1.0 for
    ``hamming_max ≤ bands - 1`` (default 3 @ 4 bands) — the banded
    shuffle only moves (id, band, value, hash) skinny rows.
    """
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def _sketch(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({id_col: pa.array([], pa.string()),
                             "band_id": pa.array([], pa.int32()),
                             "band_val": pa.array([], pa.uint64()),
                             "simhash": pa.array([], pa.uint64()),
                             "_bucket": pa.array([], pa.int32())})
        sh = batch[hash_col].cast(pa.uint64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        shifts = (np.arange(bands, dtype=np.uint64) * np.uint64(width))
        vals = ((sh[:, None] >> shifts[None, :]) & mask).reshape(-1)
        band_id = np.tile(np.arange(bands, dtype=np.int32), n)
        take = np.repeat(np.arange(n, dtype=np.int64), bands)
        with np.errstate(over="ignore"):
            cell_h = _mix64(vals * _POLY_B + band_id.astype(np.uint64) * _GOLD)
        return pa.table({
            id_col: batch[id_col].cast(pa.string()).take(pa.array(take)),
            "band_id": pa.array(band_id),
            "band_val": pa.array(vals, pa.uint64()),
            "simhash": pa.array(np.repeat(sh, bands), pa.uint64()),
            "_bucket": pa.array((cell_h % np.uint64(num_buckets)).astype(np.int32)),
        })

    def _pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                              "id_b": pd.Series([], dtype=object),
                              "hamming": pd.Series([], dtype=np.int64),
                              "_pb": pd.Series([], dtype=np.int32)})
        dup = df[df.duplicated(["band_id", "band_val"], keep=False)]
        if len(dup) == 0:
            return empty
        a_id, b_id, a_h, b_h = [], [], [], []
        for _, g in dup.groupby(["band_id", "band_val"], sort=False):
            g = g.drop_duplicates(id_col).sort_values(id_col, kind="mergesort")
            ids = g[id_col].tolist()
            hs = g["simhash"].tolist()
            if len(ids) > cell_cap:
                # degenerate cell: connectivity chain (s-1 pairs) bounds
                # the task like the minhash cap; see that docstring for
                # the chain/verify recall interaction
                for i in range(len(ids) - 1):
                    a_id.append(ids[i]); b_id.append(ids[i + 1])
                    a_h.append(hs[i]); b_h.append(hs[i + 1])
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_id.append(ids[i]); b_id.append(ids[j])
                    a_h.append(hs[i]); b_h.append(hs[j])
        ham = _popcount64(np.asarray(a_h, np.uint64) ^ np.asarray(b_h, np.uint64))
        keep = ham <= hamming_max
        out = pd.DataFrame({"id_a": np.asarray(a_id, dtype=object)[keep],
                            "id_b": np.asarray(b_id, dtype=object)[keep],
                            "hamming": ham[keep]}).drop_duplicates(["id_a", "id_b"])
        if not len(out):
            return empty
        h = (pd.util.hash_pandas_object(out["id_a"], index=False).to_numpy()
             * _GOLD
             + pd.util.hash_pandas_object(out["id_b"], index=False).to_numpy())
        out["_pb"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["id_a", "id_b"], sort=False)
                .agg(hamming=("hamming", "min")).reset_index())

    sketched = ds.map_batches(_sketch, batch_format="pyarrow", batch_size=1024)
    pairs = sketched.groupby("_bucket").map_groups(_pairs_bucket,
                                                   batch_format="pandas")
    return pairs.groupby("_pb").map_groups(_distinct, batch_format="pandas")


def simhash_neardup_candidates(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    hamming_max: int = 3,
    bands: int = 4,
    num_buckets: int = 16,
    cell_cap: int = 256,
) -> "ray.data.Dataset":
    """SimHash near-dup candidate pairs: 64-bit simhash per doc, then
    the shared banded-Hamming plan (:func:`hamming_neardup_candidates`
    — same pigeonhole-completeness guarantee, same skinny shuffle)."""

    def _hashes(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col].cast(pa.string()),
            "h64": pa.array(batch_simhash64(batch[text_col], shingle_k),
                            pa.uint64())})

    return hamming_neardup_candidates(
        ds.map_batches(_hashes, batch_format="pyarrow", batch_size=1024),
        id_col, "h64", hamming_max=hamming_max, bands=bands,
        num_buckets=num_buckets, cell_cap=cell_cap)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_candidates(
    ds: "ray.data.Dataset",
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    cosine_threshold: float = 0.95,
    bucket_cap: int = 2048,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Multi-table random-hyperplane LSH → per-bucket cosine verify →
    bucketed distinct on (id_a, id_b).

    Scale hardening vs the round-1 single-table version:

    - ``num_tables`` independent hyperplane tables: a near-pair at
      cosine c survives one table with prob (1 - acos(c)/π)^p; tables
      multiply recall (1-(1-p₁)^T) instead of praying on one draw.
    - bucket-size cap: any LSH cell bigger than ``bucket_cap`` is split
      by EXTRA hyperplanes (deterministic, seeded) before the O(s²)
      verify, so a degenerate cell (all-equal vectors at 100 TB) can
      never produce an unbounded task. Split recall loss only affects
      pairs inside oversized cells and is documented here.
    - the verify's pair set is distinct-ed across tables by a bucketed
      groupby (pairs hash to one bucket) — no driver or single-task
      collapse.

    The plane tensors are broadcast in the closure (tiny, deterministic).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, dim, num_planes)).astype(np.float32)
    extra_planes = rng.standard_normal((dim, 32)).astype(np.float32)  # cap splitting

    def _bucket(batch: pa.Table) -> pa.Table:
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(batch)
        if n == 0:
            return pa.table({id_col: batch[id_col],
                             "lsh_bucket": pa.array([], pa.int64()),
                             vec_col: col})
        mat = _fixed_list_matrix(col, dim, np.float32)
        take_idx = []
        codes = []
        shifts = np.arange(num_planes, dtype=np.uint64)
        for t in range(num_tables):
            signs = (mat @ planes[t]) > 0
            code = (signs.astype(np.uint64) << shifts[None, :]).sum(axis=1)
            codes.append((np.uint64(t) << np.uint64(num_planes)) | code)
            take_idx.append(np.arange(n, dtype=np.int64))
        take = np.concatenate(take_idx)
        code_all = np.concatenate(codes).astype(np.int64)
        t_take = pa.array(take)
        return pa.table({id_col: batch[id_col].take(t_take),
                         "lsh_bucket": pa.array(code_all),
                         vec_col: col.take(t_take)})

    def _pairs_for(mat: np.ndarray, ids: np.ndarray) -> tuple:
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sim = unit @ unit.T
        ii, jj = np.triu_indices(len(ids), k=1)
        mask = sim[ii, jj] >= cosine_threshold
        return ids[ii[mask]], ids[jj[mask]], sim[ii[mask], jj[mask]]

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64),
                              "cosine": pd.Series([], dtype="float64"),
                              "_pb": pd.Series([], dtype=np.int32)})
        if len(df) < 2:
            return empty
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
        ids = df[id_col].to_numpy()
        groups = [(mat, ids)]
        out_a, out_b, out_c = [], [], []
        plane_i = 0
        while groups:
            m, i = groups.pop()
            if len(i) > bucket_cap:
                if plane_i < extra_planes.shape[1]:
                    side = (m @ extra_planes[:, plane_i].astype(np.float64)) > 0
                    plane_i += 1
                    groups.append((m[side], i[side]))
                    groups.append((m[~side], i[~side]))
                    continue
                # degenerate cell no hyperplane can split (near-identical
                # vectors): bounded chunked verify. Cross-chunk pairs are
                # lost, but identical content is exact-dedup's job — this
                # trades bounded recall loss for a bounded task.
                for s in range(0, len(i), bucket_cap):
                    groups.append((m[s : s + bucket_cap], i[s : s + bucket_cap]))
                continue
            if len(i) >= 2:
                a, b, c = _pairs_for(m, i)
                out_a.append(a); out_b.append(b); out_c.append(c)
        if not out_a:
            return empty
        ida = np.concatenate(out_a); idb = np.concatenate(out_b)
        lo, hi = np.minimum(ida, idb), np.maximum(ida, idb)
        out = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": np.concatenate(out_c)})
        h = (lo.astype(np.uint64) * _GOLD + hi.astype(np.uint64))
        out["_pb"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], sort=False).agg(
            cosine=("cosine", "max")).reset_index()
        return g

    return (
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lsh_bucket")
        .map_groups(_verify, batch_format="pandas")
        .groupby("_pb")
        .map_groups(_distinct, batch_format="pandas")
    )


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    n: int = 3,
    threshold: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    max_df: int | None = None,
    metric: str = "jaccard",
) -> "ray.data.Dataset":
    """EXACT word-n-gram Jaccard near-dup pairs via an inverted-index
    join — the oracle-checkable exact baseline to the subquadratic
    MinHash-LSH path (``minhash_lsh_candidates``).

    J(A,B) = |A∩B| / (|A|+|B|-|A∩B|) over each doc's DISTINCT word
    n-grams.  Tokenization is ``text.split(' ')`` == DuckDB
    ``string_split(text, ' ')`` (empties kept) so the result is
    bit-exact against the SQL self-join oracle.

    Plan (three stages, two skinny shuffles):
      1. stateless map: explode tokens, form n-grams VECTORIZED on the
         exploded frame (aligned shift-concat, masked at doc
         boundaries — a doc is one input row so its grams never cross
         a batch), distinct per doc, attach the doc's distinct-gram
         count ``ng``; bucket postings by gram hash.
      2. per gram-bucket: drop df=1 grams (no pairs), sort by (gram,
         id), emit each colliding cell's s(s-1)/2 ordered pairs with a
         closed-form vectorized enumeration (no Python loop), then
         PRE-AGGREGATE partial intersection counts per (id_a, id_b)
         inside the task; re-bucket by pair hash.
      3. per pair-bucket: sum partials, J = inter/(na+nb-inter),
         filter >= threshold.

    Scale: the only wide ops move (gram-hash, id, ng) postings and
    (id_a, id_b, partial) triples.  The inherent cost is the quadratic
    blowup of a high-df gram; ``max_df`` drops grams appearing in more
    than ``max_df`` docs within a bucket-cell (standard df-capping —
    CHANGES semantics, so the oracle query leaves it None; set it on
    web-scale boilerplate corpora, or use the MinHash path).

    Reference has no dedup (brief-mandated training-data operator);
    windowing/tokenization semantics shared with
    ``stages/text.py:term_df_topk``.
    """
    def _postings(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "gram_h": pd.Series([], dtype=np.uint64),
            "ng": pd.Series([], dtype=np.int64),
            "_bucket": pd.Series([], dtype=np.int32)})
        if df.empty:
            return empty
        s = pd.DataFrame({
            id_col: df[id_col].astype(np.int64),
            "term": df[text_col].fillna("").str.split(" "),
        })
        e = s.explode("term", ignore_index=True)
        del s
        doc = e[id_col].to_numpy()
        term = e["term"].astype(str)
        m = len(term) - (n - 1)
        if m <= 0:
            return empty
        # aligned shift-concat: gram i = term[i] .. term[i+n-1]
        parts = [term.iloc[i:m + i].reset_index(drop=True) for i in range(n)]
        gram = parts[0].str.cat(parts[1:], sep=" ")
        valid = doc[:m] == doc[n - 1:]
        g = pd.DataFrame({id_col: doc[:m][valid], "gram": gram[valid]})
        g = g.drop_duplicates()
        cnt = g.groupby(id_col, sort=False)[id_col].transform("size")
        # shuffle a 64-bit gram FINGERPRINT, not the gram string: the
        # posting sort/exchange is the dominant cost and int keys are
        # ~5x cheaper to sort and ship.  A fingerprint collision would
        # merge two distinct grams (P ≈ m²/2⁶⁵ ≈ 1e-7 even at 2M
        # distinct grams per corpus) — standard content-defined
        # fingerprinting, same trade the winnowing fingerprints make.
        h = pd.util.hash_pandas_object(g["gram"], index=False).to_numpy()
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "gram_h": h,
            "ng": cnt.to_numpy().astype(np.int64),
            "_bucket": (h % np.uint64(num_buckets)).astype(np.int32)})
        return out

    _pair_empty = pd.DataFrame({
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
        "inter": pd.Series([], dtype=np.int64),
        "na": pd.Series([], dtype=np.int64),
        "nb": pd.Series([], dtype=np.int64),
        "_pb": pd.Series([], dtype=np.int32)})

    def _pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dup = df[df.duplicated("gram_h", keep=False)]
        if max_df is not None and len(dup):
            sizes = dup.groupby("gram_h", sort=False)["gram_h"].transform("size")
            dup = dup[sizes <= max_df]
        if not len(dup):
            return _pair_empty
        dup = dup.sort_values(["gram_h", id_col], kind="mergesort")
        ids = dup[id_col].to_numpy()
        ngs = dup["ng"].to_numpy()
        grams = dup["gram_h"].to_numpy()
        first = np.empty(len(dup), bool)
        first[0] = True
        first[1:] = grams[1:] != grams[:-1]
        # closed-form all-pairs within each sorted cell: element at
        # local index j pairs with the j elements before it
        loc = np.arange(len(dup)) - np.maximum.accumulate(
            np.where(first, np.arange(len(dup)), 0))
        total = int(loc.sum())
        if total == 0:
            return _pair_empty
        b_idx = np.repeat(np.arange(len(dup)), loc)
        off = np.concatenate(([0], np.cumsum(loc)))
        a_idx = b_idx - loc[b_idx] + (np.arange(total) - np.repeat(off[:-1], loc))
        out = pd.DataFrame({
            "id_a": ids[a_idx], "id_b": ids[b_idx],
            "na": ngs[a_idx], "nb": ngs[b_idx]})
        agg = out.groupby(["id_a", "id_b"], sort=False).agg(
            inter=("na", "size"), na=("na", "first"),
            nb=("nb", "first")).reset_index()
        agg["inter"] = agg["inter"].astype(np.int64)
        h = (agg["id_a"].to_numpy().astype(np.uint64) * _GOLD
             + agg["id_b"].to_numpy().astype(np.uint64))
        agg["_pb"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return agg[["id_a", "id_b", "inter", "na", "nb", "_pb"]]

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["id_a", "id_b"], sort=False).agg(
            inter=("inter", "sum"), na=("na", "first"),
            nb=("nb", "first")).reset_index()
        if metric == "containment":
            # asymmetric doc-in-doc score: |A∩B| / min(|A|, |B|) — a
            # short doc fully quoted inside a long one scores 1.0 while
            # its Jaccard stays tiny (the boilerplate/quotation case
            # symmetric Jaccard misses)
            nmin = np.minimum(g["na"].to_numpy(),
                              g["nb"].to_numpy()).astype(np.int64)
            c = g["inter"].to_numpy() / nmin
            keep = c >= threshold
            return pd.DataFrame({
                "id_a": g["id_a"].to_numpy()[keep],
                "id_b": g["id_b"].to_numpy()[keep],
                "inter": g["inter"].to_numpy().astype(np.int64)[keep],
                "nmin": nmin[keep],
                "containment": c[keep]})
        uni = (g["na"] + g["nb"] - g["inter"]).astype(np.int64)
        j = g["inter"].to_numpy() / uni.to_numpy()
        keep = j >= threshold
        return pd.DataFrame({
            "id_a": g["id_a"].to_numpy()[keep],
            "id_b": g["id_b"].to_numpy()[keep],
            "inter": g["inter"].to_numpy().astype(np.int64)[keep],
            "uni": uni.to_numpy()[keep],
            "jaccard": j[keep]})

    return (ds.map_batches(_postings, batch_format="pandas")
            .groupby("_bucket").map_groups(_pairs_bucket, batch_format="pandas")
            .groupby("_pb").map_groups(_final, batch_format="pandas"))


def distinct_values(
    ds: "ray.data.Dataset", cols, num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Exact DISTINCT over ``cols`` — per-batch dedup partials bucketed
    by row hash (duplicates of a tuple always share a bucket, so the
    per-bucket dedup is globally exact); the shuffle moves only each
    batch's already-deduped skinny rows.  The building block for SQL
    set ops: EXCEPT = distinct + anti ``hash_join``, INTERSECT =
    distinct + semi."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[cols].drop_duplicates()
        h = np.zeros(len(d), dtype=np.uint64)
        for c in cols:
            h = h * np.uint64(0x100000001B3) + pd.util.hash_pandas_object(
                d[c], index=False).to_numpy()
        return d.assign(_bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].drop_duplicates()

    return (ds.map_batches(_partial, batch_format="pandas")
            .groupby("_bucket").map_groups(_final, batch_format="pandas"))


# ---------------------------------------------------------------------------
# edit-distance-1 similarity self-join (FastSS deletion neighborhoods)
# ---------------------------------------------------------------------------

def _lev_le1(u: str, v: str) -> bool:
    """Exact edit-distance <= 1 for two strings (O(len) single scan —
    no DP table needed at this radius)."""
    lu, lv = len(u), len(v)
    if abs(lu - lv) > 1:
        return False
    if lu == lv:
        return sum(a != b for a, b in zip(u, v)) <= 1
    if lu > lv:
        u, v, lu, lv = v, u, lv, lu
    # v is u plus one inserted char: skip the first mismatch in v
    i = 0
    while i < lu and u[i] == v[i]:
        i += 1
    return u[i:] == v[i + 1:]


def edit1_pairs(
    ds: "ray.data.Dataset",
    key_col: str = "id",
    text_col: str = "name",
    num_buckets: int = 16,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """All DISTINCT pairs ``(ka, kb)`` with ``ka < kb`` whose strings
    are at edit distance <= 1 — the entity-resolution / typo-dedup
    primitive, as a FastSS deletion-neighborhood join (Bocek et al.,
    "Fast Similarity Search in Large Dictionaries", 2007).

    ``lev(u, v) <= 1  <=>  ({u} ∪ del1(u)) ∩ ({v} ∪ del1(v)) != ∅``,
    so each row emits its string plus every single-deletion variant
    (len+1 postings), variants hash-bucket (a variant's postings are
    confined to one bucket), each bucket emits its candidate pairs and
    VERIFIES the exact distance before emitting, and one bucketed
    distinct collapses pairs found via several shared variants.

    Scale: postings are O(rows x len); candidate volume is bounded by
    variant-group sizes (real dictionaries: small), never all-pairs —
    the SQL oracle's nested-loop ``levenshtein`` join is quadratic,
    this is not.  Verification cost per candidate is O(len).
    """

    def _postings(batch: pa.Table) -> pd.DataFrame:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        names = batch[text_col].to_pylist()
        out_v, out_k, out_n = [], [], []
        for k, s in zip(keys, names):
            if s is None:
                continue
            out_v.append(s)
            out_k.append(k)
            out_n.append(s)
            for i in range(len(s)):
                out_v.append(s[:i] + s[i + 1:])
                out_k.append(k)
                out_n.append(s)
        d = pd.DataFrame({"variant": out_v, "k": out_k, "name": out_n})
        d = d.drop_duplicates(["variant", "k"])
        h = pd.util.hash_pandas_object(d["variant"],
                                       index=False).to_numpy()
        d["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return d

    def _candidates(df: pd.DataFrame) -> pd.DataFrame:
        # Fully vectorized: sort postings by (variant, k), find group
        # runs, generate within-group pairs per SIZE CLASS (groups of
        # equal size c stack into an (m, c) index matrix, one
        # triu_indices fan-out per distinct c — no per-group Python),
        # then verify all equal-length candidates with ONE padded
        # codepoint-matrix Hamming compare; only length±1 candidates
        # (rare) fall back to the scalar check.
        empty = pd.DataFrame({"ka": pd.Series([], dtype=np.int64),
                              "kb": pd.Series([], dtype=np.int64)})
        if df.empty or "variant" not in df.columns:
            return empty
        d = (df[["variant", "k", "name"]]
             .sort_values(["variant", "k"], kind="mergesort")
             .drop_duplicates(["variant", "k"]))
        v = d["variant"].to_numpy()
        if len(d) < 2:
            return empty
        ks = d["k"].to_numpy(np.int64)
        change = np.concatenate(([True], v[1:] != v[:-1]))
        starts = np.flatnonzero(change)
        counts = np.diff(np.concatenate([starts, [len(v)]]))

        # unique-name codepoint matrix (padded with -1) for the
        # vectorized verifier
        names, name_idx = np.unique(d["name"].to_numpy(),
                                    return_inverse=True)
        nlen = np.array([len(s) for s in names], dtype=np.int64)
        width = int(nlen.max()) if len(nlen) else 0
        mat = np.full((len(names), width), -1, dtype=np.int64)
        for i, s in enumerate(names):       # O(unique names), not pairs
            mat[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)

        ia_all, ib_all = [], []
        for c in np.unique(counts):
            if c < 2:
                continue
            s_c = starts[counts == c]
            members = s_c[:, None] + np.arange(c)[None, :]   # (m, c)
            ii, jj = np.triu_indices(int(c), k=1)
            ia_all.append(members[:, ii].ravel())
            ib_all.append(members[:, jj].ravel())
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        na, nb = name_idx[ia], name_idx[ib]
        keep = np.zeros(len(ia), dtype=bool)
        same_len = nlen[na] == nlen[nb]
        if same_len.any():
            sa, sb = na[same_len], nb[same_len]
            ham = (mat[sa] != mat[sb]).sum(axis=1)
            keep[same_len] = ham <= 1
        off = ~same_len & (np.abs(nlen[na] - nlen[nb]) == 1)
        for t in np.flatnonzero(off):
            keep[t] = _lev_le1(names[na[t]], names[nb[t]])
        ka, kb = ks[ia[keep]], ks[ib[keep]]
        lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
        return (pd.DataFrame({"ka": lo, "kb": hi})
                .drop_duplicates())

    cand = (ds.map_batches(_postings, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(_candidates, batch_format="pandas"))
    if not distinct:
        # a pair found via several shared variants appears once per
        # bucket it was found in — callers folding their own
        # downstream distinct (e.g. the degree query) skip one shuffle
        return cand

    def _tag_pair(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "ka" not in df.columns:
            return pd.DataFrame({"ka": pd.Series([], dtype=np.int64),
                                 "kb": pd.Series([], dtype=np.int64),
                                 "_bucket": pd.Series([], dtype=np.int32)})
        d = df.drop_duplicates()
        h = pd.util.hash_pandas_object(
            d["ka"] * np.int64(1 << 31) + d["kb"],
            index=False).to_numpy()
        d = d.assign(_bucket=(h % np.uint64(num_buckets)).astype(np.int32))
        return d

    def _distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "ka" not in df.columns:
            return pd.DataFrame({"ka": pd.Series([], dtype=np.int64),
                                 "kb": pd.Series([], dtype=np.int64)})
        return df[["ka", "kb"]].drop_duplicates()

    return (cand.map_batches(_tag_pair, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(_distinct_pairs, batch_format="pandas"))


def ppjoin_gram_pairs(
    ds: "ray.data.Dataset",
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """PPJoin-style PREFIX-FILTERED exact set-similarity self-join
    over distinct word-n-gram sets (Xiao et al., WWW'08; the
    MapReduce adaptation follows Vernica et al., SIGMOD'10): returns
    exactly the pairs with Jaccard ≥ ``threshold`` — the same result
    (and the same quadratic SQL oracle) as ``ngram_jaccard_pairs`` at
    that threshold, via a subquadratic candidate path:

    1. gram postings (per-doc distinct, hashed) + a distributed df
       count; postings meet their gram's df in the gram-bucketed
       shuffle — no global rank map is ever built: (df, gram_h) IS
       the total order PPJoin needs, shipped alongside each posting.
    2. doc-bucketed stage sorts each doc's grams by (df, gram_h)
       ascending (rarest first) and keeps only the PREFIX — the first
       ``|d| − ⌈τ·|d|⌉ + 1`` grams.  Lossless: two sets with
       J ≥ τ overlap in ≥ ⌈τ·|d|⌉ elements, so a disjoint-prefix
       pair can't qualify (the oracle equality re-proves it on data).
    3. prefix postings collide in a gram-bucketed shuffle → candidate
       pairs (deduped, skinny).
    4. fully-distributed verify: candidates hash-join their two texts
       (never via the driver), each pair recomputes both distinct
       gram sets and the exact intersection — bit-identical
       inter/uni/jaccard to the full posting join.

    Pruning power scales with df skew (web boilerplate: prefixes are
    the RARE grams, so hot grams never generate pairs); the full
    posting join stays the exact baseline.
    """
    from .joins import hash_join, partial_agg

    def _postings(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "gram_h": pd.Series([], dtype=np.uint64),
            "ng": pd.Series([], dtype=np.int64),
            "_bucket": pd.Series([], dtype=np.int32)})
        if df.empty:
            return empty
        s = pd.DataFrame({
            id_col: df[id_col].astype(np.int64),
            "term": df[text_col].fillna("").str.split(" ")})
        e = s.explode("term", ignore_index=True)
        doc = e[id_col].to_numpy()
        term = e["term"].astype(str)
        m = len(term) - (n - 1)
        if m <= 0:
            return empty
        parts = [term.iloc[i:m + i].reset_index(drop=True)
                 for i in range(n)]
        gram = parts[0].str.cat(parts[1:], sep=" ")
        valid = doc[:m] == doc[n - 1:]
        g = pd.DataFrame({id_col: doc[:m][valid],
                          "gram": gram[valid]}).drop_duplicates()
        cnt = g.groupby(id_col, sort=False)[id_col].transform("size")
        h = pd.util.hash_pandas_object(g["gram"], index=False).to_numpy()
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "gram_h": h,
            "ng": cnt.to_numpy().astype(np.int64),
            "_bucket": (h % np.uint64(num_buckets)).astype(np.int32)})

    post = ds.map_batches(_postings, batch_format="pandas")

    # distributed df per gram; met in the SAME gram-keyed bucketing
    def _with_df(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "gram_h": pd.Series([], dtype=np.uint64),
            "ng": pd.Series([], dtype=np.int64),
            "df": pd.Series([], dtype=np.int64),
            "_db": pd.Series([], dtype=np.int32)})
        if df.empty or "gram_h" not in df.columns:
            return empty
        cnt = df.groupby("gram_h", sort=False)["gram_h"].transform(
            "size")
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "gram_h": df["gram_h"].to_numpy(),
            "ng": df["ng"].to_numpy(),
            "df": cnt.to_numpy().astype(np.int64)})
        out["_db"] = (out[id_col].to_numpy(np.int64).astype(np.uint64)
                      % np.uint64(num_buckets)).astype(np.int32)
        return out

    with_df = post.groupby("_bucket").map_groups(
        _with_df, batch_format="pandas")

    def _prefix(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "gram_h": pd.Series([], dtype=np.uint64),
            id_col: pd.Series([], dtype=np.int64),
            "_gb": pd.Series([], dtype=np.int32)})
        if df.empty or "gram_h" not in df.columns:
            return empty
        df = df.sort_values([id_col, "df", "gram_h"], kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        ng = df["ng"].to_numpy(np.int64)
        first = np.concatenate(([True], ids[1:] != ids[:-1]))
        pos = np.arange(len(ids)) - np.maximum.accumulate(
            np.where(first, np.arange(len(ids)), 0))
        # prefix length |d| - ceil(tau*|d|) + 1
        need = (ng * np.int64(round(threshold * 1_000_000))
                + 999_999) // 1_000_000          # ceil(tau*ng), exact
        keep = pos < (ng - need + 1)
        gh = df["gram_h"].to_numpy()[keep]
        out = pd.DataFrame({"gram_h": gh, id_col: ids[keep]})
        out["_gb"] = (gh % np.uint64(num_buckets)).astype(np.int32)
        return out

    prefixes = with_df.groupby("_db").map_groups(
        _prefix, batch_format="pandas")

    _pair_empty = pd.DataFrame({
        "id_a": pd.Series([], dtype=object),
        "id_b": pd.Series([], dtype=object),
        "_pb": pd.Series([], dtype=np.int32)})

    def _cands(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "gram_h" not in df.columns:
            return _pair_empty
        dup = df[df.duplicated("gram_h", keep=False)]
        if not len(dup):
            return _pair_empty
        dup = dup.sort_values(["gram_h", id_col], kind="mergesort")
        ids = dup[id_col].to_numpy(np.int64)
        grams = dup["gram_h"].to_numpy()
        first = np.concatenate(([True], grams[1:] != grams[:-1]))
        loc = np.arange(len(dup)) - np.maximum.accumulate(
            np.where(first, np.arange(len(dup)), 0))
        total = int(loc.sum())
        if total == 0:
            return _pair_empty
        bi = np.repeat(np.arange(len(dup)), loc)
        off = np.concatenate(([0], np.cumsum(loc)))
        ai = bi - loc[bi] + (np.arange(total) - np.repeat(off[:-1],
                                                          loc))
        out = pd.DataFrame({"id_a": ids[ai],
                            "id_b": ids[bi]}).drop_duplicates()
        h = (out["id_a"].to_numpy().astype(np.uint64) * _GOLD
             + out["id_b"].to_numpy().astype(np.uint64))
        out = out.astype({"id_a": str, "id_b": str})
        out["_pb"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    cands = (prefixes.groupby("_gb")
             .map_groups(_cands, batch_format="pandas")
             .groupby("_pb").map_groups(
                 lambda df: (df.drop_duplicates(["id_a", "id_b"])
                             if len(df) and "id_a" in df.columns
                             else _pair_empty),
                 batch_format="pandas")
             .map_batches(lambda df: (df[["id_a", "id_b"]]
                                      if len(df) else
                                      _pair_empty[["id_a", "id_b"]]),
                          batch_format="pandas"))

    # fully-distributed verify: join texts, recompute exact gram sets
    pairs_schema = pa.schema([("id_a", pa.string()),
                              ("id_b", pa.string())])

    def _side(col_id: str, col_text: str):
        def _fn(batch: pa.Table) -> pa.Table:
            return pa.table({col_id: batch[id_col].cast(pa.string()),
                             col_text: batch[text_col]})
        return _fn

    docs_a = ds.map_batches(_side("id_a", "text_a"),
                            batch_format="pyarrow")
    docs_b = ds.map_batches(_side("id_b", "text_b"),
                            batch_format="pyarrow")
    sch_a = pa.schema([("id_a", pa.string()), ("text_a", pa.string())])
    sch_b = pa.schema([("id_b", pa.string()), ("text_b", pa.string())])
    j1 = hash_join(cands, docs_a, on="id_a", num_buckets=num_buckets,
                   schemas=(pairs_schema, sch_a))
    j1_schema = pa.schema([("id_a", pa.string()),
                           ("id_b", pa.string()),
                           ("text_a", pa.string())])
    j2 = hash_join(j1, docs_b, on="id_b", num_buckets=num_buckets,
                   schemas=(j1_schema, sch_b))

    def _gramset(text: str) -> np.ndarray:
        toks = text.split(" ")
        if len(toks) < n:
            return np.empty(0, dtype=object)
        return np.unique(np.array(
            [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)],
            dtype=object))

    def _verify(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "inter": pd.Series([], dtype=np.int64),
            "uni": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64)})
        if df.empty or "text_a" not in df.columns:
            return empty
        rows = []
        for r in df.itertuples():
            sa, sb = _gramset(r.text_a), _gramset(r.text_b)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            uni = len(sa) + len(sb) - inter
            if uni and inter / uni >= threshold:
                rows.append((int(r.id_a), int(r.id_b), inter, uni,
                             inter / uni))
        if not rows:
            return empty
        out = pd.DataFrame(rows, columns=["id_a", "id_b", "inter",
                                          "uni", "jaccard"])
        return out.astype({"id_a": np.int64, "id_b": np.int64,
                           "inter": np.int64, "uni": np.int64})

    return j2.map_batches(_verify, batch_format="pandas")
