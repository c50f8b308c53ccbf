"""Corpus-curation operators — the LLM-training-data counterpart of the
reference's per-clip filtering/skip logic (``utils/utils.py``
form_list_from_user_input + skip-if-exists), generalized to the
document corpus: repetition quality stats (Gopher-style), benchmark
decontamination (GPT-3 appendix-C shape), incremental dedup against an
existing corpus (Bloom prefilter + exact verify), token-budget
selection (global ordered prefix-sum), deterministic mixture sampling,
and SemDeDup-style semantic dedup over embeddings.

Every SQL-checked operator here is bit-exact vs its DuckDB oracle:
word splits are ``text.split(' ')`` (= ``string_split(text, ' ')``,
empties kept), n-grams are space-joined word tuples, counts are exact
int64, and every ratio is ONE IEEE division of those exact integers.

Vectorization: word n-grams are counted on per-batch DICTIONARY CODES
(pyarrow ``dictionary_encode`` → exact integer word ids; adjacent-code
tuples are re-factorized pairwise with ``np.unique`` so ids never
overflow), not on strings — no per-row Python in any hot kernel.
String grams are materialized ONLY for batch-distinct representatives
(contamination membership), never per occurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


# --------------------------------------------------------------------------
# word/ngram codes — the shared exact kernel
# --------------------------------------------------------------------------

def _word_table(batch: pa.Table, text_col: str):
    """split(' ') over the whole batch → (words: StringArray of the
    flattened word stream, offsets: int64 row offsets into it)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.coalesce(col, pa.scalar("", pa.string()))
    lists = pc.split_pattern(col, pattern=" ")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    words = lists.values
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return words, offsets


def _word_codes(words: pa.StringArray) -> np.ndarray:
    """Exact per-batch integer word ids (dictionary codes). Two words
    share a code iff they are the same string — no hashing, no
    collisions, so downstream n-gram counts match SQL string grouping
    bit-for-bit."""
    if len(words) == 0:
        return np.zeros(0, np.int64)
    d = words.dictionary_encode()
    return d.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def _combine_exact(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Collision-free combine of two nonneg int id arrays into compact
    ids (< number of distinct pairs). Uses the fast multiplicative key
    when it provably fits int64, else a structured-dtype unique."""
    if len(a) == 0:
        return a
    amax = int(a.max()) + 1
    bmax = int(b.max()) + 1
    if amax * bmax < (1 << 62):  # exact: both bounded, product checked
        key = a * np.int64(bmax) + b
        _, inv = np.unique(key, return_inverse=True)
        return inv.astype(np.int64)
    pair = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
    pair["a"] = a
    pair["b"] = b
    _, inv = np.unique(pair, return_inverse=True)
    return inv.astype(np.int64)


def _ngram_codes(codes: np.ndarray, offsets: np.ndarray, n: int):
    """All within-row word-``n``-grams of the batch.

    Returns ``(gram_ids, row_of_gram, start_idx)`` where ``gram_ids``
    are compact exact ids (two grams equal iff their word tuples are
    equal), ``row_of_gram`` the owning row, ``start_idx`` the flat word
    index of each gram's first word (for reconstructing the string).
    """
    n_rows = len(offsets) - 1
    row_of_word = np.repeat(np.arange(n_rows, dtype=np.int64),
                            np.diff(offsets))
    total = len(codes)
    if total < n:
        z = np.zeros(0, np.int64)
        return z, z, z
    m = total - n + 1
    valid = row_of_word[: m] == row_of_word[n - 1:]
    start = np.flatnonzero(valid)
    cur = codes[start]
    for k in range(1, n):
        cur = _combine_exact(cur, codes[start + k])
    return cur, row_of_word[start], start


# --------------------------------------------------------------------------
# 1. Gopher-style repetition stats
# --------------------------------------------------------------------------

def ngram_repetition(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-document repetition quality stats (the Gopher repetition
    family, Rae et al. 2021 §A1.1, restated over space-split words so a
    SQL oracle can check it exactly):

    - ``top2_frac``  = occurrences of the most frequent word-2-gram /
      total 2-gram occurrences (``MAX(c)/SUM(c)``);
    - ``dup3_frac``  = fraction of 3-gram occurrences that are repeats
      (``(n3 - distinct3) / n3``).

    Documents too short for a gram get exact zeros. Stateless map —
    a doc's stats never leave its batch, so this streams at any scale.
    """

    def _stats(batch: pa.Table) -> pa.Table:
        words, offsets = _word_table(batch, text_col)
        codes = _word_codes(words)
        n_rows = len(offsets) - 1

        def per_row(n: int):
            gid, row, _ = _ngram_codes(codes, offsets, n)
            tot = np.bincount(row, minlength=n_rows).astype(np.int64)
            if len(gid) == 0:
                z = np.zeros(n_rows, np.int64)
                return tot, z, z
            key = _combine_exact(row, gid)
            # first-occurrence indices are aligned with the sorted
            # unique keys, hence with cnt — row[first] is the owning
            # row of each distinct (row, gram) pair in cnt order
            _, first, cnt = np.unique(key, return_index=True,
                                      return_counts=True)
            urow = row[first]
            distinct = np.bincount(urow, minlength=n_rows).astype(np.int64)
            mx = np.zeros(n_rows, np.int64)
            np.maximum.at(mx, urow, cnt)
            return tot, distinct, mx

        n2, _, top2 = per_row(2)
        n3, d3, _ = per_row(3)
        dup3 = n3 - d3
        return pa.table({
            id_col: batch[id_col],
            "n2": pa.array(n2),
            "top2": pa.array(top2),
            "top2_frac": pa.array(
                np.where(n2 > 0, top2 / np.maximum(n2, 1), 0.0)),
            "n3": pa.array(n3),
            "dup3": pa.array(dup3),
            "dup3_frac": pa.array(
                np.where(n3 > 0, dup3 / np.maximum(n3, 1), 0.0)),
        })

    return ds.map_batches(_stats, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# 2. benchmark decontamination
# --------------------------------------------------------------------------

def collect_benchmark_ngrams(
    bench: "ray.data.Dataset", n: int = 3, text_col: str = "text",
) -> frozenset:
    """DISTINCT word-``n``-gram strings of the benchmark corpus,
    collected to the driver.

    The benchmark in a decontamination run is the EVAL set — small by
    construction (GPT-3 decontaminated 300B training tokens against
    benchmarks of ~10^5 grams). Per-batch distinct first, then a driver
    set-union of the skinny gram strings; the training corpus itself
    never materializes anywhere.
    """

    def _distinct(batch: pa.Table) -> pa.Table:
        words, offsets = _word_table(batch, text_col)
        codes = _word_codes(words)
        gid, _, start = _ngram_codes(codes, offsets, n)
        if len(gid) == 0:
            return pa.table({"gram": pa.array([], pa.string())})
        _, first = np.unique(gid, return_index=True)
        rep = start[first]
        parts = [words.take(pa.array(rep + k)) for k in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        return pa.table({"gram": grams})

    parts = bench.map_batches(_distinct, batch_format="pyarrow").to_pandas()
    return frozenset(parts["gram"])


def contamination_check(
    ds: "ray.data.Dataset",
    bench_grams: frozenset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    flag_num: int = 1,
    flag_den: int = 5,
) -> "ray.data.Dataset":
    """Per-document benchmark-overlap score: of the document's DISTINCT
    word-``n``-grams, how many appear in the benchmark set.

    ``contam_frac = n_hit / n_grams`` (one IEEE division of exact
    ints); ``contaminated = 1`` iff ``n_hit * flag_den >= n_grams *
    flag_num`` (exact integer comparison — no float threshold
    ambiguity; default flags docs with ≥ 1/5 of grams contaminated).
    Docs with no gram (fewer than ``n`` words) are dropped, matching
    the SQL grams CTE.

    The benchmark set is broadcast once per actor via ``ray.put``;
    membership tests run on BATCH-DISTINCT gram strings only (a
    hash-based ``pd.Index.isin``), then fan back out to (row, gram)
    pairs by code — the contaminated-membership cost is O(distinct
    grams per batch), not O(gram occurrences).
    """
    bench_ref = ray.put(bench_grams)

    class _Score:
        def __init__(self):
            self.bench = pd.Index(ray.get(bench_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            words, offsets = _word_table(batch, text_col)
            codes = _word_codes(words)
            n_rows = len(offsets) - 1
            gid, row, start = _ngram_codes(codes, offsets, n)
            empty = pa.table({
                id_col: batch[id_col].slice(0, 0),
                "n_grams": pa.array([], pa.int64()),
                "n_hit": pa.array([], pa.int64()),
                "contam_frac": pa.array([], pa.float64()),
                "contaminated": pa.array([], pa.int64()),
            })
            if len(gid) == 0:
                return empty
            # distinct grams of the batch: representative string each
            ug, first = np.unique(gid, return_index=True)
            rep = start[first]
            parts = [words.take(pa.array(rep + k)) for k in range(n)]
            gstr = pc.binary_join_element_wise(*parts, " ").to_pandas()
            hit_of_gram = np.zeros(int(ug.max()) + 1, bool)
            hit_of_gram[ug] = gstr.isin(self.bench).to_numpy()
            # distinct per (row, gram)
            key = _combine_exact(row, gid)
            _, kfirst = np.unique(key, return_index=True)
            kfirst = np.sort(kfirst)
            urow = row[kfirst]
            ugram = gid[kfirst]
            nd = np.bincount(urow, minlength=n_rows).astype(np.int64)
            nh = np.bincount(urow[hit_of_gram[ugram]],
                             minlength=n_rows).astype(np.int64)
            keep = nd > 0
            nd_k, nh_k = nd[keep], nh[keep]
            flag = (nh_k * np.int64(flag_den)
                    >= nd_k * np.int64(flag_num)).astype(np.int64)
            return pa.table({
                id_col: batch[id_col].filter(pa.array(keep)),
                "n_grams": pa.array(nd_k),
                "n_hit": pa.array(nh_k),
                "contam_frac": pa.array(nh_k / nd_k),
                "contaminated": pa.array(flag),
            })

    return ds.map_batches(_Score, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8), num_cpus=0.25)


# --------------------------------------------------------------------------
# 3. incremental dedup: new docs vs an existing corpus
# --------------------------------------------------------------------------

def bloom_new_docs(
    new_ds: "ray.data.Dataset",
    corpus_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 16,
    n_bits: int = 1 << 23,
    schemas=None,
) -> "ray.data.Dataset":
    """EXACT anti-join of ``new_ds`` against ``corpus_ds`` on
    ``text_col`` ("which new documents are not already in the corpus"),
    with a Bloom prefilter so rows that are definitely new NEVER enter
    the shuffle.

    Plan: build a mergeable Bloom filter over the corpus texts
    (distributed bitmap-OR, one ~1 MB partial per batch), broadcast it,
    split the new side per batch into (a) Bloom-miss rows — provably
    absent, emitted directly with zero shuffle — and (b) Bloom-hit
    candidates, which go through one exact bucketed ANTI hash-join to
    reject false positives. At a realistic overlap rate the shuffle
    carries only ``fp_rate + true_dup`` of the new corpus instead of
    all of it. Output is bit-exact anti-join semantics regardless of
    the filter's false-positive rate (no false negatives ever).
    """
    from ..functions.sketches import BloomFilter, build_bloom, _hash_values

    bloom = build_bloom(corpus_ds, text_col, n_bits=n_bits)
    ref = ray.put((bloom.words, bloom.n_bits, bloom.k))

    class _Split:
        def __init__(self, want_hit: bool):
            words, nb, k = ray.get(ref)
            self.bf = BloomFilter(nb, k)
            self.bf.words = words
            self.want_hit = want_hit

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return batch
            h, valid = _hash_values(batch[text_col], with_valid=True)
            hit = self.bf.contains_hashes(h) & valid
            keep = hit if self.want_hit else ~hit
            return batch.filter(pa.array(keep))

    misses = new_ds.map_batches(
        _Split, fn_constructor_args=(False,), batch_format="pyarrow",
        zero_copy_batch=True, concurrency=(1, 8), num_cpus=0.25)
    candidates = new_ds.map_batches(
        _Split, fn_constructor_args=(True,), batch_format="pyarrow",
        zero_copy_batch=True, concurrency=(1, 8), num_cpus=0.25)

    from .joins import hash_join

    corpus_texts = corpus_ds.map_batches(
        lambda b: b.select([text_col]), batch_format="pyarrow",
        zero_copy_batch=True)
    right_schema = None
    left_schema = None
    if schemas is not None:
        left_schema, full_right = schemas
        right_schema = pa.schema([full_right.field(text_col)])
    truly_new = hash_join(
        candidates, corpus_texts, on=text_col, how="anti",
        num_buckets=num_buckets,
        schemas=(left_schema, right_schema) if schemas is not None else None)
    return misses.union(truly_new)


# --------------------------------------------------------------------------
# 4. token-budget selection (global ordered prefix-sum)
# --------------------------------------------------------------------------

def token_budget_select(
    ds: "ray.data.Dataset",
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_id_buckets: int = 16,
    n_docs: int | None = None,
) -> "ray.data.Dataset":
    """Select documents in ``(n_words DESC, doc_id ASC)`` order until
    the cumulative word count reaches ``budget_frac`` of the corpus
    total — the "fill the token budget with the longest/best docs
    first" curation step. Emits ``(doc_id, n_words, cum_words)`` for
    the selected set, bit-exact vs the SQL window oracle
    (``SUM(nw) OVER (ORDER BY nw DESC, doc_id) <= total * frac``).

    Distributed-scan plan (the ``pack_sequences`` pattern over a
    COMPOSITE order key): one stateless pass computes each doc's word
    count and per ``(n_words, id-range)`` partial sums; the driver
    reduces the partials to exclusive-scan base offsets — O(distinct
    counts × ranges) scalars, never rows (for an order key with huge
    cardinality substitute sampled range quantiles, same plan); the
    skinny count rows shuffle ONCE by ``(n_words, id-range)`` group;
    each group task sorts its ids, adds its broadcast base, and keeps
    rows under budget. Text never moves.
    """
    if n_docs is None:
        n_docs = ds.count()
    range_size = max(1, -(-n_docs // num_id_buckets))

    def _counts(batch: pa.Table) -> pa.Table:
        words, offsets = _word_table(batch, text_col)
        nw = np.diff(offsets).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        grp = nw * np.int64(num_id_buckets + 1) + (ids // range_size)
        return pa.table({id_col: pa.array(ids), "nw": pa.array(nw),
                         "_grp": pa.array(grp)})

    counts = ds.map_batches(_counts, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_grp", sort=False)["nw"].sum().reset_index()
        g["nw"] = g["nw"].astype(np.int64)
        return g

    pdf = counts.map_batches(_partials, batch_format="pandas").to_pandas()
    agg = pdf.groupby("_grp")["nw"].sum()
    grp_keys = np.asarray(agg.index, np.int64)
    grp_sums = agg.to_numpy(np.int64)
    # scan order = (n_words DESC, id_bucket ASC); _grp = nw*(B+1)+bucket
    # is ASC in both, so sort by (-nw, bucket) == sort by key with nw
    # negated: decompose, order by (-nw, bucket)
    nw_of = grp_keys // np.int64(num_id_buckets + 1)
    bk_of = grp_keys % np.int64(num_id_buckets + 1)
    order = np.lexsort((bk_of, -nw_of))
    sums_sorted = grp_sums[order]
    base_sorted = np.concatenate(([0], np.cumsum(sums_sorted)[:-1]))
    total = int(grp_sums.sum())
    budget = total * float(budget_frac)  # ONE IEEE multiply, = SQL T*frac
    base_of = dict(zip(grp_keys[order].tolist(), base_sorted.tolist()))
    # groups whose base already exceeds budget can be skipped wholesale
    live = {k for k, b in base_of.items() if b <= budget}

    def _select(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "n_words": pd.Series([], dtype=np.int64),
            "cum_words": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        key = int(df["_grp"].iloc[0])
        if key not in live:
            return empty
        df = df.sort_values(id_col, kind="mergesort")
        nw = df["nw"].to_numpy(np.int64)
        cum = base_of[key] + np.cumsum(nw)
        keep = cum <= budget
        if not keep.any():
            return empty
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64)[keep],
            "n_words": nw[keep],
            "cum_words": cum[keep]})

    return counts.groupby("_grp").map_groups(_select, batch_format="pandas")


# --------------------------------------------------------------------------
# 5. deterministic mixture sampling
# --------------------------------------------------------------------------

def mixture_sample(
    ds: "ray.data.Dataset",
    rates_bp: dict,
    id_col: str = "doc_id",
    source_col: str = "source",
    basis: int = 10000,
) -> "ray.data.Dataset":
    """Deterministic domain-mixture downsampling: keep a row iff
    ``hash(id) % basis < rates_bp[source]`` (rates in basis points of
    ``basis``). The same DuckDB-pinned murmur hash as
    ``hash_split``/``kfold_assign``, so the oracle is native SQL and an
    entity's keep/drop decision is stable across runs, partitionings
    and re-executions (the property mixture reweighing needs: adding a
    source never resamples another).

    ``rates_bp`` is a small per-source dict, captured in the closure
    (broadcast once per task). Map-only — no shuffle at any scale.
    Unknown sources default to rate 0 (dropped) so a typo'd mixture
    spec fails loudly in row counts rather than silently passing data.
    """
    from ..functions.sketches import duckdb_hash_int64

    srcs = sorted(rates_bp)
    rate_arr = np.array([int(rates_bp[s]) for s in srcs], dtype=np.int64)

    def _keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        draw = (duckdb_hash_int64(
            batch[id_col].to_numpy(zero_copy_only=False))
            % np.uint64(basis)).astype(np.int64)
        codes = pc.index_in(batch[source_col],
                            pa.array(srcs)).to_numpy(zero_copy_only=False)
        codes = np.asarray(codes, dtype=np.float64)
        known = ~np.isnan(codes)
        rate = np.zeros(len(batch), np.int64)
        rate[known] = rate_arr[codes[known].astype(np.int64)]
        return batch.filter(pa.array(draw < rate))

    return ds.map_batches(_keep, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# 6. SemDeDup-style semantic dedup
# --------------------------------------------------------------------------

def semantic_dedup(
    ds: "ray.data.Dataset",
    dim: int,
    n_clusters: int = 8,
    tau: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    bucket_cap: int = 2048,
    num_buckets: int = 16,
    seed: int = 42,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    find near-duplicate pairs ONLY within each cluster (cosine ≥
    ``tau``), connected-component them, and keep one representative
    (the min id) per component. Returns the surviving ``(id, cluster)``
    rows.

    Scale shape: centroids are fit with the distributed Lloyd pass
    (broadcast centroids + per-batch partial sums, driver holds
    O(k·dim)); cluster assignment is a stateless map; the pairwise
    verify runs per cluster cell under ``groupby(cluster)`` with the
    same ``bucket_cap`` hyperplane-split guard as the LSH verify (a
    degenerate cluster can never make an unbounded O(s²) task);
    components use the distributed hash-to-min pass; losers are removed
    with a bucketed ANTI join — the driver never holds row-scale data.
    """
    from ..stages.dedup import _fixed_list_matrix, cluster_pairs_distributed
    from ..stages.joins import hash_join
    from ..stages.similarity import distributed_kmeans

    cent = distributed_kmeans(ds, dim=dim, n_centroids=n_clusters,
                              iters=iters)
    cent_ref = ray.put(cent.astype(np.float32))

    class _Assign:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[vec_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if len(batch) == 0:
                return pa.table({id_col: batch[id_col],
                                 "cluster": pa.array([], pa.int64()),
                                 vec_col: col})
            mat = _fixed_list_matrix(col, dim, np.float32)
            d2 = ((mat[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
            return pa.table({id_col: batch[id_col],
                             "cluster": pa.array(np.argmin(d2, axis=1)
                                                 .astype(np.int64)),
                             vec_col: col})

    assigned = ds.map_batches(_Assign, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8), num_cpus=0.25)

    rng = np.random.default_rng(seed)
    extra_planes = rng.standard_normal((dim, 32)).astype(np.float64)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64)})
        if len(df) < 2:
            return empty
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in df[vec_col]])
        ids = df[id_col].to_numpy(np.int64)
        out_a, out_b = [], []
        groups = [(mat, ids)]
        plane_i = 0
        while groups:
            m, i = groups.pop()
            if len(i) > bucket_cap:
                if plane_i < extra_planes.shape[1]:
                    side = (m @ extra_planes[:, plane_i]) > 0
                    plane_i += 1
                    groups.append((m[side], i[side]))
                    groups.append((m[~side], i[~side]))
                    continue
                for s in range(0, len(i), bucket_cap):
                    groups.append((m[s:s + bucket_cap], i[s:s + bucket_cap]))
                continue
            if len(i) < 2:
                continue
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0] = 1.0
            unit = m / norms[:, None]
            sim = unit @ unit.T
            ii, jj = np.triu_indices(len(i), k=1)
            hit = sim[ii, jj] >= tau
            a, b = i[ii[hit]], i[jj[hit]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        if not out_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    pairs = assigned.groupby("cluster").map_groups(
        _pairs, batch_format="pandas")
    comp = cluster_pairs_distributed(pairs, num_buckets=num_buckets)
    losers = comp.map_batches(
        lambda df: df.loc[df["doc_id"] != df["root"], ["doc_id"]]
        .rename(columns={"doc_id": id_col}),
        batch_format="pandas")
    # explicit schemas: the loser side can be EMPTY (no near-dups), and
    # schema inference on an empty dataset would execute/fail upstream
    survivors = hash_join(
        assigned.map_batches(lambda b: b.select([id_col, "cluster"]),
                             batch_format="pyarrow", zero_copy_batch=True),
        losers, on=id_col, how="anti", num_buckets=num_buckets,
        schemas=(pa.schema([(id_col, pa.int64()),
                            ("cluster", pa.int64())]),
                 pa.schema([(id_col, pa.int64())])))
    return survivors


# --------------------------------------------------------------------------
# 7. composed curation pipeline (the curation flagship)
# --------------------------------------------------------------------------

def curate(
    ds: "ray.data.Dataset",
    bench_grams: frozenset,
    min_words: int = 20,
    max_dup3_frac: float = 0.2,
    max_contam_num: int = 1,
    max_contam_den: int = 5,
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_id_buckets: int = 16,
    n_docs: int | None = None,
) -> "ray.data.Dataset":
    """The composed end-to-end curation pipeline a pretraining corpus
    goes through, fused into ONE read pass + one skinny scan:

      quality filter (n_words ≥ min, dup3_frac ≤ max)
      → decontamination (distinct-3-gram benchmark overlap < num/den)
      → token-budget selection (longest-first until budget_frac of the
        SURVIVORS' words).

    All three per-doc signals (word count, duplicate-3-gram fraction,
    benchmark overlap) come out of the same single fused map over the
    text — no join, no second read, no row ever leaves its batch until
    the budget scan's skinny (doc_id, n_words) rows. The budget is a
    fraction of the FILTERED corpus (the real curation semantics: you
    budget what you'd actually train on).

    Exactness contract matches the component operators: the contam
    filter is the exact integer comparison ``n_hit·den < n_grams·num``
    (docs with no 3-gram count as uncontaminated), dup3 the exact
    ``dup3·1 ≤ n3·max_dup3_frac`` IEEE comparison on exact ints.
    """
    bench_ref = ray.put(bench_grams)
    dup_thresh = float(max_dup3_frac)

    class _Fused:
        def __init__(self):
            self.bench = pd.Index(ray.get(bench_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            words, offsets = _word_table(batch, text_col)
            codes = _word_codes(words)
            n_rows = len(offsets) - 1
            nw = np.diff(offsets).astype(np.int64)  # words per row
            gid, row, start = _ngram_codes(codes, offsets, 3)
            n3 = np.bincount(row, minlength=n_rows).astype(np.int64) \
                if len(gid) else np.zeros(n_rows, np.int64)
            d3 = np.zeros(n_rows, np.int64)
            nh = np.zeros(n_rows, np.int64)
            if len(gid):
                ug, first = np.unique(gid, return_index=True)
                rep = start[first]
                parts = [words.take(pa.array(rep + k)) for k in range(3)]
                gstr = pc.binary_join_element_wise(*parts, " ").to_pandas()
                hit_of_gram = np.zeros(int(ug.max()) + 1, bool)
                hit_of_gram[ug] = gstr.isin(self.bench).to_numpy()
                key = _combine_exact(row, gid)
                _, kfirst = np.unique(key, return_index=True)
                urow = row[kfirst]
                ugram = gid[kfirst]
                d3 = np.bincount(urow, minlength=n_rows).astype(np.int64)
                nh = np.bincount(urow[hit_of_gram[ugram]],
                                 minlength=n_rows).astype(np.int64)
            dup3 = n3 - d3
            ok_len = nw >= np.int64(min_words)
            # dup3/n3 <= thresh as exact-int vs IEEE product comparison
            ok_dup = dup3.astype(np.float64) <= n3.astype(np.float64) * dup_thresh
            ok_cont = (nh * np.int64(max_contam_den)
                       < d3 * np.int64(max_contam_num)) | (d3 == 0)
            keep = ok_len & ok_dup & ok_cont
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({id_col: pa.array(ids[keep]),
                             "nw": pa.array(nw[keep])})

    # fused single pass: read → per-doc signals → filter → skinny rows
    ds_nw = ds.map_batches(_Fused, batch_format="pyarrow",
                           zero_copy_batch=True, concurrency=(1, 8), num_cpus=0.25)

    # budget scan over the survivors (same distributed-scan plan as
    # token_budget_select, reusing its group/scan machinery on the
    # already-computed counts)
    if n_docs is None:
        n_docs = ds.count()
    range_size = max(1, -(-n_docs // num_id_buckets))

    def _grp(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        nwv = batch["nw"].to_numpy(zero_copy_only=False)
        g = nwv * np.int64(num_id_buckets + 1) + (ids // range_size)
        return batch.append_column("_grp", pa.array(g))

    counts = ds_nw.map_batches(_grp, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_grp", sort=False)["nw"].sum().reset_index()
        g["nw"] = g["nw"].astype(np.int64)
        return g

    pdf = counts.map_batches(_partials, batch_format="pandas").to_pandas()
    if pdf.empty:
        return counts.map_batches(
            lambda df: pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                     "n_words": pd.Series([], dtype=np.int64),
                                     "cum_words": pd.Series([], dtype=np.int64)}),
            batch_format="pandas")
    agg = pdf.groupby("_grp")["nw"].sum()
    grp_keys = np.asarray(agg.index, np.int64)
    grp_sums = agg.to_numpy(np.int64)
    nw_of = grp_keys // np.int64(num_id_buckets + 1)
    bk_of = grp_keys % np.int64(num_id_buckets + 1)
    order = np.lexsort((bk_of, -nw_of))
    base_sorted = np.concatenate(([0], np.cumsum(grp_sums[order])[:-1]))
    total = int(grp_sums.sum())
    budget = total * float(budget_frac)
    base_of = dict(zip(grp_keys[order].tolist(), base_sorted.tolist()))
    live = {k for k, b in base_of.items() if b <= budget}

    def _select(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=np.int64),
            "n_words": pd.Series([], dtype=np.int64),
            "cum_words": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        key = int(df["_grp"].iloc[0])
        if key not in live:
            return empty
        df = df.sort_values(id_col, kind="mergesort")
        nwv = df["nw"].to_numpy(np.int64)
        cum = base_of[key] + np.cumsum(nwv)
        keep = cum <= budget
        if not keep.any():
            return empty
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64)[keep],
            "n_words": nwv[keep],
            "cum_words": cum[keep]})

    return counts.groupby("_grp").map_groups(_select, batch_format="pandas")


# --------------------------------------------------------------------------
# 8. chunk-level (paragraph) exact dedup with document reassembly
# --------------------------------------------------------------------------

_CHUNK_MULT = np.int64(1 << 20)  # chunk index space per doc (≤ 1M chunks/doc)


def chunk_dedup(
    ds: "ray.data.Dataset",
    chunk_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """C4-style sub-document exact dedup: split every document into
    consecutive non-overlapping ``chunk_words``-word chunks (the last
    chunk may be short), keep each distinct chunk STRING only at its
    FIRST occurrence in global ``(doc_id, chunk_idx)`` order, and
    reassemble each document from its surviving chunks in original
    order. Documents that lose every chunk disappear (the C4 rule).
    The reference has no sub-record dedup (its unit is the whole clip,
    ``utils/utils.py:91-92``); this is the paragraph-granularity
    variant a 100 TB text corpus needs.

    Scale shape: the chunking is one vectorized pass (ListArray
    re-offsetting + ``pc.binary_join`` — no per-row Python); each batch
    pre-combines to one row per distinct chunk (a boilerplate chunk in
    50% of docs ships once per batch, not once per doc); winners are a
    per-bucket idxmin over hash(chunk) buckets; reassembly is a second
    skinny shuffle bucketed by doc. Both shuffles move chunk-scale
    rows — unavoidable for EXACT string dedup (the payload IS the
    text) — but never all-to-one.

    Winner order is encoded as ``doc_id * 2^20 + chunk_idx`` (raises if
    a doc exceeds 2^20 chunks or ids exceed 2^43 — re-key upstream
    ids into a dense range before calling at that scale).
    """
    W = int(chunk_words)
    nb = int(num_buckets)

    def _chunks(batch: pa.Table) -> pd.DataFrame:
        words, offsets = _word_table(batch, text_col)
        nw = np.diff(offsets).astype(np.int64)
        n_rows = len(nw)
        nchunks = -(-nw // W)  # ceil; 0-word rows → 0 chunks
        total = int(nchunks.sum())
        if total == 0:
            return pd.DataFrame({"chunk": pd.Series([], dtype=object),
                                 "key": pd.Series([], dtype=np.int64),
                                 "_bucket": pd.Series([], dtype=np.int32)})
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), nchunks)
        base = np.concatenate(([0], np.cumsum(nchunks)[:-1]))
        cidx = np.arange(total, dtype=np.int64) - base[row_of]
        starts = offsets[row_of] + cidx * W
        # chunks tile the flat word stream: each chunk ends where the
        # next begins (rows are adjacent in the stream), so one extra
        # sentinel offset closes the list array
        chunk_offsets = np.concatenate((starts, offsets[-1:]))
        lists = pa.ListArray.from_arrays(
            pa.array(chunk_offsets, pa.int32()), words)
        chunk = pc.binary_join(lists, " ")
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (int(ids.max()) >= (1 << 43) or
                         int(nchunks.max()) >= (1 << 20)):
            raise ValueError("chunk_dedup key overflow: doc ids must be "
                             "< 2^43 and docs < 2^20 chunks")
        key = ids[row_of] * _CHUNK_MULT + cidx
        df = pd.DataFrame({"chunk": chunk.to_pandas(), "key": key})
        # local pre-combine: first occurrence within the batch
        g = df.groupby("chunk", sort=False)["key"].min().reset_index()
        h = pd.util.hash_pandas_object(g["chunk"], index=False).to_numpy()
        g["_bucket"] = (h % np.uint64(nb)).astype(np.int32)
        return g

    def _winners(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("chunk", sort=False)["key"].min().reset_index()
        g["_doc_bucket"] = ((g["key"].to_numpy(np.int64) // _CHUNK_MULT)
                            % nb).astype(np.int32)
        return g

    def _reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 text_col: pd.Series([], dtype=object),
                                 "n_kept": pd.Series([], dtype=np.int64)})
        key = df["key"].to_numpy(np.int64)
        d = pd.DataFrame({id_col: key // _CHUNK_MULT,
                          "_cidx": key % _CHUNK_MULT,
                          "chunk": df["chunk"].to_numpy()})
        d = d.sort_values([id_col, "_cidx"], kind="mergesort")
        out = d.groupby(id_col, sort=False).agg(
            **{text_col: ("chunk", " ".join), "n_kept": ("chunk", "size")})
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return out.reset_index()

    return (ds.map_batches(_chunks, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bucket").map_groups(_winners, batch_format="pandas")
            .groupby("_doc_bucket").map_groups(_reassemble,
                                               batch_format="pandas"))


def chunk_dedup_local(
    ds: "ray.data.Dataset",
    chunk_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """WITHIN-document chunk dedup: drop repeated ``chunk_words``-word
    chunks inside the SAME document (keep the first occurrence),
    reassembling in place — the intra-doc half of C4's repeated-span
    rule, complementing the corpus-wide :func:`chunk_dedup`.

    Scale shape: a document never needs data from any other document,
    so this is a pure stateless map — zero shuffle, zero driver state,
    linear in corpus bytes at any cluster size. The chunking reuses the
    vectorized ListArray re-offsetting; the within-row first-occurrence
    mask is one pandas ``duplicated`` over (row, chunk).
    """
    W = int(chunk_words)

    def _local(batch: pa.Table) -> pa.Table:
        words, offsets = _word_table(batch, text_col)
        nw = np.diff(offsets).astype(np.int64)
        n_rows = len(nw)
        nchunks = -(-nw // W)
        total = int(nchunks.sum())
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if total == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             text_col: pa.array([], pa.string()),
                             "n_kept": pa.array([], pa.int64())})
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), nchunks)
        base = np.concatenate(([0], np.cumsum(nchunks)[:-1]))
        cidx = np.arange(total, dtype=np.int64) - base[row_of]
        starts = offsets[row_of] + cidx * W
        chunk_offsets = np.concatenate((starts, offsets[-1:]))
        lists = pa.ListArray.from_arrays(
            pa.array(chunk_offsets, pa.int32()), words)
        chunk = pc.binary_join(lists, " ").to_pandas()
        keep = ~pd.DataFrame({"r": row_of, "c": chunk}).duplicated().to_numpy()
        d = pd.DataFrame({"r": row_of[keep], "chunk": chunk[keep]})
        agg = d.groupby("r", sort=True).agg(
            text=("chunk", " ".join), n_kept=("chunk", "size"))
        surviving_rows = agg.index.to_numpy()
        return pa.table({
            id_col: pa.array(ids[surviving_rows]),
            text_col: pa.array(agg["text"].to_numpy(), pa.string()),
            "n_kept": pa.array(agg["n_kept"].to_numpy(np.int64))})

    return ds.map_batches(_local, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# 9. temperature-flattened class sampling (multilingual alpha-sampling)
# --------------------------------------------------------------------------

def temperature_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    scale: float = 4.0,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Temperature-flattened per-class sampling: keep
    ``min(n_g, ceil(n_g^alpha * scale))`` rows of each class ``g``,
    deterministically (smallest DuckDB-hash keys win) — the
    multinomial alpha-sampling rule multilingual LLM corpora use to
    flatten head languages without starving the tail (alpha=1 keeps
    natural proportions, alpha=0 equalizes classes).

    Exactness: ``n^alpha`` is one IEEE ``pow`` of an exact int64 count
    — bit-identical to SQL's, so the per-class k and therefore the row
    set match the oracle exactly. Scale shape: one O(classes) count
    pass (partial_agg), per-class k on the driver (O(classes) floats),
    then the same bucketed per-class bottom-k as
    :func:`~video_features_ray.functions.sketches.stratified_bottom_k`
    with a per-class k — driver never holds row-scale data.
    """
    from ..functions.sketches import duckdb_hash_int64
    from ..stages.joins import partial_agg

    counts = partial_agg(ds, [group_col], sums=(), count_col="n",
                         num_buckets=min(4, num_buckets)).to_pandas()
    n = counts["n"].to_numpy(np.int64)
    k = np.minimum(n, np.ceil(np.power(n.astype(np.float64), float(alpha))
                              * float(scale)).astype(np.int64))
    k_of = dict(zip(counts[group_col], k.tolist()))
    k_ref = ray.put(k_of)

    def _bottomk(df: pd.DataFrame, drop_bucket: bool = False) -> pd.DataFrame:
        ks = ray.get(k_ref)
        if "_h" not in df.columns:
            df = df.assign(_h=duckdb_hash_int64(df[key_col].to_numpy()))
        df = df.sort_values(["_h", key_col], kind="mergesort")
        rank = df.groupby(group_col, sort=False).cumcount()
        kcol = df[group_col].map(ks).fillna(0).to_numpy(np.int64)
        out = df[rank.to_numpy() < kcol]
        if drop_bucket:
            return out.drop(columns=["_bucket"])
        hg = pd.util.hash_pandas_object(out[group_col], index=False).to_numpy()
        return out.assign(_bucket=(hg % np.uint64(num_buckets)).astype(np.int32))

    parts = (ds.map_batches(_bottomk, batch_format="pandas")
             .groupby("_bucket")
             .map_groups(lambda df: _bottomk(df, drop_bucket=True),
                         batch_format="pandas"))
    out = parts.to_pandas().sort_values([group_col, "_h", key_col],
                                        kind="mergesort")
    return out.drop(columns=["_h"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# 10. n-gram novelty (per-doc contribution scoring)
# --------------------------------------------------------------------------

def ngram_novelty(
    ds: "ray.data.Dataset",
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-document novelty: the fraction of a document's DISTINCT
    word-``n``-grams whose global FIRST owner (minimum doc id over all
    docs containing the gram) is the document itself — a contribution
    score that separates originals from recombinations of earlier text.

    Scale shape: distinct (doc, gram) pairs are computed per batch on
    dictionary codes and shipped ONCE through a hash(gram)-bucketed
    shuffle (each gram's pairs land in exactly one bucket, so the
    per-bucket min-doc owner is globally exact — same invariant as
    :func:`~video_features_ray.stages.dedup.distinct_count_per_group`);
    each bucket credits its pairs back to docs as skinny
    (doc, n_grams, n_novel) partials, and a second O(docs)-row shuffle
    sums them. The driver never sees a gram.
    """
    nb = int(num_buckets)
    N = int(n)

    def _pairs(batch: pa.Table) -> pd.DataFrame:
        words, offsets = _word_table(batch, text_col)
        codes = _word_codes(words)
        gid, row, start = _ngram_codes(codes, offsets, N)
        empty = pd.DataFrame({"gram": pd.Series([], dtype=object),
                              id_col: pd.Series([], dtype=np.int64),
                              "_bucket": pd.Series([], dtype=np.int32)})
        if len(gid) == 0:
            return empty
        key = _combine_exact(row, gid)
        _, kfirst = np.unique(key, return_index=True)
        urow, ustart = row[kfirst], start[kfirst]
        parts = [words.take(pa.array(ustart + k)) for k in range(N)]
        gstr = pc.binary_join_element_wise(*parts, " ").to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"gram": gstr, id_col: ids[urow]})
        h = pd.util.hash_pandas_object(g["gram"], index=False).to_numpy()
        g["_bucket"] = (h % np.uint64(nb)).astype(np.int32)
        return g

    def _credit(df: pd.DataFrame) -> pd.DataFrame:
        # bucket owns all of each gram's pairs → exact global owner
        owner = df.groupby("gram", sort=False)[id_col].transform("min")
        novel = (owner.to_numpy() == df[id_col].to_numpy())
        out = (df.assign(_novel=novel.astype(np.int64))
               .groupby(id_col, sort=False)
               .agg(n_grams=("gram", "size"), n_novel=("_novel", "sum"))
               .reset_index())
        out["_doc_bucket"] = (
            pd.util.hash_pandas_object(out[id_col], index=False).to_numpy()
            % np.uint64(nb)).astype(np.int32)
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(id_col, sort=False)
               .agg(n_grams=("n_grams", "sum"), n_novel=("n_novel", "sum"))
               .reset_index())
        out["n_grams"] = out["n_grams"].astype(np.int64)
        out["n_novel"] = out["n_novel"].astype(np.int64)
        out["novelty"] = (out["n_novel"].to_numpy(np.float64)
                          / out["n_grams"].to_numpy(np.float64))
        return out

    return (ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bucket").map_groups(_credit, batch_format="pandas")
            .groupby("_doc_bucket").map_groups(_final,
                                               batch_format="pandas"))


# --------------------------------------------------------------------------
# 12. Count-weighted n-gram LM familiarity
# --------------------------------------------------------------------------

def lm_familiarity(
    ds: "ray.data.Dataset",
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-document n-gram language-model familiarity: for every
    n-gram occurrence in a document, look up its GLOBAL corpus count
    and report exact-integer summaries — ``n_grams`` (occurrences),
    ``sum_count`` (Σ global count over occurrences), ``n_hapax``
    (occurrences whose gram appears exactly once corpus-wide) — plus
    ``familiarity = sum_count / n_grams`` (one IEEE division of exact
    ints, so it hash-compares bit-stably). High familiarity ≈ text made
    of common constructions (the count-based stand-in for an n-gram LM
    cross-entropy quality filter); high hapax share ≈ novel or noisy.

    Scale shape (same invariants as :func:`ngram_novelty`, but
    count-weighted and NON-distinct): per-batch (doc, gram) occurrence
    counts ``m`` ship once through a hash(gram)-bucketed shuffle — the
    bucket owns each gram globally, so ``c(gram) = Σ m`` inside one
    bucket is exact; buckets credit ``(doc, n_grams, sum_count,
    n_hapax)`` partials back through a second O(docs)-row shuffle. The
    driver never sees a gram, and a doc's payload text never moves.
    """
    nb = int(num_buckets)
    N = int(n)

    def _pairs(batch: pa.Table) -> pd.DataFrame:
        words, offsets = _word_table(batch, text_col)
        codes = _word_codes(words)
        gid, row, start = _ngram_codes(codes, offsets, N)
        empty = pd.DataFrame({"gram": pd.Series([], dtype=object),
                              id_col: pd.Series([], dtype=np.int64),
                              "m": pd.Series([], dtype=np.int64),
                              "_bucket": pd.Series([], dtype=np.int32)})
        if len(gid) == 0:
            return empty
        key = _combine_exact(row, gid)
        _, kfirst, m = np.unique(key, return_index=True, return_counts=True)
        urow, ustart = row[kfirst], start[kfirst]
        parts = [words.take(pa.array(ustart + k)) for k in range(N)]
        gstr = pc.binary_join_element_wise(*parts, " ").to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        g = pd.DataFrame({"gram": gstr, id_col: ids[urow],
                          "m": m.astype(np.int64)})
        h = pd.util.hash_pandas_object(g["gram"], index=False).to_numpy()
        g["_bucket"] = (h % np.uint64(nb)).astype(np.int32)
        return g

    def _credit(df: pd.DataFrame) -> pd.DataFrame:
        # bucket owns every occurrence of each gram → exact global count
        c = df.groupby("gram", sort=False)["m"].transform("sum").to_numpy()
        m = df["m"].to_numpy()
        out = (df.assign(_wc=m * c, _hx=np.where(c == 1, m, 0))
               .groupby(id_col, sort=False)
               .agg(n_grams=("m", "sum"), sum_count=("_wc", "sum"),
                    n_hapax=("_hx", "sum"))
               .reset_index())
        out["_doc_bucket"] = (
            pd.util.hash_pandas_object(out[id_col], index=False).to_numpy()
            % np.uint64(nb)).astype(np.int32)
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(id_col, sort=False)
               .agg(n_grams=("n_grams", "sum"), sum_count=("sum_count", "sum"),
                    n_hapax=("n_hapax", "sum"))
               .reset_index())
        for col in ("n_grams", "sum_count", "n_hapax"):
            out[col] = out[col].astype(np.int64)
        out["familiarity"] = (out["sum_count"].to_numpy(np.float64)
                              / out["n_grams"].to_numpy(np.float64))
        return out

    return (ds.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bucket").map_groups(_credit, batch_format="pandas")
            .groupby("_doc_bucket").map_groups(_final,
                                               batch_format="pandas"))


# --------------------------------------------------------------------------
# 13. Corpus snapshot diff
# --------------------------------------------------------------------------

def corpus_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Snapshot diff between two corpus versions: per id, ``status`` in
    ``{'added','removed','changed','unchanged'}`` — the incremental-
    curation primitive (what changed since the last crawl / last
    training-set build).

    Scale shape: each side maps to skinny ``(id, md5(text))`` rows —
    the payload text NEVER enters the shuffle — then ONE bucketed FULL
    OUTER hash join on id decides status per row. md5 equality stands
    in for text equality (matches DuckDB ``md5`` byte-for-byte, same
    contract as :func:`~video_features_ray.stages.dedup.exact_dedup`).
    """
    from .dedup import _md5_hex
    from .joins import hash_join

    def _skinny(name):
        def _m(batch: pa.Table) -> pa.Table:
            return pa.table({
                id_col: batch[id_col],
                name: pa.array(_md5_hex(batch[text_col].to_pylist()),
                               pa.string())})
        return _m

    o = old.map_batches(_skinny("h_old"), batch_format="pyarrow",
                        zero_copy_batch=True)
    nw = new.map_batches(_skinny("h_new"), batch_format="pyarrow",
                         zero_copy_batch=True)
    sch_o = pa.schema([(id_col, pa.int64()), ("h_old", pa.string())])
    sch_n = pa.schema([(id_col, pa.int64()), ("h_new", pa.string())])
    j = hash_join(o, nw, on=id_col, how="outer",
                  num_buckets=num_buckets, schemas=(sch_o, sch_n))

    def _status(df: pd.DataFrame) -> pd.DataFrame:
        ho, hn = df["h_old"], df["h_new"]
        status = np.where(ho.isna(), "added",
                          np.where(hn.isna(), "removed",
                                   np.where(ho.to_numpy() == hn.to_numpy(),
                                            "unchanged", "changed")))
        return pd.DataFrame({id_col: df[id_col].astype(np.int64),
                             "status": status})

    return j.map_batches(_status, batch_format="pandas")
