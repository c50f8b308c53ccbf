"""Substring-level duplicate-span detection + exact all-pairs cosine.

Two corpus-analysis operators the LLM-data literature treats as
first-class (substring dedup: Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022 — their ExactSubstr finds
repeated >=50-token spans across documents; we implement the k-char
variant over the ``documents`` table), expressed Ray-Data-first:

- :func:`dup_span_stats` — which k-character windows ("grams") occur in
  >=2 DISTINCT documents, and what fraction of each source's character
  positions sit inside such a duplicated window.  ONE pass, one
  shuffle, NOTHING collected but O(sources x buckets) partial rows:
  per-batch distinct ``(gram, doc)`` postings (with their position
  count and the doc's group value) hash-bucket BY GRAM, so a gram's
  postings all land in one bucket task and that task can compute BOTH
  the global distinct-doc count per gram AND the per-group position
  sums locally — the duplicated-gram set never exists as a driver-side
  object and there is no broadcast membership pass at all.

  Keys: by default each k-char window is keyed by a PAIR of
  independent 64-bit multiplicative folds over its codepoints
  (128 key bits; two distinct windows collide on both folds with
  probability ~2^-128 per pair — negligible at any corpus size, and
  16 posting bytes instead of the 4*k=160 exact key cuts the shuffle
  ~10x).  ``hashed_keys=False`` keeps the injective ``|S{4k}`` raw
  codepoint key (numpy view of the utf-32 window matrix, full-width
  memcmp compare) for exact-equality verification — the two modes are
  output-identical on real corpora (asserted in tests).

  Winnowing (the 100 TB knob): with ``winnow_w > 1`` only positions
  whose key-hash is the minimum of some ``w``-long window of
  consecutive positions are shuffled at all (Schleimer et al.'s
  winnowing selection, ~2/(w+1) of positions).  Detection guarantee:
  any span of length >= k + w - 1 shared by two documents selects at
  least one common gram in both, so long duplicated spans are always
  seen; the reported counts are then over SELECTED positions
  (fingerprint-level dup pressure), not all positions.

- :func:`doc_vectors` / :func:`cosine_pairs_topk` — bag-of-words count
  vectors over a FITTED vocabulary (distinct terms of the corpus,
  space-split, matching DuckDB ``string_split(text, ' ')`` exactly),
  then the exact all-pairs cosine top-k self-join.  The corpus matrix
  is assembled from PER-BLOCK object-store refs (``to_arrow_refs`` —
  the driver holds O(blocks) refs, never the vectors); each actor
  reconstructs it once in ``__init__`` under an explicit byte budget
  (``matrix_budget`` guards estimated ``n_docs x |vocab| x 8`` BEFORE
  any allocation), then each batch computes one int64 ``B x N``
  matmul, keeps its local top-k, and the driver merges O(k x blocks)
  rows.  Dots and norms are exact int64, cosine is ONE double division
  by ONE double sqrt of an exact integer product — bit-identical to
  the SQL.

  Scale: exact all-pairs is inherently quadratic; this operator is for
  corpus slices whose count matrix fits the per-actor budget (~1e6
  docs x small vocab).  The 100 TB path is the LSH/ANN family
  (stages/similarity.py, stages/dedup.py) — this is its
  exact-verification complement, the same role brute-force cosine
  plays for IVF recall tests.

Reference anchor: the reference repo has no corpus analytics; these
extend its per-item map family (video_features' per-clip loops) to the
corpus-wide training-data ops SURVEY.md lists as required additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.sequences import _codepoints_batch

__all__ = ["window_keys", "dup_span_stats", "dup_span_ranges",
           "doc_vectors", "cosine_pairs_topk"]

#: two independent odd multipliers for the 2x64-bit window fold
#: (FNV-1a prime and the splitmix64 increment — both well-mixed odd
#: constants; the PAIR is the key, so a collision needs both folds of
#: two different windows to agree mod 2^64 simultaneously)
_FOLD_P1 = np.uint64(1099511628211)
_FOLD_P2 = np.uint64(0x9E3779B97F4A7C15)


def window_keys(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """All k-char windows of a string column -> (``|S{4k}`` key array,
    int64 row index per window).

    One utf-32 decode of the whole batch, one ``sliding_window_view``,
    zero per-row Python.  Windows never cross row boundaries; rows
    shorter than ``k`` emit nothing.  Keys are injective encodings of
    the codepoint sequence (full-width memcmp equality — trailing and
    embedded NULs are significant in numpy ``S`` compares, verified in
    tests), so two keys are equal IFF the k-char substrings are equal.
    """
    flat, offsets = _codepoints_batch(texts)
    lens = np.diff(offsets)
    npos = np.maximum(lens - k + 1, 0)
    total = int(npos.sum())
    if total == 0 or len(flat) < k:
        return (np.empty(0, dtype=f"|S{4 * k}"),
                np.empty(0, dtype=np.int64))
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), npos)
    excl = np.concatenate(([0], np.cumsum(npos)[:-1]))
    within = np.arange(total, dtype=np.int64) - np.repeat(excl, npos)
    starts = offsets[:-1][row_idx] + within
    wins = np.lib.stride_tricks.sliding_window_view(
        flat.astype(np.int32, copy=False), k)[starts]
    keys = np.ascontiguousarray(wins).view(f"|S{4 * k}").ravel()
    return keys, row_idx


def _fold_pair(keys_s: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """``|S{4k}`` window keys -> two independent uint64 folds over the
    k codepoint columns (vectorized; 40 fused mul-adds per fold)."""
    if len(keys_s) == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.uint64))
    u = keys_s.view(np.uint32).reshape(-1, k).astype(np.uint64)
    h1 = np.zeros(len(keys_s), dtype=np.uint64)
    h2 = np.full(len(keys_s), np.uint64(k), dtype=np.uint64)
    for c in range(k):
        col = u[:, c]
        h1 = h1 * _FOLD_P1 + col
        h2 = (h2 * _FOLD_P2) ^ (col + np.uint64(0xFF51AFD7ED558CCD))
    return h1, h2


def _winnow_select(h: np.ndarray, row_idx: np.ndarray, w: int
                   ) -> np.ndarray:
    """Winnowing selection (Schleimer et al., SIGMOD 2003): indices of
    positions whose hash is the minimum of SOME w-long window of
    consecutive positions of the same row (leftmost min per window —
    content-determined, so two documents sharing >= w consecutive
    grams select at least one common gram).  Rows with fewer than w
    positions keep their single minimum (every document with >= 1
    position emits >= 1 fingerprint)."""
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    sel = np.zeros(n, dtype=bool)
    if n >= w:
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        valid = row_idx[: n - w + 1] == row_idx[w - 1:]
        amin = win.argmin(axis=1) + np.arange(n - w + 1)
        sel[amin[valid]] = True
    # rows with < w positions: per-row argmin via one lexsort run-start
    starts = np.flatnonzero(np.concatenate(
        ([True], row_idx[1:] != row_idx[:-1])))
    counts = np.diff(np.concatenate([starts, [n]]))
    short = counts < w
    if short.any():
        pos_in_row = np.arange(n) - np.repeat(starts, counts)
        mask = np.repeat(short, counts)
        idx = np.flatnonzero(mask)
        order = np.lexsort((pos_in_row[idx], h[idx], row_idx[idx]))
        srt = idx[order]
        first = np.concatenate(
            ([True], row_idx[srt][1:] != row_idx[srt][:-1]))
        sel[srt[first]] = True
    return np.flatnonzero(sel)


def dup_span_stats(
    ds: "ray.data.Dataset",
    k: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    num_buckets: int = 16,
    hashed_keys: bool = True,
    winnow_w: int = 0,
) -> pd.DataFrame:
    """Per-``group_col`` duplicated-span pressure: of all k-char window
    positions (docs with >= k chars), how many hold a gram that occurs
    in >= 2 DISTINCT documents.  Returns columns
    ``(group, n_positions, n_dup_positions, dup_frac)`` with exact int
    counts and one IEEE division.

    ONE gram-bucketed shuffle computes everything: each bucket task
    sees ALL postings of its grams, so it resolves dup membership AND
    sums positions per group locally; the driver reduces O(groups x
    buckets) partial rows.  No dup-gram set is ever collected or
    broadcast (the former ``max_dup`` driver guard is gone by design).
    NULL ``group_col`` values stay a distinct group (SQL GROUP BY
    semantics), never merged with the empty string.
    """
    width = 4 * k

    def _fsb(keys_s: np.ndarray) -> pa.FixedSizeBinaryArray:
        # S-array -> Arrow FixedSizeBinary, one buffer copy, zero
        # Python bytes objects
        return pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(keys_s),
            [None, pa.py_buffer(np.ascontiguousarray(keys_s).tobytes())])

    def _s_view(col) -> np.ndarray:
        # Arrow FixedSizeBinary column -> numpy S view (no objects)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buf = col.buffers()[1]
        flat = np.frombuffer(buf, dtype=f"|S{width}",
                             count=len(col) + col.offset)
        return flat[col.offset:]

    def _postings(batch: pa.Table) -> pa.Table:
        # one utf-32 decode -> all windows -> (key, doc) distinct with
        # position counts; group value carried per posting (a doc has
        # one group, so the posting's group is well defined)
        keys, row_idx = window_keys(batch[text_col], k)
        h1, h2 = _fold_pair(keys, k)
        if winnow_w > 1:
            sel = _winnow_select(h1, row_idx, winnow_w)
            keys, row_idx = keys[sel], row_idx[sel]
            h1, h2 = h1[sel], h2[sel]
        ids = batch[id_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        if group_col in batch.column_names:
            grp_rows = batch[group_col].to_numpy(zero_copy_only=False)
        else:
            grp_rows = np.full(batch.num_rows, "", dtype=object)
        # distinct (key, doc) with counts: lexsort + run-length
        if hashed_keys:
            order = np.lexsort((row_idx, h2, h1))
            kk1, kk2, rr = h1[order], h2[order], row_idx[order]
            first = np.concatenate(([True], (kk1[1:] != kk1[:-1])
                                    | (kk2[1:] != kk2[:-1])
                                    | (rr[1:] != rr[:-1])))
        else:
            order = np.lexsort((row_idx, keys))
            kk, rr = keys[order], row_idx[order]
            first = np.concatenate(([True], (kk[1:] != kk[:-1])
                                    | (rr[1:] != rr[:-1])))
        starts = np.flatnonzero(first)
        cnt = np.diff(np.concatenate([starts, [len(order)]]))
        keep = order[starts]
        cols: dict = {}
        if hashed_keys:
            cols["h1"] = pa.array(h1[keep].view(np.int64),
                                  type=pa.int64())
            cols["h2"] = pa.array(h2[keep].view(np.int64),
                                  type=pa.int64())
            bucket = (h1[keep] % np.uint64(num_buckets)).astype(np.int32)
        else:
            cols["gram"] = _fsb(keys[keep])
            u32 = keys[keep].view(np.uint32).reshape(-1, k).astype(
                np.uint64)
            hb = np.zeros(len(keep), dtype=np.uint64)
            for c in range(k):
                hb = hb * _FOLD_P1 + u32[:, c]
            bucket = (hb % np.uint64(num_buckets)).astype(np.int32)
        cols["doc"] = pa.array(ids[row_idx[keep]], type=pa.int64())
        cols["grp"] = pa.array(grp_rows[row_idx[keep]].tolist(),
                               type=pa.string())
        cols["n"] = pa.array(cnt, type=pa.int64())
        cols["_bucket"] = pa.array(bucket)
        return pa.table(cols)

    key_cols = ["h1", "h2"] if hashed_keys else ["gram"]

    def _bucket_stats(batch: pa.Table) -> pd.DataFrame:
        # gram-confined bucket: global distinct-doc count per gram AND
        # per-group position sums are computable locally; emit one
        # partial row per group
        empty = pd.DataFrame({
            "grp": pd.Series([], dtype=object),
            "n_pos": pd.Series([], dtype=np.int64),
            "n_dup": pd.Series([], dtype=np.int64)})
        if batch.num_rows == 0 or "doc" not in batch.column_names:
            return empty
        if hashed_keys:
            a = batch["h1"].to_numpy(zero_copy_only=False)
            b = batch["h2"].to_numpy(zero_copy_only=False)
            docs = batch["doc"].to_numpy(zero_copy_only=False)
            order = np.lexsort((docs, b, a))
            a, b, docs = a[order], b[order], docs[order]
            new_key = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        else:
            ks = _s_view(batch["gram"])
            docs = batch["doc"].to_numpy(zero_copy_only=False)
            order = np.lexsort((docs, ks))
            ks, docs = ks[order], docs[order]
            new_key = np.concatenate(([True], ks[1:] != ks[:-1]))
        n = batch["n"].to_numpy(zero_copy_only=False)[order]
        grp = np.asarray(batch["grp"].to_numpy(zero_copy_only=False),
                         dtype=object)[order]
        # distinct docs per key: postings are distinct (key, doc)
        # within a batch but may repeat across batches -> run-length
        # over (key, doc)
        new_doc = new_key | np.concatenate(([True],
                                            docs[1:] != docs[:-1]))
        key_id = np.cumsum(new_key) - 1
        ndocs = np.bincount(key_id[new_doc])
        dup_post = ndocs[key_id] >= 2
        codes, uniq = pd.factorize(grp, use_na_sentinel=True)
        # NULL group -> its own code (len(uniq)); kept distinct
        codes = np.where(codes < 0, len(uniq), codes)
        n_grp = len(uniq) + 1
        n_pos = np.bincount(codes, weights=n, minlength=n_grp)
        n_dup = np.bincount(codes[dup_post], weights=n[dup_post],
                            minlength=n_grp)
        labels = np.concatenate([np.asarray(uniq, dtype=object), [None]])
        keep = n_pos > 0
        return pd.DataFrame({
            "grp": labels[keep],
            "n_pos": n_pos[keep].astype(np.int64),
            "n_dup": n_dup[keep].astype(np.int64)})

    parts = (ds.map_batches(_postings, batch_format="pyarrow",
                            batch_size=512)
             .groupby("_bucket")
             .map_groups(_bucket_stats, batch_format="pyarrow")
             .to_pandas())
    if parts.empty or "grp" not in parts.columns:
        return pd.DataFrame({
            group_col: pd.Series([], dtype=object),
            "n_positions": pd.Series([], dtype=np.int64),
            "n_dup_positions": pd.Series([], dtype=np.int64),
            "dup_frac": pd.Series([], dtype=np.float64)})
    agg = (parts.groupby("grp", sort=False, dropna=False)
           [["n_pos", "n_dup"]].sum().reset_index())
    npos = agg["n_pos"].to_numpy(np.int64)
    ndup = agg["n_dup"].to_numpy(np.int64)
    out = pd.DataFrame({
        group_col: agg["grp"].astype(object),
        "n_positions": npos,
        "n_dup_positions": ndup,
        "dup_frac": ndup / npos.astype(np.float64)})
    return (out.sort_values(group_col, kind="mergesort")
            .reset_index(drop=True))


def dup_span_ranges(
    ds: "ray.data.Dataset",
    k: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 16,
    doc_buckets: int = 16,
) -> "ray.data.Dataset":
    """Merged duplicated-span intervals per document — ExactSubstr's
    actual deliverable (Lee et al. mark or drop exactly these char
    ranges before training).  Two bucketed shuffles, nothing broadcast
    and nothing collected to the driver:

    1. per-position postings ``(h1, h2, doc, pos)`` (128-bit hashed
       window keys, 1-based in-document position) bucket BY GRAM; the
       bucket task resolves which keys occur in >= 2 distinct docs
       locally (the bucketed semi-join membership — the dup-key set
       never leaves its task) and emits ONLY the duplicated positions,
       re-tagged with a DOC-hash bucket;
    2. the doc-bucket task sorts ``(doc, pos)`` and merges intervals
       with one vectorized gaps-and-islands pass: a new span starts
       when ``pos - prev_pos > k`` (overlapping or adjacent duplicated
       windows fuse into one range).

    Returns a Dataset of ``(doc_id, span_start, span_end, n_dup_pos)``
    with 1-based inclusive char bounds (``span_end`` = last duplicated
    window start + k - 1) — the same rows the SQL oracle's
    lag/window-function formulation produces.
    """
    from .events import stable_bucket

    def _post(batch: pa.Table) -> pa.Table:
        keys, row_idx = window_keys(batch[text_col], k)
        h1, h2 = _fold_pair(keys, k)
        n = len(keys)
        if n:
            first = np.concatenate(([True], row_idx[1:] != row_idx[:-1]))
            run_starts = np.flatnonzero(first)
            within = np.arange(n, dtype=np.int64) \
                - run_starts[np.cumsum(first) - 1]
        else:
            within = np.empty(0, dtype=np.int64)
        ids = batch[id_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "h1": pa.array(h1.view(np.int64), type=pa.int64()),
            "h2": pa.array(h2.view(np.int64), type=pa.int64()),
            "doc": pa.array(ids[row_idx], type=pa.int64()),
            "pos": pa.array(within + 1, type=pa.int64()),
            "_bucket": pa.array((h1 % np.uint64(num_buckets))
                                .astype(np.int32))})

    def _dup_pos(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc": pa.array([], type=pa.int64()),
                          "pos": pa.array([], type=pa.int64()),
                          "_dbucket": pa.array([], type=pa.int32())})
        if batch.num_rows == 0 or "doc" not in batch.column_names:
            return empty
        a = batch["h1"].to_numpy(zero_copy_only=False)
        b = batch["h2"].to_numpy(zero_copy_only=False)
        docs = batch["doc"].to_numpy(zero_copy_only=False)
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, b, a))
        a, b, docs, pos = a[order], b[order], docs[order], pos[order]
        new_key = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        new_doc = new_key | np.concatenate(([True],
                                            docs[1:] != docs[:-1]))
        key_id = np.cumsum(new_key) - 1
        ndocs = np.bincount(key_id[new_doc])
        dup = ndocs[key_id] >= 2
        if not dup.any():
            return empty
        d, p = docs[dup], pos[dup]
        return pa.table({
            "doc": pa.array(d, type=pa.int64()),
            "pos": pa.array(p, type=pa.int64()),
            "_dbucket": pa.array(stable_bucket(d, doc_buckets))})

    def _merge(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "span_start": pa.array([], type=pa.int64()),
            "span_end": pa.array([], type=pa.int64()),
            "n_dup_pos": pa.array([], type=pa.int64())})
        if batch.num_rows == 0 or "doc" not in batch.column_names:
            return empty
        docs = batch["doc"].to_numpy(zero_copy_only=False)
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, docs))
        docs, pos = docs[order], pos[order]
        n = len(docs)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (docs[1:] != docs[:-1]) | (pos[1:] - pos[:-1] > k)
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pa.table({
            "doc_id": pa.array(docs[starts], type=pa.int64()),
            "span_start": pa.array(pos[starts], type=pa.int64()),
            "span_end": pa.array(pos[ends] + (k - 1), type=pa.int64()),
            "n_dup_pos": pa.array(
                np.diff(np.concatenate([starts, [n]])).astype(np.int64))})

    dup = (ds.map_batches(_post, batch_format="pyarrow", batch_size=512)
           .groupby("_bucket")
           .map_groups(_dup_pos, batch_format="pyarrow"))
    return (dup.groupby("_dbucket")
            .map_groups(_merge, batch_format="pyarrow"))


def _terms_of(texts) -> tuple[np.ndarray, np.ndarray]:
    """Space-split terms per row, DuckDB ``string_split(text, ' ')``
    semantics exactly: empty string -> [''], NULL -> no terms.
    Vectorized: one Arrow ``split_pattern`` + flatten — no per-row
    Python.  Returns (object array of terms, int64 count per row)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lists = pc.split_pattern(texts, " ")
    counts = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    # flatten() respects offsets and skips null rows (NULL -> no terms)
    terms = lists.flatten().to_numpy(zero_copy_only=False)
    return np.asarray(terms, dtype=object), counts


def fit_vocab(ds: "ray.data.Dataset", text_col: str = "text",
              num_buckets: int = 16, max_vocab: int = 2_000_000
              ) -> np.ndarray:
    """Distinct corpus terms (sorted) — the fit half of bag-of-words
    vectorization.  Per-batch distinct -> gram-confined bucket distinct
    -> driver collect of O(vocab) strings."""

    def _partial(batch: pa.Table) -> pd.DataFrame:
        terms, _ = _terms_of(batch[text_col])
        u = pd.unique(pd.Series(terms, dtype=object))
        d = pd.DataFrame({"term": u})
        h = pd.util.hash_pandas_object(d["term"], index=False).to_numpy()
        d["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return d

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "term" not in df.columns:   # Ray empty partition
            return pd.DataFrame({"term": pd.Series([], dtype=object)})
        return df[["term"]].drop_duplicates()

    vocab = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("_bucket").map_groups(_distinct,
                                            batch_format="pandas")
             .to_pandas())
    if len(vocab) > max_vocab:
        raise ValueError(f"vocab {len(vocab)} exceeds broadcast budget "
                         f"({max_vocab}); hash terms instead")
    return np.sort(vocab["term"].to_numpy().astype(object))


def doc_vectors(batch: pa.Table, vocab: np.ndarray,
                text_col: str = "text", id_col: str = "doc_id"
                ) -> tuple[np.ndarray, np.ndarray]:
    """(ids, count matrix) of a batch over the fitted vocab — int64,
    one searchsorted + one bincount, no per-term Python."""
    terms, counts = _terms_of(batch[text_col])
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n, v = len(ids), len(vocab)
    if len(terms) == 0:
        return ids, np.zeros((n, v), dtype=np.int64)
    idx = np.searchsorted(vocab, terms)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    mat = np.bincount(row * v + idx, minlength=n * v).reshape(n, v)
    return ids, mat.astype(np.int64)


def cosine_pairs_topk(
    ds: "ray.data.Dataset",
    topk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    matrix_budget: int = 1 << 30,
) -> pd.DataFrame:
    """Exact all-pairs bag-of-words cosine, global top-k.

    Returns ``(doc_a, doc_b, dot, cos)`` for the ``topk`` highest-cosine
    pairs (ties broken by ``(doc_a, doc_b)``), ``doc_a < doc_b``.
    ``dot`` is the exact int64 count-vector dot product; ``cos`` is
    ``dot / sqrt(na * nb)`` with the product exact in int64 — both
    sides of the oracle compute the identical IEEE expression.

    The corpus count matrix never touches the driver: vectorized
    blocks stay in the object store (``to_arrow_refs``) and each
    comparison actor assembles its copy once in ``__init__`` — after
    an explicit estimated-bytes check (``n_docs x |vocab| x 8`` vs
    ``matrix_budget``) that fails fast with a pointer to the ANN
    family instead of OOMing a worker mid-matmul.
    """
    vocab = fit_vocab(ds, text_col)
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                          "doc_b": pd.Series([], dtype=np.int64),
                          "dot": pd.Series([], dtype=np.int64),
                          "cos": pd.Series([], dtype=np.float64)})
    if len(vocab) == 0:          # all-NULL corpus: no terms, no pairs
        return empty.copy()
    vocab_ref = ray.put(vocab)
    row_w = len(vocab) * 8

    def _vec(batch: pa.Table) -> pa.Table:
        ids, mat = doc_vectors(batch, ray.get(vocab_ref), text_col,
                               id_col)
        na = (mat * mat).sum(axis=1)
        # whole matrix -> ONE FixedSizeBinary buffer (no per-row bytes)
        vec = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(row_w), len(ids),
            [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())])
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "vec": vec,
            "na": pa.array(na, type=pa.int64())})

    vec_ds = ds.map_batches(_vec, batch_format="pyarrow").materialize()
    n_docs = vec_ds.count()
    est = int(n_docs) * len(vocab) * 8
    if est > matrix_budget:
        raise ValueError(
            f"exact all-pairs corpus matrix would be ~{est / 2**30:.1f}"
            f" GiB ({n_docs} docs x {len(vocab)} terms); over the "
            f"{matrix_budget / 2**30:.1f} GiB per-actor budget — use "
            "the ANN family (stages/similarity.py) or raise "
            "matrix_budget explicitly")
    # per-block refs: the driver holds O(blocks) ObjectRefs, never the
    # vectors; actors pull blocks zero-copy from the local object store
    block_refs = vec_ds.to_arrow_refs()

    def _decode(tbl: pa.Table, v: int) -> tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        na = tbl["na"].to_numpy(zero_copy_only=False)
        col = tbl["vec"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(ids) == 0:
            return ids.astype(np.int64), \
                np.zeros((0, v), dtype=np.int64), na.astype(np.int64)
        flat = np.frombuffer(col.buffers()[1], dtype=np.int64,
                             count=(len(ids) + col.offset) * v)
        mat = flat[col.offset * v:].reshape(len(ids), v)
        return ids.astype(np.int64), mat, na.astype(np.int64)

    class _BlockTopK:
        def __init__(self):
            vv = len(ray.get(vocab_ref))
            parts = [_decode(ray.get(r), vv) for r in block_refs]
            parts = [p for p in parts if len(p[0])]
            if parts:
                self.ids = np.concatenate([p[0] for p in parts])
                self.mat = np.concatenate([p[1] for p in parts], axis=0)
                self.na = np.concatenate([p[2] for p in parts])
            else:
                self.ids = np.empty(0, np.int64)
                self.mat = np.zeros((0, vv), dtype=np.int64)
                self.na = np.empty(0, np.int64)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids_b, mat_b = doc_vectors(batch, vocab, text_col, id_col)
            if len(ids_b) == 0 or len(self.ids) == 0:
                return empty.copy()
            na_b = (mat_b * mat_b).sum(axis=1)
            dots = mat_b @ self.mat.T                       # int64 exact
            ii, jj = np.nonzero((ids_b[:, None] < self.ids[None, :])
                                & (dots > 0))
            if len(ii) == 0:
                return empty.copy()
            dot = dots[ii, jj]
            cos = dot.astype(np.float64) / np.sqrt(
                (na_b[ii] * self.na[jj]).astype(np.float64))
            d = pd.DataFrame({"doc_a": ids_b[ii], "doc_b": self.ids[jj],
                              "dot": dot.astype(np.int64), "cos": cos})
            d = d.sort_values(["cos", "doc_a", "doc_b"],
                              ascending=[False, True, True],
                              kind="mergesort")
            return d.head(topk)

    cand = ds.map_batches(_BlockTopK, concurrency=(1, 8),
                          batch_format="pyarrow").to_pandas()
    if cand.empty or "cos" not in cand.columns:
        return empty.copy()
    cand = cand.sort_values(["cos", "doc_a", "doc_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(topk)
    return cand.reset_index(drop=True)
