"""Substring-level duplicate-span detection + exact all-pairs cosine.

Two corpus-analysis operators the LLM-data literature treats as
first-class (substring dedup: Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL 2022 — their ExactSubstr finds
repeated >=50-token spans across documents; we implement the k-char
variant over the ``documents`` table), expressed Ray-Data-first:

- :func:`dup_span_stats` — which k-character windows ("grams") occur in
  >=2 DISTINCT documents, and what fraction of each source's character
  positions sit inside such a duplicated window.  Two passes, one
  shuffle: (1) per-batch distinct (gram, doc) pairs hash-bucketed BY
  GRAM (a gram's postings all land in one bucket, so the per-bucket
  distinct-doc count is globally exact) -> grams with >=2 docs; (2) the
  dup-gram set broadcasts once (``ray.put``) and a map-only pass counts
  member positions per source.  Gram keys are the raw 4*k-byte
  codepoint windows (numpy ``|S4k`` view of the utf-32 window matrix —
  injective, no hash-collision risk, vectorized memcmp compare), built
  by ONE ``sliding_window_view`` over the batch's flat codepoint array.

  Scale: the shuffled postings are ~4k bytes x positions (positions ~=
  corpus chars), same order as what any COUNT(DISTINCT) must move; at
  100 TB you would first winnow positions (keep only window hashes that
  are local minima — the ``text.fingerprint`` machinery) and/or swap
  the exact S-key for a 128-bit hash.  The dup-gram set is assumed
  broadcastable (true when duplication is the exception); ``max_dup``
  guards the collect and the join-path fallback is
  ``jaccard_verify_joined``-style (dedup.py) if it ever trips.

- :func:`doc_vectors` / :func:`cosine_pairs_topk` — bag-of-words count
  vectors over a FITTED vocabulary (distinct terms of the corpus,
  space-split, matching DuckDB ``string_split(text, ' ')`` exactly),
  then the exact all-pairs cosine top-k self-join: the corpus matrix
  broadcasts once and each batch computes one int64 ``B x N`` matmul,
  keeps its local top-k, and the driver merges O(k x blocks) rows.
  Dots and norms are exact int64, cosine is ONE double division by ONE
  double sqrt of an exact integer product — bit-identical to the SQL.

  Scale: exact all-pairs is inherently quadratic; this operator is for
  corpus slices up to ~1e6 docs x small vocab (broadcast matrix).  The
  100 TB path is the LSH/ANN family (stages/similarity.py,
  stages/dedup.py) — this is its exact-verification complement, the
  same role brute-force cosine plays for IVF recall tests.

Reference anchor: the reference repo has no corpus analytics; these
extend its per-item map family (video_features' per-clip loops) to the
corpus-wide training-data ops SURVEY.md lists as required additions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.sequences import _codepoints_batch

__all__ = ["window_keys", "dup_span_stats", "doc_vectors",
           "cosine_pairs_topk"]


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


def dup_span_stats(
    ds: "ray.data.Dataset",
    k: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    num_buckets: int = 16,
    max_dup: int = 5_000_000,
) -> pd.DataFrame:
    """Per-``group_col`` duplicated-span pressure: of all k-char window
    positions (docs with >= k chars), how many hold a gram that occurs
    in >= 2 DISTINCT documents.  Returns columns
    ``(group, n_positions, n_dup_positions, dup_frac)`` with exact int
    counts and one IEEE division."""

    width = 4 * k

    def _fsb(keys_s: np.ndarray) -> pa.FixedSizeBinaryArray:
        # S-array -> Arrow FixedSizeBinary, one buffer copy, zero
        # Python bytes objects (1.3M per batch with the pandas path)
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
        # no map-side dedupe: a lexsort of every posting here costs
        # more than shuffling the (rare) within-doc repeats the bucket
        # combiner removes anyway
        keys, row_idx = window_keys(batch[text_col], k)
        ids = batch[id_col].to_numpy(
            zero_copy_only=False)[row_idx].astype(np.int64)
        # bucket by a vectorized 64-bit fold of the window columns
        u32 = keys.view(np.uint32).reshape(-1, k).astype(np.uint64)
        h = np.zeros(len(keys), dtype=np.uint64)
        for c in range(k):
            h = h * np.uint64(1099511628211) + u32[:, c]
        return pa.table({
            "gram": _fsb(keys),
            "doc": pa.array(ids, type=pa.int64()),
            "_bucket": pa.array((h % np.uint64(num_buckets))
                                .astype(np.int32))})

    def _dup_grams(batch: pa.Table) -> pa.Table:
        # gram-confined bucket: the global distinct-doc count per gram
        # is computable locally; emit only grams with >= 2 docs
        if batch.num_rows == 0 or "gram" not in batch.column_names:
            return pa.table({"gram": pa.array([], type=pa.binary(width))})
        ks = _s_view(batch["gram"])
        ds_ = batch["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ds_, ks))
        ks, ds_ = ks[order], ds_[order]
        first = np.concatenate(
            ([True], (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])))
        ks = ks[first]
        starts = np.flatnonzero(np.concatenate(
            ([True], ks[1:] != ks[:-1])))
        counts = np.diff(np.concatenate([starts, [len(ks)]]))
        dup = ks[starts[counts >= 2]]
        return pa.table({"gram": _fsb(dup)})

    dup_t = (ds.map_batches(_postings, batch_format="pyarrow",
                            batch_size=512)
             .groupby("_bucket")
             .map_groups(_dup_grams, batch_format="pyarrow"))
    chunks = [_s_view(t["gram"])
              for r in dup_t.to_arrow_refs()
              for t in (ray.get(r),)
              if t.num_rows and "gram" in t.column_names]
    dup_keys = (np.sort(np.concatenate(chunks)) if chunks
                else np.empty(0, dtype=f"|S{width}"))
    if len(dup_keys) > max_dup:
        raise ValueError(
            f"{len(dup_keys)} duplicated grams exceeds the broadcast "
            f"budget ({max_dup}); use a join-path membership test "
            "(see stages/dedup.py jaccard_verify_joined for the shape)")
    dup_ref = ray.put(dup_keys)

    class _Count:
        def __init__(self):
            self.dup = ray.get(dup_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            keys, row_idx = window_keys(batch[text_col], k)
            grp = (batch[group_col].to_pylist() if group_col
                   in batch.column_names else [""] * batch.num_rows)
            grp = pd.Series(grp, dtype=object).fillna("").to_numpy()
            # searchsorted membership: the broadcast set is pre-sorted,
            # so this is n*log(|dup|) memcmps — np.isin would re-sort
            # every position key per batch
            if len(self.dup):
                pos = np.searchsorted(self.dup, keys)
                pos = np.minimum(pos, len(self.dup) - 1)
                member = self.dup[pos] == keys
            else:
                member = np.zeros(len(keys), dtype=bool)
            # per-ROW group codes fanned to positions via bincount —
            # no per-position string column
            codes, uniq = pd.factorize(grp)
            pos_codes = codes[row_idx]
            n_pos = np.bincount(pos_codes, minlength=len(uniq))
            n_dup = np.bincount(pos_codes[member], minlength=len(uniq))
            keep = n_pos > 0
            return pd.DataFrame({
                group_col: np.asarray(uniq, dtype=object)[keep],
                "n_pos": n_pos[keep].astype(np.int64),
                "n_dup": n_dup[keep].astype(np.int64)})

    parts = ds.map_batches(_Count, concurrency=(1, 8), batch_size=512,
                           batch_format="pyarrow").to_pandas()
    agg = (parts.groupby(group_col, sort=False)[["n_pos", "n_dup"]]
           .sum().reset_index())
    npos = agg["n_pos"].astype(np.int64)
    ndup = agg["n_dup"].astype(np.int64)
    return (pd.DataFrame({
        group_col: agg[group_col],
        "n_positions": npos,
        "n_dup_positions": ndup,
        "dup_frac": ndup.to_numpy(np.int64)
        / npos.to_numpy(np.int64).astype(np.float64)})
        .sort_values(group_col, kind="mergesort").reset_index(drop=True))


def _terms_of(texts) -> tuple[list, list]:
    """Space-split terms per row, DuckDB ``string_split(text, ' ')``
    semantics exactly: empty string -> [''], NULL -> no terms."""
    out_terms: list = []
    out_counts: list = []
    for t in texts.to_pylist():
        if t is None:
            out_counts.append(0)
            continue
        ts = t.split(" ")
        out_terms.extend(ts)
        out_counts.append(len(ts))
    return out_terms, out_counts


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
    if not terms:
        return ids, np.zeros((n, v), dtype=np.int64)
    idx = np.searchsorted(vocab, np.asarray(terms, dtype=object))
    row = np.repeat(np.arange(n, dtype=np.int64),
                    np.asarray(counts, dtype=np.int64))
    mat = np.bincount(row * v + idx, minlength=n * v).reshape(n, v)
    return ids, mat.astype(np.int64)


def cosine_pairs_topk(
    ds: "ray.data.Dataset",
    topk: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Exact all-pairs bag-of-words cosine, global top-k.

    Returns ``(doc_a, doc_b, dot, cos)`` for the ``topk`` highest-cosine
    pairs (ties broken by ``(doc_a, doc_b)``), ``doc_a < doc_b``.
    ``dot`` is the exact int64 count-vector dot product; ``cos`` is
    ``dot / sqrt(na * nb)`` with the product exact in int64 — both
    sides of the oracle compute the identical IEEE expression.
    """
    vocab = fit_vocab(ds, text_col)
    vocab_ref = ray.put(vocab)

    # corpus matrix: collected once, broadcast once (documented bound —
    # exact all-pairs is for slices where ids x vocab fits a worker)
    def _vec(batch: pa.Table) -> pd.DataFrame:
        ids, mat = doc_vectors(batch, ray.get(vocab_ref), text_col,
                               id_col)
        return pd.DataFrame({"doc_id": ids,
                             "vec": [r.tobytes() for r in mat]})

    vec_df = ds.map_batches(_vec, batch_format="pyarrow").to_pandas()
    order = np.argsort(vec_df["doc_id"].to_numpy(np.int64),
                       kind="stable")
    ids_all = vec_df["doc_id"].to_numpy(np.int64)[order]
    mat_all = np.stack([
        np.frombuffer(b, dtype=np.int64)
        for b in vec_df["vec"].to_numpy()[order]]) if len(vec_df) else \
        np.zeros((0, len(vocab)), dtype=np.int64)
    na_all = (mat_all * mat_all).sum(axis=1)
    corpus_ref = ray.put((ids_all, mat_all, na_all))

    class _BlockTopK:
        def __init__(self):
            self.ids, self.mat, self.na = ray.get(corpus_ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            ids_b, mat_b = doc_vectors(batch, vocab, text_col, id_col)
            if len(ids_b) == 0 or len(self.ids) == 0:
                return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                     "doc_b": pd.Series([], dtype=np.int64),
                                     "dot": pd.Series([], dtype=np.int64),
                                     "cos": pd.Series([], dtype=np.float64)})
            na_b = (mat_b * mat_b).sum(axis=1)
            dots = mat_b @ self.mat.T                       # int64 exact
            ii, jj = np.nonzero((ids_b[:, None] < self.ids[None, :])
                                & (dots > 0))
            if len(ii) == 0:
                return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                     "doc_b": pd.Series([], dtype=np.int64),
                                     "dot": pd.Series([], dtype=np.int64),
                                     "cos": pd.Series([], dtype=np.float64)})
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
    cand = cand.sort_values(["cos", "doc_a", "doc_b"],
                            ascending=[False, True, True],
                            kind="mergesort").head(topk)
    return cand.reset_index(drop=True)
