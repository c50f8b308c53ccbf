"""Concat-and-chunk sequence packing — the GPT-style pretraining layout.

Semantics: concatenate every document's whitespace tokens in ``doc_id``
order into one global token stream, then cut the stream into
fixed-``context_len`` chunks.  The output is the PACKING MANIFEST, one
row per (chunk, doc) span: which token range of which doc lands where.
A downstream actor stage turns manifest + token payloads into packed
training examples; the manifest itself is the exact, oracle-checkable
part.

This is the repo's distributed SCAN pattern (global exclusive
prefix-sum), complementing the per-entity ``cumulative_sum``:

  1. one stateless pass computes each doc's token count plus per
     doc-id-RANGE partial sums (a doc's global offset = sum of all
     smaller ids' counts);
  2. the driver reduces the per-range partials to ``num_buckets`` base
     offsets with an exclusive scan — O(num_buckets) scalars, never
     rows;
  3. the skinny (doc_id, cnt) rows shuffle ONCE by range bucket; each
     bucket task sorts its contiguous id range, adds local cumsum to
     its broadcast base, and emits chunk spans with a closed-form
     vectorized enumeration.

Scale: the only wide op moves 16-byte count rows; the driver holds one
integer per bucket; text never moves at all.  Range bucketing assumes
DENSE integer doc ids (the manifest/testdata shape — see
``sources/sequences.py``); for sparse keys substitute a range partition
from a distributed sample, same plan otherwise.

The reference packs frames into fixed windows per clip
(`/root/reference/models/i3d/extract_i3d.py:97-116` stack slicing);
this is the corpus-global analogue every LLM pretraining pipeline
needs (sequence packing / example packing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def pack_sequences(
    ds: "ray.data.Dataset",
    context_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    n_docs: int | None = None,
) -> "ray.data.Dataset":
    """documents → packing manifest (chunk_id, doc_id, tok_start,
    tok_end, chunk_off), bit-exact vs the SQL window-scan oracle.

    ``tok_start``/``tok_end``: the doc-local token slice [start, end)
    this span contributes; ``chunk_off``: where it lands inside the
    chunk.  Tokenization is ``text.split(' ')`` == DuckDB
    ``string_split`` (empties kept), shared with ``stages/text.py``.
    """
    if n_docs is None:
        n_docs = ds.count()
    range_size = max(1, -(-n_docs // num_buckets))
    L = int(context_len)

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64),
                "_bucket": pd.Series([], dtype=np.int32)})
        ids = df[id_col].to_numpy(np.int64)
        cnt = (df[text_col].fillna("").str.count(" ") + 1).to_numpy(np.int64)
        return pd.DataFrame({
            id_col: ids, "cnt": cnt,
            "_bucket": (ids // range_size).astype(np.int32)})

    # skinny counts are reused by phases 2 and 3 — materialize ONCE so
    # the text split doesn't run twice (bounded: 16 B/doc, vs the
    # corpus's KBs/doc; this is the "small result" materialization the
    # streaming rule allows)
    counts = ds.map_batches(_counts, batch_format="pandas").materialize()

    def _partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("_bucket", sort=False)["cnt"].sum().reset_index()
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    # driver reduce: one partial row per (block, bucket) pair — O(small)
    pdf = counts.map_batches(_partials, batch_format="pandas").to_pandas()
    agg = pdf.groupby("_bucket")["cnt"].sum()
    # size by the OBSERVED max bucket: ids need only be dense integers,
    # not 0-based — 1-based ids put the max id in bucket num_buckets,
    # which a fixed-size array would index out of bounds
    nb = (int(np.asarray(agg.index, np.int64).max()) + 1) if len(agg) else 1
    totals = np.zeros(nb + 1, np.int64)
    totals[np.asarray(agg.index, np.int64) + 1] = agg.to_numpy(np.int64)
    base = np.cumsum(totals)[:-1]  # exclusive scan: base[b] = tokens before range b

    def _spans(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "chunk_id": pd.Series([], dtype=np.int64),
            id_col: pd.Series([], dtype=np.int64),
            "tok_start": pd.Series([], dtype=np.int64),
            "tok_end": pd.Series([], dtype=np.int64),
            "chunk_off": pd.Series([], dtype=np.int64)})
        if df.empty:
            return empty
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy(np.int64)
        cnt = df["cnt"].to_numpy(np.int64)
        b = int(df["_bucket"].iloc[0])
        off = base[b] + np.concatenate(([0], np.cumsum(cnt)[:-1]))
        first = off // L
        last = (off + cnt - 1) // L
        k = (last - first + 1).astype(np.int64)
        total = int(k.sum())
        if total == 0:
            return empty
        seg = np.repeat(np.arange(len(ids)), k)
        koff = np.concatenate(([0], np.cumsum(k)))
        chunk = first[seg] + (np.arange(total) - np.repeat(koff[:-1], k))
        o = off[seg]
        c = cnt[seg]
        tok_start = np.maximum(0, chunk * L - o)
        tok_end = np.minimum(c, (chunk + 1) * L - o)
        return pd.DataFrame({
            "chunk_id": chunk, id_col: ids[seg],
            "tok_start": tok_start, "tok_end": tok_end,
            "chunk_off": np.maximum(0, o - chunk * L)})

    return counts.groupby("_bucket").map_groups(_spans, batch_format="pandas")
