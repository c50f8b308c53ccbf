"""T5-style span corruption over token sequences.

The denoising-objective data transform (Raffel et al., JMLR'20 §3.1.4
"span corruption"): contiguous token spans are replaced by one
sentinel each in the encoder input, and the decoder target is the
sequence of (sentinel, original span tokens) pairs.  Masking is
DETERMINISTIC — a Knuth multiplicative hash of (doc_id, span index)
decides each fixed-length span — so reruns, resumes and different
block layouts produce byte-identical examples (the engine's standard
reproducibility discipline; no RNG state rides along).

Per-row invariant (pinned in tests/test_corruption.py): interleaving
input and target back together reproduces the original token array
EXACTLY — the op is lossless, like the reference's window transforms
are (`SURVEY.md` §2.3 token-array equality).

Stateless vectorized map over the Arrow list column: one flat int32
buffer per batch, span decisions computed for all rows at once; no
shuffle, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

KNUTH = np.uint64(2654435761)
SENTINEL_BASE = np.int32(-100)  # sentinel k encodes as -100 - k


def corrupt_spans(
    batch: pa.Table,
    span_len: int = 3,
    mask_every: int = 5,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> pd.DataFrame:
    """Mask every span whose hash lands on 0 mod ``mask_every``.

    Span b of doc d (tokens [b·L, (b+1)·L), ragged tail included) is
    masked iff ``((d·KNUTH + b) mod 2^64) mod mask_every == 0``.
    Returns (doc_id, n_tok, n_masked, n_spans, input_tokens,
    target_tokens); sentinel k (k-th masked span of the doc, 0-based)
    encodes as −100−k in BOTH streams.
    """
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    la = batch[tokens_col].combine_chunks()
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    lens = la.value_lengths().to_numpy(zero_copy_only=False).astype(
        np.int64)
    off = np.concatenate(([0], np.cumsum(lens)))
    n = int(off[-1])
    if n == 0:
        return pd.DataFrame({
            id_col: ids, "n_tok": lens,
            "n_masked": np.zeros(len(ids), np.int64),
            "n_spans": np.zeros(len(ids), np.int64),
            "input_tokens": [[] for _ in ids],
            "target_tokens": [[] for _ in ids]})
    row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    pos = np.arange(n, dtype=np.int64) - np.repeat(off[:-1], lens)
    span = pos // span_len
    h = (ids[row].astype(np.uint64) * KNUTH
         + span.astype(np.uint64)) % np.uint64(mask_every)
    masked = h == 0
    # span index within the doc among MASKED spans: rank of this
    # span's first token among masked span starts
    first_of_span = (pos % span_len == 0) | (pos == 0)
    span_start = masked & first_of_span
    k = np.cumsum(span_start) - 1                       # global rank
    doc_first = np.concatenate(([True], row[1:] != row[:-1]))
    # per-doc base: rank just before the doc starts
    base = np.maximum.accumulate(
        np.where(doc_first, np.cumsum(span_start) - span_start, 0))
    sent_k = (k - base).astype(np.int64)               # 0-based per doc
    sentinel = (SENTINEL_BASE - sent_k).astype(np.int32)

    inp_keep = ~masked | span_start       # masked span → one sentinel
    inp = np.where(masked, sentinel, flat)[inp_keep]
    inp_row = row[inp_keep]
    tgt_keep = masked
    # target stream: sentinel BEFORE each span's tokens — emit the
    # sentinel via duplicating span starts
    ts_idx = np.flatnonzero(span_start)
    tok_idx = np.flatnonzero(tgt_keep)
    merged = np.concatenate([ts_idx * 2, tok_idx * 2 + 1])
    orderm = np.argsort(merged, kind="stable")
    merged = merged[orderm]
    src_idx = merged // 2
    is_sent = (merged % 2) == 0
    tgt = np.where(is_sent, sentinel[src_idx], flat[src_idx])
    tgt_row = row[src_idx]

    def _split(values: np.ndarray, rows: np.ndarray) -> list:
        counts = np.bincount(rows, minlength=len(ids))
        ends = np.cumsum(counts)
        return [values[s:e].tolist()
                for s, e in zip(np.concatenate(([0], ends[:-1])), ends)]

    n_masked = np.bincount(row[masked], minlength=len(ids)).astype(
        np.int64)
    n_spans = np.bincount(row[span_start], minlength=len(ids)).astype(
        np.int64)
    return pd.DataFrame({
        id_col: ids, "n_tok": lens, "n_masked": n_masked,
        "n_spans": n_spans,
        "input_tokens": _split(inp.astype(np.int32), inp_row),
        "target_tokens": _split(tgt.astype(np.int32), tgt_row)})


def reconstruct(input_tokens, target_tokens) -> list:
    """Invert span corruption for one row (test helper): splice each
    sentinel's span from the target stream back into the input."""
    spans = {}
    cur = None
    for t in target_tokens:
        if t <= int(SENTINEL_BASE):
            cur = t
            spans[cur] = []
        else:
            spans[cur].append(t)
    out = []
    for t in input_tokens:
        if t <= int(SENTINEL_BASE):
            out.extend(spans[t])
        else:
            out.append(t)
    return out
