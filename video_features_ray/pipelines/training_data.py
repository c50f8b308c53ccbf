"""Composed training-data pipeline — the full replacement story.

A reference user runs: manifest → (skip existing) → per-clip windowed
extraction → per-entity files. A training-data user at 100 TB needs the
same spine plus data hygiene. This module wires the engine's operators
into that one pipeline:

    documents parquet
      → validate (unique ids)                     [M20/G6]
      → exact-dedup filter (keep min-id winner)   [§2.8]
      → quality filter (length/punct bounds)      [text ops]
      → tokenize (codepoints or BPE)              [S3/M13]
      → giant-doc chunking with halo              [skew]
      → slide windows (spec geometry)             [W1/W2/…]
      → encoder actor pool                        [A1/A2]
      → checkpointed partitioned parquet          [J4/M21 resume]

Everything stays lazy inside one partition run; the checkpoint layer
provides partition-level commit + resume (``wave_size`` partitions in
flight). Only skinny columns shuffle (the dedup hash groupby);
payloads never do.

Dedup scale shape: winner ids come from the BUCKETED ``exact_dedup``
(distributed partial+combine over content hashes); the driver holds
only object-store block refs, never a materialized id set. Each filter
actor assembles its sorted winner array once in ``__init__`` from those
refs (the classic broadcast side: valid while distinct-doc ids fit a
worker heap — at 10^12 unique docs switch to routing the doc payload
through the dedup shuffle itself instead of broadcasting winners).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.sequences import _codepoints_batch, tokenize_documents
from ..specs import EncoderSpec
from ..stages.dedup import exact_dedup
from ..stages.encode import Encoder
from ..stages.skew import make_offset_window_stage, split_giant_sequences
from ..stages.text import _PUNCT_CP, _per_row
from ..stages.windows import make_window_stage


@dataclass
class TrainingDataConfig:
    spec: EncoderSpec
    min_chars: int = 10
    max_punct_ratio: float = 0.5
    dedup: bool = True
    near_dedup: bool = False           # MinHash→verify→cluster loser filter
    near_dedup_threshold: float = 0.8
    max_tokens_per_chunk: int = 1 << 20
    encoder_concurrency: Optional[int] = None
    wave_size: int = 2


def _quality_filter(batch: pa.Table, min_chars: int, max_punct_ratio: float) -> pa.Table:
    """Vectorized length/punct-ratio gate (one codepoint pass per batch)."""
    flat, offsets = _codepoints_batch(batch["text"])
    n_chars = np.diff(offsets)
    n_punct = _per_row(np.isin(flat, _PUNCT_CP), offsets)
    keep = (n_chars >= min_chars) & (
        n_punct / np.maximum(n_chars, 1) <= max_punct_ratio
    )
    return batch.filter(pa.array(keep))


def _winner_block_refs(docs: "ray.data.Dataset") -> list:
    """Distributed winner computation: bucketed exact_dedup → the
    ``keep_id`` column as Arrow block refs IN THE OBJECT STORE. The
    driver never materializes the winner set (round 1 pulled one row
    per document through ``to_pandas()`` — a driver OOM at scale)."""
    winners = exact_dedup(docs, id_col="doc_id", text_col="text")
    ids = winners.map_batches(lambda df: df[["keep_id"]], batch_format="pandas")
    return list(ids.to_arrow_refs())


class _WinnerFilter:
    """Actor-pool filter: assemble the sorted winner-id array once per
    actor from object-store refs, then filter batches with one
    vectorized ``isin`` (searchsorted under the hood)."""

    def __init__(self, refs: list):
        tabs = ray.get(list(refs))
        arrs = [t.column("keep_id").to_numpy(zero_copy_only=False) for t in tabs if len(t)]
        self.winners = np.sort(np.concatenate(arrs)) if arrs else np.array([], np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, self.winners)))


class _LoserFilter:
    """Actor-pool ANTI-filter: assemble the sorted loser-id array once
    per actor from object-store block refs (the ``_WinnerFilter``
    pattern), then drop losers per batch with one vectorized ``isin``.
    doc_id is string-typed here (the near-dup family keys on strings)."""

    def __init__(self, refs: list):
        tabs = ray.get(list(refs))
        ids = [t.column("doc_id").to_numpy(zero_copy_only=False)
               for t in tabs if len(t)]
        self.losers = (np.sort(np.concatenate(ids).astype(str))
                       if ids else np.array([], dtype=str))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].cast(pa.string()).to_pylist(), dtype=str)
        return batch.filter(pa.array(~np.isin(ids, self.losers)))


def run_training_data_pipeline(
    input_files: list[str],
    out_dir: str,
    cfg: TrainingDataConfig,
    target_rows: int = 250_000,
) -> dict:
    """Checkpointed end-to-end run. Returns the checkpoint summary."""
    from ..state.checkpoint import Manifest, plan_partitions, run_checkpointed

    # skip the expensive dedup side-inputs entirely when every
    # partition is already committed — a pure resume used to pay the
    # whole-corpus hash shuffle + MinHash/verify/clustering first
    parts = plan_partitions(input_files, target_rows)
    done = Manifest(out_dir).committed() if os.path.isdir(out_dir) else {}
    pending = [p for p in parts if p.partition_id not in done]

    winner_refs = None
    neardup_losers_ref = None

    def _quality_docs():
        # winners/losers are chosen among QUALITY SURVIVORS: picking a
        # winner that quality later rejects would delete the whole
        # cluster's content even when another member passed
        d = ray.data.read_parquet(input_files, columns=["doc_id", "text"])
        return d.map_batches(
            lambda b: _quality_filter(b, cfg.min_chars, cfg.max_punct_ratio),
            batch_format="pyarrow", zero_copy_batch=True)

    if cfg.dedup and pending:
        winner_refs = _winner_block_refs(_quality_docs())
    if cfg.near_dedup and pending:
        from ..stages.dedup import neardup_dedup

        docs = _quality_docs().map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.string()),
                                "text": b["text"]}),
            batch_format="pyarrow")
        losers = neardup_dedup(docs, threshold=cfg.near_dedup_threshold)
        # loser ids stay as object-store block refs (like the winner
        # side) — the driver never materializes the set (round-2's
        # frozenset broadcast was O(near-dups) driver memory)
        neardup_losers_ref = list(
            losers.map_batches(lambda df: df[["doc_id"]], batch_format="pandas")
            .to_arrow_refs())

    spec = cfg.spec
    if cfg.encoder_concurrency is None:
        total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        enc_conc = max(1, min(total - 1, (total * 3) // 4))
    else:
        enc_conc = cfg.encoder_concurrency

    def _pipe(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        ds = ds.map_batches(
            lambda b: _quality_filter(b, cfg.min_chars, cfg.max_punct_ratio),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        if winner_refs is not None:
            ds = ds.map_batches(
                _WinnerFilter, fn_constructor_args=(winner_refs,),
                batch_format="pyarrow", concurrency=(1, 2),
            )
        if neardup_losers_ref is not None:
            ds = ds.map_batches(
                _LoserFilter, fn_constructor_args=(neardup_losers_ref,),
                batch_format="pyarrow", concurrency=(1, 2),
            )
        seqs = ds.map_batches(tokenize_documents, batch_format="pyarrow")
        if spec.resample_fps is None and spec.resample_total is None:
            seqs = split_giant_sequences(seqs, spec, max_tokens=cfg.max_tokens_per_chunk)
            windows = seqs.map_batches(make_offset_window_stage(spec), batch_format="pyarrow")
        else:
            windows = seqs.map_batches(make_window_stage(spec), batch_format="pyarrow")
        return windows.map_batches(
            Encoder, fn_constructor_args=(spec,), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=4096, concurrency=(1, enc_conc),
        )

    return run_checkpointed(input_files, _pipe, out_dir, target_rows=target_rows,
                            wave_size=cfg.wave_size)
