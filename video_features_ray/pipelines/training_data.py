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
provides partition-level commit + resume. Only skinny columns shuffle
(the dedup hash groupby); payloads never do.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.sequences import tokenize_documents
from ..specs import EncoderSpec
from ..stages.dedup import _md5_hex
from ..stages.encode import Encoder
from ..stages.skew import make_offset_window_stage, split_giant_sequences
from ..stages.windows import make_window_stage


@dataclass
class TrainingDataConfig:
    spec: EncoderSpec
    min_chars: int = 10
    max_punct_ratio: float = 0.5
    dedup: bool = True
    max_tokens_per_chunk: int = 1 << 20
    encoder_concurrency: Optional[int] = None


def _quality_filter(batch: pa.Table, min_chars: int, max_punct_ratio: float) -> pa.Table:
    texts = batch["text"].to_pylist()
    keep = np.ones(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        t = t or ""
        if len(t) < min_chars:
            keep[i] = False
            continue
        n_punct = sum(c in ".!?,;:" for c in t)
        if n_punct / max(len(t), 1) > max_punct_ratio:
            keep[i] = False
    return batch.filter(pa.array(keep))


def _dedup_winners(docs: "ray.data.Dataset") -> frozenset:
    """Winner id per content hash (min doc_id), broadcast-sized: one
    short row per distinct hash leaves the cluster."""
    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = _md5_hex(batch["text"].to_pylist())
        return pa.table({"doc_id": pa.array([str(i) for i in ids]), "h": pa.array(hs)})

    import pandas as pd

    pdf = docs.map_batches(_partial, batch_format="pyarrow").to_pandas()
    winners = pdf.sort_values(["h", "doc_id"]).groupby("h", sort=False).head(1)
    return frozenset(winners["doc_id"])


def run_training_data_pipeline(
    input_files: list[str],
    out_dir: str,
    cfg: TrainingDataConfig,
    target_rows: int = 250_000,
) -> dict:
    """Checkpointed end-to-end run. Returns the checkpoint summary."""
    from ..state.checkpoint import run_checkpointed

    winners_ref = None
    if cfg.dedup:
        docs = ray.data.read_parquet(input_files, columns=["doc_id", "text"])
        winners_ref = ray.put(_dedup_winners(docs))

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
        if winners_ref is not None:
            def _keep_winners(batch: pa.Table) -> pa.Table:
                winners = ray.get(winners_ref)
                ids = [str(i) for i in batch["doc_id"].to_pylist()]
                return batch.filter(pa.array([i in winners for i in ids]))

            ds = ds.map_batches(_keep_winners, batch_format="pyarrow")
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

    return run_checkpointed(input_files, _pipe, out_dir, target_rows=target_rows)
