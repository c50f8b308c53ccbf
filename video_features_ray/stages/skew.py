"""Skew handling: salted repartition + giant-sequence chunking with halo.

The reference serializes per video — a long clip blocks its worker with
no recourse (SURVEY §4 "Skew / stragglers"). Two engine-side remedies:

- ``salt_repartition``      — spread a hot ``source``/key across
  ``n_salt`` sub-partitions by appending a deterministic per-row salt
  before a repartition/groupby, so one hot key no longer lands in one
  task.
- ``split_giant_sequences`` — cut any sequence longer than
  ``max_tokens`` into independent chunks whose boundaries fall on
  multiples of ``spec.step`` and which carry ``window_len - step`` halo
  tokens, so EVERY window of the original sequence is produced by
  exactly one chunk with globally-correct ``window_id`` and ``ts_ms``
  (the ``pos_offset`` column shifts the window enumeration). This keeps
  block sizes bounded (no straggler task for a 10M-token doc) without
  changing a single output row.

Correctness argument for the chunking: with chunk start ``s`` a multiple
of ``step``, windows of the original doc starting in ``[s, s+body)``
are exactly the windows the chunk emits locally (local start + s), and
the halo guarantees the last of them sees its full ``window_len``
tokens. Global ``window_id = (s + local_start)/step`` and ts are
reconstructed from ``pos_offset = s``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..specs import EncoderSpec
from .events import stable_bucket
# Module-level (not function-level) on purpose: ``windows_with_offset``
# executes on WORKERS. A function-level relative import would re-import
# the package at call time on the worker, which fails when the driver
# made the package importable only after ray.init (cloudpickle by-value
# registration ships code, but a live ``from .windows import ...`` in a
# worker frame still needs sys.path). Module-level names are pickled
# with the function's globals instead.
from .windows import (
    _list_to_flat,
    resample_indices,
    slide_windows,
    window_counts,
    window_timestamps_ms,
)


def salt_repartition(ds: "ray.data.Dataset", key: str, n_salt: int = 16,
                     num_blocks: int | None = None) -> "ray.data.Dataset":
    """Append `_salt` = hash(key, row) % n_salt and shuffle-repartition."""

    def _salt(batch: pa.Table) -> pa.Table:
        k = stable_bucket(batch[key].to_numpy(zero_copy_only=False), 1 << 30)
        r = np.arange(len(batch), dtype=np.uint64)
        s = ((k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) + r) % np.uint64(n_salt)
        return batch.append_column("_salt", pa.array(s.astype(np.int32)))

    out = ds.map_batches(_salt, batch_format="pyarrow", zero_copy_batch=True)
    if num_blocks:
        out = out.repartition(num_blocks, shuffle=True)
    return out


def split_giant_sequences(
    ds: "ray.data.Dataset", spec: EncoderSpec, max_tokens: int = 1 << 20
) -> "ray.data.Dataset":
    """Chunk rows with n_tok > max_tokens; adds ``pos_offset`` (0 for
    unsplit rows). Only valid for specs WITHOUT resampling (W7 resample
    reindexes positions globally — resample first, then split)."""
    if spec.resample_fps is not None or spec.resample_total is not None:
        raise ValueError("split_giant_sequences requires resample to be applied first")
    # raw-token units: for vggish windows stride step*inner_hop samples and
    # span (stack-1)*inner_hop+inner_win — the outer-window count over a
    # chunk equals the w1 count over these units, so the same chunk math holds
    step = spec.chunk_step_units
    halo = spec.chunk_window_units - step
    if halo < 0:
        halo = 0
    body = max((max_tokens - halo) // step * step, step)

    def _split(batch: pa.Table) -> pa.Table:
        values, offsets = _flat(batch["tokens"])
        n = np.diff(offsets)
        n_rows = len(batch)
        src = (batch["source"] if "source" in batch.column_names
               else pa.array([""] * n_rows, pa.string()))
        giant = n > max_tokens
        if not giant.any():
            # fast path (the overwhelmingly common batch): rows pass
            # through UNTOUCHED — zero token copies, no per-row Python
            return pa.table({
                "doc_id": batch["doc_id"].cast(pa.string()),
                "tokens": batch["tokens"],
                "n_tok": pa.array(n.astype(np.int32)),
                "source": src,
                "pos_offset": pa.array(np.zeros(n_rows, np.int64)),
            })
        # vectorized, order-preserving chunking: k chunks per row
        # (k=1 for non-giant), starts at multiples of `body`, each chunk
        # carrying `halo` extra tokens — one flat gather for the batch
        k = np.where(giant, np.maximum(-(-(n - halo) // body), 1), 1).astype(np.int64)
        total = int(k.sum())
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), k)
        local = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
        starts = local * body
        # giant rows: chunk spans capped at body+halo. NON-giant rows in
        # this mixed batch (k=1, start=0) must pass through WHOLE — the
        # cap would silently truncate any n in (body+halo, max_tokens],
        # which exists whenever (max_tokens - halo) isn't a step multiple
        ends = np.where(giant[row_of],
                        np.minimum(starts + body + halo, n[row_of]),
                        n[row_of])
        out_lens = ends - starts
        tok_total = int(out_lens.sum())
        t_row = np.repeat(np.arange(total, dtype=np.int64), out_lens)
        t_local = np.arange(tok_total, dtype=np.int64) - np.repeat(
            np.cumsum(out_lens) - out_lens, out_lens)
        flat = values[offsets[:-1][row_of][t_row] + starts[t_row] + t_local]
        offs = np.concatenate(([0], np.cumsum(out_lens)))
        tokens = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int64()).cast(pa.int32()),
            pa.array(flat.astype(np.int32, copy=False), type=pa.int32()))
        take = pa.array(row_of)
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(take).cast(pa.string()),
                "tokens": tokens,
                "n_tok": pa.array(out_lens.astype(np.int32)),
                "source": src.take(take),
                "pos_offset": pa.array(starts.astype(np.int64)),
            }
        )

    return ds.map_batches(_split, batch_format="pyarrow", zero_copy_batch=True)


# shared extraction (sliced-offset normalization lives ONCE in
# windows.py); MODULE-level import — a function-level relative import
# inside a by-value-pickled worker kernel cannot resolve the package
# on a hostile driver's workers (tests/test_hostile_driver.py)
_flat = _list_to_flat


def windows_with_offset(batch: pa.Table, spec: EncoderSpec) -> pa.Table:
    """slide_windows over chunked rows: window_id/ts shifted by pos_offset,
    then chunk-local tail windows that would duplicate the next chunk's
    (none, by construction) or exceed the doc (cut by the chunk end) are
    naturally absent. Expects ``pos_offset`` column (int64)."""
    has_off = "pos_offset" in batch.column_names
    off = (batch["pos_offset"].to_numpy(zero_copy_only=False)
           if has_off else np.zeros(len(batch), dtype=np.int64))
    core = batch.drop_columns(["pos_offset"]) if has_off else batch
    w = slide_windows(core, spec)
    if len(w) == 0:
        return w
    # map each window row back to its input row to apply the offset
    counts = np.zeros(len(batch), dtype=np.int64)
    # recompute counts the same way slide_windows did
    n = np.diff(_flat(core["tokens"])[1])
    m, _, eff = resample_indices(n, spec)
    counts = window_counts(m, spec)
    row_of_w = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    shift = off[row_of_w]
    # pos_offset is in raw-token units; chunk starts are multiples of
    # chunk_step_units, so the global outer-window shift divides exactly
    wid = w["window_id"].to_numpy(zero_copy_only=False).astype(np.int64) + shift // spec.chunk_step_units
    # recompute ts from the GLOBAL window start so it is bit-identical to
    # the unsplit pipeline (adding a shifted ts would differ in the last ulp)
    ts = window_timestamps_ms(wid * spec.effective_step, eff[row_of_w], spec)
    w = w.set_column(w.schema.get_field_index("window_id"),
                     "window_id", pa.array(wid.astype(np.int32)))
    w = w.set_column(w.schema.get_field_index("ts_ms"), "ts_ms", pa.array(ts))
    return w


def make_offset_window_stage(spec: EncoderSpec):
    def _stage(batch: pa.Table) -> pa.Table:
        return windows_with_offset(batch, spec)

    _stage.__name__ = f"windows_offset_{spec.name}"
    return _stage


def detect_hot_keys(
    ds: "ray.data.Dataset",
    key: str,
    threshold_frac: float = 0.01,
    per_batch_top: int = 256,
    total_rows: int | None = None,
) -> list:
    """Keys carrying more than ``threshold_frac`` of all rows — the
    candidates worth salting in ``hash_join(salt_hot=...)``.

    One map pass: each batch emits its ``per_batch_top`` most frequent
    keys with counts plus its row count (skinny partials); the driver
    sums and thresholds O(top x blocks) rows.  A key above
    ``threshold_frac`` of the WHOLE input is above it in enough batches
    to make the per-batch top list wherever it matters, so data-sized
    hot keys are never missed; borderline keys straddling the threshold
    may be, which only costs them the salting optimization, never
    correctness.  ``total_rows`` skips the denominator estimate when
    the caller already knows it (e.g. parquet footer row counts).
    """
    import pandas as pd

    def _partial(df: "pd.DataFrame") -> "pd.DataFrame":
        vc = df[key].value_counts().head(per_batch_top)
        out = pd.DataFrame({key: vc.index, "_cnt": vc.to_numpy()})
        out["_rows"] = 0
        # one carrier row per batch holds the batch row count, so the
        # driver can reconstruct the true denominator without a second
        # pass (top-list counts alone undercount the total). A batch of
        # all-NULL keys has an EMPTY top list but still contributes rows
        # — dropping its carrier would shrink the denominator and
        # over-flag borderline keys as hot.
        if len(out):
            out.iloc[0, out.columns.get_loc("_rows")] = len(df)
        elif len(df):
            out = pd.DataFrame({key: [None], "_cnt": [0], "_rows": [len(df)]})
        return out

    parts = ds.map_batches(_partial, batch_format="pandas").to_pandas()
    if parts.empty:
        return []
    total = total_rows if total_rows is not None else int(parts["_rows"].sum())
    counts = parts.groupby(key, sort=False)["_cnt"].sum()
    return sorted(counts[counts >= threshold_frac * max(total, 1)].index.tolist())
