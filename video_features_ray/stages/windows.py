"""Stateless windowing stage — the heart of the engine.

Turns a batch of sequences ``(doc_id, tokens: list<int32>, n_tok, source)``
into one row per emitted window, fully vectorized over the whole Arrow
batch (no Python loop over rows; token buffers are gathered with one
fancy index on the flat list values).

Reference semantics implemented (see ``specs.py`` for citations):

- W7 resample-then-window ordering: fps / total resample happens before
  window formation (reference ``models/i3d/extract_i3d.py:79-80``).
- W1 ``form_slices``: windows ``[j*step, j*step+stack)``, count
  ``(n-stack)//step+1``, ragged tail dropped (``utils/utils.py:62-71``).
- W2 streaming stack: stack+1 tokens consumed per emission (flow
  lookahead), count ``(n-stack-1)//step+1``, retention ``stack[step:]``
  (``models/i3d/extract_i3d.py:112-124``). ``window_tokens`` holds the
  full stack+1 span the reference holds at inference time
  (``extract_i3d.py:115-117``): the rgb stream reads ``[:-1]``, the flow
  stream reads consecutive pairs.
- framewise: one row per token, ts = pos/fps*1000
  (``utils/io.py:132``, ``base_framewise_extractor.py:67-79``).
- flow (lag-1): n-1 rows, window = ``(x[i], x[i+1])``
  (``base_flow_extractor.py:104-115``).
- vggish two-level: inner frames ``inner_win/inner_hop`` over samples,
  outer tumbling ``stack/step`` over inner frames, tails dropped at
  both levels (``mel_features.py:21-45``, ``vggish_input.py:52-67``).
  ``window_tokens`` holds the per-inner-frame token sums (int32; the
  deterministic stand-in for the log-mel reduce).
- W6 end-of-window timestamps everywhere: a row stamped t only ever
  read events with ts <= t (w2 stamps the capture position after the
  completing frame, matching ``CAP_PROP_POS_MSEC`` at
  ``extract_i3d.py:124``).

Scale notes: this stage is embarrassingly parallel (per-row), so it runs
as plain ``map_batches`` tasks — no shuffle, no actor state. Window
emission multiplies data by up to ``stack/step``; the gather writes a
fresh flat buffer per batch, so keep ``batch_size`` modest for large
``stack`` (the pipeline sets it from the spec).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..specs import EncoderSpec, VOCAB_SIZE


def _vggish_n_inner(m: np.ndarray, spec: "EncoderSpec") -> np.ndarray:
    """Inner-frame count per row for the vggish two-level framing — ONE
    definition shared by window_counts and the slide gather (a drift
    between the two would mis-offset every gathered row)."""
    n_inner = np.maximum((m - spec.inner_win) // spec.inner_hop + 1, 0)
    return np.where(m >= spec.inner_win, n_inner, 0)


def _list_to_flat(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """list<int32> column → (flat int32 values, int64 row offsets), zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_list(col.type):
        col = col.cast(pa.list_(col.type.value_type))
    # normalize a sliced array so offsets start at the values we see
    col = col.slice(0)
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    # account for a non-zero starting offset (sliced parent buffers)
    start = offsets[0]
    if start != 0:
        offsets = offsets - start
        values = values[start:]
    return values, offsets


def resample_indices(
    n: np.ndarray, spec: EncoderSpec
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row resample (S5 fps / S6 total) → (m per row, local src idx, eff fps).

    fps resample models the reference's ffmpeg re-encode as deterministic
    nearest-frame sampling: new frame k reads original frame
    ``floor(k * base_fps / new_fps)``; ``m = ceil(n * new_fps / base_fps)``.
    total=N resample picks exactly N evenly-strided frames
    ``floor(k * n / N)`` with effective fps ``N * base_fps / n``
    (reference ``utils/io.py:83-89``).

    Returns m (int64[rows]), flat local source indices (int64[sum m]),
    and effective fps per row (float64[rows]).
    """
    n = n.astype(np.int64)
    if spec.resample_fps is not None:
        rate = spec.resample_fps / spec.base_fps
        m = np.ceil(n * rate).astype(np.int64)
        eff_fps = np.full(len(n), spec.resample_fps, dtype=np.float64)
    elif spec.resample_total is not None:
        m = np.where(n > 0, np.int64(spec.resample_total), np.int64(0))
        with np.errstate(divide="ignore", invalid="ignore"):
            eff_fps = np.where(n > 0, spec.resample_total * spec.base_fps / n, spec.base_fps)
    else:
        m = n
        eff_fps = np.full(len(n), spec.base_fps, dtype=np.float64)

    total = int(m.sum())
    row_of = np.repeat(np.arange(len(n), dtype=np.int64), m)
    out_off = np.concatenate(([0], np.cumsum(m)))
    local_k = np.arange(total, dtype=np.int64) - out_off[row_of]
    if spec.resample_fps is not None:
        src = np.floor(local_k * (spec.base_fps / spec.resample_fps)).astype(np.int64)
        src = np.minimum(src, np.maximum(n[row_of] - 1, 0))
    elif spec.resample_total is not None:
        src = (local_k * n[row_of]) // spec.resample_total
    else:
        src = local_k
    return m, src, eff_fps


def window_counts(m: np.ndarray, spec: EncoderSpec) -> np.ndarray:
    """Emitted windows per row for a (resampled) length vector m."""
    m = m.astype(np.int64)
    if spec.kind == "w1":
        c = (m - spec.stack) // spec.step + 1
    elif spec.kind == "w2":
        c = (m - spec.stack - 1) // spec.effective_step + 1
    elif spec.kind == "framewise":
        c = m.copy()
    elif spec.kind == "flow":
        c = m - 1
    elif spec.kind == "vggish":
        n_inner = _vggish_n_inner(m, spec)
        c = (n_inner - spec.stack) // spec.step + 1
    else:  # pragma: no cover
        raise ValueError(spec.kind)
    return np.maximum(c, 0)


def window_timestamps_ms(starts: np.ndarray, eff_fps: np.ndarray, spec: EncoderSpec) -> np.ndarray:
    """End-of-window timestamps (W6) for local window starts."""
    if spec.kind == "w1":
        last = starts + spec.stack - 1
    elif spec.kind == "w2":
        # CAP_PROP_POS_MSEC after the completing frame (extract_i3d.py:124)
        last = starts + spec.stack + 1
    elif spec.kind == "framewise":
        last = starts
    elif spec.kind == "flow":
        last = starts + 1
    elif spec.kind == "vggish":
        last = starts * spec.inner_hop + (spec.stack - 1) * spec.inner_hop + spec.inner_win - 1
    else:  # pragma: no cover
        raise ValueError(spec.kind)
    return last / eff_fps * 1000.0


def slide_windows(batch: pa.Table, spec: EncoderSpec) -> pa.Table:
    """Vectorized window explosion for one Arrow batch of sequences.

    Output schema: ``doc_id: string, spec: string, window_id: int32,
    ts_ms: float64, window_tokens: list<int32>, n_in_window: int32,
    fps: float64``.
    """
    doc_id = batch["doc_id"]
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    values, offsets = _list_to_flat(batch["tokens"])
    n = np.diff(offsets)

    m, src_local, eff_fps = resample_indices(n, spec)

    # materialize the resampled flat stream only when resampling happens
    if spec.resample_fps is None and spec.resample_total is None:
        res_values = values
        res_off = offsets
    else:
        row_of_src = np.repeat(np.arange(len(n), dtype=np.int64), m)
        res_values = values[offsets[:-1][row_of_src] + src_local]
        res_off = np.concatenate(([0], np.cumsum(m)))

    counts = window_counts(m, spec)
    total_w = int(counts.sum())
    out_fields = [
        ("doc_id", pa.string()),
        ("spec", pa.string()),
        ("window_id", pa.int32()),
        ("ts_ms", pa.float64()),
        ("window_tokens", pa.list_(pa.int32())),
        ("n_in_window", pa.int32()),
        ("fps", pa.float64()),
    ]
    if total_w == 0:
        return pa.table(
            {name: pa.array([], type=t) for name, t in out_fields}
        )

    row_of_w = np.repeat(np.arange(len(n), dtype=np.int64), counts)
    w_off = np.concatenate(([0], np.cumsum(counts)))
    wid = (np.arange(total_w, dtype=np.int64) - w_off[row_of_w])  # per-row window index
    starts = wid * spec.effective_step

    if spec.kind == "vggish":
        # level 1: inner frame sums (the deterministic log-mel stand-in)
        n_inner = _vggish_n_inner(m, spec)
        total_inner = int(n_inner.sum())
        row_of_i = np.repeat(np.arange(len(n), dtype=np.int64), n_inner)
        i_off = np.concatenate(([0], np.cumsum(n_inner)))
        iid = np.arange(total_inner, dtype=np.int64) - i_off[row_of_i]
        gidx = (res_off[:-1][row_of_i] + iid * spec.inner_hop)[:, None] + np.arange(spec.inner_win, dtype=np.int64)[None, :]
        inner = res_values[gidx].astype(np.int64).sum(axis=1).astype(np.int32)
        # level 2: tumbling windows over inner frames
        widx = (i_off[:-1][row_of_w] + starts)[:, None] + np.arange(spec.stack, dtype=np.int64)[None, :]
        win_mat = inner[widx]
        win_len = spec.stack
    else:
        win_len = spec.window_len
        gidx = (res_off[:-1][row_of_w] + starts)[:, None] + np.arange(win_len, dtype=np.int64)[None, :]
        win_mat = res_values[gidx]

    ts = window_timestamps_ms(starts, eff_fps[row_of_w], spec)

    flat = np.ascontiguousarray(win_mat, dtype=np.int32).reshape(-1)
    win_offsets = np.arange(0, (total_w + 1) * win_len, win_len, dtype=np.int32)
    window_tokens = pa.ListArray.from_arrays(pa.array(win_offsets, type=pa.int32()), pa.array(flat, type=pa.int32()))

    return pa.table(
        {
            "doc_id": doc_id.take(pa.array(row_of_w)),
            "spec": pa.array(np.full(total_w, spec.name), type=pa.string()),
            "window_id": pa.array(wid.astype(np.int32), type=pa.int32()),
            "ts_ms": pa.array(ts, type=pa.float64()),
            "window_tokens": window_tokens,
            "n_in_window": pa.array(np.full(total_w, win_len, dtype=np.int32), type=pa.int32()),
            "fps": pa.array(eff_fps[row_of_w], type=pa.float64()),
        }
    )


def make_window_stage(spec: EncoderSpec):
    """Bind a spec → a map_batches-ready function (stateless task)."""

    def _stage(batch: pa.Table) -> pa.Table:
        return slide_windows(batch, spec)

    _stage.__name__ = f"slide_windows_{spec.name}"
    return _stage
