"""Deterministic encoder stage — stateful actor pool over Arrow batches.

The GPU nets of the reference (I3D/S3D/R21D/CLIP/ResNet/timm/VGGish —
loaded once per process at extractor init, ``extract_i3d.py:171-209``)
are replaced by a deterministic seeded random projection so correctness
is machine-checkable without GPUs (same role as the reference's golden
fixtures, ``tests/utils.py:36-48``). The expensive-to-build state (the
projection matrix) is constructed ONCE per actor in ``__init__`` and
applied per batch in ``__call__`` — the Ray-native version of the
reference's per-process model load.

Encoding rule (pinned by the oracle in ``oracle.py`` and the pytest
fixtures):

- normalize: ``x = tokens/VOCAB_SIZE * 2 - 1`` (float32), except vggish
  where window_tokens are inner-frame sums, normalized by
  ``inner_win * VOCAB_SIZE``.
- w1 / framewise / vggish: ``feature = x @ R`` with
  ``R = rng(seed).standard_normal((rows, D)).float32 / sqrt(rows)``.
- w2: ``feature = x[:stack] @ R_rgb`` (rgb stream, the reference's
  ``rgb_stack[:-1]``, ``extract_i3d.py:153-156``) and
  ``feature_flow = diff(x) @ R_flow`` (lag-1 pairs over the stack+1
  span — the flow stream).
- flow: ``feature = (x[1]-x[0]) * R[0]``.

Purity: per-row, no cross-batch state → output is invariant to batch
size, block boundaries and actor-pool size (SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..specs import EncoderSpec, VOCAB_SIZE


def projection_matrix(spec: EncoderSpec, stream: str = "rgb") -> np.ndarray:
    """Seeded float32 projection. stream ∈ {rgb, flow} (flow only for w2)."""
    if spec.kind == "vggish":
        rows = spec.stack
    elif spec.kind == "w2":
        rows = spec.stack
    elif spec.kind == "flow":
        rows = 1
    elif spec.kind == "framewise":
        rows = 1
    else:
        rows = spec.stack
    seed = spec.seed if stream == "rgb" else spec.seed ^ 0xF10F
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((rows, spec.dim)) / np.sqrt(rows)).astype(np.float32)


def _normalize(win_mat: np.ndarray, spec: EncoderSpec) -> np.ndarray:
    scale = float(spec.inner_win * VOCAB_SIZE) if spec.kind == "vggish" else float(VOCAB_SIZE)
    return (win_mat.astype(np.float32) / np.float32(scale)) * np.float32(2.0) - np.float32(1.0)


def encode_windows(win_mat: np.ndarray, spec: EncoderSpec, r_rgb: np.ndarray, r_flow=None):
    """(W, win_len) int32 → dict of float32 feature matrices (W, D)."""
    x = _normalize(win_mat, spec)
    out = {}
    if spec.kind == "w2":
        out["feature"] = x[:, : spec.stack] @ r_rgb
        out["feature_flow"] = np.diff(x, axis=1) @ r_flow
    elif spec.kind == "flow":
        d = (x[:, 1] - x[:, 0])[:, None]
        out["feature"] = d @ r_rgb
    else:
        out["feature"] = x @ r_rgb
    return out


def _fixed_list(mat: np.ndarray) -> pa.Array:
    w, d = mat.shape
    flat = np.ascontiguousarray(mat, dtype=np.float32).reshape(-1)
    offsets = np.arange(0, (w + 1) * d, d, dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.float32()))


class Encoder:
    """Callable class for ``map_batches(Encoder, fn_constructor_args=(spec,),
    concurrency=N, batch_size=B)`` — one actor per pool slot, matrix built
    once per actor.

    ``reduce_stats=True`` turns the actor into a combined encode+reduce
    sink: it computes the full feature matrix, then emits ONE row of
    partial aggregates (rows, window tokens, |feature| sum) instead of
    the 4 KB/row feature payload — for throughput benchmarks and
    validation counts where the consumer is an aggregate anyway.
    """

    def __init__(self, spec: EncoderSpec, reduce_stats: bool = False):
        self.spec = spec
        self.reduce_stats = reduce_stats
        self.r_rgb = projection_matrix(spec, "rgb")
        self.r_flow = projection_matrix(spec, "flow") if spec.kind == "w2" else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["window_tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w = len(batch)
        if w == 0:
            cols = dict(zip(batch.column_names, batch.columns))
            cols["feature"] = pa.array([], type=pa.list_(pa.float32()))
            if self.spec.kind == "w2":
                cols["feature_flow"] = pa.array([], type=pa.list_(pa.float32()))
            return pa.table(cols)
        win_len = self.spec.stack if self.spec.kind in ("vggish",) else self.spec.window_len
        flat = col.values.to_numpy(zero_copy_only=False)
        start = col.offsets[0].as_py()
        if start != 0:
            flat = flat[start:]
        win_mat = flat[: w * win_len].reshape(w, win_len)
        feats = encode_windows(win_mat, self.spec, self.r_rgb, self.r_flow)
        if self.reduce_stats:
            return pa.table(
                {
                    "rows": pa.array([w], pa.int64()),
                    "toks": pa.array([int(w) * int(win_len)], pa.int64()),
                    "feat_abs_sum": pa.array(
                        [float(np.abs(feats["feature"]).sum(dtype=np.float64))], pa.float64()
                    ),
                }
            )
        out = batch
        for name, mat in feats.items():
            out = out.append_column(name, _fixed_list(mat))
        return out
