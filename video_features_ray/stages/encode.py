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
import ray

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
            if self.reduce_stats:  # keep the stats schema block-uniform
                return pa.table({"rows": pa.array([], pa.int64()),
                                 "toks": pa.array([], pa.int64()),
                                 "feat_abs_sum": pa.array([], pa.float64())})
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


def _list_col_matrix(col, n_rows: int) -> np.ndarray:
    """Zero-copy-ish (row, dim) float64 view of a fixed-width vector
    column — plain ``list<float>``, ``fixed_size_list``, or Ray's
    tensor-extension array (offset-sliced chunks handled)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        flat = col.values.to_numpy(zero_copy_only=False)
        start = col.offsets[0].as_py()
        if start != 0:
            flat = flat[start:]
        dim = (col.offsets[1].as_py() - col.offsets[0].as_py()) if n_rows else 0
        return flat[: n_rows * dim].reshape(n_rows, dim).astype(np.float64)
    if pa.types.is_fixed_size_list(t):
        dim = t.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        start = col.offset * dim
        return flat[start: start + n_rows * dim].reshape(
            n_rows, dim).astype(np.float64)
    # Ray ArrowTensorArray / other extension: materialize via to_numpy
    x = col.to_numpy(zero_copy_only=False)
    if x.dtype == object:
        x = np.stack(x)
    return np.asarray(x, dtype=np.float64).reshape(n_rows, -1)


def fit_pca(ds: "ray.data.Dataset", col: str = "embedding", k: int = 8):
    """DISTRIBUTED PCA training over an embedding column — the
    corpus-scale version of the reference's PCA postprocessor
    (`/root/reference/models/vggish/vggish_src/vggish_postprocess.py:77-88`
    applies SHIPPED params; here they are learned from the data, the
    way distributed BPE closed the tokenizer-training loop).

    Iter-free two-moment plan: every batch emits ONE skinny partial
    row (n, Σx, Σxxᵀ flattened — D + D² doubles); the driver reduces
    O(batches) partials, forms the covariance
    ``(Σxxᵀ − n·mean·meanᵀ)/(n−1)``, and runs one D×D ``eigh``.  Data
    never moves; the only driver-side work is O(batches·D²) + O(D³),
    independent of corpus size.  Eigenvector signs are fixed by the
    largest-|component|-positive convention so training is
    deterministic up to float-sum ordering.

    Returns ``(mean [D], components [D, k], eigvals [k])`` with
    components sorted by descending eigenvalue.
    """
    def _partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:  # an empty block would emit ragged [] partials
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.list_(pa.float64())),
                             "sxx": pa.array([], pa.list_(pa.float64()))})
        x = _list_col_matrix(batch[col], n)
        sx = x.sum(axis=0)
        sxx = x.T @ x
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "sx": pa.array([sx.tolist()], pa.list_(pa.float64())),
            "sxx": pa.array([sxx.reshape(-1).tolist()], pa.list_(pa.float64())),
        })

    pdf = ds.map_batches(_partial, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    n = int(pdf["n"].sum())
    if n < 2:
        raise ValueError(f"fit_pca needs >= 2 rows, got {n}")
    sx = np.sum(np.stack(pdf["sx"].to_numpy()), axis=0)
    d = len(sx)
    sxx = np.sum(np.stack(pdf["sxx"].to_numpy()), axis=0).reshape(d, d)
    mean = sx / n
    cov = (sxx - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)       # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order]
    vals = eigvals[order]
    # deterministic sign: largest-|component| of each vector positive
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0),
                         np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return mean, comps * flip, vals


def pca_project(
    ds: "ray.data.Dataset",
    mean: np.ndarray,
    components: np.ndarray,
    col: str = "embedding",
    out_col: str = "pca",
    whiten_eigvals: np.ndarray | None = None,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Apply a fitted PCA: ``y = (x − mean) @ components`` (optionally
    ÷ sqrt(eigvals) for whitening — the reference postprocessor's
    shape).  Params are ``ray.put`` ONCE; each actor pulls them in
    ``__init__`` and projects batches with one dgemm."""
    w = components / np.sqrt(whiten_eigvals)[None, :] \
        if whiten_eigvals is not None else components
    params_ref = ray.put((np.asarray(mean, dtype=np.float64),
                          np.ascontiguousarray(w, dtype=np.float64)))

    class _Project:
        def __init__(self):
            self.mean, self.w = ray.get(params_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            x = _list_col_matrix(batch[col], n)
            y = (x - self.mean[None, :]) @ self.w
            return batch.append_column(out_col,
                                       _fixed_list(y.astype(np.float32)))

    return ds.map_batches(_Project, concurrency=concurrency,
                          batch_format="pyarrow", zero_copy_batch=True)
