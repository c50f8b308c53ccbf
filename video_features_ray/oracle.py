"""Single-process numpy oracle — reference window semantics, verbatim loops.

No Ray imports. This is the analogue of the reference's golden-fixture
strategy (``tests/utils.py:107-135``): the Ray pipeline must match this
oracle with token-array EQUALITY per row and ``np.allclose`` feature
vectors per entity×timestamp.

Each per-doc function is written as the literal loop the reference runs:

- ``form_slices`` loop → W1 (``utils/utils.py:62-71``).
- streaming-stack loop with ``stack = stack[step:]`` retention and
  emit-on ``len(stack)-1 == stack_size`` → W2
  (``models/i3d/extract_i3d.py:95-128``).
- per-frame batches → framewise (``base_framewise_extractor.py:67-79``).
- overlap-1 pair loop → flow (``base_flow_extractor.py:76-94``).
- two-level ``frame()`` stride windows → vggish
  (``mel_features.py:21-45``, ``vggish_input.py:52-67``).
"""

from __future__ import annotations

import numpy as np

from .specs import EncoderSpec, VOCAB_SIZE
from .stages.encode import projection_matrix


def resample_doc(tokens: np.ndarray, spec: EncoderSpec) -> tuple[np.ndarray, float]:
    """Deterministic model of the reference's ffmpeg re-rate (utils/io.py:75-89)."""
    n = len(tokens)
    if spec.resample_fps is not None:
        fps = spec.resample_fps
        m = int(np.ceil(n * fps / spec.base_fps))
        idx = [min(int(np.floor(k * spec.base_fps / fps)), n - 1) for k in range(m)]
        return tokens[idx] if n else tokens[:0], fps
    if spec.resample_total is not None:
        if n == 0:
            return tokens[:0], spec.base_fps
        N = spec.resample_total
        idx = [(k * n) // N for k in range(N)]
        return tokens[idx], N * spec.base_fps / n
    return tokens, spec.base_fps


def windows_for_doc(tokens: np.ndarray, spec: EncoderSpec) -> list[dict]:
    """Window rows for one doc: (window_id, ts_ms, window_tokens)."""
    x, fps = resample_doc(np.asarray(tokens, dtype=np.int32), spec)
    n = len(x)
    rows = []

    if spec.kind == "w1":
        # literal form_slices loop
        full = (n - spec.stack) // spec.step + 1
        for j in range(max(full, 0)):
            s = j * spec.step
            rows.append(dict(window_id=j, ts_ms=(s + spec.stack - 1) / fps * 1000.0,
                             window_tokens=x[s : s + spec.stack]))
    elif spec.kind == "w2":
        # literal streaming-stack loop (extract_i3d.py:112-124)
        stack: list[int] = []
        j = 0
        for pos in range(n):
            stack.append(pos)
            if len(stack) - 1 == spec.stack:
                span = x[stack[0] : stack[-1] + 1]  # stack+1 tokens incl. lookahead
                # POS_MSEC after reading frame `pos` = presentation time of next frame
                rows.append(dict(window_id=j, ts_ms=(pos + 1) / fps * 1000.0,
                                 window_tokens=span))
                stack = stack[spec.step :]
                j += 1
    elif spec.kind == "framewise":
        for pos in range(n):
            rows.append(dict(window_id=pos, ts_ms=pos / fps * 1000.0,
                             window_tokens=x[pos : pos + 1]))
    elif spec.kind == "flow":
        for i in range(n - 1):
            rows.append(dict(window_id=i, ts_ms=(i + 1) / fps * 1000.0,
                             window_tokens=x[i : i + 2]))
    elif spec.kind == "vggish":
        # level 1: frame() over samples, tail dropped
        if n >= spec.inner_win:
            n_inner = 1 + (n - spec.inner_win) // spec.inner_hop
        else:
            n_inner = 0
        inner = np.array(
            [x[k * spec.inner_hop : k * spec.inner_hop + spec.inner_win].astype(np.int64).sum()
             for k in range(n_inner)],
            dtype=np.int32,
        )
        # level 2: frame() over inner frames, tumbling
        if n_inner >= spec.stack:
            n_out = 1 + (n_inner - spec.stack) // spec.step
        else:
            n_out = 0
        for j in range(n_out):
            s = j * spec.step
            last_sample = (s + spec.stack - 1) * spec.inner_hop + spec.inner_win - 1
            rows.append(dict(window_id=j, ts_ms=last_sample / fps * 1000.0,
                             window_tokens=inner[s : s + spec.stack]))
    else:  # pragma: no cover
        raise ValueError(spec.kind)

    for r in rows:
        r["fps"] = fps
    return rows


def encode_row(window_tokens: np.ndarray, spec: EncoderSpec,
               r_rgb: np.ndarray | None = None, r_flow: np.ndarray | None = None) -> dict:
    """Deterministic encoder for one window (mirrors stages/encode.py rule)."""
    if r_rgb is None:
        r_rgb = projection_matrix(spec, "rgb")
    scale = float(spec.inner_win * VOCAB_SIZE) if spec.kind == "vggish" else float(VOCAB_SIZE)
    x = (window_tokens.astype(np.float32) / np.float32(scale)) * np.float32(2.0) - np.float32(1.0)
    out = {}
    if spec.kind == "w2":
        if r_flow is None:
            r_flow = projection_matrix(spec, "flow")
        out["feature"] = x[: spec.stack] @ r_rgb
        out["feature_flow"] = np.diff(x) @ r_flow
    elif spec.kind == "flow":
        out["feature"] = (x[1] - x[0]) * r_rgb[0]
    else:
        out["feature"] = x @ r_rgb
    return out


def extract_doc(doc_id: str, tokens, spec: EncoderSpec) -> list[dict]:
    """Full oracle extraction for one doc: windows + features."""
    r_rgb = projection_matrix(spec, "rgb")
    r_flow = projection_matrix(spec, "flow") if spec.kind == "w2" else None
    rows = windows_for_doc(np.asarray(tokens, dtype=np.int32), spec)
    for r in rows:
        r["doc_id"] = doc_id
        r["spec"] = spec.name
        r.update(encode_row(r["window_tokens"], spec, r_rgb, r_flow))
    return rows
