"""Encoder specs — the registry that mirrors the reference's per-model configs.

The reference dispatches ``feature_type`` → extractor class with per-model
window geometry (reference ``main.py:21-38``, ``configs/*.yml``). Here a
spec is a plain dataclass: window kind + geometry + deterministic-encoder
output dim. The encoder itself is a seeded random projection (a stand-in
for the GPU nets, see ``stages/encode.py``) so correctness is
machine-checkable without GPUs.

Window kinds (reference semantics, cited):

- ``w1``        ``form_slices`` windows ``[i*step, i*step+stack)``,
                count ``(n-stack)//step + 1``, ragged tail dropped
                (reference ``utils/utils.py:62-71``; used by S3D/R21D).
- ``w2``        I3D streaming stack: emit when ``len(stack)-1 == stack_size``
                (stack+1 frames held; flow needs pairs), rgb window =
                ``stack[:-1]``, retention ``stack = stack[step:]``; window j
                covers ``[j*step, j*step+stack)`` with one-frame lookahead;
                ts = capture position when the stack completes
                (reference ``models/i3d/extract_i3d.py:112-124``).
- ``framewise`` one output row per frame/token (CLIP/ResNet/timm;
                reference ``models/_base/base_framewise_extractor.py:67-79``).
- ``flow``      lag-1 pairs f(x[i], x[i+1]), n-1 rows; batch overlap=1 with
                ts[0]-dedup stitching (reference
                ``models/_base/base_flow_extractor.py:76-94``).
- ``vggish``    two-level framing: inner windows ``inner_win/inner_hop``
                over raw samples, outer tumbling ``stack/step`` over inner
                frames, tails dropped at both levels (reference
                ``models/vggish/vggish_src/mel_features.py:21-45``,
                ``vggish_input.py:52-67``, ``vggish_params.py:27-35``).

Timestamp rule (W6): every emitted row is stamped at end-of-window —
features at time t only ever read events with ts <= t (zero temporal
leakage). Frame ts = ``pos / fps * 1000`` ms (reference ``utils/io.py:132``);
w2 stamps ``(j*step + stack + 1)/fps*1000`` (the reference's
``CAP_PROP_POS_MSEC`` after the completing frame, ``extract_i3d.py:124``).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Optional

#: CLIP BPE vocab size (reference ``models/clip/clip_src/simple_tokenizer.py:66-74``)
VOCAB_SIZE = 49408

#: default stream rate when a spec doesn't resample (reference default fps 25,
#: ``configs/i3d.yml``)
DEFAULT_FPS = 25.0


@dataclass(frozen=True)
class EncoderSpec:
    name: str
    kind: str                       # w1 | w2 | framewise | flow | vggish
    stack: int                      # window length (outer level for vggish)
    step: int                       # hop (outer level for vggish)
    dim: int                        # encoder output dimensionality D
    resample_fps: Optional[float] = None   # S5: re-rate before windowing (W7)
    resample_total: Optional[int] = None   # S6: fixed-count resample
    inner_win: int = 400            # vggish level-1 window (samples)
    inner_hop: int = 160            # vggish level-1 hop (samples)
    base_fps: float = DEFAULT_FPS

    def __post_init__(self):
        if self.kind not in ("w1", "w2", "framewise", "flow", "vggish"):
            raise ValueError(f"unknown window kind {self.kind!r}")
        if self.resample_fps is not None and self.resample_total is not None:
            # mutual exclusion, reference ``utils/io.py:75-77``
            raise ValueError("resample_fps and resample_total are mutually exclusive")
        if self.kind == "flow" and (self.step != 1 or self.stack != 2):
            # lag-1 pairs place window w at position w (count n-1 ignores
            # step); any other geometry would silently read past the end
            raise ValueError("flow specs require stack=2, step=1 (lag-1 pairs)")

    @property
    def seed(self) -> int:
        """Stable per-spec seed for the deterministic projection matrix."""
        return zlib.crc32(self.name.encode("utf-8"))

    @property
    def effective_step(self) -> int:
        """Window-start advance. For w2 the reference's retention
        ``stack = stack[step:]`` empties entirely when step > stack+1,
        so the next window starts at the first unseen frame — the
        effective advance is ``min(step, stack+1)``
        (``extract_i3d.py:118-122``; found by property testing)."""
        if self.kind == "w2":
            return min(self.step, self.stack + 1)
        return self.step

    @property
    def window_len(self) -> int:
        """Tokens consumed per emitted window (w2/flow hold one lookahead)."""
        if self.kind == "w2":
            return self.stack + 1
        if self.kind == "flow":
            return 2
        return self.stack

    @property
    def chunk_step_units(self) -> int:
        """Window-start advance in RAW-TOKEN units — what giant-sequence
        chunk boundaries must be multiples of. For vggish the outer
        windows stride ``step`` inner frames = ``step * inner_hop``
        samples; for every other kind it equals ``effective_step``."""
        if self.kind == "vggish":
            return self.step * self.inner_hop
        return self.effective_step

    @property
    def chunk_window_units(self) -> int:
        """Raw tokens a single window spans — the chunk halo is
        ``chunk_window_units - chunk_step_units``. For vggish one outer
        window covers ``(stack-1)*inner_hop + inner_win`` samples."""
        if self.kind == "vggish":
            return (self.stack - 1) * self.inner_hop + self.inner_win
        return self.window_len


def _mk(name, kind, stack, step, dim, **kw) -> EncoderSpec:
    return EncoderSpec(name=name, kind=kind, stack=stack, step=step, dim=dim, **kw)


#: the spec grid from FIXTURES.md §T3, mirroring the reference pytest
#: parametrization (``tests/i3d/test_i3d.py:21-27`` etc.)
SPECS: dict[str, EncoderSpec] = {
    s.name: s
    for s in [
        _mk("i3d_like_default", "w2", 64, 64, 1024),
        _mk("i3d_like_24_24_25", "w2", 24, 24, 1024, resample_fps=25.0),
        _mk("i3d_like_24_12_15", "w2", 24, 12, 1024, resample_fps=15.0),
        _mk("s3d_like_32_32_20", "w1", 32, 32, 1024, resample_fps=20.0),
        _mk("r21d_like_16_16", "w1", 16, 16, 512),
        _mk("framewise_b1", "framewise", 1, 1, 512),
        _mk("framewise_b128", "framewise", 1, 1, 512),
        _mk("framewise_total5", "framewise", 1, 1, 2048, resample_total=5),
        _mk("flow_like_lag1", "flow", 2, 1, 64, resample_fps=1.0),
        _mk("vggish_like_tumbling", "vggish", 96, 96, 128),
    ]
}


def get_spec(name: str) -> EncoderSpec:
    return SPECS[name]
