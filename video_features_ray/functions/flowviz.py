"""Optical-flow → RGB visualization (reference ``utils/flow_viz.py``).

Re-implemented from the standard Middlebury flow color-coding scheme
(Baker et al., "A Database and Evaluation Methodology for Optical
Flow", IJCV 2011): a 55-entry color wheel over six hue segments
(RY=15, YG=6, GC=4, CB=11, BM=13, MR=6); flow angle picks the hue by
linear interpolation between adjacent wheel entries, flow magnitude
scales saturation (toward white at zero flow), out-of-range radii are
dimmed by 0.75. Fully vectorized over (N, 2) flow arrays.
"""

from __future__ import annotations

import numpy as np

_SEGMENTS = [(15, (255, 0, 0), (255, 255, 0)),   # RY
             (6, (255, 255, 0), (0, 255, 0)),    # YG
             (4, (0, 255, 0), (0, 255, 255)),    # GC
             (11, (0, 255, 255), (0, 0, 255)),   # CB
             (13, (0, 0, 255), (255, 0, 255)),   # BM
             (6, (255, 0, 255), (255, 0, 0))]    # MR


def make_colorwheel() -> np.ndarray:
    """(55, 3) uint8 wheel, ramp-exact vs the reference
    (``255 - floor(255*k/n)`` on descending channels — a float lerp's
    ``floor(255*(1-k/n))`` is one LESS wherever 255k/n is fractional,
    17 of 55 entries)."""
    rows = []
    for n, a, b in _SEGMENTS:
        k = np.arange(n)[:, None]
        a_arr = np.array(a)[None, :]
        b_arr = np.array(b)[None, :]
        ramp = np.floor(255 * k / n)
        seg = np.where(b_arr > a_arr, a_arr + ramp,
                       np.where(b_arr < a_arr, a_arr - ramp, a_arr))
        rows.append(seg)
    return np.concatenate(rows).astype(np.uint8)


_WHEEL = make_colorwheel()


def flow_to_rgb(u: np.ndarray, v: np.ndarray, clip_flow: float | None = None) -> np.ndarray:
    """(...,) u/v components → (..., 3) uint8 colors; normalized by the
    max magnitude over the input (as the reference does per image)."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    if clip_flow is not None:
        u = np.clip(u, -clip_flow, clip_flow)
        v = np.clip(v, -clip_flow, clip_flow)
    rad = np.sqrt(u * u + v * v)
    rad_max = rad.max() if rad.size else 0.0
    eps = 1e-5
    u = u / (rad_max + eps)
    v = v / (rad_max + eps)
    rad = np.sqrt(u * u + v * v)

    ncols = len(_WHEEL)
    a = np.arctan2(-v, -u) / np.pi           # [-1, 1]
    fk = (a + 1) / 2 * (ncols - 1)           # wheel position
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = fk - np.floor(fk)

    col0 = _WHEEL[k0].astype(np.float64) / 255.0
    col1 = _WHEEL[k1].astype(np.float64) / 255.0
    col = (1 - f)[..., None] * col0 + f[..., None] * col1

    in_range = rad <= 1
    col = np.where(in_range[..., None], 1 - rad[..., None] * (1 - col), col * 0.75)
    return np.floor(255.0 * col).astype(np.uint8)
