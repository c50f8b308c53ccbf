"""Multimodal (image/audio/video) columns as opaque binary payloads.

The reference decodes real media (OpenCV frame reads ``utils/io.py:109-154``,
ffmpeg demux ``utils/utils.py:194-223``, soundfile PCM ``vggish_input.py:86-89``).
This container has no media libraries, so the DECODE step is stubbed —
either a clearly-marked ``NotImplementedError`` (real codecs) or a
deterministic fake (``fake_decode=True``) — while all the Ray-side
plumbing is real and tested: schema (``payload: binary`` + typed
metadata columns), actor-pool signature, batch sizing for large binary
rows, and output layout.

Scale notes: binary payloads are large → small ``batch_size`` (the
pipeline sizes batches by byte budget, not row count), blocks stay
zero-copy Arrow binary, and the decode pool's ``concurrency × num_cpus``
is the knob that paces object-store pressure.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image | audio | video
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synthetic_media_table(n: int = 32, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    rng = np.random.default_rng(seed)
    ids, payloads, types, w, h, sr, nf = [], [], [], [], [], [], []
    for i in range(n):
        ids.append(f"media{i:06d}")
        payloads.append(rng.bytes(payload_bytes))
        t = ["image", "audio", "video"][i % 3]
        types.append(t)
        w.append(64 if t != "audio" else 0)
        h.append(64 if t != "audio" else 0)
        sr.append(16000 if t == "audio" else 0)
        nf.append(1 if t == "image" else 50)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "sample_rate": pa.array(sr, pa.int32()),
            "n_frames": pa.array(nf, pa.int32()),
        }
    )


class MediaDecoder:
    """Actor-pool decode stage: payload → frame-sampled float features.

    ``fake_decode=True`` derives a deterministic pseudo-decode from the
    payload bytes (blake2b-seeded) so the downstream plumbing (resize /
    frame-sample geometry, output schema) is fully testable. With
    ``fake_decode=False`` it raises ``NotImplementedError`` — the real
    codec (cv2/ffmpeg/soundfile) is not available in this environment.
    """

    def __init__(self, fake_decode: bool = True, target_hw: int = 16, frame_step: int = 10):
        self.fake = fake_decode
        self.hw = target_hw
        self.step = frame_step

    def _decode(self, payload: bytes, n_frames: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode needs cv2/ffmpeg/soundfile — not in this container; "
                "run with fake_decode=True for plumbing tests"
            )
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.random((max(n_frames, 1), self.hw, self.hw), dtype=np.float64).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, feats = [], [], []
        for mid, payload, nf in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(), batch["n_frames"].to_pylist()
        ):
            frames = self._decode(payload, nf or 1)
            sampled = frames[:: self.step] if len(frames) > 1 else frames
            for j, fr in enumerate(sampled):
                ids.append(mid)
                fidx.append(j * self.step)
                feats.append(fr.mean(axis=0))  # "resize+pool" stand-in: (hw,) vector
        mat = np.stack(feats) if feats else np.empty((0, self.hw), np.float32)
        flat = mat.astype(np.float32).reshape(-1)
        off = np.arange(0, (len(ids) + 1) * self.hw, self.hw, dtype=np.int32)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(np.array(fidx, dtype=np.int32)),
                "frame_feature": pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                                          pa.array(flat, pa.float32())),
            }
        )


def decode_pipeline(ds: "ray.data.Dataset", concurrency: int = 4,
                    batch_bytes: int = 32 << 20, est_row_bytes: int = 4096) -> "ray.data.Dataset":
    """Media dataset → per-frame feature rows via the decode actor pool.

    batch_size derives from a byte budget (payloads are wide rows).
    """
    rows = max(1, batch_bytes // max(est_row_bytes, 1))
    return ds.map_batches(
        MediaDecoder, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=rows, concurrency=concurrency,
        fn_constructor_kwargs=dict(fake_decode=True),
    )
