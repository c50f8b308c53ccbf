"""Multimodal (image/audio/video) columns as opaque binary payloads.

The reference decodes real media (OpenCV frame reads ``utils/io.py:109-154``,
ffmpeg demux ``utils/utils.py:194-223``, soundfile PCM ``vggish_input.py:86-89``).
This engine's decode stage resolves, per payload, the best available
decoder:

1. REAL pure-numpy decoders for uncompressed containers — WAV/PCM16
   audio (stdlib ``wave`` header + one ``frombuffer``) and binary PPM
   (P6) images. These run in any environment, including this one, and
   are pinned by roundtrip tests.
2. cv2 / soundfile, IMPORT-TRIED once per actor, for compressed
   formats when the host has them (this container does not).
3. A deterministic fake (``fake_decode=True``, OPT-IN) so
   compressed-video plumbing stays testable. In the default PRODUCTION
   mode an unsupported payload becomes a dead-letter row
   (``_error`` column, split via ``stages/deadletter.py``) — features
   are never silently fabricated.

All the Ray-side structure is real either way: schema
(``payload: binary`` + typed metadata columns), actor-pool signature
(decoder resolution once per actor in ``__init__``), byte-budget batch
sizing for large binary rows, and the exploded per-frame output layout.

Scale notes: binary payloads are large → small ``batch_size`` (the
pipeline sizes batches by byte budget, not row count), blocks stay
zero-copy Arrow binary, and the decode pool's ``concurrency × num_cpus``
is the knob that paces object-store pressure.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# real decoders (no external deps)
# ---------------------------------------------------------------------------

def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM16 → (mono float32 samples in [-1, 1], sample_rate).
    Multi-channel input is mean-downmixed (M16 semantics, reference
    ``vggish_input.py:91-93``)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV is supported")
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, sr


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of :func:`decode_wav_pcm16` (test fixtures)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (H, W, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary P6 PPM is supported")
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> data
    parts, i, tok = [], 2, b""
    end = len(payload)
    while len(parts) < 3:
        if i >= end:  # truncated/malformed header — never spin
            raise ValueError("truncated P6 header")
        c = payload[i : i + 1]
        i += 1
        if c in b" \t\r\n":
            if tok:
                parts.append(int(tok))
                tok = b""
        elif c == b"#":  # comment to end of line
            while i < end and payload[i : i + 1] not in b"\r\n":
                i += 1
        elif not c.isdigit():
            raise ValueError("malformed P6 header")
        else:
            tok += c
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM is supported")
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6 %d %d 255\n" % (w, h) + img.astype(np.uint8).tobytes()


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (the fps-resampler index rule
    applied to pixels: out (i,j) ← src (floor(i*H/out_h), floor(j*W/out_w)))."""
    h, w = img.shape[:2]
    ri = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    rj = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ri[:, None], rj[None, :]]


def synthetic_media_table(n: int = 32, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic media corpus with REAL payloads: P6 images and
    PCM16 WAV audio (decoded for real by MediaDecoder); video rows get
    opaque bytes (the compressed-codec case this container can't decode)."""
    rng = np.random.default_rng(seed)
    ids, payloads, types, w_, h_, sr_, nf_ = [], [], [], [], [], [], []
    for i in range(n):
        ids.append(f"media{i:06d}")
        t = ["image", "audio", "video"][i % 3]
        types.append(t)
        if t == "image":
            img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img))
            w_.append(64); h_.append(48); sr_.append(0); nf_.append(1)
        elif t == "audio":
            sr = 16000
            samples = (rng.random(sr // 2, dtype=np.float64) * 2 - 1).astype(np.float32)
            payloads.append(encode_wav_pcm16(samples, sr))
            w_.append(0); h_.append(0); sr_.append(sr); nf_.append(0)
        else:
            payloads.append(rng.bytes(payload_bytes))
            w_.append(64); h_.append(64); sr_.append(0); nf_.append(50)
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(types),
            "width": pa.array(w_, pa.int32()),
            "height": pa.array(h_, pa.int32()),
            "sample_rate": pa.array(sr_, pa.int32()),
            "n_frames": pa.array(nf_, pa.int32()),
        }
    )


class MediaDecoder:
    """Actor-pool decode stage: payload → frame-sampled float features.

    Decoder resolution happens ONCE per actor in ``__init__`` (the A-series
    pattern): cv2/soundfile are import-tried; the numpy WAV/PPM decoders
    are always available; the fake is last resort and only if enabled.
    Output: one row per sampled frame — ``(media_id, frame_idx,
    frame_feature: list<float32>[target_hw])``:

    - image: grayscale mean → nearest resize to (hw, hw) → row means;
    - audio: 100 ms windows, each nearest-resampled to hw points;
    - video: frames every ``frame_step``, pooled like images (real only
      when cv2 exists; else fake).
    """

    def __init__(self, fake_decode: bool = False, target_hw: int = 16, frame_step: int = 10):
        self.fake = fake_decode
        self.hw = target_hw
        self.step = frame_step
        try:
            import cv2  # noqa: F401
            self.cv2 = cv2
        except ImportError:
            self.cv2 = None
        try:
            import soundfile  # noqa: F401
            self.soundfile = soundfile
        except ImportError:
            self.soundfile = None

    def _fake_frames(self, payload: bytes, n_frames: int) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.random((max(n_frames, 1), self.hw, self.hw), dtype=np.float64).astype(np.float32)

    def _image_feature(self, img: np.ndarray) -> np.ndarray:
        gray = img.astype(np.float32).mean(axis=2) / 255.0
        return resize_nearest(gray, self.hw, self.hw).mean(axis=0)

    def _decode_video_cv2(self, payload: bytes):
        """Compressed video via cv2.VideoCapture, sampling every
        ``frame_step``-th frame (the reference reads frames from a FILE
        path — ``utils/utils.py:194-223`` — so the payload is spilled to
        a per-call tempfile; cv2 has no in-memory video API). Returns
        None when cv2 can't open the container (falls through the
        decoder chain), a row list otherwise."""
        import os
        import tempfile

        fd, path = tempfile.mkstemp(suffix=".bin")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            cap = self.cv2.VideoCapture(path)
            if not cap.isOpened():
                cap.release()
                return None
            rows, i = [], 0
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if i % self.step == 0:
                    rows.append((i, self._image_feature(frame[:, :, ::-1])))
                i += 1
            cap.release()
            return rows or None
        finally:
            os.unlink(path)

    def _decode_rows(self, payload: bytes, n_frames: int):
        """→ list of (frame_idx, feature[hw]) rows."""
        # native decoders are ATTEMPTS, never verdicts: a truncated PPM, an
        # AVI/WebP (RIFF but not WAVE), or a non-PCM16 WAV falls through to
        # the codec libs / fake instead of killing the actor task
        if payload.startswith(b"P6"):
            try:
                return [(0, self._image_feature(decode_ppm(payload)))]
            except (ValueError, NotImplementedError):
                pass
        if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            try:
                x, sr = decode_wav_pcm16(payload)
            except Exception:
                x = None
            if x is not None:
                win = max(sr // 10, 1)
                n_full = len(x) // win
                rows = []
                for j in range(max(n_full, 1)):
                    seg = x[j * win : (j + 1) * win] if n_full else x
                    if len(seg) == 0:
                        seg = np.zeros(1, np.float32)
                    idx = np.minimum((np.arange(self.hw) * len(seg)) // self.hw, len(seg) - 1)
                    rows.append((j, seg[idx].astype(np.float32)))
                return rows
        if self.cv2 is not None:
            buf = np.frombuffer(payload, np.uint8)
            img = self.cv2.imdecode(buf, self.cv2.IMREAD_COLOR)
            if img is not None:
                return [(0, self._image_feature(img[:, :, ::-1]))]
            rows = self._decode_video_cv2(payload)
            if rows is not None:
                return rows
        if self.soundfile is not None:
            try:
                x, sr = self.soundfile.read(io.BytesIO(payload), dtype="float32")
                if x.ndim > 1:
                    x = x.mean(axis=1)
                win = max(int(sr) // 10, 1)
                return [(j, np.resize(x[j * win : (j + 1) * win], self.hw).astype(np.float32))
                        for j in range(max(len(x) // win, 1))]
            except Exception:
                pass
        if self.fake:
            frames = self._fake_frames(payload, n_frames)
            sampled = frames[:: self.step] if len(frames) > 1 else frames
            return [(j * self.step, fr.mean(axis=0)) for j, fr in enumerate(sampled)]
        raise NotImplementedError(
            "compressed media needs cv2/ffmpeg/soundfile — not in this container; "
            "WAV-PCM16 and P6 PPM decode natively, or run with fake_decode=True"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import traceback

        ids, fidx, feats = [], [], []
        dead_ids, dead_errs = [], []
        for mid, payload, nf in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(), batch["n_frames"].to_pylist()
        ):
            # per-payload error isolation (the reference's per-video
            # try/except, base_extractor.py:40-53): an undecodable
            # payload becomes a DEAD-LETTER row, never a fabricated
            # feature and never a failed task
            try:
                rows = self._decode_rows(payload, nf or 1)
            except Exception:
                dead_ids.append(mid)
                dead_errs.append(traceback.format_exc(limit=2))
                continue
            for j, feat in rows:
                ids.append(mid)
                fidx.append(j)
                feats.append(feat)
        mat = np.stack(feats) if feats else np.empty((0, self.hw), np.float32)
        flat = mat.astype(np.float32).reshape(-1)
        off = np.arange(0, (len(ids) + 1) * self.hw, self.hw, dtype=np.int32)
        good = pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(np.array(fidx, dtype=np.int32), pa.int32()),
                "frame_feature": pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                                          pa.array(flat, pa.float32())),
                "_error": pa.nulls(len(ids), pa.string()),
            }
        )
        if not dead_ids:
            return good
        dead = pa.table(
            {
                "media_id": pa.array(dead_ids, pa.string()),
                "frame_idx": pa.nulls(len(dead_ids), pa.int32()),
                "frame_feature": pa.nulls(len(dead_ids), good["frame_feature"].type),
                "_error": pa.array(dead_errs, pa.string()),
            }
        )
        return pa.concat_tables([good, dead])


def decode_pipeline(ds: "ray.data.Dataset", concurrency: int = 4,
                    batch_bytes: int = 32 << 20,
                    est_row_bytes: int | None = None,
                    fake_decode: bool = False,
                    return_deadletters: bool = False):
    """Media dataset → per-frame feature rows via the decode actor pool.

    PRODUCTION semantics by default (round 3): ``fake_decode`` is
    OPT-IN — undecodable payloads (compressed codecs absent from the
    host) are routed to the dead-letter side via the ``_error`` column
    convention of ``stages/deadletter.py``, never silently fabricated.
    ``return_deadletters=True`` returns ``(good, dead)`` datasets;
    otherwise only the good rows (``_error`` stripped).

    batch_size derives from a byte budget (payloads are wide rows).
    """
    from .deadletter import split_deadletters

    if est_row_bytes is None:
        # size from OBSERVED payloads (a fixed guess under real media
        # blows the byte budget 4x+); one tiny prefix read
        sample = ds.limit(16).to_pandas()
        if len(sample) and "payload" in sample.columns:
            est_row_bytes = int(max(
                4096, sample["payload"].map(len).mean()))
        else:
            est_row_bytes = 4096
    rows = max(1, batch_bytes // max(est_row_bytes, 1))
    out = ds.map_batches(
        MediaDecoder, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=rows, concurrency=concurrency,
        fn_constructor_kwargs=dict(fake_decode=fake_decode),
    )
    if return_deadletters:
        # split materializes internally — both sides consume `out`
        return split_deadletters(out)
    good, _dead = split_deadletters(out, materialize=False)
    return good


def dhash64(img: np.ndarray) -> np.uint64:
    """Perceptual difference-hash of an image (any HxWx3 uint8): mean
    the channels to grayscale, nearest-resize to 8x9, take the 64
    horizontal-gradient sign bits.  Near-duplicate images (re-encodes,
    small crops/noise) land within a few Hamming bits."""
    g = img.astype(np.uint16).mean(axis=2)
    small = resize_nearest(g, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    return np.uint64(
        int.from_bytes(np.packbits(bits).tobytes(), "big"))


def image_dhash_stage(batch: pa.Table) -> pa.Table:
    """Stateless map: decode each P6 PPM payload (pure numpy — the
    REAL codec path) and emit its 64-bit dHash.  Non-image rows are
    dropped; undecodable payloads dead-letter upstream via
    MediaDecoder's isolation when composed behind it."""
    keep = pc.equal(batch["media_type"], "image")
    imgs = batch.filter(keep)
    ids, hashes = [], []
    for mid, payload in zip(imgs["media_id"].to_pylist(),
                            imgs["payload"].to_pylist()):
        ids.append(mid)
        hashes.append(dhash64(decode_ppm(payload)))
    return pa.table({"media_id": pa.array(ids, pa.string()),
                     "dhash": pa.array(np.array(hashes, np.uint64),
                                       pa.uint64())})


def image_neardup_candidates(
    ds: "ray.data.Dataset",
    hamming_max: int = 3,
    bands: int = 4,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Image near-duplicate candidate pairs: dHash per decoded image,
    then the SHARED banded-Hamming plan (`stages/dedup.py:
    hamming_neardup_candidates` — pigeonhole-complete for
    hamming_max ≤ bands-1).  The payload bytes never shuffle: only
    (id, band, value, hash) rows move, exactly the multimodal scale
    discipline (decode in the map, dedup on the sketch)."""
    from .dedup import hamming_neardup_candidates

    hashes = ds.map_batches(image_dhash_stage, batch_format="pyarrow")
    return hamming_neardup_candidates(
        hashes, "media_id", "dhash", hamming_max=hamming_max,
        bands=bands, num_buckets=num_buckets)
