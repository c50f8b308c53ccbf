"""Real-codec decode branches of MediaDecoder (SURVEY §2.1 S7).

Two layers:

1. ``pytest.importorskip`` tests that prove the cv2 / soundfile happy
   path END-TO-END on any host that has the codecs (this container does
   not — they skip here, run elsewhere). Reference behavior:
   ``utils/utils.py:194-223`` (ffmpeg/cv2 frame reads),
   ``vggish_input.py:86-89`` (soundfile PCM).
2. Mock-module tests that run EVERYWHERE: a stub cv2/soundfile is
   injected on the instance, pinning that the decoder chain actually
   routes compressed payloads through the codec branch (and that a
   codec failure still falls through to dead-letter, never a fake).
"""

import io

import numpy as np
import pyarrow as pa
import pytest

from video_features_ray.stages.multimodal import (MediaDecoder, decode_ppm,
                                                  encode_ppm)

HW = 16


# ---------------------------------------------------------------------------
# layer 1: real codecs (skip when absent)
# ---------------------------------------------------------------------------

def test_cv2_image_roundtrip_end_to_end():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img[:, :, ::-1])  # cv2 wants BGR
    assert ok
    dec = MediaDecoder(target_hw=HW)
    rows = dec._decode_rows(buf.tobytes(), 1)
    assert len(rows) == 1 and rows[0][0] == 0
    np.testing.assert_allclose(rows[0][1], dec._image_feature(img),
                               atol=1e-6)


def test_cv2_video_frames_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    if not w.isOpened():
        pytest.skip("no MJPG encoder on this host")
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
              for _ in range(25)]
    for f in frames:
        w.write(f)
    w.release()
    payload = open(path, "rb").read()
    dec = MediaDecoder(target_hw=HW, frame_step=10)
    rows = dec._decode_rows(payload, 25)
    # frames 0, 10, 20 sampled
    assert [r[0] for r in rows] == [0, 10, 20]
    assert all(r[1].shape == (HW,) for r in rows)


def test_soundfile_decode_end_to_end():
    sf = pytest.importorskip("soundfile")
    rng = np.random.default_rng(2)
    x = (rng.random(8000, dtype=np.float64) * 2 - 1).astype(np.float32)
    buf = io.BytesIO()
    sf.write(buf, x, 16000, format="FLAC")
    dec = MediaDecoder(target_hw=HW)
    rows = dec._decode_rows(buf.getvalue(), 1)
    assert len(rows) == 5  # 0.5 s / 100 ms windows
    assert all(r[1].dtype == np.float32 for r in rows)


# ---------------------------------------------------------------------------
# layer 2: branch plumbing via injected stub modules (runs everywhere)
# ---------------------------------------------------------------------------

class _StubCv2:
    IMREAD_COLOR = 1

    def __init__(self, img=None):
        self._img = img

    def imdecode(self, buf, flags):
        return self._img  # BGR or None


class _StubSoundfile:
    def __init__(self, x, sr):
        self._x, self._sr = x, sr

    def read(self, fobj, dtype="float32"):
        return self._x, self._sr


def test_cv2_branch_routes_compressed_image():
    rng = np.random.default_rng(3)
    img_rgb = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    dec = MediaDecoder(target_hw=HW)
    dec.cv2 = _StubCv2(img_rgb[:, :, ::-1])   # decoder flips BGR→RGB
    dec.soundfile = None
    rows = dec._decode_rows(b"\x89PNG-ish-opaque-bytes", 1)
    assert len(rows) == 1
    np.testing.assert_allclose(rows[0][1], dec._image_feature(img_rgb),
                               atol=1e-6)


def test_soundfile_branch_routes_compressed_audio():
    rng = np.random.default_rng(4)
    x = (rng.random(3200, dtype=np.float64) * 2 - 1).astype(np.float32)
    dec = MediaDecoder(target_hw=HW)
    dec.cv2 = None
    dec.soundfile = _StubSoundfile(x, 16000)
    rows = dec._decode_rows(b"fLaC-opaque-bytes", 1)
    assert len(rows) == 2  # 0.2 s / 100 ms windows
    assert all(r[1].shape == (HW,) and r[1].dtype == np.float32
               for r in rows)


def test_stereo_soundfile_downmixed():
    x = np.stack([np.ones(1600, np.float32), -np.ones(1600, np.float32)],
                 axis=1)
    dec = MediaDecoder(target_hw=HW)
    dec.cv2 = None
    dec.soundfile = _StubSoundfile(x, 16000)
    rows = dec._decode_rows(b"fLaC", 1)
    np.testing.assert_allclose(rows[0][1], np.zeros(HW), atol=1e-7)


def test_codec_failure_still_deadletters():
    """A present-but-failing codec must NOT mask the dead-letter path."""
    dec = MediaDecoder(target_hw=HW)
    dec.cv2 = _StubCv2(None)                 # imdecode fails

    class _Boom:
        def read(self, fobj, dtype="float32"):
            raise RuntimeError("codec error")

    # cv2 video fallback must also fail cleanly on garbage
    class _NoCap:
        def __init__(self):
            pass

        def isOpened(self):
            return False

        def release(self):
            pass

    dec.cv2.VideoCapture = lambda path: _NoCap()
    dec.soundfile = _Boom()
    with pytest.raises(NotImplementedError):
        dec._decode_rows(b"opaque-compressed", 1)


def test_native_ppm_still_preferred_over_codecs():
    """Native decoders short-circuit before the codec libs (zero-copy
    numpy beats a library roundtrip for the formats we own)."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)

    class _Never:
        def __getattr__(self, _):
            raise AssertionError("codec lib must not be touched for P6")

    dec = MediaDecoder(target_hw=HW)
    dec.cv2 = _Never()
    dec.soundfile = _Never()
    rows = dec._decode_rows(encode_ppm(img), 1)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
    assert len(rows) == 1
