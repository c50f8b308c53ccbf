"""Real (pure-numpy) media decode: WAV-PCM16 + P6 PPM roundtrips, the
nearest resize kernel, and the decode stage's per-frame layout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.stages.multimodal import (
    MediaDecoder,
    decode_pipeline,
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    resize_nearest,
    synthetic_media_table,
)


def test_wav_roundtrip_mono():
    rng = np.random.default_rng(3)
    x = (rng.random(16000) * 2 - 1).astype(np.float32)
    got, sr = decode_wav_pcm16(encode_wav_pcm16(x, 16000))
    assert sr == 16000
    np.testing.assert_allclose(got, x, atol=2.0 / 32767)  # trunc + scale LSBs


def test_wav_stereo_downmix():
    import io
    import wave

    l = np.full(100, 0.5, np.float32)
    r = np.full(100, -0.5, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2], inter[1::2] = l, r
    pcm = (np.clip(inter, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    got, sr = decode_wav_pcm16(buf.getvalue())
    assert sr == 8000 and len(got) == 100
    np.testing.assert_allclose(got, 0.0, atol=1.0 / 32767)


def test_ppm_roundtrip_and_comment():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
    with_comment = b"P6 # a comment\n7 10 255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(with_comment), img)


def test_resize_nearest():
    img = np.arange(16).reshape(4, 4)
    same = resize_nearest(img, 4, 4)
    np.testing.assert_array_equal(same, img)
    half = resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(half, [[0, 2], [8, 10]])


def test_decoder_routes_real_payloads():
    """image rows → 1 frame; 0.5 s audio rows → 5 × 100 ms frames; the
    features come from the REAL decoders, not the fake (a fake-decoded
    image would produce a different deterministic vector)."""
    t = synthetic_media_table(n=12, seed=42)
    out = decode_pipeline(ray.data.from_arrow(t), concurrency=2,
                          fake_decode=True).to_pandas()
    counts = out.groupby("media_id").size()
    types = dict(zip(t["media_id"].to_pylist(), t["media_type"].to_pylist()))
    for mid, c in counts.items():
        if types[mid] == "image":
            assert c == 1
        elif types[mid] == "audio":
            assert c == 5
    # direct kernel equality for one image row
    dec = MediaDecoder()
    payload = t["payload"][0].as_py()
    assert t["media_type"][0].as_py() == "image"
    want = dec._image_feature(decode_ppm(payload))
    got = np.asarray(
        out[(out.media_id == t["media_id"][0].as_py())]["frame_feature"].iloc[0])
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-6)


def test_production_mode_deadletters_undecodable():
    """Round-3 verdict item 6: mixed WAV/PPM/opaque corpus in PRODUCTION
    mode (fake off, the default) yields real decoded rows + dead-letter
    rows, zero fabricated features."""
    t = synthetic_media_table(n=24, seed=42)  # 8 image, 8 audio, 8 video
    good, dead = decode_pipeline(ray.data.from_arrow(t), concurrency=2,
                                 return_deadletters=True)
    g, d = good.to_pandas(), dead.to_pandas()
    types = dict(zip(t["media_id"].to_pylist(), t["media_type"].to_pylist()))
    # every good row decodes from a REAL payload — never a video
    assert all(types[m] in ("image", "audio") for m in g["media_id"])
    assert len(g) == 8 * 1 + 8 * 5      # images + 5×100ms audio frames
    assert "_error" not in g.columns
    # every opaque video payload dead-letters exactly once, with error
    assert sorted(d["media_id"]) == sorted(
        m for m, ty in types.items() if ty == "video")
    assert d["_error"].str.contains("NotImplementedError").all()
    assert d["frame_feature"].isna().all()  # no fabricated features


def test_riff_non_wave_falls_through_to_fake():
    """AVI/WebP are RIFF but not WAVE — must reach the fake/codec chain,
    not crash in the strict WAV parser (round-2 review bug)."""
    avi = b"RIFF$\x00\x00\x00AVI LIST" + b"\x00" * 64
    rows = MediaDecoder(fake_decode=True)._decode_rows(avi, 5)
    assert len(rows) >= 1
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake_decode=False)._decode_rows(avi, 5)


def test_truncated_ppm_never_hangs():
    with pytest.raises(ValueError):
        decode_ppm(b"P6 12 ")                 # header cut mid-int
    with pytest.raises(ValueError):
        decode_ppm(b"P6 12 bogus 255\n")      # non-digit token
    # through the decoder: falls to fake, no hang, no crash
    rows = MediaDecoder(fake_decode=True)._decode_rows(b"P6 12 ", 1)
    assert len(rows) == 1


def test_unsupported_without_fake_raises():
    dec = MediaDecoder(fake_decode=False)
    with pytest.raises(NotImplementedError):
        dec._decode_rows(b"\x00\x01opaque", 1)
    # but the fake path still covers it when enabled
    rows = MediaDecoder(fake_decode=True)._decode_rows(b"\x00\x01opaque", 20)
    assert len(rows) == 2  # frame_step=10 over 20 fake frames
