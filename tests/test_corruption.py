"""Span corruption: lossless reconstruction, determinism, mask-rate
band, sentinel numbering, and the distributed pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from video_features_ray.stages.corruption import corrupt_spans, reconstruct


def _batch(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "tokens": pa.array([r[1] for r in rows], pa.list_(pa.int32()))})


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_reconstruction_lossless(seed):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(30):
        n = int(rng.integers(0, 40))
        rows.append((d + seed * 1000,
                     rng.integers(0, 1000, size=n).astype(np.int32)
                     .tolist()))
    out = corrupt_spans(_batch(rows))
    assert len(out) == len(rows)
    for (d, toks), r in zip(rows, out.itertuples()):
        back = reconstruct(r.input_tokens, r.target_tokens)
        assert back == toks, f"doc {d} not reconstructed"
        assert r.n_tok == len(toks)
        assert r.n_masked == sum(1 for t in r.target_tokens if t >= 0)


def test_sentinels_sequential_per_doc():
    rows = [(7, list(range(60))), (8, list(range(60)))]
    out = corrupt_spans(_batch(rows))
    for r in out.itertuples():
        sents = [t for t in r.input_tokens if t <= -100]
        assert sents == [-100 - k for k in range(len(sents))]
        # target stream interleaves each sentinel before its span
        tsents = [t for t in r.target_tokens if t <= -100]
        assert tsents == sents


def test_deterministic_and_batchsize_invariant():
    rows = [(d, list(range(d % 25))) for d in range(50)]
    a = corrupt_spans(_batch(rows))
    b1 = corrupt_spans(_batch(rows[:17]))
    b2 = corrupt_spans(_batch(rows[17:]))
    b = pd.concat([b1, b2], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_mask_rate_band():
    rows = [(d, list(range(300))) for d in range(100)]
    out = corrupt_spans(_batch(rows), span_len=3, mask_every=5)
    rate = out["n_masked"].sum() / out["n_tok"].sum()
    assert 0.12 < rate < 0.28        # nominal 1/5 of spans


def test_distributed_pipeline(ray_session):
    import ray as _ray

    rows = [(d, list(range((d * 13) % 80))) for d in range(200)]
    ds = _ray.data.from_arrow(_batch(rows)).repartition(8)
    out = (ds.map_batches(corrupt_spans, batch_format="pyarrow")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = corrupt_spans(_batch(rows)).sort_values(
        "doc_id").reset_index(drop=True)
    assert (out["n_masked"] == want["n_masked"]).all()
    for a, b in zip(out["input_tokens"], want["input_tokens"]):
        assert list(a) == list(b)
