"""Giant-sequence chunking with halo must be invisible in the output."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.specs import EncoderSpec
from video_features_ray.stages.skew import (
    make_offset_window_stage,
    salt_repartition,
    split_giant_sequences,
)
from video_features_ray.stages.windows import slide_windows


def _corpus(seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for i, n in enumerate([0, 5, 64, 100, 1000, 5000, 12345]):
        rows.append((f"d{i}", rng.integers(0, 49408, n, dtype=np.int32)))
    flat = np.concatenate([t for _, t in rows]) if rows else np.array([], np.int32)
    offs = np.concatenate(([0], np.cumsum([len(t) for _, t in rows])))
    tokens = pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()),
                                      pa.array(flat, pa.int32()))
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows]),
        "tokens": tokens,
        "n_tok": pa.array(np.diff(offs).astype(np.int32)),
        "source": pa.array(["web"] * len(rows)),
    })


@pytest.mark.parametrize("spec", [
    EncoderSpec("sk_w1", "w1", 16, 8, 8),
    EncoderSpec("sk_w1_nooverlap", "w1", 16, 16, 8),
    EncoderSpec("sk_w2", "w2", 16, 8, 8),
    EncoderSpec("sk_flow", "flow", 2, 1, 8),
    EncoderSpec("sk_frame", "framewise", 1, 1, 8),
    EncoderSpec("sk_vgg", "vggish", 8, 8, 8, inner_win=40, inner_hop=16),
    EncoderSpec("sk_vgg_overlap", "vggish", 8, 4, 8, inner_win=40, inner_hop=16),
], ids=lambda s: s.name)
@pytest.mark.parametrize("max_tokens", [256, 1000])
def test_split_invisible(spec, max_tokens):
    table = _corpus()
    want = slide_windows(table, spec).to_pandas()

    ds = ray.data.from_arrow(table)
    split = split_giant_sequences(ds, spec, max_tokens=max_tokens)
    got = (
        split.map_batches(make_offset_window_stage(spec), batch_format="pyarrow")
        .to_pandas()
    )
    key = ["doc_id", "window_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert (got["window_id"].to_numpy() == want["window_id"].to_numpy()).all()
    np.testing.assert_array_equal(got["ts_ms"].to_numpy(), want["ts_ms"].to_numpy())
    for g, w in zip(got["window_tokens"], want["window_tokens"]):
        assert np.array_equal(np.asarray(g), np.asarray(w))


def test_split_bounds_block_size():
    spec = EncoderSpec("sk_b", "w1", 16, 8, 8)
    table = _corpus()
    split = split_giant_sequences(ray.data.from_arrow(table), spec, max_tokens=256).to_pandas()
    assert split["n_tok"].max() <= 256 + spec.window_len
    # original short rows unsplit
    assert (split[split["doc_id"] == "d2"]["pos_offset"] == 0).all()
    assert len(split[split["doc_id"] == "d6"]) > 1


def test_salt_repartition_spreads():
    table = _corpus()
    out = salt_repartition(ray.data.from_arrow(table), "source", n_salt=4).to_pandas()
    assert out["_salt"].nunique() > 1  # hot single-source key gets spread
    assert len(out) == len(table)


def test_mixed_batch_nongiant_rows_pass_whole():
    """A non-giant row whose length lies in (body+halo, max_tokens]
    must pass through untouched even when a giant row shares its batch
    — the vector path used to cap it at body+halo (silent truncation
    whenever (max_tokens - halo) is not a step multiple)."""
    spec = EncoderSpec("sk_trunc", "w1", 152, 128, 8)  # halo 24: body+halo 1928 < 2000
    max_tokens = 2000
    rng = np.random.default_rng(3)
    rows = [("near", rng.integers(0, 100, 1990, dtype=np.int32)),   # non-giant, > body+halo
            ("giant", rng.integers(0, 100, 5000, dtype=np.int32))]  # forces the vector path
    flat = np.concatenate([t for _, t in rows])
    offs = np.concatenate(([0], np.cumsum([len(t) for _, t in rows])))
    tab = pa.table({
        "doc_id": pa.array([d for d, _ in rows]),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offs, pa.int64()).cast(pa.int32()),
            pa.array(flat, pa.int32())),
        "n_tok": pa.array(np.diff(offs).astype(np.int32)),
        "source": pa.array(["web", "web"]),
    })
    out = split_giant_sequences(ray.data.from_arrow(tab), spec,
                                max_tokens=max_tokens).to_pandas()
    near = out[out["doc_id"] == "near"]
    assert len(near) == 1
    assert int(near["n_tok"].iloc[0]) == 1990
    np.testing.assert_array_equal(np.asarray(near["tokens"].iloc[0]),
                                  rows[0][1])
