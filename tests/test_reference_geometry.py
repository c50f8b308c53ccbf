"""Reference-geometry specs + equivalence trio + as-of leakage property."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from video_features_ray.oracle import extract_doc, windows_for_doc
from video_features_ray.pipelines.extract import extract
from video_features_ray.specs import SPECS, EncoderSpec
from video_features_ray.stages.asof import asof_join


def _long_doc(n, seed=3):
    return np.random.default_rng(seed).integers(0, 49408, n, dtype=np.int32)


def test_vggish_reference_geometry():
    """inner 400/160, outer 96/96 (vggish_params.py:27-35): first example
    needs (96-1)*160 + 400 = 15600 samples; hop 96*160 samples."""
    spec = SPECS["vggish_like_tumbling"]
    assert (spec.inner_win, spec.inner_hop, spec.stack, spec.step) == (400, 160, 96, 96)
    for n, expect in [(15599, 0), (15600, 1), (15600 + 96 * 160 - 1, 1), (15600 + 96 * 160, 2)]:
        rows = windows_for_doc(_long_doc(n), spec)
        assert len(rows) == expect, (n, expect, len(rows))
    rows = windows_for_doc(_long_doc(40000), spec)
    # ts = end-of-window sample time
    last_sample = (0 * 96 + 96 - 1) * 160 + 400 - 1
    assert rows[0]["ts_ms"] == last_sample / spec.base_fps * 1000.0
    assert len(rows[0]["window_tokens"]) == 96


def test_i3d_default_geometry():
    """stack 64 step 64 (configs/i3d.yml:3-4): w2 needs 65 frames."""
    spec = SPECS["i3d_like_default"]
    for n, expect in [(64, 0), (65, 1), (128, 1), (129, 2)]:
        assert len(windows_for_doc(_long_doc(n), spec)) == expect, n
    r = windows_for_doc(_long_doc(129), spec)
    assert len(r[0]["window_tokens"]) == 65  # stack+1 with flow lookahead
    assert r[0]["ts_ms"] == 65 / 25.0 * 1000.0  # POS_MSEC at completion


@pytest.mark.slow
def test_registry_specs_run_through_pipeline():
    """Every registry spec (reference parity grid) runs end-to-end and
    matches the oracle on a long-doc corpus."""
    docs = [("dA", _long_doc(17000, 1)), ("dB", _long_doc(40000, 2)), ("dC", _long_doc(63, 4))]
    flat = np.concatenate([t for _, t in docs])
    offs = np.concatenate(([0], np.cumsum([len(t) for _, t in docs])))
    table = pa.table({
        "doc_id": pa.array([d for d, _ in docs]),
        "tokens": pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()),
                                           pa.array(flat, pa.int32())),
        "n_tok": pa.array(np.diff(offs).astype(np.int32)),
        "source": pa.array(["web", "books", "web"]),
    })
    ds = ray.data.from_arrow(table)
    for name, spec in SPECS.items():
        got = extract(ds, spec, encoder_concurrency=2).to_pandas()
        want = []
        for d, toks in docs:
            want.extend(extract_doc(d, toks, spec))
        assert len(got) == len(want), name
        if not len(want):
            continue
        got = got.sort_values(["doc_id", "window_id"]).reset_index(drop=True)
        wdf = pd.DataFrame(want).sort_values(["doc_id", "window_id"]).reset_index(drop=True)
        for g, w in zip(got["window_tokens"], wdf["window_tokens"]):
            assert np.array_equal(np.asarray(g), np.asarray(w)), name
        gm = np.stack([np.asarray(v) for v in got["feature"]])
        wm = np.stack([np.asarray(v) for v in wdf["feature"]])
        np.testing.assert_allclose(gm, wm, rtol=1e-5, atol=1e-6, err_msg=name)


def test_equivalence_trio(tmp_path):
    """Library-call output == written-parquet re-read (reference
    tests/utils.py:117-135 equivalence across sinks/entries)."""
    from video_features_ray.sources.sequences import synthetic_sequences_table

    spec = EncoderSpec("trio_w1", "w1", 8, 4, 16)
    table = synthetic_sequences_table(n_docs=30, mean_n_tok=64, seed=21,
                                      max_n_tok=300, edge_stack=8, edge_step=4)
    lib = extract(ray.data.from_arrow(table), spec, encoder_concurrency=2)
    out = str(tmp_path / "sink")
    lib.write_parquet(out)
    reread = pq.read_table(out).to_pandas()
    lib_df = extract(ray.data.from_arrow(table), spec, encoder_concurrency=2).to_pandas()
    key = ["doc_id", "window_id"]
    a = lib_df.sort_values(key).reset_index(drop=True)
    b = reread.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["ts_ms"], b["ts_ms"])
    for x, y in zip(a["feature"], b["feature"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_asof_zero_leakage():
    """Mutating events strictly after probe ts must not change the asof
    result at that ts (the zero-temporal-leakage property, north_rule)."""
    spec = EncoderSpec("leak_w1", "w1", 8, 4, 8)

    def run(tokens):
        table = pa.table({
            "doc_id": pa.array(["d0"]),
            "tokens": pa.ListArray.from_arrays(
                pa.array([0, len(tokens)], pa.int32()), pa.array(tokens, pa.int32())),
            "n_tok": pa.array([len(tokens)], pa.int32()),
            "source": pa.array(["web"]),
        })
        windows = extract(ray.data.from_arrow(table), spec, with_features=False)
        probes = ray.data.from_pandas(pd.DataFrame({"doc_id": ["d0"] * 4,
                                                    "ts_q": [100.0, 300.0, 500.0, 700.0]}))
        j = asof_join(probes, windows.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"], "ts_ms": b["ts_ms"],
                                "window_id": b["window_id"]}), batch_format="pyarrow"),
            key="doc_id", left_ts="ts_q", right_ts="ts_ms", num_buckets=2)
        out = j.to_pandas().sort_values("ts_q").reset_index(drop=True)
        out["window_id_r"] = out["window_id_r"].fillna(-1).astype(np.int64)
        return out

    base_tokens = (np.arange(60) % 97).astype(np.int32)
    mut = base_tokens.copy()
    # probe at 500 ms → windows with ts <= 500 end at pos <= 12 (fps 25);
    # mutate tokens at positions > 13 only
    mut[20:] = 7
    a, b = run(base_tokens), run(mut)
    for ts_q in [100.0, 300.0, 500.0]:
        ra = a[a["ts_q"] == ts_q].iloc[0]
        rb = b[b["ts_q"] == ts_q].iloc[0]
        assert ra["window_id_r"] == rb["window_id_r"]
