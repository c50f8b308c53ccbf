"""Windowing + encoder vs. the single-process numpy oracle.

Mirrors the reference test strategy (golden comparison with all_close,
``tests/utils.py:102-135``): the Ray pipeline must match the oracle with
token-array EQUALITY per row and allclose features per entity×window.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from video_features_ray.oracle import extract_doc, windows_for_doc
from video_features_ray.pipelines.extract import extract
from video_features_ray.sources.sequences import synthetic_sequences_table
from video_features_ray.specs import SPECS, EncoderSpec
from video_features_ray.stages.encode import Encoder
from video_features_ray.stages.windows import slide_windows

# small-geometry specs so the synthetic corpus exercises every branch
TEST_SPECS = [
    EncoderSpec("t_w1_8_4", "w1", 8, 4, 16),
    EncoderSpec("t_w1_8_8", "w1", 8, 8, 16),
    EncoderSpec("t_w2_8_4", "w2", 8, 4, 16),
    EncoderSpec("t_w2_8_8", "w2", 8, 8, 16),
    EncoderSpec("t_framewise", "framewise", 1, 1, 8),
    EncoderSpec("t_frame_total5", "framewise", 1, 1, 8, resample_total=5),
    EncoderSpec("t_frame_fps10", "framewise", 1, 1, 8, resample_fps=10.0),
    EncoderSpec("t_w1_fps15", "w1", 6, 3, 8, resample_fps=15.0),
    EncoderSpec("t_w2_fps50", "w2", 6, 3, 8, resample_fps=50.0),
    EncoderSpec("t_flow", "flow", 2, 1, 8),
    EncoderSpec("t_vggish", "vggish", 4, 4, 8, inner_win=20, inner_hop=8),
]


def corpus():
    return synthetic_sequences_table(n_docs=40, mean_n_tok=64, seed=7, max_n_tok=600,
                                     edge_stack=8, edge_step=4)


def oracle_frame(table: pa.Table, spec: EncoderSpec) -> pd.DataFrame:
    rows = []
    for doc_id, tokens in zip(table["doc_id"].to_pylist(), table["tokens"].to_pylist()):
        for r in extract_doc(doc_id, np.array(tokens, dtype=np.int32), spec):
            rows.append(r)
    return pd.DataFrame(rows)


def run_batchwise(table: pa.Table, spec: EncoderSpec, batch_rows: int) -> pd.DataFrame:
    """Run window+encode stage functions directly over arbitrary batch splits
    (checks batch-boundary invariance without Ray overhead)."""
    enc = Encoder(spec)
    outs = []
    for start in range(0, len(table), batch_rows):
        piece = table.slice(start, batch_rows)
        w = slide_windows(piece, spec)
        outs.append(enc(w))
    return pa.concat_tables(outs).to_pandas()


def compare(got: pd.DataFrame, want: pd.DataFrame, spec: EncoderSpec):
    assert len(got) == len(want), f"{spec.name}: row count {len(got)} != {len(want)}"
    if len(want) == 0:
        return
    key = ["doc_id", "window_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert (got["window_id"] == want["window_id"]).all()
    np.testing.assert_allclose(got["ts_ms"], want["ts_ms"], rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["fps"], want["fps"], rtol=0, atol=1e-12)
    for g, w in zip(got["window_tokens"], want["window_tokens"]):
        assert np.array_equal(np.asarray(g), np.asarray(w)), f"{spec.name}: token mismatch"
    for col in ["feature"] + (["feature_flow"] if spec.kind == "w2" else []):
        gm = np.stack([np.asarray(v) for v in got[col]])
        wm = np.stack([np.asarray(v) for v in want[col]])
        np.testing.assert_allclose(gm, wm, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("spec", TEST_SPECS, ids=lambda s: s.name)
def test_stage_matches_oracle(spec):
    table = corpus()
    want = oracle_frame(table, spec)
    got = run_batchwise(table, spec, batch_rows=len(table))
    compare(got, want, spec)


@pytest.mark.parametrize("spec", TEST_SPECS[:4], ids=lambda s: s.name)
@pytest.mark.parametrize("batch_rows", [1, 7, 1000])
def test_batch_size_invariance(spec, batch_rows):
    """Output must not depend on how rows are batched (SURVEY §7.4)."""
    table = corpus()
    want = oracle_frame(table, spec)
    got = run_batchwise(table, spec, batch_rows=batch_rows)
    compare(got, want, spec)


@pytest.mark.parametrize("spec", TEST_SPECS, ids=lambda s: s.name)
@pytest.mark.slow
def test_ray_pipeline_matches_oracle(spec):
    import ray.data

    table = corpus()
    ds = ray.data.from_arrow(table).repartition(5)
    got = extract(ds, spec).to_pandas()
    want = oracle_frame(table, spec)
    compare(got, want, spec)


def test_edge_doc_window_counts():
    """Pin FIXTURES.md edge rows: empty, sub-stack, ==stack, ragged ±1."""
    spec = EncoderSpec("t_edge", "w1", 8, 4, 4)
    for n, expect in [(0, 0), (7, 0), (8, 1), (11, 1), (12, 2), (15, 2), (16, 3)]:
        rows = windows_for_doc(np.arange(n, dtype=np.int32), spec)
        assert len(rows) == expect, (n, expect, len(rows))
    spec2 = EncoderSpec("t_edge2", "w2", 8, 4, 4)
    for n, expect in [(8, 0), (9, 1), (12, 1), (13, 2)]:
        rows = windows_for_doc(np.arange(n, dtype=np.int32), spec2)
        assert len(rows) == expect, (n, expect, len(rows))


def test_zero_leakage():
    """Perturbing tokens after a window's ts must not change its feature."""
    spec = EncoderSpec("t_leak", "w2", 8, 4, 16)
    tokens = np.arange(100, dtype=np.int32) % 500
    base = extract_doc("d", tokens, spec)
    mut = tokens.copy()
    # first w2 window consumes tokens [0, 9); ts covers up to pos 8
    mut[20:] = 0
    changed = extract_doc("d", mut, spec)
    np.testing.assert_array_equal(base[0]["window_tokens"], changed[0]["window_tokens"])
    np.testing.assert_allclose(base[0]["feature"], changed[0]["feature"])
    np.testing.assert_allclose(base[0]["feature_flow"], changed[0]["feature_flow"])
