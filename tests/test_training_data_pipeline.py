"""Composed pipeline: validate→dedup→quality→tokenize→chunk→window→encode
→checkpointed write, then resume no-op."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from video_features_ray.pipelines.training_data import (
    TrainingDataConfig,
    run_training_data_pipeline,
)
from video_features_ray.specs import EncoderSpec


@pytest.fixture()
def docs_file(tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog and keeps going for a while longer",
        "the quick brown fox jumps over the lazy dog and keeps going for a while longer",  # dup
        "a completely different document with plenty of words to window over nicely here",
        "short",                       # fails min_chars=10? len 5 → dropped
        "!!!!!!!!!!..........,,,,,,",  # punct ratio ~1 → dropped
        "x" * 500,                     # long doc
    ]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["web"] * len(texts)),
    })
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p, row_group_size=2)
    return p


def _read_out(out_dir):
    frames = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("part="):
            for f in sorted(os.listdir(os.path.join(out_dir, d))):
                if f.endswith(".parquet"):
                    frames.append(pq.read_table(os.path.join(out_dir, d, f)).to_pandas())
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


@pytest.mark.slow
def test_end_to_end(docs_file, tmp_path):
    out = str(tmp_path / "out")
    cfg = TrainingDataConfig(
        spec=EncoderSpec("td_w1", "w1", 16, 8, 8),
        min_chars=10, max_punct_ratio=0.5,
        max_tokens_per_chunk=128,  # forces chunking of the 500-char doc
    )
    summary = run_training_data_pipeline([docs_file], out, cfg, target_rows=4)
    assert summary["committed"] >= 1
    df = _read_out(out)
    docs = set(df["doc_id"].unique())
    assert "1" not in docs       # dup loses to doc 0
    assert "3" not in docs       # too short
    assert "4" not in docs       # too punctuated
    assert {"0", "2", "5"} <= docs
    # the chunked giant doc has contiguous, deduplicated window ids
    w5 = df[df["doc_id"] == "5"].sort_values("window_id")
    assert list(w5["window_id"]) == list(range(len(w5)))
    assert len(w5) == (500 - 16) // 8 + 1
    assert all(len(f) == 8 for f in df["feature"])

    # resume is a no-op
    summary2 = run_training_data_pipeline([docs_file], out, cfg, target_rows=4)
    assert summary2["committed"] == 0
    pd.testing.assert_frame_equal(
        _read_out(out).drop(columns=["feature"]), df.drop(columns=["feature"]))


@pytest.mark.slow
def test_end_to_end_with_near_dedup(tmp_path):
    """near_dedup=True also drops NEAR-duplicates (one-word edit), which
    exact dedup alone keeps."""
    base = "the quick brown fox jumps over the lazy dog and keeps going for a while longer"
    texts = [base,
             base.replace("longer", "today"),   # near-dup of doc 0
             "a completely different document with plenty of words to window over nicely"]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(["web"] * len(texts)),
    })
    p = str(tmp_path / "documents.parquet")
    pq.write_table(t, p, row_group_size=2)

    out = str(tmp_path / "out")
    cfg = TrainingDataConfig(
        spec=EncoderSpec("td_w1n", "w1", 16, 8, 8),
        near_dedup=True, near_dedup_threshold=0.6,
    )
    run_training_data_pipeline([p], out, cfg, target_rows=4)
    docs = set(_read_out(out)["doc_id"].unique())
    assert docs == {"0", "2"}            # near-dup doc 1 dropped, winner kept
