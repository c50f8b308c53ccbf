"""Hostile-driver regression: worker-executed kernels must not perform
function-level package imports.

Emulates `ray job submit` from a foreign cwd: the subprocess calls
ray.init() BEFORE the package is importable, then adds /repo to
sys.path and runs a pipeline whose batch kernels execute on workers
(which snapshotted the pre-insert sys.path). With cloudpickle by-value
registration the shipped code works — UNLESS a worker-executed function
body does a live `from .x import y`, which re-imports the package in
the worker frame and dies with ModuleNotFoundError. The chunked-window
stage (`windows_with_offset`) regressed exactly this way in round 3.
"""
from __future__ import annotations

import pytest
import os
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys, tempfile, ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext; DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, {repo!r})          # AFTER ray.init — the hostile-driver ordering
import __ray_entry__                   # registers the package by value
from video_features_ray.pipelines.training_data import (
    TrainingDataConfig, run_training_data_pipeline)
from video_features_ray.specs import get_spec
out = tempfile.mkdtemp(prefix="vfr_hostile_test_")
cfg = TrainingDataConfig(spec=get_spec("r21d_like_16_16"),
                         near_dedup=True, max_tokens_per_chunk=64)
summary = run_training_data_pipeline([{parquet!r}], out, cfg, target_rows=500)
assert summary["committed"] >= 1, summary
import glob
rows = sum(pq.num_rows for pq in
           (__import__("pyarrow.parquet", fromlist=["x"]).ParquetFile(f)
            .metadata for f in glob.glob(out + "/**/*.parquet", recursive=True)))
print("HOSTILE_OK", rows)
ray.shutdown()
"""


@pytest.mark.slow
def test_worker_kernels_survive_hostile_driver(tmp_path):
    # 40 docs, several longer than max_tokens_per_chunk=64 so the
    # split_giant_sequences -> windows_with_offset worker path runs
    texts = [f"doc {i} " + ("tok " * (20 + 25 * (i % 4))) for i in range(40)]
    p = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": [str(i) for i in range(40)],
        "text": texts,
        "source": [f"s{i % 3}" for i in range(40)],
    }), p)
    script = SCRIPT.format(repo=REPO, parquet=p)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=420, cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "HOSTILE_OK" in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
    assert "ModuleNotFoundError" not in r.stderr


def test_no_function_level_relative_imports_in_worker_kernels():
    """Static guard: the known worker-executed modules must have no
    indented relative imports (driver-side builders may keep lazy
    imports; worker kernels may not). Extend this list when a new
    module gains worker-executed top-level functions."""
    import re
    worker_modules = ["video_features_ray/stages/skew.py",
                      "video_features_ray/stages/windows.py",
                      "video_features_ray/stages/encode.py"]
    offenders = []
    for m in worker_modules:
        src = open(os.path.join(REPO, m)).read()
        for i, line in enumerate(src.splitlines(), 1):
            if re.match(r"\s+from \.", line):
                offenders.append(f"{m}:{i}: {line.strip()}")
    assert not offenders, offenders
