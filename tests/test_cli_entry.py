"""3-way entry equivalence (reference ``tests/utils.py:107-135`` runs
CLI vs API vs fixtures): the ``python -m video_features_ray`` CLI, the
library ``extract()`` call, and the checkpointed CLI path must produce
identical window rows and allclose features on the same input."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from video_features_ray.pipelines.extract import extract
from video_features_ray.sources.sequences import synthetic_sequences_table

SPEC = "r21d_like_16_16"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def seq_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    table = synthetic_sequences_table(n_docs=40, mean_n_tok=64, seed=21,
                                      max_n_tok=300, edge_stack=16, edge_step=16)
    path = str(d / "sequences.parquet")
    pq.write_table(table, path, row_group_size=16)
    return path


def _read_dir(out_dir):
    frames = []
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                frames.append(pq.read_table(os.path.join(root, f)).to_pandas())
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(["doc_id", "window_id"]).reset_index(drop=True)


def _run_cli(args):
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run([sys.executable, "-m", "video_features_ray", *args],
                       capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_specs_lists_registry():
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-m", "video_features_ray", "specs"],
                       capture_output=True, text=True, cwd=REPO, env=env, timeout=120)
    assert r.returncode == 0
    assert SPEC in r.stdout


@pytest.mark.slow
def test_cli_api_checkpoint_equivalence(seq_file, tmp_path):
    import ray.data

    # API path (uses the session-scoped test Ray cluster)
    want = extract(ray.data.read_parquet(seq_file), SPEC).to_pandas()
    want = want.sort_values(["doc_id", "window_id"]).reset_index(drop=True)

    # CLI path (own subprocess + own Ray session)
    out_a = str(tmp_path / "cli_plain")
    res = _run_cli(["extract", "--input", seq_file, "--out", out_a,
                    "--spec", SPEC, "--num-cpus", "4"])
    assert res["rows"] == len(want)
    got_a = _read_dir(out_a)

    # checkpointed CLI path
    out_b = str(tmp_path / "cli_ckpt")
    res_b = _run_cli(["extract", "--input", seq_file, "--out", out_b,
                      "--spec", SPEC, "--checkpoint", "--target-rows", "16",
                      "--num-cpus", "4"])
    assert res_b["committed"] >= 2
    got_b = _read_dir(out_b)

    for got in (got_a, got_b):
        nonfeat = [c for c in want.columns if not c.startswith("feature")]
        pd.testing.assert_frame_equal(got[nonfeat], want[nonfeat])
        # float32 sgemm kernels differ in the last ulp across processes
        # (OpenBLAS picks blocking by runtime affinity) — allclose, not
        # bit-equality, is the contract (reference tests/utils.py:102-104)
        for g, w in zip(got["feature"], want["feature"]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_cli_features_matches_library(tmp_path):
    """CLI `features` subcommand == library events_feature_table on the
    same input (the CLI-vs-API equivalence contract, feature edition)."""
    out_dir = str(tmp_path / "feat_out")
    env = dict(os.environ, RAY_ADDRESS="", PYTHONPATH=REPO)
    env.pop("RAY_ADDRESS")
    r = subprocess.run(
        [sys.executable, "-m", "video_features_ray", "features",
         "--input", "/root/testdata/sf0.001/events.parquet",
         "--out", out_dir, "--num-cpus", "4", "--num-buckets", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=280)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 1000

    from video_features_ray.pipelines.feature_store import (
        events_feature_table,
    )

    lib = (events_feature_table(["/root/testdata/sf0.001/events.parquet"],
                                num_buckets=4)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    frames = []
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(root, f)).to_pandas()
                # partition col comes back as the dir value
                t["split"] = os.path.basename(root).split("=", 1)[1]
                frames.append(t)
    cli = (pd.concat(frames, ignore_index=True)
           .sort_values("event_id").reset_index(drop=True))
    assert len(cli) == len(lib)
    for c in ("lag_1", "roll_mean", "roll_std", "z", "vmax", "dt_prev"):
        assert np.allclose(cli[c].to_numpy(), lib[c].to_numpy(),
                           equal_nan=True), c
    assert (cli["split"].to_numpy() == lib["split"].to_numpy()).all()
