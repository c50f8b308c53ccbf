"""Per-entity npy/pkl sinks + skip-existing anti-join + flow colorization."""

import os
import pickle

import numpy as np
import pyarrow as pa
import ray.data

from video_features_ray.functions.flowviz import flow_to_rgb, make_colorwheel
from video_features_ray.pipelines.extract import extract
from video_features_ray.sources.sequences import synthetic_sequences_table
from video_features_ray.sources.sinks import namespaced_dir, skip_existing, write_entity_files
from video_features_ray.specs import EncoderSpec

SPEC = EncoderSpec("t_sink", "w1", 8, 4, 8)


def _features():
    table = synthetic_sequences_table(n_docs=12, mean_n_tok=64, seed=17,
                                      max_n_tok=200, edge_stack=8, edge_step=4)
    return table, extract(ray.data.from_arrow(table), SPEC, encoder_concurrency=2)


def test_write_entity_npy_and_pickle(tmp_path):
    table, feats = _features()
    out_npy = namespaced_dir(str(tmp_path), "t_sink", "proj/v1")
    assert out_npy.endswith("t_sink/proj_v1")  # '/'→'_' namespacing
    n = write_entity_files(feats, out_npy, fmt="npy")
    assert n > 0
    # one entity: matrix + ts + fps triple round-trips
    docs = [f for f in os.listdir(out_npy) if f.endswith("_feature.npy")]
    assert len(docs) == n
    doc = docs[0][: -len("_feature.npy")]
    mat = np.load(os.path.join(out_npy, f"{doc}_feature.npy"))
    ts = np.load(os.path.join(out_npy, f"{doc}_timestamps_ms.npy"))
    assert mat.shape[0] == ts.shape[0] and mat.shape[1] == SPEC.dim

    _, feats2 = _features()
    out_pkl = str(tmp_path / "pkl")
    write_entity_files(feats2, out_pkl, fmt="pickle")
    pkls = [f for f in os.listdir(out_pkl) if f.endswith(".pkl")]
    with open(os.path.join(out_pkl, pkls[0]), "rb") as fh:
        d = pickle.load(fh)
    assert set(d) == {"feature", "timestamps_ms", "fps"}
    # npy == pickle content for the same doc (reference asserts this,
    # tests/utils.py:117-127)
    doc0 = pkls[0][: -len("_feature.pkl")]
    np.testing.assert_array_equal(
        d["feature"], np.load(os.path.join(out_npy, f"{doc0}_feature.npy"))
    ) if os.path.exists(os.path.join(out_npy, f"{doc0}_feature.npy")) else None


def test_skip_existing(tmp_path):
    table, feats = _features()
    out = str(tmp_path / "out")
    write_entity_files(feats, out, fmt="npy")
    ds = ray.data.from_arrow(table)
    remaining = skip_existing(ds, out, fmt="npy").to_pandas()
    # every doc that produced windows is skipped; zero-window docs remain
    produced = set()
    for f in os.listdir(out):
        if f.endswith("_feature.npy"):
            produced.add(f[: -len("_feature.npy")])
    assert set(remaining["doc_id"]) == set(table["doc_id"].to_pylist()) - produced


def test_flowviz():
    wheel = make_colorwheel()
    assert wheel.shape == (55, 3) and wheel.dtype == np.uint8
    u = np.array([1.0, -1.0, 0.0, 0.0, 0.0])
    v = np.array([0.0, 0.0, 1.0, -1.0, 0.0])
    rgb = flow_to_rgb(u, v)
    assert rgb.shape == (5, 3) and rgb.dtype == np.uint8
    # zero flow → white; distinct directions → distinct colors
    assert (rgb[4] > 250).all()
    assert not np.array_equal(rgb[0], rgb[1])
    assert not np.array_equal(rgb[2], rgb[3])
    # deterministic
    np.testing.assert_array_equal(rgb, flow_to_rgb(u, v))
    # 2-D field shape preserved
    field = flow_to_rgb(np.ones((4, 6)), np.zeros((4, 6)))
    assert field.shape == (4, 6, 3)
