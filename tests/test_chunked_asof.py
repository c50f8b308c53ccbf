"""Hot-entity chunked as-of join (round-4 skew item).

A synthetic corpus where ONE key holds ~50% of both sides must produce
bit-identical output through the chunked plan, while every (key, chunk)
task group stays bounded by the planned chunk size + halo — the memory
property that makes the plan safe when a key is data-sized.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from video_features_ray.stages.asof import (asof_join, asof_join_chunked,
                                            plan_hot_chunks)
from video_features_ray.stages.skew import detect_hot_keys

ROWS_PER_CHUNK = 64


def _hot_corpus(seed=0, n_hot=1000, n_cold_keys=20, per_cold=50):
    rng = np.random.default_rng(seed)

    def _side(tag):
        ks = (["hot"] * n_hot
              + [f"u{i}" for i in range(n_cold_keys) for _ in range(per_cold)])
        n = len(ks)
        ts = rng.integers(0, 1_000_000, n)
        return pd.DataFrame({
            "k": ks, "ts": ts,
            f"{tag}_id": np.arange(n, dtype=np.int64),
            f"{tag}_v": rng.normal(size=n)})

    return _side("l"), _side("r")


def _sorted(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_chunked_equals_unchunked_hot_key(direction):
    l, r = _hot_corpus()
    # right ts must be unique per key for a deterministic tie pick
    r = r.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    lds, rds = ray.data.from_pandas(l), ray.data.from_pandas(r)

    hot = detect_hot_keys(lds, "k", threshold_frac=0.2)
    assert hot == ["hot"], hot
    cuts = plan_hot_chunks(rds, "k", "ts", hot, rows_per_chunk=ROWS_PER_CHUNK)
    assert "hot" in cuts and len(cuts["hot"]) >= 5   # really multi-chunk

    plain = _sorted(asof_join(lds, rds, "k", "ts", direction=direction,
                              num_buckets=8).to_pandas())
    chunked = _sorted(asof_join_chunked(
        lds, rds, "k", "ts", direction=direction, hot_cuts=cuts,
        num_buckets=8).to_pandas())
    pd.testing.assert_frame_equal(plain, chunked)


def test_chunked_bounded_task_groups():
    """No (key, chunk) group — the unit one bucket task materializes —
    may exceed chunk size + halo on either side."""
    l, r = _hot_corpus()
    r = r.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    lds, rds = ray.data.from_pandas(l), ray.data.from_pandas(r)
    cuts = plan_hot_chunks(rds, "k", "ts", ["hot"],
                           rows_per_chunk=ROWS_PER_CHUNK)
    cu = cuts["hot"]

    hot_l = l[l["k"] == "hot"]
    hot_r = r[r["k"] == "hot"]
    lc = np.searchsorted(cu, hot_l["ts"].to_numpy(), side="right")
    rc = np.searchsorted(cu, hot_r["ts"].to_numpy(), side="right")
    l_sizes = pd.Series(lc).value_counts()
    r_sizes = pd.Series(rc).value_counts()
    # sampled cuts aren't exact quantiles — allow 3x planning slack, an
    # order of magnitude below the unchunked single-task size (~1000)
    bound = ROWS_PER_CHUNK * 3
    assert l_sizes.max() <= bound, l_sizes.sort_values().tail()
    # per-task right side = own chunk + previous chunk's halo replica
    r_task = r_sizes.add(r_sizes.shift(1), fill_value=0)
    assert r_task.max() <= 2 * bound, r_task.sort_values().tail()


def test_chunked_with_tolerance_and_no_hot_cuts():
    l, r = _hot_corpus(seed=3)
    r = r.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    lds, rds = ray.data.from_pandas(l), ray.data.from_pandas(r)
    cuts = plan_hot_chunks(rds, "k", "ts", ["hot"], rows_per_chunk=50)
    plain = _sorted(asof_join(lds, rds, "k", "ts", tolerance=5000,
                              num_buckets=8).to_pandas())
    chunked = _sorted(asof_join_chunked(lds, rds, "k", "ts",
                                        tolerance=5000, hot_cuts=cuts,
                                        num_buckets=8).to_pandas())
    pd.testing.assert_frame_equal(plain, chunked)
    # empty cuts → falls through to the plain join
    same = _sorted(asof_join_chunked(lds, rds, "k", "ts", tolerance=5000,
                                     hot_cuts={}, num_buckets=8).to_pandas())
    pd.testing.assert_frame_equal(plain, same)


def test_auto_join_salt_threshold_output_identical():
    from video_features_ray.stages.joins import auto_join, hash_join

    rng = np.random.default_rng(1)
    left = pd.DataFrame({
        "k": np.where(rng.random(2000) < 0.5, 7,
                      rng.integers(0, 40, 2000)).astype(np.int64),
        "x": rng.normal(size=2000)})
    right = pd.DataFrame({"k": np.arange(40, dtype=np.int64),
                          "name": [f"n{i}" for i in range(40)]})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    for how in ("inner", "left", "semi", "anti"):
        plain = _sorted(hash_join(lds, rds, on="k", how=how,
                                  num_buckets=8).to_pandas())
        salted = _sorted(auto_join(lds, rds, on="k", how=how,
                                   broadcast_limit=0, salt_threshold=0.1,
                                   salt_n=4, num_buckets=8).to_pandas())
        pd.testing.assert_frame_equal(plain, salted)
