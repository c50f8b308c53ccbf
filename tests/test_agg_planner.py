"""partial_agg min/max extension + byte-based join-plan selection."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.joins import (
    auto_join,
    broadcast_join,
    choose_join_plan,
    hash_join,
    partial_agg,
)


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_partial_agg_min_max_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"k": rng.integers(0, 7, 5000),
                       "v": rng.integers(-1000, 1000, 5000)})
    for combine in ("driver", "distributed"):
        got = partial_agg(ray.data.from_pandas(df), ["k"], sums=["v"],
                          mins=["v"], maxs=["v"], combine=combine).to_pandas()
        want = (df.groupby("k")
                .agg(sum_v=("v", "sum"), min_v=("v", "min"),
                     max_v=("v", "max"), n=("v", "size")).reset_index())
        pd.testing.assert_frame_equal(
            _norm(got.astype({"n": np.int64})), _norm(want))


def test_partial_agg_minmax_only_no_sums():
    df = pd.DataFrame({"k": [1, 1, 2], "v": [5, -3, 9]})
    got = partial_agg(ray.data.from_pandas(df), ["k"], mins=["v"],
                      combine="driver").to_pandas()
    want = df.groupby("k").agg(min_v=("v", "min"), n=("v", "size")).reset_index()
    pd.testing.assert_frame_equal(_norm(got.astype({"n": np.int64})), _norm(want))


def test_choose_join_plan_boundaries():
    assert choose_join_plan(None) == "shuffle"
    assert choose_join_plan(64 << 20) == "broadcast"
    assert choose_join_plan((64 << 20) + 1) == "shuffle"
    assert choose_join_plan(10 << 20, broadcast_limit=1 << 20) == "shuffle"


@pytest.mark.parametrize("limit", [1, 1 << 30])  # force shuffle / broadcast
def test_auto_join_both_plans_agree(limit):
    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 50, 2000),
                         "v": np.arange(2000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 40, dtype=np.int64),
                          "attr": [f"a{i}" for i in range(40)]})
    got = auto_join(ray.data.from_pandas(left), right, "k",
                    broadcast_limit=limit, num_buckets=4).to_pandas()
    ref = broadcast_join(ray.data.from_pandas(left), right, on="k").to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(ref))


def test_auto_join_semi_always_buckets():
    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([2, 4], dtype=np.int64)})
    got = auto_join(ray.data.from_pandas(left), right, "k", how="semi",
                    broadcast_limit=1 << 30, num_buckets=2).to_pandas()
    assert sorted(got["k"].tolist()) == [2, 4]


def test_auto_join_dataset_right_bytes_broadcasts():
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1, 3], dtype=np.int64),
                          "attr": ["x", "y"]})
    got = auto_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    "k", right_bytes=1024, broadcast_limit=1 << 20).to_pandas()
    assert sorted(got["k"].tolist()) == [1, 3]
    # unknown size stays on the bucketed plan and agrees
    got2 = auto_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     "k", num_buckets=2).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(got2))


def test_rollup_numeric_keys_and_label():
    from video_features_ray.stages.joins import cube_agg, rollup_agg

    df = pd.DataFrame({"y": np.array([2020, 2020, 2021], dtype=np.int64),
                       "v": np.array([1, 2, 4], dtype=np.int64)})
    out = rollup_agg(ray.data.from_pandas(df), ["y"], sums=["v"])
    # string keys with the ALL marker; totals correct at both levels
    assert set(out["y"]) == {"2020", "2021", "ALL"}
    assert int(out.loc[out["y"] == "ALL", "sum_v"].iloc[0]) == 7
    cube = cube_agg(ray.data.from_pandas(df), ["y"], sums=["v"])
    assert len(cube) == 3


def test_broadcast_join_null_keys_match_hash_join():
    left = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                         "v": [10, 20, 30]})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "attr": ["a", "b"]})
    b_inner = broadcast_join(ray.data.from_pandas(left), right, on="k").to_pandas()
    h_inner = hash_join(ray.data.from_pandas(left),
                        ray.data.from_pandas(right), "k",
                        num_buckets=2).to_pandas()
    assert sorted(b_inner["v"].tolist()) == sorted(h_inner["v"].tolist()) == [10]
    b_left = broadcast_join(ray.data.from_pandas(left), right, on="k",
                            how="left").to_pandas()
    assert len(b_left) == 3 and b_left["attr"].notna().sum() == 1


def test_hash_join_rejects_unsupported_how():
    l = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError):
        hash_join(l, l, "k", how="right")  # flip the sides instead
    with pytest.raises(ValueError):
        hash_join(l, l, "k", how="cross")
