"""Edge cases for full-outer hash_join, grouped_regression, cume_dist
that the SQL-parity fixtures can't isolate (null keys, degenerate
groups, bucket-width invariance)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.events import cume_dist
from video_features_ray.stages.joins import grouped_regression, hash_join


def _join_pd(l, r, how, on="k"):
    return hash_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                     on, how=how, num_buckets=4).to_pandas()


def test_full_outer_keeps_both_unmatched_sides():
    l = pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]})
    r = pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]})
    out = _join_pd(l, r, "outer").sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert np.isnan(out.loc[0, "b"]) and np.isnan(out.loc[3, "a"])
    assert out.loc[1, "a"] == 20 and out.loc[1, "b"] == 200


def test_full_outer_null_keys_match_nothing_but_survive():
    l = pd.DataFrame({"k": [1.0, np.nan], "a": [10, 99]})
    r = pd.DataFrame({"k": [1.0, np.nan], "b": [100, 88]})
    out = _join_pd(l, r, "outer")
    # 1 matched row + one null-key row from EACH side = 3 rows
    assert len(out) == 3
    matched = out[out["k"] == 1.0]
    assert len(matched) == 1 and matched["a"].iloc[0] == 10 \
        and matched["b"].iloc[0] == 100
    nulls = out[out["k"].isna()]
    assert len(nulls) == 2
    assert sorted(x for x in [nulls["a"].sum(), nulls["b"].sum()]) == [88, 99]


def test_full_outer_duplicate_keys_cross_product():
    l = pd.DataFrame({"k": [1, 1], "a": [10, 11]})
    r = pd.DataFrame({"k": [1, 1, 2], "b": [100, 101, 200]})
    out = _join_pd(l, r, "outer")
    assert len(out) == 5  # 2×2 matched + 1 right-only
    assert len(out[out["k"] == 2]) == 1


def test_full_outer_matches_pandas_reference():
    rng = np.random.RandomState(3)
    l = pd.DataFrame({"k": rng.randint(0, 40, 100), "a": np.arange(100)})
    r = pd.DataFrame({"k": rng.randint(20, 60, 80), "b": np.arange(80)})
    out = _join_pd(l, r, "outer")
    want = l.merge(r, on="k", how="outer")
    cols = ["k", "a", "b"]
    got = out[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert np.allclose(got[c].astype(float), want[c].astype(float),
                           equal_nan=True)


def test_grouped_regression_exact_line():
    # y = 3x + 7 exactly → slope/intercept recovered bit-exact
    x = np.arange(50, dtype=np.int64)
    df = pd.DataFrame({"g": ["a"] * 50, "x": x, "y": 3 * x + 7})
    out = grouped_regression(ray.data.from_pandas(df), ["g"], "x", "y"
                             ).to_pandas()
    assert out["slope"].iloc[0] == 3.0 and out["intercept"].iloc[0] == 7.0


def test_grouped_regression_zero_variance_x_is_null():
    df = pd.DataFrame({"g": ["a", "a"], "x": [5, 5], "y": [1, 2]})
    out = grouped_regression(ray.data.from_pandas(df), ["g"], "x", "y"
                             ).to_pandas()
    assert out["slope"].isna().all() and out["intercept"].isna().all()


@pytest.mark.parametrize("width", [2, 16])
def test_cume_dist_matches_pandas(width):
    rng = np.random.RandomState(11)
    df = pd.DataFrame({"k": rng.randint(0, 9, 300),
                       "id": np.arange(300, dtype=np.int64),
                       "v": rng.randint(0, 50, 300)})
    out = cume_dist(ray.data.from_pandas(df), "k", ["v", "id"],
                    num_buckets=width).to_pandas()
    out = out.sort_values(["k", "v", "id"]).reset_index(drop=True)
    ref = df.sort_values(["k", "v", "id"]).reset_index(drop=True)
    # total order → cume_dist == within-group 1-based position / n
    pos = ref.groupby("k").cumcount().to_numpy() + 1
    n = ref.groupby("k")["k"].transform("size").to_numpy()
    assert np.array_equal(out["cume_dist"].to_numpy(), pos / n)
    assert (out["cume_dist"] <= 1.0).all() and (out["cume_dist"] > 0).all()
