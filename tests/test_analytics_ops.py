"""Unit tests for the analytics stage ops (gini_exact,
grouped_lag1_moments) against hand-computed / pandas oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.events import grouped_lag1_moments
from video_features_ray.stages.features import gini_exact


def test_gini_uniform_is_zero():
    ds = ray.data.from_pandas(pd.DataFrame({"x": [5] * 100}))
    n, g = gini_exact(ds, "x")
    assert n == 100
    assert g == pytest.approx(0.0, abs=1e-12)


def test_gini_known_value():
    # x = [1,2,3,4]: G = (2*(1+4+9+16) - 5*10) / (4*10) = 10/40 = 0.25
    ds = ray.data.from_pandas(pd.DataFrame({"x": [3, 1, 4, 2]}))
    n, g = gini_exact(ds, "x")
    assert n == 4
    assert g == pytest.approx(0.25, abs=1e-15)


def test_gini_partition_invariant():
    rng = np.random.default_rng(7)
    x = rng.integers(1, 10_000, size=5_000)
    one = gini_exact(ray.data.from_pandas(pd.DataFrame({"x": x})), "x")
    many = gini_exact(
        ray.data.from_pandas(pd.DataFrame({"x": x})).repartition(23), "x")
    assert one == many


def test_gini_empty_raises():
    ds = ray.data.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=np.int64)}))
    with pytest.raises(ValueError):
        gini_exact(ds, "x")


def _pandas_lag1(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, g in df.sort_values(["k", "ts", "tie"]).groupby("k"):
        v = g["v"].to_numpy(np.int64)
        if len(v) < 2:
            continue
        x, y = v[:-1], v[1:]
        rows.append({"k": k, "n_pairs": len(x), "sx": x.sum(), "sy": y.sum(),
                     "sxx": (x * x).sum(), "syy": (y * y).sum(),
                     "sxy": (x * y).sum()})
    return pd.DataFrame(rows)


def test_lag1_moments_match_pandas():
    rng = np.random.default_rng(11)
    n = 4_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "d"], size=n),
        "ts": rng.integers(0, 10_000_000, size=n),
        "tie": np.arange(n),
        "v": rng.integers(-500, 500, size=n),
    })
    got = (grouped_lag1_moments(
        ray.data.from_pandas(df).repartition(17), "k", "ts", "v",
        tie_col="tie", num_buckets=8)
        .to_pandas().sort_values("k").reset_index(drop=True))
    want = _pandas_lag1(df).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "n_pairs", "sx", "sy", "sxx", "syy", "sxy"]].astype(
            {c: np.int64 for c in ["n_pairs", "sx", "sy", "sxx", "syy", "sxy"]}),
        want.astype(
            {c: np.int64 for c in ["n_pairs", "sx", "sy", "sxx", "syy", "sxy"]}))


def test_lag1_single_row_group_emits_nothing():
    df = pd.DataFrame({"k": ["solo"], "ts": [1], "tie": [0], "v": [42]})
    got = grouped_lag1_moments(ray.data.from_pandas(df), "k", "ts", "v",
                               tie_col="tie", num_buckets=4).to_pandas()
    assert len(got) == 0
