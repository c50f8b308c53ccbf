"""Property-based checks (hypothesis) for the feature-engineering
family: each operator against a naive pandas reference on arbitrary
small inputs, at varying partitionings — the engine property under
test is batching/bucketing invariance of the fit/transform split."""

import pytest
import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from video_features_ray.stages.features import (
    grouped_variance,
    hash_split,
    mean_target_encode,
    minmax_normalize,
    multi_lag,
    winsorize,
    zscore_normalize,
)
from video_features_ray.stages.joins import grouped_regression

_SETTINGS = dict(max_examples=10, deadline=None)


@st.composite
def keyed_ints(draw, cols=("v",), lo=-1000, hi=1000):
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    n = draw(st.integers(2, 120))
    df = pd.DataFrame({"k": rng.integers(0, 5, n).astype(np.int64),
                       "row": np.arange(n, dtype=np.int64)})
    for c in cols:
        df[c] = rng.integers(lo, hi, n).astype(np.int64)
    return df, draw(st.integers(1, 4)), draw(st.integers(2, 8))


def _ds(df, parts):
    return ray.data.from_pandas(df).repartition(parts)


@given(keyed_ints(cols=("x",)))
@settings(**_SETTINGS)
def test_grouped_variance_property(case):
    df, parts, buckets = case
    got = (grouped_variance(_ds(df, parts), ["k"], "x",
                            num_buckets=buckets)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in got.iterrows():
        g = df[df["k"] == row["k"]]["x"]
        assert row["n"] == len(g)
        if len(g) > 1:
            assert np.isclose(row["var"], g.var(ddof=1), equal_nan=True)


@given(keyed_ints(cols=("x",)))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_zscore_property(case):
    df, parts, buckets = case
    got = (zscore_normalize(_ds(df, parts), "k", "x",
                            num_buckets=buckets)
           .to_pandas().sort_values("row").reset_index(drop=True))
    ref = df.sort_values("row").reset_index(drop=True)
    grp = ref.groupby("k")["x"]
    want = (ref["x"] - grp.transform("mean")) / grp.transform("std")
    # zero-variance groups: engine yields NaN, pandas yields NaN via 0/0
    assert np.allclose(got["z"].to_numpy(), want.to_numpy(), equal_nan=True)


@given(keyed_ints(cols=("x",)))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_minmax_property(case):
    df, parts, buckets = case
    got = (minmax_normalize(_ds(df, parts), "k", "x",
                            num_buckets=buckets)
           .to_pandas().sort_values("row").reset_index(drop=True))
    ref = df.sort_values("row").reset_index(drop=True)
    grp = ref.groupby("k")["x"]
    rng = grp.transform("max") - grp.transform("min")
    want = (ref["x"] - grp.transform("min")) / rng.where(rng > 0)
    assert np.allclose(got["mm"].to_numpy(), want.to_numpy(), equal_nan=True)


@given(keyed_ints(cols=("t",)))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_target_encode_property(case):
    df, parts, buckets = case
    got = (mean_target_encode(_ds(df, parts), "k", "t",
                              num_buckets=buckets)
           .to_pandas().sort_values("row").reset_index(drop=True))
    ref = df.sort_values("row").reset_index(drop=True)
    want = ref.groupby("k")["t"].transform("mean")
    assert np.allclose(got["te"].to_numpy(), want.to_numpy())


@given(keyed_ints(cols=("x", "y")))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_grouped_regression_property(case):
    df, parts, buckets = case
    got = (grouped_regression(_ds(df, parts), ["k"], "x", "y",
                              num_buckets=buckets)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in got.iterrows():
        g = df[df["k"] == row["k"]]
        if g["x"].nunique() > 1:
            slope, intercept = np.polyfit(g["x"], g["y"], 1)
            assert np.isclose(row["slope"], slope)
            assert np.isclose(row["intercept"], intercept)
        else:
            assert np.isnan(row["slope"])


@given(keyed_ints(cols=("x",)))
@settings(**_SETTINGS)
def test_multi_lag_property(case):
    df, parts, buckets = case
    got = (multi_lag(_ds(df, parts), "k", "row", "x", lags=(1, 2),
                     leads=(1,), num_buckets=buckets)
           .to_pandas().sort_values("row").reset_index(drop=True))
    ref = df.sort_values("row").reset_index(drop=True)
    for k in (1, 2):
        want = ref.groupby("k")["x"].shift(k)
        assert np.allclose(got[f"lag_{k}"].to_numpy(), want.to_numpy(),
                           equal_nan=True)
    want = ref.groupby("k")["x"].shift(-1)
    assert np.allclose(got["lead_1"].to_numpy(), want.to_numpy(),
                       equal_nan=True)


@given(keyed_ints(cols=("x",)))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_winsorize_bounds_property(case):
    df, parts, buckets = case
    got = (winsorize(_ds(df, parts), "k", "x", lo_q=0.1, hi_q=0.9,
                     num_buckets=buckets)
           .to_pandas().sort_values("row").reset_index(drop=True))
    ref = df.sort_values("row").reset_index(drop=True)
    for k, g in ref.groupby("k"):
        lo = np.quantile(g["x"], 0.1)
        hi = np.quantile(g["x"], 0.9)
        w = got.loc[got["k"] == k, "w"].to_numpy()
        assert np.allclose(w, np.clip(g["x"].to_numpy().astype(float),
                                      lo, hi))


@given(keyed_ints(cols=()))
@settings(**_SETTINGS)
def test_hash_split_partition_invariance(case):
    df, parts, _ = case
    a = (hash_split(_ds(df, parts), "k").to_pandas()
         .sort_values("row")["split"].tolist())
    b = (hash_split(_ds(df, 1), "k").to_pandas()
         .sort_values("row")["split"].tolist())
    assert a == b
