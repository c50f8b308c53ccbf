"""Property-based checks (hypothesis) for the newest operators:
grouped corr/latest/string_agg/quantile_cont, group_share, pivot-sum,
distinct_values and the salted join — each against a naive pandas
reference on arbitrary small inputs, at varying partitionings (the
engine property under test is batching/bucketing invariance)."""

import numpy as np
import pandas as pd
import ray.data
from hypothesis import given, settings, strategies as st

from video_features_ray.stages.dedup import distinct_values
from video_features_ray.stages.events import group_share
from video_features_ray.stages.joins import (
    categorical_pivot_sum,
    grouped_corr,
    grouped_latest,
    grouped_quantile_cont,
    grouped_string_agg,
    hash_join,
)

_SETTINGS = dict(max_examples=10, deadline=None)


@st.composite
def keyed_ints(draw, cols=("v",), lo=-1000, hi=1000):
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    n = draw(st.integers(2, 120))
    df = pd.DataFrame({"k": rng.integers(0, 5, n).astype(np.int64)})
    for c in cols:
        df[c] = rng.integers(lo, hi, n).astype(np.int64)
    return df, draw(st.integers(1, 4)), draw(st.integers(2, 8))


def _ds(df, parts):
    return ray.data.from_pandas(df).repartition(parts)


@given(keyed_ints(cols=("x", "y")))
@settings(**_SETTINGS)
def test_grouped_corr_property(case):
    df, parts, buckets = case
    got = (grouped_corr(_ds(df, parts), ["k"], "x", "y", num_buckets=buckets)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for _, row in got.iterrows():
        g = df[df["k"] == row["k"]]
        assert row["n"] == len(g)
        if g["x"].nunique() > 1 and g["y"].nunique() > 1:
            want = np.corrcoef(g["x"], g["y"])[0, 1]
            assert abs(row["corr"] - want) < 1e-9
        else:
            assert np.isnan(row["corr"])


@given(keyed_ints(cols=("ts", "tie")))
@settings(**_SETTINGS)
def test_grouped_latest_property(case):
    df, parts, buckets = case
    got = (grouped_latest(_ds(df, parts), "k", "ts", tie_cols=["tie"],
                          num_buckets=buckets)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "ts", "tie"], ascending=[True, False, False],
                           kind="mergesort")
            .groupby("k", sort=False).head(1)
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "ts", "tie"]],
                                  want[["k", "ts", "tie"]])


@given(keyed_ints(cols=("o", "v")))
@settings(**_SETTINGS)
def test_grouped_string_agg_property(case):
    df, parts, buckets = case
    df = df.copy()
    df["s"] = "s" + df["v"].astype(str)
    # make the order total so the concat is deterministic
    df["o"] = np.arange(len(df), dtype=np.int64)
    got = (grouped_string_agg(_ds(df, parts), "k", "s", order_cols=["o"],
                              sep="|", num_buckets=buckets, out_col="path")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "o"], kind="mergesort")
            .groupby("k", sort=False)["s"].agg("|".join)
            .rename("path").reset_index()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


@given(keyed_ints(), st.sampled_from([0.1, 0.5, 0.9]))
@settings(**_SETTINGS)
def test_grouped_quantile_cont_property(case, q):
    df, parts, buckets = case
    got = grouped_quantile_cont(_ds(df, parts), "k", "v", q=q,
                                num_buckets=buckets)
    for _, row in got.iterrows():
        want = float(np.quantile(df[df["k"] == row["k"]]["v"].to_numpy(), q,
                                 method="linear"))
        assert abs(row[f"q{q}"] - want) < 1e-9


@given(keyed_ints(lo=1, hi=50))
@settings(**_SETTINGS)
def test_group_share_property(case):
    df, parts, buckets = case
    df = df.assign(rid=np.arange(len(df), dtype=np.int64))
    got = (group_share(_ds(df, parts), "k", "v", num_buckets=buckets,
                       out_col="share")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    want = df["v"] / df.groupby("k")["v"].transform("sum")
    np.testing.assert_allclose(
        got["share"].to_numpy(),
        want.iloc[got["rid"].to_numpy()].to_numpy(), rtol=0, atol=0)


@given(keyed_ints(cols=("v", "c")))
@settings(**_SETTINGS)
def test_pivot_sum_property(case):
    df, parts, buckets = case
    df = df.copy()
    df["cat"] = "c" + (df["c"] % 3).astype(str)
    cats = ["c0", "c1", "c2"]
    got = (categorical_pivot_sum(_ds(df, parts), "k", "cat", "v", cats,
                                 num_buckets=buckets)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.pivot_table(index="k", columns="cat", values="v",
                           aggfunc="sum", fill_value=0)
            .reindex(columns=cats, fill_value=0).astype(np.int64))
    want.columns = [f"sum_{c}" for c in cats]
    want = want.reset_index().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@given(keyed_ints())
@settings(**_SETTINGS)
def test_distinct_values_property(case):
    df, parts, buckets = case
    got = (distinct_values(_ds(df, parts), ["k", "v"], num_buckets=buckets)
           .to_pandas())
    want = df[["k", "v"]].drop_duplicates()
    assert (sorted(map(tuple, got.to_numpy().tolist()))
            == sorted(map(tuple, want.to_numpy().tolist())))


@given(keyed_ints(cols=("v",)), st.integers(2, 5))
@settings(max_examples=8, deadline=None)
def test_salted_join_property(case, n_salts):
    df, parts, buckets = case
    right = pd.DataFrame({"k": np.arange(0, 4, dtype=np.int64),
                          "attr": np.arange(0, 4, dtype=np.int64) * 10})
    plain = hash_join(_ds(df, parts), _ds(right, 1), on="k",
                      num_buckets=buckets).to_pandas()
    hot = [int(df["k"].mode().iloc[0])]
    salted = hash_join(_ds(df, parts), _ds(right, 1), on="k",
                       num_buckets=buckets, salt_hot=(hot, n_salts)).to_pandas()
    key = ["k", "v", "attr"]
    pd.testing.assert_frame_equal(
        plain[key].sort_values(key, kind="mergesort").reset_index(drop=True),
        salted[key].sort_values(key, kind="mergesort").reset_index(drop=True))


@given(keyed_ints(cols=("t", "v"), lo=0, hi=30), st.integers(0, 20))
@settings(**_SETTINGS)
def test_rolling_time_agg_property(case, span):
    from video_features_ray.stages.events import rolling_time_agg

    df, parts, buckets = case
    # small t range forces tied (k, t) pairs — the SQL RANGE peer case
    df = df.assign(rid=np.arange(len(df), dtype=np.int64))
    got = (rolling_time_agg(_ds(df, parts), "k", "t", "v", span_us=span,
                            num_buckets=buckets, out_col="rs")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    # naive reference: for each row, sum same-key values in [t-span, t]
    want = []
    for _, row in df.iterrows():
        g = df[(df["k"] == row["k"]) & (df["t"] >= row["t"] - span)
               & (df["t"] <= row["t"])]
        want.append(g["v"].sum())
    assert got["rs"].astype(np.int64).tolist() == want


@given(keyed_ints(cols=("t", "v"), lo=0, hi=1000), st.sampled_from([50.0, 300.0]))
@settings(**_SETTINGS)
def test_ewma_feature_property(case, halflife):
    from video_features_ray.stages.events import ewma_feature

    df, parts, buckets = case
    df = df.assign(rid=np.arange(len(df), dtype=np.int64))
    got = (ewma_feature(_ds(df, parts), "k", "t", "v", halflife_us=halflife,
                        num_buckets=buckets, out_col="e")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    # reference: pandas ewm(times=, adjust=True) per key over tie-collapsed rows
    ref = (df.groupby(["k", "t"], sort=False)["v"].mean().reset_index()
           .sort_values(["k", "t"], kind="mergesort"))
    outs = []
    for k, g in ref.groupby("k", sort=False):
        times = pd.to_datetime(g["t"], unit="us")
        e = g["v"].ewm(halflife=pd.Timedelta(microseconds=int(halflife)),
                       times=times.to_numpy()).mean()
        outs.append(pd.DataFrame({"k": k, "t": g["t"].to_numpy(),
                                  "want": e.to_numpy()}))
    want = pd.concat(outs, ignore_index=True)
    m = got.merge(want, on=["k", "t"], how="left")
    np.testing.assert_allclose(m["e"].to_numpy(), m["want"].to_numpy(),
                               rtol=1e-9, atol=1e-12)


@given(st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_ewma_extreme_span_no_nan(seed):
    """Spans of thousands of halflives used to underflow the single
    anchor into 0/0 = NaN at a key's oldest rows; the epoch carry chain
    must return pandas ewm(times=) values everywhere."""
    from video_features_ray.stages.events import ewma_feature

    rng = np.random.default_rng(seed)
    n = 40
    df = pd.DataFrame({
        "k": rng.integers(0, 2, n).astype(np.int64),
        # spread rows across ~3000 halflives (halflife 1.0 below)
        "t": np.sort(rng.choice(3000, n, replace=False)).astype(np.int64),
        "v": rng.integers(1, 100, n).astype(np.int64),
    })
    df = df.assign(rid=np.arange(n, dtype=np.int64))
    got = (ewma_feature(_ds(df, 2), "k", "t", "v", halflife_us=1.0,
                        num_buckets=3, out_col="e")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    assert not got["e"].isna().any()
    ref = df.sort_values(["k", "t"], kind="mergesort")
    for k, g in ref.groupby("k", sort=False):
        times = pd.to_datetime(g["t"], unit="us")
        e = g["v"].ewm(halflife=pd.Timedelta(microseconds=1),
                       times=times.to_numpy()).mean()
        m = got[got["k"] == k].sort_values("t")
        np.testing.assert_allclose(m["e"].to_numpy(), e.to_numpy(),
                                   rtol=1e-9, atol=1e-12)
