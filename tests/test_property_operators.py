"""Property-based checks (hypothesis) for the round-2 operators: each
distributed operator must equal its single-process pandas/numpy
reference on arbitrary small inputs — keys with ties, empty groups,
negative timestamps, duplicate rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from video_features_ray.stages.events import cumulative_sum, rolling_agg, window_rank
from video_features_ray.stages.joins import hash_join, sliding_aggregate

_SETTINGS = dict(max_examples=15, deadline=None)


def _events_frame(draw):
    n = draw(st.integers(1, 60))
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    return pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 5, n).astype(np.int64),
        "t": rng.integers(-50, 50, n).astype(np.int64),   # ties + negatives
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })


@st.composite
def events(draw):
    return _events_frame(draw)


@given(events(), st.integers(1, 6))
@settings(**_SETTINGS)
def test_rolling_sum_property(df, w):
    got = rolling_agg(ray.data.from_pandas(df).repartition(3), "k", "t", "v",
                      window_rows=w, tie_cols=["eid"]).to_pandas()
    ref = df.sort_values(["k", "t", "eid"], kind="mergesort").copy()
    ref["want"] = (ref.groupby("k", sort=False)["v"]
                   .rolling(w, min_periods=1).sum().reset_index(level=0, drop=True))
    m = got.merge(ref[["eid", "want"]], on="eid")
    assert (m[f"v_rollsum{w}"] == m["want"]).all()


@given(events())
@settings(**_SETTINGS)
def test_cumsum_property(df):
    got = cumulative_sum(ray.data.from_pandas(df).repartition(3), "k", "t", "v",
                         tie_cols=["eid"]).to_pandas()
    ref = df.sort_values(["k", "t", "eid"], kind="mergesort").copy()
    ref["want"] = ref.groupby("k", sort=False)["v"].cumsum()
    m = got.merge(ref[["eid", "want"]], on="eid")
    assert (m["v_cumsum"] == m["want"]).all()


@given(events())
@settings(**_SETTINGS)
def test_rank_property(df):
    got = window_rank(ray.data.from_pandas(df).repartition(3), "k",
                      ["v", "eid"], ascending=[False, True]).to_pandas()
    ref = df.sort_values(["k", "v", "eid"], ascending=[True, False, True],
                         kind="mergesort").copy()
    ref["want"] = ref.groupby("k", sort=False).cumcount() + 1
    m = got.merge(ref[["eid", "want"]], on="eid")
    assert (m["rnk"] == m["want"]).all()


@given(events(), events(), st.sampled_from(["inner", "semi", "anti"]))
@settings(**_SETTINGS)
def test_hash_join_property(left, right, how):
    l = left.rename(columns={"eid": "lid"})[["lid", "k"]]
    r = right.rename(columns={"eid": "rid"})[["rid", "k"]].head(20)
    got = hash_join(ray.data.from_pandas(l).repartition(2),
                    ray.data.from_pandas(r).repartition(2),
                    on="k", how=how, num_buckets=4).to_pandas()
    if len(got) == 0:
        # Ray drops the schema of an all-empty map_groups result (0
        # blocks -> no columns); assert the reference is empty too
        if how == "inner":
            assert len(l.merge(r, on="k")) == 0
        else:
            present = set(r["k"])
            assert not any((k in present) == (how == "semi") for k in l["k"])
        return
    if how == "inner":
        want = l.merge(r, on="k")
        key = ["k", "lid", "rid"]
        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True)[sorted(got.columns)],
            want.sort_values(key).reset_index(drop=True)[sorted(want.columns)])
    else:
        present = set(r["k"])
        want_ids = {lid for lid, k in zip(l["lid"], l["k"])
                    if (k in present) == (how == "semi")}
        assert set(got["lid"]) == want_ids


@given(st.integers(0, 10_000), st.integers(1, 4), st.integers(1, 4))
@settings(**_SETTINGS)
def test_sliding_aggregate_property(seed, w_mult, step_units):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 50))
    ts = rng.integers(-100, 100, n).astype(np.float64)
    v = rng.integers(0, 50, n).astype(np.int64)
    step = float(step_units * 10)
    window = float(step * w_mult)
    t = pa.table({"ts": pa.array(ts), "v": pa.array(v)})
    got = (sliding_aggregate(ray.data.from_arrow(t), "ts", "v",
                             window=window, step=step)
           .to_pandas().set_index("window_start"))
    # naive reference: every (start multiple of step) covering any point
    starts = {(np.floor(x / step) - k) * step
              for x in ts for k in range(int(np.ceil(window / step)))}
    for s in starts:
        mask = (ts >= s) & (ts < s + window)
        if mask.any():
            assert got.loc[s, "n"] == mask.sum(), (s, window, step)
            assert got.loc[s, "sum_v"] == v[mask].sum()
    assert set(got.index) <= starts
