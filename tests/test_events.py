"""Per-entity stream operators + as-of join vs. pandas oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.asof import asof_join, asof_join_broadcast
from video_features_ray.stages.events import forward_fill, lag_lead, sessionize


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 50, n),
            "ts": rng.integers(0, 100_000, n).astype(np.int64),
            "value": rng.normal(size=n),
        }
    )
    # make (user_id, ts) unique so ordering is deterministic
    df = df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    df.loc[rng.integers(0, len(df), 300), "value"] = np.nan
    return df


def test_lag_lead(events_df):
    ds = ray.data.from_pandas(events_df)
    got = (
        lag_lead(ds, "user_id", "ts", "value", lags=[1, 2], leads=[1], num_buckets=8)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = events_df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    g = want.groupby("user_id", sort=False)["value"]
    for col, series in [
        ("value_lag1", g.shift(1)),
        ("value_lag2", g.shift(2)),
        ("value_lead1", g.shift(-1)),
    ]:
        np.testing.assert_allclose(got[col].to_numpy(), series.to_numpy(), equal_nan=True)


def test_sessionize(events_df):
    gap = 2000.0
    ds = ray.data.from_pandas(events_df)
    got = (
        sessionize(ds, "user_id", "ts", gap, num_buckets=8)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = events_df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    new = want.groupby("user_id", sort=False)["ts"].diff() > gap
    want_sid = new.groupby(want["user_id"], sort=False).cumsum().astype(np.int64)
    np.testing.assert_array_equal(got["session_id"].to_numpy(), want_sid.to_numpy())


def test_forward_fill(events_df):
    ds = ray.data.from_pandas(events_df)
    got = (
        forward_fill(ds, "user_id", "ts", "value", num_buckets=8)
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    want = events_df.sort_values(["user_id", "ts"]).reset_index(drop=True)
    ffill = want.groupby("user_id", sort=False)["value"].ffill()
    np.testing.assert_allclose(got["value_ffill"].to_numpy(), ffill.to_numpy(), equal_nan=True)


def _asof_oracle(left, right, key, ts, direction="backward"):
    out = pd.merge_asof(
        left.sort_values(ts, kind="mergesort"),
        right.sort_values(ts, kind="mergesort").rename(columns={"rv": "rv_r"}),
        on=ts, by=key, direction=direction,
    )
    return out.sort_values([key, ts]).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join(direction):
    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {"k": rng.integers(0, 20, 500), "ts": rng.integers(0, 10_000, 500).astype("int64")}
    ).drop_duplicates(["k", "ts"]).reset_index(drop=True)
    right = pd.DataFrame(
        {"k": rng.integers(0, 25, 300), "ts": rng.integers(0, 10_000, 300).astype("int64"),
         "rv": rng.normal(size=300)}
    ).drop_duplicates(["k", "ts"]).reset_index(drop=True)

    got = (
        asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            key="k", left_ts="ts", direction=direction, num_buckets=8,
        )
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    want = _asof_oracle(left, right, "k", "ts", direction)
    np.testing.assert_array_equal(got["k"].to_numpy(), want["k"].to_numpy())
    np.testing.assert_allclose(got["rv_r"].to_numpy(), want["rv_r"].to_numpy(), equal_nan=True)

    got_b = (
        asof_join_broadcast(ray.data.from_pandas(left), right, key="k", left_ts="ts",
                            direction=direction)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(got_b["rv_r"].to_numpy(), want["rv_r"].to_numpy(), equal_nan=True)


def test_rolling_time_moments_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.events import rolling_time_moments

    rng = np.random.RandomState(17)
    n = 600
    df = pd.DataFrame({
        "k": rng.randint(0, 6, n).astype(np.int64),
        "ts": np.sort(rng.randint(0, 10_000, n)).astype(np.int64),
        "x": rng.randint(0, 1000, n).astype(np.int64),
    })
    out = (rolling_time_moments(ray.data.from_pandas(df), "k", "ts", "x",
                                span_us=500, num_buckets=4)
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    # naive reference: for each row, all same-key rows in [t-500, t]
    for i in rng.choice(n, 60, replace=False):
        r = ref.iloc[i]
        w = ref[(ref["k"] == r["k"]) & (ref["ts"] >= r["ts"] - 500)
                & (ref["ts"] <= r["ts"])]["x"].to_numpy()
        # out rows with same (k, ts) all share the full-peer value
        got = out[(out["k"] == r["k"]) & (out["ts"] == r["ts"])]
        assert np.allclose(got["roll_mean"].to_numpy(), w.mean())
        if len(w) > 1:
            assert np.allclose(got["roll_std"].to_numpy(), w.std(ddof=1))
        else:
            assert got["roll_std"].isna().all()


# --------------------------------------------------------------- funnel

def test_funnel_cascade_strict_order(ray_session):
    """A purchase BEFORE the first post-signup click must not count;
    the chain requires strictly increasing timestamps."""
    import pyarrow as pa
    from video_features_ray.stages.events import funnel_stages

    def t(s):
        return np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")

    tbl = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3, 3], pa.int64()),
        "event_type": pa.array(["signup", "click", "purchase",
                                "purchase", "signup", "click",
                                "click", "signup"]),
        "ts": pa.array([t(1), t(2), t(3),
                        t(1), t(2), t(3),
                        t(1), t(2)], pa.timestamp("us"))})
    out = (funnel_stages(ray.data.from_arrow(tbl),
                         ["signup", "click", "purchase"], num_buckets=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # user 1: full chain; user 2: purchase precedes signup → stage 2;
    # user 3: click precedes signup → stage 1
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["funnel_stage"].tolist() == [3, 2, 1]
    assert pd.isna(out.loc[2, "click_ts"])


def test_throttle_keeps_first_and_spaced(ray_session):
    import pyarrow as pa
    from video_features_ray.stages.events import throttle_events

    base = np.datetime64("2024-01-01T00:00:00", "us")
    us = np.timedelta64(1, "us")
    tbl = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["click"] * 4 + ["view"]),
        "ts": pa.array([base, base + 50 * us, base + 200 * us,
                        base + 301 * us, base + 60 * us],
                       pa.timestamp("us"))})
    out = (throttle_events(ray.data.from_arrow(tbl), 100, num_buckets=2)
           .to_pandas().sort_values("event_id"))
    # clicks at +0 (first), +50 (dropped, gap 50), +200 (kept, gap 150
    # from +50 — lag semantics, not last-kept), +301 (kept, gap 101);
    # the view stream is independent (first → kept)
    assert out["event_id"].tolist() == [0, 2, 3, 4]


def test_cohort_retention_matrix(ray_session):
    import pyarrow as pa
    from video_features_ray.stages.events import cohort_retention

    def d(day, h=0):
        return np.datetime64(f"2024-01-{day:02d}T{h:02d}:00:00", "us")

    # user 1: first day 1, active days 1,1,2 (dup same-day collapses)
    # user 2: first day 1, active days 1,3
    # user 3: first day 2, active day 2
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([d(1), d(1, 5), d(2), d(1), d(3), d(2)],
                       pa.timestamp("us"))})
    out = (cohort_retention(ray.data.from_arrow(tbl), num_buckets=2)
           .to_pandas())
    day1 = int(np.datetime64("2024-01-01").astype("datetime64[D]")
               .astype(np.int64))
    got = {(r.cohort_day - day1, r.offset_days): r.n_users
           for r in out.itertuples()}
    assert got == {(0, 0): 2, (0, 1): 1, (0, 2): 1, (1, 0): 1}
