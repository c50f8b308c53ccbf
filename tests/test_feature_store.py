"""Feature-store pipeline: shuffle fusion must be output-identical to
the per-operator plans (bit-equal), and the composed pipeline's schema
and split discipline must hold."""

import numpy as np
import pandas as pd
import ray.data

from video_features_ray.pipelines.feature_store import user_feature_block
from video_features_ray.stages.events import rolling_time_moments
from video_features_ray.stages.features import (
    cumulative_extrema,
    multi_lag,
)


def _events(n=800, seed=23):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "ts_us": np.sort(rng.randint(0, 50_000_000, n)).astype(np.int64),
        "value": np.round(rng.uniform(0, 100, n), 2),
    }).assign(xs=lambda d: np.round(d["value"] * 100).astype(np.int64))


def test_fused_block_bit_equals_individual_operators():
    df = _events()
    ds = ray.data.from_pandas(df).repartition(3)
    fused = (user_feature_block(ds, span_us=5_000_000, num_buckets=4)
             .to_pandas().sort_values("event_id").reset_index(drop=True))

    lag = (multi_lag(ds, "user_id", "ts_us", "value", lags=(1, 2),
                     leads=(1,), num_buckets=8, extra_order=["event_id"])
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    ext = (cumulative_extrema(ds, "user_id", "ts_us", "value",
                              num_buckets=8, extra_order=["event_id"],
                              max_col="vmax", min_col="vmin")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    roll = (rolling_time_moments(ds, "user_id", "ts_us", "xs",
                                 span_us=5_000_000, num_buckets=8)
            .to_pandas().sort_values("event_id").reset_index(drop=True))

    for c in ("lag_1", "lag_2", "lead_1"):
        assert np.array_equal(fused[c].to_numpy(), lag[c].to_numpy(),
                              equal_nan=True), c
    for c in ("vmax", "vmin"):
        assert np.array_equal(fused[c].to_numpy(), ext[c].to_numpy()), c
    for c in ("roll_mean", "roll_std"):
        assert np.array_equal(fused[c].to_numpy(), roll[c].to_numpy(),
                              equal_nan=True), c


def test_dt_prev_semantics():
    df = pd.DataFrame({
        "event_id": np.array([0, 1, 2, 3], dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
        "ts_us": np.array([100, 250, 250, 50], dtype=np.int64),
        "value": [1.0, 2.0, 3.0, 4.0],
    }).assign(xs=lambda d: (d["value"] * 100).astype(np.int64))
    out = (user_feature_block(ray.data.from_pandas(df), num_buckets=2)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert np.isnan(out.loc[0, "dt_prev"])      # first of user 1
    assert out.loc[1, "dt_prev"] == 150.0
    assert out.loc[2, "dt_prev"] == 0.0         # tied ts, event_id order
    assert np.isnan(out.loc[3, "dt_prev"])      # first of user 2


def test_pipeline_schema_and_split_consistency():
    from video_features_ray.pipelines.feature_store import (
        feature_store_pipeline,
    )

    out = feature_store_pipeline("/root/testdata/sf0.001",
                                 num_buckets=4).to_pandas()
    want = {"event_id", "user_id", "ts_us", "value", "lag_1", "lag_2",
            "lead_1", "dt_prev", "vmax", "vmin", "roll_mean", "roll_std",
            "z", "split"}
    assert want <= set(out.columns)
    # one split per user, all three splits present at this size
    assert (out.groupby("user_id")["split"].nunique() == 1).all()
    assert set(out["split"].unique()) <= {"train", "val", "test"}
