"""Composed feature-store pipeline — the engine's feature_eng flagship.

The reference extracts one feature family per pass (`main.py` runs one
extractor per invocation); a training-data feature store wants EVERY
per-entity window feature in one job.  The scale discipline here is
SHUFFLE FUSION: all per-user ordered features (lags, lead, rolling 1-h
mean/std, running extrema, time-since-prev) come out of ONE
``transform_buckets`` hash shuffle — the naive plan pays one shuffle
per operator (6× the exchange volume for identical output, verified
bit-equal in tests/test_feature_store.py).  The remaining stages are
map-only: a broadcast z-score fit/transform and the hash train/val/test
split.

Every output column has an exact SQL mirror, so the WHOLE composed
pipeline is one DuckDB-hash-checked driver query (`feature_store_events`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..stages.events import (
    partition_bounds,
    rolling_moment_cols,
    transform_buckets,
)

HOUR_US = 3_600_000_000


def user_feature_block(
    ds: "ray.data.Dataset",
    key: str = "user_id",
    ts: str = "ts_us",
    value: str = "value",
    scaled: str = "xs",
    tie: str = "event_id",
    span_us: int = HOUR_US,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """ONE hash shuffle → every per-entity ordered feature:

    - ``lag_1``, ``lag_2``, ``lead_1`` of ``value`` (boundary-masked)
    - ``roll_mean`` / ``roll_std`` of ``scaled`` over the trailing
      ``span_us`` (RANGE semantics incl. tied-ts peers)
    - ``vmax`` / ``vmin`` running extrema of ``value``
    - ``dt_prev`` microseconds since the previous event (NULL first)

    The bucket frame is sorted once by ``[key, ts, tie]``; every
    feature is a vectorized view over that one sort.
    """

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        idx = np.arange(n)
        v = df[value].to_numpy().astype(np.float64)
        t = df[ts].to_numpy().astype(np.int64)
        starts, ends = partition_bounds(df, key)

        for k in (1, 2):
            shifted = np.concatenate([np.full(k, np.nan), v[:-k]]) \
                if k < n else np.full(n, np.nan)
            df[f"lag_{k}"] = np.where(idx - k < starts, np.nan, shifted)
        lead = np.concatenate([v[1:], [np.nan]]) if n else np.full(0, np.nan)
        df["lead_1"] = np.where(idx + 1 > ends, np.nan, lead)

        tprev = np.concatenate([[0], t[:-1]]) if n else t
        dt = (t - tprev).astype(np.float64)
        df["dt_prev"] = np.where(idx - 1 < starts, np.nan, dt)

        g = df.groupby(key, sort=False)[value]
        df["vmax"] = g.cummax()
        df["vmin"] = g.cummin()

        cnt, sx, sxx = rolling_moment_cols(df, key, ts, scaled, span_us)
        df["roll_mean"] = sx / cnt
        denom = cnt * (cnt - 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = np.where(denom > 0, (cnt * sxx - sx * sx) / denom, np.nan)
        df["roll_std"] = np.sqrt(var)
        return df

    return transform_buckets(ds, key, [ts, tie], _fn, num_buckets)


def feature_store_pipeline(
    sf_dir: str,
    num_buckets: int = 64,
    span_us: int = HOUR_US,
) -> "ray.data.Dataset":
    """events → (one-shuffle user feature block) → per-type z-score
    (broadcast fit/transform) → leakage-safe hash split.  Returns the
    wide per-event feature table a trainer would consume; write it
    with ``write_parquet(partition_cols=["split"])`` for the resumable
    partitioned layout."""
    return events_feature_table([f"{sf_dir}/events.parquet"],
                                num_buckets=num_buckets, span_us=span_us)


def events_feature_table(
    paths,
    num_buckets: int = 64,
    span_us: int = HOUR_US,
) -> "ray.data.Dataset":
    """:func:`feature_store_pipeline` over explicit parquet paths (the
    CLI entry's input shape — any event table with
    ``event_id, user_id, ts, event_type, value``)."""
    from ..stages.features import hash_split, zscore_normalize

    ds = ray.data.read_parquet(list(paths),
                               columns=["event_id", "user_id", "ts",
                                        "event_type", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        if batch["value"].null_count:
            raise ValueError(
                "events.value contains NULLs — a NULL would int-cast to "
                "garbage and silently poison the z-score moment sums; "
                "run stages.features.mean_impute (or filter) first")
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "value": batch["value"],
            "xs": pa.array(np.round(v * 100.0).astype(np.int64)),
        })

    ds = ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True)
    feats = user_feature_block(ds, span_us=span_us, num_buckets=num_buckets)
    # fit the z-score moments on the PRE-shuffle stream: the fused
    # block only adds columns / reorders rows, so the int sums are
    # bit-identical — and the expensive shuffle executes exactly ONCE
    # (fitting on `feats` would run it eagerly for the fit and again
    # at consumption)
    feats = zscore_normalize(feats, "event_type", "xs", out_col="z",
                             fit_ds=ds)
    return hash_split(feats, "user_id")
