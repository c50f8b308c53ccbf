"""Equi-joins and pre-aggregated grouped aggregation.

The reference has only small-side lookups (label maps,
``utils/utils.py:28-46``) — generalized here for engine completeness:

- ``broadcast_join``      — small side materialized once via ``ray.put``
  and merged per batch (no shuffle). Use for dimension tables.
- ``partial_agg``         — sum/count pre-aggregation inside
  ``map_batches`` (one row per key per batch) before the wide
  ``groupby`` — the combiner pattern that turns an all-to-all shuffle
  of raw rows into a shuffle of per-batch partials.
- ``tumbling_aggregate``  — time-bucketed grouped aggregate built on
  ``partial_agg`` (the tumbling-window generalization of the
  reference's 0.96 s VGGish examples).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def broadcast_join(
    big: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    ref = ray.put(small_df)

    class _Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return big.map_batches(_Join, batch_format="pandas", concurrency=(1, 8))


def partial_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_col: str = "n",
) -> "ray.data.Dataset":
    """groupby(keys).agg(sum..., count) with per-batch combining.

    Emits exact results: per-batch partial sums/counts, then a final
    groupby over the partials. Column names: ``sum_<col>`` and
    ``count_col``.
    """
    keys = list(keys)
    sums = list(sums)

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        out = g[sums].sum() if sums else g.size().to_frame("__sz").drop(columns="__sz")
        out = out.rename(columns={c: f"sum_{c}" for c in sums})
        out[count_col] = g.size()
        return out.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas")
    aggs = [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sums]
    aggs.append(Sum(count_col, alias_name=count_col))
    return partials.groupby(keys).aggregate(*aggs)


def tumbling_aggregate(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    window: float,
    bucket_col: str = "window_start",
) -> "ray.data.Dataset":
    """Per-(key, floor(ts/window)) count + sum. ts numeric (epoch units)."""

    def _bucket(batch: pa.Table) -> pa.Table:
        t = batch[ts].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(t / window) * window
        return batch.append_column(bucket_col, pa.array(b))

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return partial_agg(bucketed, [key, bucket_col], sums=[value])
