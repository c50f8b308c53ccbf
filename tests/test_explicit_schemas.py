"""Explicit-schema path for TaggedUnion joins (round-3 verdict item 9):
`Dataset.schema()` can execute an upstream block just to infer types —
when the caller supplies schemas, that call must never happen, and the
result must be identical to the inferred path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.stages.asof import asof_join
from video_features_ray.stages.joins import hash_join


class _NoSchema:
    """Dataset proxy that fails the test if .schema() is ever called."""

    def __init__(self, ds):
        self._ds = ds

    def schema(self, *a, **k):
        raise AssertionError("Dataset.schema() called despite explicit schemas")

    def __getattr__(self, name):
        return getattr(self._ds, name)


def _sides():
    rng = np.random.default_rng(5)
    n = 1000
    left = pa.table({
        "k": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 300, n).astype(np.int64)),
        "lid": pa.array(np.arange(n, dtype=np.int64)),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        "ts": pa.array(rng.integers(0, 300, n).astype(np.int64)),
        "rid": pa.array(np.arange(n, dtype=np.int64) + 10_000),
    })
    # route through map_batches so .schema() would genuinely execute work
    l = ray.data.from_arrow(left).map_batches(lambda b: b, batch_format="pyarrow")
    r = ray.data.from_arrow(right).map_batches(lambda b: b, batch_format="pyarrow")
    return l, r, left.schema, right.schema


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_asof_join_explicit_schemas_no_inference():
    l, r, ls, rs = _sides()
    out = asof_join(_NoSchema(l), _NoSchema(r), key="k", left_ts="ts",
                    num_buckets=8, schemas=(ls, rs)).to_pandas()
    want = asof_join(l, r, key="k", left_ts="ts", num_buckets=8).to_pandas()
    for df in (out, want):
        df["rid_r"] = df["rid_r"].fillna(-1).astype(np.int64)
        df["ts_r"] = df.get("ts_r", df["ts"])
    pd.testing.assert_frame_equal(_norm(out), _norm(want))


def test_hash_join_explicit_schemas_all_hows():
    l, r, ls, rs = _sides()
    for how in ("inner", "left", "semi", "anti"):
        out = hash_join(_NoSchema(l), _NoSchema(r), on="k", how=how,
                        num_buckets=8, schemas=(ls, rs)).to_pandas()
        want = hash_join(l, r, on="k", how=how, num_buckets=8).to_pandas()
        for df in (out, want):
            for c in df.columns:
                if df[c].isna().any():
                    df[c] = df[c].fillna(-1)
        pd.testing.assert_frame_equal(_norm(out), _norm(want)), how
