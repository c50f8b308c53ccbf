"""Event/as-of operators must be invariant to block order and bucket
count — the two things a real cluster changes under your feet.

The fixture PLANTS duplicate (key, ts) pairs, so without the tie_cols
sort the result would depend on shuffle arrival order (the round-1
latent fragility: hash-parity relied on stable mergesort over input
order surviving the shuffle, which Ray does not guarantee)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.stages.asof import asof_join
from video_features_ray.stages.events import forward_fill, lag_lead, sessionize


def _events(n=4000, seed=13):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 500, n).astype(np.int64)  # small range → many ties
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "ts_us": pa.array(ts),
        "value": pa.array(np.round(rng.random(n), 4)),
    })


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run(op, t, **kw):
    ds = ray.data.from_arrow(t).repartition(8)
    if kw.pop("randomize", False):
        ds = ds.randomize_block_order(seed=7)
    return _norm(op(ds, **kw).to_pandas())


def test_lag_lead_block_order_and_width_invariant():
    t = _events()
    base = _run(lag_lead, t, key="user_id", ts="ts_us", value="value",
                num_buckets=16, tie_cols=["event_id"])
    rand = _run(lag_lead, t, key="user_id", ts="ts_us", value="value",
                num_buckets=16, tie_cols=["event_id"], randomize=True)
    wide = _run(lag_lead, t, key="user_id", ts="ts_us", value="value",
                num_buckets=64, tie_cols=["event_id"])
    pd.testing.assert_frame_equal(base, rand)
    pd.testing.assert_frame_equal(base, wide)


def test_sessionize_and_ffill_invariant():
    t = _events()
    for op, kw in [
        (sessionize, dict(key="user_id", ts="ts_us", gap=50, tie_cols=["event_id"])),
        (forward_fill, dict(key="user_id", ts="ts_us", value="value", tie_cols=["event_id"])),
    ]:
        base = _run(op, t, num_buckets=16, **kw)
        rand = _run(op, t, num_buckets=16, randomize=True, **kw)
        wide = _run(op, t, num_buckets=48, **kw)
        pd.testing.assert_frame_equal(base, rand)
        pd.testing.assert_frame_equal(base, wide)


def test_asof_right_side_with_array_column():
    """The tie-break sort must skip list/ndarray-valued right columns
    (pandas can't key a multi-sort on them) — joining against feature
    windows is the stage's headline use (round-2 review bug)."""
    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts_us": pa.array([100, 200, 150], pa.int64()),
    }))
    feat = pa.ListArray.from_arrays(
        pa.array([0, 2, 4, 6], pa.int32()),
        pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float32()))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts_us": pa.array([50, 150, 100], pa.int64()),
        "feature": feat,
    }))
    out = asof_join(left, right, key="user_id", left_ts="ts_us",
                    num_buckets=4).to_pandas().sort_values(["user_id", "ts_us"])
    got = [np.asarray(f).tolist() if f is not None else None
           for f in out["feature_r"]]
    assert got == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]


def test_asof_join_width_invariant():
    t = _events()
    left = ray.data.from_arrow(t.select(["event_id", "user_id", "ts_us"]))
    right_t = pa.table({
        "user_id": t["user_id"],
        "ts_us": t["ts_us"],
        "r_id": pa.array(np.arange(len(t), dtype=np.int64) + 10_000),
    })

    def _go(nb, randomize=False):
        l = left.repartition(8)
        r = ray.data.from_arrow(right_t).repartition(8)
        if randomize:
            l = l.randomize_block_order(seed=3)
            r = r.randomize_block_order(seed=5)
        out = asof_join(l, r, key="user_id", left_ts="ts_us",
                        num_buckets=nb, coalesce_blocks=8).to_pandas()
        out["r_id_r"] = out["r_id_r"].fillna(-1).astype(np.int64)
        return _norm(out)

    base = _go(16)
    pd.testing.assert_frame_equal(base, _go(64))
    pd.testing.assert_frame_equal(base, _go(16, randomize=True))
