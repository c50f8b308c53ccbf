"""Data-sized shuffle widths (round-3 verdict item 1).

The per-bucket ``map_groups`` frame is the unit of task memory; the
bucket count must therefore scale with INPUT BYTES (uncapped), with the
cluster-derived term only as a floor. These tests pin:

- the sizing rule itself (cluster floor, 256-MB data term, no cap),
- that results are width-invariant up to 1024 buckets (correctness is
  independent of the memory knob),
- that per-bucket frames actually respect the byte budget on a corpus
  big enough to need more buckets than CPUs suggest.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from video_features_ray.pipelines.queries import shuffle_width, table_bytes
from video_features_ray.stages.events import lag_lead, transform_buckets


def test_shuffle_width_cluster_term():
    cpus = int(ray.cluster_resources().get("CPU", 8))
    base = shuffle_width()
    assert base == min(max(16, 2 * cpus), 256)
    # small inputs don't shrink the cluster term
    assert shuffle_width(input_bytes=1 << 20) == base


def test_shuffle_width_data_term_uncapped():
    # 100 GB / 256 MB = 400 buckets — past the old 256 cap
    assert shuffle_width(input_bytes=100 << 30) == 400
    # 100 TB → 409600 buckets; memory per task stays bounded
    assert shuffle_width(input_bytes=100 << 40) == 409_600
    # exact multiples round up, not down
    assert shuffle_width(input_bytes=(256 << 20) * 3 + 1,
                         target_bucket_bytes=256 << 20) >= 4


def test_table_bytes_reads_metadata(tmp_path):
    import pyarrow.parquet as pq

    t = pa.table({"a": pa.array(np.arange(10_000, dtype=np.int64)),
                  "b": pa.array(["x" * 50] * 10_000)})
    pq.write_table(t, tmp_path / "documents.parquet")
    b = table_bytes(str(tmp_path), "documents")
    assert b > 10_000 * 8  # at least the int column, uncompressed


def test_width_1024_results_identical():
    """SQL-hash parity must hold at widths {16, 64, 1024} (the 100 TB
    width is just a memory knob, never a semantics knob)."""
    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 37, n).astype(np.int64)),
        "ts_us": pa.array(rng.integers(0, 400, n).astype(np.int64)),
        "value": pa.array(np.round(rng.random(n), 4)),
    })

    def _run(nb):
        ds = ray.data.from_arrow(t).repartition(8)
        out = lag_lead(ds, "user_id", "ts_us", "value", num_buckets=nb,
                       tie_cols=["event_id"]).to_pandas()
        out = out[sorted(out.columns)]
        return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)

    base = _run(16)
    pd.testing.assert_frame_equal(base, _run(64))
    pd.testing.assert_frame_equal(base, _run(1024))


def test_bucket_frames_respect_byte_budget():
    """With a data-derived width, no bucket's pandas frame exceeds a
    small multiple of the target budget (hash imbalance slack)."""
    rng = np.random.default_rng(11)
    n = 200_000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50_000, n).astype(np.int64),
        "ts_us": rng.integers(0, 1 << 40, n).astype(np.int64),
        "value": rng.random(n),
    })
    input_bytes = int(df.memory_usage(index=False, deep=False).sum())
    target = 64 << 10  # tiny budget so the data term dominates
    nb = shuffle_width(input_bytes=input_bytes, target_bucket_bytes=target)
    assert nb > shuffle_width()  # data term engaged past the cluster term

    def _measure(g: pd.DataFrame) -> pd.DataFrame:
        payload = g.drop(columns=["_bucket"], errors="ignore")
        sz = int(payload.memory_usage(index=False, deep=False).sum())
        return pd.DataFrame({"bucket_bytes": [sz]})

    sizes = transform_buckets(
        ray.data.from_pandas(df).repartition(8),
        "user_id", ["ts_us"], _measure, num_buckets=nb,
    ).to_pandas()
    assert len(sizes) == nb or len(sizes) <= nb  # empty buckets may drop
    # 4× slack: hash imbalance over 50k keys stays well inside this
    assert int(sizes["bucket_bytes"].max()) <= 4 * target
