"""Zone-map sink/source (sources/zonemap.py): pruned read == full-scan
filter, files actually skipped, rerun idempotent."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data

from video_features_ray.sources.zonemap import (
    MANIFEST, read_zonemapped, write_zonemapped)


def _events(n=5000, days=20, seed=3):
    rng = np.random.default_rng(seed)
    day_us = 86_400_000_000
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts_us": rng.integers(0, days * day_us, n).astype(np.int64),
        "value": rng.normal(size=n),
    })


def test_pruned_read_matches_full_filter(ray_session, tmp_path):
    df = _events()
    day_us = 86_400_000_000
    out = str(tmp_path / "zm")
    manifest = write_zonemapped(ray.data.from_pandas(df).repartition(8),
                                out, "ts_us", day_us)
    assert manifest["rows"].sum() == len(df)
    assert os.path.exists(os.path.join(out, MANIFEST))

    lo, hi = 5 * day_us, 8 * day_us  # 3 of ~20 days
    ds, files_read, files_total = read_zonemapped(out, "ts_us", lo, hi)
    got = (ds.to_pandas().sort_values("event_id").reset_index(drop=True))
    want = (df[(df.ts_us >= lo) & (df.ts_us < hi)]
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["event_id", "ts_us", "value"]],
        want[["event_id", "ts_us", "value"]])
    # the point of the zone map: most files were never opened
    assert files_read <= 4
    assert files_total >= 15


def test_files_are_sorted_runs(ray_session, tmp_path):
    df = _events(n=1000, days=4)
    out = str(tmp_path / "zm2")
    manifest = write_zonemapped(ray.data.from_pandas(df).repartition(4),
                                out, "ts_us", 86_400_000_000)
    for f in manifest["file"]:
        t = pq.read_table(os.path.join(out, f)).to_pandas()
        v = t["ts_us"].to_numpy()
        assert (np.diff(v) >= 0).all()


def test_rerun_is_idempotent(ray_session, tmp_path):
    df = _events(n=800, days=5)
    out = str(tmp_path / "zm3")
    write_zonemapped(ray.data.from_pandas(df), out, "ts_us",
                     86_400_000_000)
    write_zonemapped(ray.data.from_pandas(df), out, "ts_us",
                     86_400_000_000)  # overwrite, never duplicate
    ds, _, _ = read_zonemapped(out, "ts_us", 0, 10 * 86_400_000_000)
    assert len(ds.to_pandas()) == len(df)


def test_empty_range(ray_session, tmp_path):
    df = _events(n=300, days=3)
    out = str(tmp_path / "zm4")
    write_zonemapped(ray.data.from_pandas(df), out, "ts_us",
                     86_400_000_000)
    ds, files_read, _ = read_zonemapped(
        out, "ts_us", 100 * 86_400_000_000, 200 * 86_400_000_000)
    assert files_read == 0
    assert len(ds.to_pandas()) == 0
