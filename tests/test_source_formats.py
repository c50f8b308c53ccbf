"""Format-agnostic ingestion: the engine's operators are source-neutral
Dataset transforms, so CSV and JSON inputs must produce byte-identical
results to the parquet path (the reference's manifest reader S1
generalized to Ray's native source formats)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from video_features_ray.stages.joins import partial_agg

SF = "/root/testdata/sf0.001"


def _agg(ds):
    def _scale(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": b["event_type"],
                         "value_c": pa.array(np.round(v * 100.0).astype(np.int64))})

    out = partial_agg(ds.map_batches(_scale, batch_format="pyarrow"),
                      ["event_type"], sums=["value_c"], count_col="n",
                      combine="driver").to_pandas()
    return out.sort_values("event_type").reset_index(drop=True)


def test_csv_and_json_sources_match_parquet(tmp_path):
    tab = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"])
    df = tab.to_pandas()
    csv_path = os.path.join(tmp_path, "events.csv")
    json_path = os.path.join(tmp_path, "events.json")
    df.to_csv(csv_path, index=False)
    df.to_json(json_path, orient="records", lines=True)

    want = _agg(ray.data.read_parquet(f"{SF}/events.parquet",
                                      columns=["event_type", "value"]))
    got_csv = _agg(ray.data.read_csv(csv_path))
    got_json = _agg(ray.data.read_json(json_path))
    pd.testing.assert_frame_equal(got_csv, want)
    pd.testing.assert_frame_equal(got_json, want)
