"""Zone-map partitioned parquet: write sorted runs with a min/max
manifest, read back with file-level data skipping.

At 100 TB a time-range query ("yesterday's events") must not open
every file.  The write path range-partitions rows by the sort column
(tumbling value ranges — e.g. one file per day of ``ts``), each bucket
task writes ITS OWN sorted parquet file, and only (file, min, max,
rows) manifest rows reach the driver — O(files), never data.  The read
path opens the manifest (one small parquet), keeps the files whose
[min, max] overlaps the requested range, and applies the residual
filter at scan time — untouched files are never opened, so a 1-day
query over a year of data reads ~1/365th of the bytes.

This is the same idea as parquet row-group statistics one level up
(fewer footer reads: ONE manifest instead of N footers), and the same
layout Delta/Iceberg call file skipping — expressed here as plain
parquet + a manifest, no table format required.

Resumability: each partition file is written atomically (tmp + rename)
and named by its range bucket, so a failed write rerun overwrites
partials instead of duplicating them (same contract as
``state/checkpoint.py``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


MANIFEST = "_zonemap.parquet"


def write_zonemapped(
    ds: "ray.data.Dataset",
    out_dir: str,
    sort_col: str,
    bucket_width: int,
    num_buckets_hint: int = 64,
) -> pd.DataFrame:
    """Write ``ds`` as one sorted parquet file per ``sort_col`` range
    bucket of width ``bucket_width`` (int column, e.g. epoch-µs with a
    1-day width), plus a min/max manifest.  Returns the manifest frame
    (O(files) rows).

    ONE shuffle (the range bucketing); each bucket task sorts its slice
    and writes its own file — the driver only ever holds manifest rows.
    """
    os.makedirs(out_dir, exist_ok=True)
    w = int(bucket_width)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        v = df[sort_col].to_numpy(np.int64)
        df["_bucket"] = v // w
        return df

    def _write(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["_bucket"].iloc[0])
        df = (df.drop(columns=["_bucket"])
              .sort_values(sort_col, kind="mergesort"))
        name = f"part_{b}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        final = os.path.join(out_dir, name)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, final)  # atomic: reruns overwrite, never dup
        v = df[sort_col].to_numpy(np.int64)
        return pd.DataFrame({
            "file": [name],
            "min_v": [int(v.min())],
            "max_v": [int(v.max())],
            "rows": [len(df)]})

    manifest = (ds.map_batches(_tag, batch_format="pandas")
                .groupby("_bucket")
                .map_groups(_write, batch_format="pandas")
                .to_pandas())
    manifest = manifest.sort_values("file", kind="mergesort").reset_index(drop=True)
    tmp = os.path.join(out_dir, f".{MANIFEST}.tmp")
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False), tmp)
    os.replace(tmp, os.path.join(out_dir, MANIFEST))
    return manifest


def read_zonemapped(
    out_dir: str,
    sort_col: str,
    lo: int,
    hi: int,
) -> tuple["ray.data.Dataset", int, int]:
    """Read rows with ``lo <= sort_col < hi`` using the manifest to
    skip non-overlapping files entirely.  Returns (dataset, files_read,
    files_total) so callers/tests can assert the skipping actually
    happened."""
    import pyarrow.dataset as pads

    manifest = pq.read_table(os.path.join(out_dir, MANIFEST)).to_pandas()
    keep = manifest[(manifest["max_v"] >= lo) & (manifest["min_v"] < hi)]
    files = [os.path.join(out_dir, f) for f in keep["file"]]
    if not files:
        empty = ray.data.from_items([])
        return empty, 0, len(manifest)
    flt = (pads.field(sort_col) >= lo) & (pads.field(sort_col) < hi)
    return (ray.data.read_parquet(files, filter=flt),
            len(files), len(manifest))
