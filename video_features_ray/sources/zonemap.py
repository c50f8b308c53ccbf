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


ZMANIFEST = "_zorder.parquet"


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave-ready bit spread: 31-bit uint -> even bit positions
    of a 62-bit word (the standard Morton magic-mask ladder,
    vectorized)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order (Morton) code of two non-negative int columns
    (< 2^31 each): bits of x on even positions, y on odd."""
    if len(x) and (x.min() < 0 or y.min() < 0
                   or x.max() >= 1 << 31 or y.max() >= 1 << 31):
        raise ValueError("morton2 needs 0 <= offsets < 2^31; rebase "
                         "columns by their global min first")
    return (_spread_bits(x) | (_spread_bits(y) << np.uint64(1))).astype(
        np.int64)


def write_zordered(
    ds: "ray.data.Dataset",
    out_dir: str,
    col_x: str,
    col_y: str,
    num_files_hint: int = 64,
) -> pd.DataFrame:
    """Write ``ds`` clustered by the Z-ORDER curve over TWO int columns
    — the multi-dimensional generalization of :func:`write_zonemapped`
    (what table formats call OPTIMIZE ZORDER BY): each output file is
    one quadtree cell of the (x, y) space, so BOTH columns get tight
    per-file min/max ranges and a 2-D box query prunes on both
    dimensions, where a single-column sort gives tight ranges on one
    dimension only.

    Plan: one O(1)-driver min/max pass rebases the columns, the top
    ``k = log2(num_files_hint)`` bits of each row's Morton code are its
    quadtree cell (ONE range shuffle — deterministic space split, no
    sampling), each cell task writes its own z-sorted file atomically,
    and only (file, min/max of both columns, rows) manifest rows reach
    the driver.  Skew note (documented per the custom-operator rule):
    the split is even in SPACE, not rows — a hot cell gets a big file;
    raise ``num_files_hint`` (deeper quadtree) to subdivide, exactly
    like the 1-D ``bucket_width`` trade."""
    from ..stages.joins import partial_agg

    os.makedirs(out_dir, exist_ok=True)

    def _gconst(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_g": np.zeros(len(df), np.int32),
            col_x: df[col_x].to_numpy(np.int64),
            col_y: df[col_y].to_numpy(np.int64)})

    mm = partial_agg(ds.map_batches(_gconst, batch_format="pandas"),
                     ["_g"], mins=[col_x, col_y], maxs=[col_x, col_y],
                     combine="driver").to_pandas()
    x0 = int(mm[f"min_{col_x}"].iloc[0])
    y0 = int(mm[f"min_{col_y}"].iloc[0])
    span = max(int(mm[f"max_{col_x}"].iloc[0]) - x0,
               int(mm[f"max_{col_y}"].iloc[0]) - y0, 1)
    bits = max(int(span).bit_length(), 1)
    k = max(int(num_files_hint - 1).bit_length(), 2)  # 2^k cells
    shift = max(2 * bits - k, 0)

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        code = morton2(df[col_x].to_numpy(np.int64) - x0,
                       df[col_y].to_numpy(np.int64) - y0)
        df["_z"] = code
        df["_bucket"] = code >> shift
        return df

    def _write(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["_bucket"].iloc[0])
        df = (df.sort_values("_z", kind="mergesort")
              .drop(columns=["_bucket", "_z"]))
        name = f"zcell_{b}.parquet"
        tmp = os.path.join(out_dir, f".{name}.tmp")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(out_dir, name))
        x = df[col_x].to_numpy(np.int64)
        y = df[col_y].to_numpy(np.int64)
        return pd.DataFrame({
            "file": [name],
            "min_x": [int(x.min())], "max_x": [int(x.max())],
            "min_y": [int(y.min())], "max_y": [int(y.max())],
            "rows": [len(df)]})

    manifest = (ds.map_batches(_tag, batch_format="pandas")
                .groupby("_bucket")
                .map_groups(_write, batch_format="pandas")
                .to_pandas()
                .sort_values("file", kind="mergesort")
                .reset_index(drop=True))
    tmp = os.path.join(out_dir, f".{ZMANIFEST}.tmp")
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                   tmp)
    os.replace(tmp, os.path.join(out_dir, ZMANIFEST))
    return manifest


def read_zordered(
    out_dir: str,
    col_x: str,
    col_y: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
) -> tuple["ray.data.Dataset", int, int]:
    """Read the 2-D box ``x_lo <= x < x_hi AND y_lo <= y < y_hi``,
    skipping every file whose manifest ranges miss the box on EITHER
    dimension.  Returns (dataset, files_read, files_total)."""
    import pyarrow.dataset as pads

    manifest = pq.read_table(os.path.join(out_dir, ZMANIFEST)).to_pandas()
    keep = manifest[(manifest["max_x"] >= x_lo) & (manifest["min_x"] < x_hi)
                    & (manifest["max_y"] >= y_lo)
                    & (manifest["min_y"] < y_hi)]
    files = [os.path.join(out_dir, f) for f in keep["file"]]
    if not files:
        return ray.data.from_items([]), 0, len(manifest)
    flt = ((pads.field(col_x) >= x_lo) & (pads.field(col_x) < x_hi)
           & (pads.field(col_y) >= y_lo) & (pads.field(col_y) < y_hi))
    return (ray.data.read_parquet(files, filter=flt),
            len(files), len(manifest))
