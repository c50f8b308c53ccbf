"""Point-in-time as-of / backward merge join.

The reference's positional zip of features↔timestamps
(``base_framewise_extractor.py:69-79``, ``extract_i3d.py:117-124``) made
explicit: for each left (probe) row ``(key, ts)`` find the latest right
row of the same key with ``right_ts <= ts`` (direction='backward';
zero temporal leakage — a probe never reads rows from its future).

Two physical strategies, chosen by the caller:

- ``asof_join``            — both sides large: ONE hash shuffle. Tag the
  sides, pad to a common schema, union, bucket by key, and inside each
  bucket run a sorted ``pd.merge_asof`` (``by=key``). Key never splits
  across buckets. This is the range-partitioned merge of SURVEY §2.5 J3.
- ``asof_join_broadcast``  — small right side (feature timestamps,
  dimension grids): ``ray.put`` the sorted right table ONCE, every map
  task reads it zero-copy from the object store and does a per-batch
  ``merge_asof``. No shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .events import stable_bucket


def _sortable_series(s: pd.Series) -> bool:
    """True when the column can serve as a pandas sort key (scalar
    values; object columns qualify only for str/bytes/number cells)."""
    if s.dtype.kind in "biufcM":
        return True
    if s.dtype == object:
        v = s.dropna()
        return len(v) == 0 or isinstance(v.iloc[0], (str, bytes, int, float))
    return False


def _merge_asof(left: pd.DataFrame, right: pd.DataFrame, key: str, left_ts: str,
                right_ts: str, direction: str, suffix: str, tolerance=None) -> pd.DataFrame:
    right = right.rename(columns={right_ts: left_ts}) if right_ts != left_ts else right
    right = right.rename(
        columns={c: f"{c}{suffix}" for c in right.columns if c not in (key, left_ts) }
    )
    left_s = left.sort_values(left_ts, kind="mergesort")
    # merge_asof picks the LAST right row among equal timestamps, so the
    # right sort needs a deterministic tie-break — otherwise the winner
    # of a (key, ts) tie depends on shuffle arrival order. The rule:
    # lexicographically-largest SORTABLE remaining columns win. Columns
    # holding list/ndarray cells (e.g. window_tokens, feature) can't key
    # a pandas multi-sort and are skipped — determinism then rests on
    # the scalar columns, which is where real ids live.
    right_tie = [c for c in right.columns
                 if c != left_ts and _sortable_series(right[c])]
    right_s = right.sort_values([left_ts, *right_tie], kind="mergesort")
    out = pd.merge_asof(
        left_s, right_s, on=left_ts, by=key, direction=direction,
        tolerance=tolerance, suffixes=("", suffix),
    )
    return out


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    num_buckets: int = 64,
    suffix: str = "_r",
    tolerance=None,
    coalesce_blocks: int | None = None,
) -> "ray.data.Dataset":
    """``coalesce_blocks``: optionally merge the tagged union into this
    many blocks before the bucket groupby — at small data the groupby's
    sort cost is dominated by per-block task overhead (measured ~2×
    faster with 16 blocks at sf0.1). Leave None at scale, where many
    blocks are exactly what the sort wants."""
    right_ts = right_ts or left_ts
    left_schema = left.schema()
    left_cols = left_schema.names
    right_cols = right.schema().names
    # The tagged union pads left columns with nulls on right-side rows, so
    # the per-bucket pandas conversion promotes e.g. int64 → float64. Record
    # the left side's true dtypes so _per_bucket can restore them (left rows
    # themselves are never null in their own columns).
    left_np_dtypes: dict[str, np.dtype] = {}
    arrow_types: dict[str, pa.DataType] = {}
    for name, typ in zip(left_schema.names, left_schema.types):
        if not isinstance(typ, pa.DataType):
            continue  # pandas/simple-block schemas report plain Python types
        arrow_types[name] = typ
        if pa.types.is_integer(typ) or pa.types.is_floating(typ) or pa.types.is_boolean(typ):
            left_np_dtypes[name] = np.dtype(typ.to_pandas_dtype())
    for name, typ in zip(right.schema().names, right.schema().types):
        if isinstance(typ, pa.DataType):
            arrow_types.setdefault(name, typ)

    # pad both sides to the union schema, tagging the side
    def _tag(side: int, own_ts: str, other_cols: list[str]):
        def _fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {c: batch[c] for c in batch.column_names}
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            cols["_ts"] = batch[own_ts]
            for c in other_cols:
                if c not in cols:
                    # typed nulls keep every block's schema identical (an
                    # untyped null column forces per-block schema unification)
                    cols[c] = pa.nulls(n, type=arrow_types.get(c))
            b = stable_bucket(batch[key].to_numpy(zero_copy_only=False), num_buckets)
            cols["_bucket"] = pa.array(b, type=pa.int32())
            return pa.table(cols)

        return _fn

    l_tagged = left.map_batches(_tag(0, left_ts, right_cols), batch_format="pyarrow")
    r_tagged = right.map_batches(_tag(1, right_ts, left_cols), batch_format="pyarrow")
    both = l_tagged.union(r_tagged)
    if coalesce_blocks:
        both = both.repartition(coalesce_blocks)

    out_right_cols = [c for c in right_cols if c not in (key, right_ts)]

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["_side"] == 0][[c for c in left_cols]].copy()
        for c, dt in left_np_dtypes.items():
            # skip columns with genuine nulls — astype(int) on NaN raises;
            # such a column was nullable upstream and stays float
            if l[c].dtype != dt and not l[c].isna().any():
                l[c] = l[c].astype(dt)
        r = df[df["_side"] == 1][[key, right_ts, *out_right_cols]].copy()
        out = _merge_asof(l, r, key, left_ts, right_ts, direction, suffix, tolerance)
        return out

    return both.groupby("_bucket").map_groups(_per_bucket, batch_format="pandas")


def asof_join_broadcast(
    left: "ray.data.Dataset",
    right_table: pd.DataFrame,
    key: str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance=None,
) -> "ray.data.Dataset":
    """Small right side: broadcast once via ray.put, merge per batch."""
    right_ts = right_ts or left_ts
    right_sorted = right_table.sort_values([key, right_ts], kind="mergesort").reset_index(drop=True)
    ref = ray.put(right_sorted)

    class _AsofMap:
        def __init__(self):
            self.right = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return _merge_asof(batch, self.right, key, left_ts, right_ts, direction, suffix, tolerance)

    return left.map_batches(_AsofMap, batch_format="pandas", concurrency=(1, 8))
