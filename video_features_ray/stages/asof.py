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

from .shuffle import TaggedUnion


def _sortable_series(s: pd.Series) -> bool:
    """True when the column can serve as a pandas sort key (scalar
    values; object columns qualify only for str/bytes/number cells)."""
    if s.dtype.kind in "biufcM":
        return True
    if s.dtype == object:
        v = s.dropna()
        return len(v) == 0 or isinstance(v.iloc[0], (str, bytes, int, float))
    return False


def _merge_asof(left: pd.DataFrame, right: pd.DataFrame, key, left_ts: str,
                right_ts: str, direction: str, suffix: str, tolerance=None) -> pd.DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    right = right.rename(columns={right_ts: left_ts}) if right_ts != left_ts else right
    right = right.rename(
        columns={c: f"{c}{suffix}" for c in right.columns
                 if c not in (*keys, left_ts)}
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
    schemas=None,
) -> "ray.data.Dataset":
    """``coalesce_blocks``: optionally merge the tagged union into this
    many blocks before the bucket groupby — at small data the groupby's
    sort cost is dominated by per-block task overhead (measured ~2×
    faster with 16 blocks at sf0.1). Leave None at scale, where many
    blocks are exactly what the sort wants.

    ``schemas``: optional (left, right) Arrow schemas — pass when known
    so the tagged union never executes an upstream block for inference."""
    right_ts = right_ts or left_ts
    keys = [key] if isinstance(key, str) else list(key)
    tu = TaggedUnion(left, right, key, num_buckets,
                     ts_cols=(left_ts, right_ts), coalesce_blocks=coalesce_blocks,
                     schemas=schemas)
    left_cols = tu.left_cols
    left_np_dtypes = tu.np_dtypes(left_cols)
    out_right_cols = [c for c in tu.right_cols if c not in (*keys, right_ts)]

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = TaggedUnion.restore_dtypes(
            df[df["_side"] == 0][list(left_cols)].copy(), left_np_dtypes)
        r = df[df["_side"] == 1][[*keys, right_ts, *out_right_cols]].copy()
        return _merge_asof(l, r, key, left_ts, right_ts, direction, suffix, tolerance)

    return tu.map_buckets(_per_bucket)


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
