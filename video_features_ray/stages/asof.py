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


def _prep_right(right: pd.DataFrame, keys, left_ts: str, right_ts: str,
                suffix: str) -> pd.DataFrame:
    """Rename/suffix/tie-sort the right side ONCE (the broadcast path
    calls this a single time in actor __init__; the bucket path per
    bucket, where the table is that bucket's slice anyway)."""
    if right_ts != left_ts:
        if left_ts in right.columns:
            raise ValueError(
                f"right side already has a column named {left_ts!r}; "
                "renaming its timestamp onto it would duplicate the "
                "label — rename the clashing column first")
        right = right.rename(columns={right_ts: left_ts})
    right = right.rename(
        columns={c: f"{c}{suffix}" for c in right.columns
                 if c not in (*keys, left_ts)}
    )
    # SQL ASOF semantics: a NULL timestamp matches nothing (merge_asof
    # would refuse the whole frame instead)
    right = right[right[left_ts].notna()]
    # merge_asof picks the LAST right row among equal timestamps, so the
    # right sort needs a deterministic tie-break — otherwise the winner
    # of a (key, ts) tie depends on shuffle arrival order. The rule:
    # lexicographically-largest SORTABLE remaining columns win. Columns
    # holding list/ndarray cells (e.g. window_tokens, feature) can't key
    # a pandas multi-sort and are skipped — determinism then rests on
    # the scalar columns, which is where real ids live.
    right_tie = [c for c in right.columns
                 if c != left_ts and _sortable_series(right[c])]
    return right.sort_values([left_ts, *right_tie], kind="mergesort")


def _merge_asof_prepped(left: pd.DataFrame, right_s: pd.DataFrame, key,
                        left_ts: str, direction: str, suffix: str,
                        tolerance=None) -> pd.DataFrame:
    # left rows with NULL ts cannot be positioned: SQL yields them with
    # no match — keep them, null-filled, instead of crashing merge_asof
    l_valid = left[left_ts].notna().to_numpy()
    left_s = left[l_valid].sort_values(left_ts, kind="mergesort")
    out = pd.merge_asof(
        left_s, right_s, on=left_ts, by=key, direction=direction,
        tolerance=tolerance, suffixes=("", suffix),
    )
    if l_valid.all():
        return out
    rest = left[~l_valid].reindex(columns=out.columns)
    return pd.concat([out, rest], ignore_index=True)


def _merge_asof(left: pd.DataFrame, right: pd.DataFrame, key, left_ts: str,
                right_ts: str, direction: str, suffix: str, tolerance=None) -> pd.DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    right_s = _prep_right(right, keys, left_ts, right_ts, suffix)
    return _merge_asof_prepped(left, right_s, key, left_ts, direction,
                               suffix, tolerance)


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
    # the union pads each side's missing columns with nulls, so the
    # right's own columns come back float64 when the names differ —
    # restore BOTH sides or merge_asof raises on int-vs-float ts keys
    right_np_dtypes = tu.np_dtypes([*keys, right_ts, *out_right_cols])

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = TaggedUnion.restore_dtypes(
            df[df["_side"] == 0][list(left_cols)].copy(), left_np_dtypes)
        r = TaggedUnion.restore_dtypes(
            df[df["_side"] == 1][[*keys, right_ts, *out_right_cols]].copy(),
            right_np_dtypes)
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
    keys = [key] if isinstance(key, str) else list(key)
    ref = ray.put(right_table)

    class _AsofMap:
        def __init__(self):
            # rename/suffix/tie-sort ONCE per actor — doing it per
            # batch re-sorted the whole immutable table on every call
            self.right = _prep_right(ray.get(ref), keys, left_ts,
                                     right_ts, suffix)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return _merge_asof_prepped(batch, self.right, key, left_ts,
                                       direction, suffix, tolerance)

    return left.map_batches(_AsofMap, batch_format="pandas", concurrency=(1, 8))
