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

    return left.map_batches(_AsofMap, batch_format="pandas", concurrency=(1, 8), num_cpus=0.25)


# ---------------------------------------------------------------------------
# hot-entity chunking (skew escape hatch for as-of joins)
# ---------------------------------------------------------------------------
#
# ``TaggedUnion`` refuses ``salt_hot`` for as-of combiners (a key's rows
# must stay co-located in time), so an entity carrying a data-sized
# share of the shuffle lands in ONE bucket task. The sound skew remedy
# is the halo-chunk treatment ``skew.py`` applies to giant sequences:
# split the hot key's rows into TIME RANGES and replicate the boundary
# context so every probe still sees its true match.
#
# Correctness argument (backward direction): cuts are placed on the hot
# key's RIGHT-side timestamps, so every chunk interval [t_c, t_c+1)
# except the first contains >= 1 right row. A probe in chunk c matches
# the latest right row <= its ts; that row lies in chunk c itself or,
# if c has no earlier right row, it is the LAST right row of chunk c-1
# — which the halo replication (each hot right row also shipped to the
# NEXT chunk) places in chunk c. Forward is symmetric (halo to the
# PREVIOUS chunk), nearest needs both. Duplicated halo rows are
# harmless: merge_asof picks one of several identical candidates.
# Output is therefore identical for ANY cut placement — cut quality
# only affects balance — which is what makes the sampled planner safe.


def plan_hot_chunks(
    right: "ray.data.Dataset",
    key: str,
    ts: str,
    hot_keys: list,
    rows_per_chunk: int = 1 << 20,
    sample_per_batch: int = 512,
) -> dict:
    """Per-hot-key timestamp cut points for :func:`asof_join_chunked`.

    One skinny map pass over the RIGHT side: each batch emits, per hot
    key present, its row count and an evenly-strided ts sample (skinny
    partials, O(hot_keys × sample) per batch). The driver pools the
    samples and places ``ceil(count / rows_per_chunk) − 1`` cuts at the
    pooled-sample quantiles. Cut placement cannot affect the join's
    output (see module comment) — only task balance — so the sampling
    is not a correctness surface. Detect the keys with
    :func:`video_features_ray.stages.skew.detect_hot_keys`."""
    if not hot_keys:
        return {}
    hot_arr = np.asarray(sorted(hot_keys))

    def _partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        t = batch[ts].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hot_arr, k)
        posc = np.minimum(pos, len(hot_arr) - 1)
        hot = hot_arr[posc] == k
        ks, cnts, samples = [], [], []
        for hk in hot_arr[np.unique(posc[hot])]:
            tv = np.sort(t[(k == hk) & ~pd.isna(t)])
            if len(tv) == 0:
                continue
            # ceil-divide so the strided sample SPANS the whole sorted
            # range (floor + truncation would keep only the lowest
            # timestamps and push every cut into the low half)
            stride = max(1, -(-len(tv) // sample_per_batch))
            sv = tv[::stride][:sample_per_batch]
            ks.append(hk)
            cnts.append(len(tv))
            samples.append(sv.astype(np.float64))
        # explicit types: a hot-free batch emits EMPTY arrays, and
        # pa.array([]) would infer null type and clash across blocks
        return pa.table({
            "_k": pa.array(list(ks), type=batch.schema.field(key).type),
            "_n": pa.array(np.asarray(cnts, dtype=np.int64),
                           type=pa.int64()),
            "_s": pa.array([s.tolist() for s in samples],
                           type=pa.list_(pa.float64())),
        })

    parts = right.map_batches(_partial, batch_format="pyarrow").to_pandas()
    cuts: dict = {}
    if parts.empty:
        return cuts
    for hk, g in parts.groupby("_k", sort=False):
        n = int(g["_n"].sum())
        n_chunks = max(1, -(-n // rows_per_chunk))
        if n_chunks == 1:
            continue
        pooled = np.sort(np.concatenate([np.asarray(s) for s in g["_s"]]))
        q = (np.arange(1, n_chunks) * len(pooled)) // n_chunks
        cuts[hk] = np.unique(pooled[q])
    return cuts


def asof_join_chunked(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_ts: str,
    right_ts: str | None = None,
    direction: str = "backward",
    hot_cuts: dict | None = None,
    num_buckets: int = 64,
    suffix: str = "_r",
    tolerance=None,
    coalesce_blocks: int | None = None,
    schemas=None,
) -> "ray.data.Dataset":
    """:func:`asof_join` with hot entities CHUNKED into time ranges so
    no single bucket task holds a data-sized key (per-task memory is
    O(rows_per_chunk), not O(hot key's rows)). Output-identical to the
    unchunked join for any ``hot_cuts`` (see module comment); plan the
    cuts with :func:`plan_hot_chunks`.

    Physical plan: both sides gain a ``_chunk`` column (0 for non-hot
    rows, ``searchsorted(cuts, ts) + 1`` for hot ones); hot RIGHT rows
    are additionally replicated to the direction-appropriate neighbor
    chunk (the boundary carry); the ordinary :func:`asof_join` then
    shuffles on the COMPOSITE key ``(key, _chunk)`` — the hot key's
    rows spread over ``n_chunks`` buckets instead of one."""
    right_ts = right_ts or left_ts
    hot_cuts = {k: np.asarray(v, dtype=np.float64) for k, v in
                (hot_cuts or {}).items() if len(v)}
    if not hot_cuts:
        return asof_join(left, right, key, left_ts, right_ts, direction,
                         num_buckets, suffix, tolerance, coalesce_blocks,
                         schemas)
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    for side_schema in (schemas or ()):
        if side_schema is not None and "_chunk" in side_schema.names:
            raise ValueError("'_chunk' column name is reserved")
    cuts_ref = ray.put(hot_cuts)
    # halo: which neighbor chunk(s) each hot right row must ALSO serve
    halo = {"backward": (1,), "forward": (-1,), "nearest": (1, -1)}[direction]

    def _assign(k: np.ndarray, t: np.ndarray, cuts: dict) -> np.ndarray:
        c = np.zeros(len(k), dtype=np.int64)
        for hk, cu in cuts.items():
            m = k == hk
            if m.any():
                c[m] = np.searchsorted(
                    cu, t[m].astype(np.float64), side="right") + 1
        return c

    def _left_fn(batch: pa.Table) -> pa.Table:
        cuts = ray.get(cuts_ref)
        c = _assign(batch[key].to_numpy(zero_copy_only=False),
                    batch[left_ts].to_numpy(zero_copy_only=False), cuts)
        return batch.append_column("_chunk", pa.array(c))

    def _right_fn(batch: pa.Table) -> pa.Table:
        cuts = ray.get(cuts_ref)
        k = batch[key].to_numpy(zero_copy_only=False)
        c = _assign(k, batch[right_ts].to_numpy(zero_copy_only=False), cuts)
        out = batch.append_column("_chunk", pa.array(c))
        n_chunks = {hk: len(cu) + 1 for hk, cu in cuts.items()}
        max_c = np.ones(len(k), dtype=np.int64)
        hot = c > 0
        if hot.any():
            for hk, nc in n_chunks.items():
                max_c[k == hk] = nc
        tables = [out]
        for d in halo:
            # replicate hot rows whose neighbor chunk exists
            m = hot & (c + d >= 1) & (c + d <= max_c)
            idx = np.flatnonzero(m)
            if len(idx):
                rep = batch.take(pa.array(idx)).append_column(
                    "_chunk", pa.array(c[idx] + d))
                tables.append(rep)
        return pa.concat_tables(tables) if len(tables) > 1 else out

    left2 = left.map_batches(_left_fn, batch_format="pyarrow",
                             zero_copy_batch=True)
    right2 = right.map_batches(_right_fn, batch_format="pyarrow",
                               zero_copy_batch=True)
    schemas2 = None
    if schemas is not None:
        l_s, r_s = schemas
        add = pa.field("_chunk", pa.int64())
        schemas2 = (
            None if l_s is None else pa.schema([*map(l_s.field, l_s.names), add]),
            None if r_s is None else pa.schema([*map(r_s.field, r_s.names), add]),
        )
    out = asof_join(left2, right2, [key, "_chunk"], left_ts, right_ts,
                    direction, num_buckets, suffix, tolerance,
                    coalesce_blocks, schemas2)

    def _drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["_chunk"])

    return out.map_batches(_drop, batch_format="pyarrow",
                           zero_copy_batch=True)
