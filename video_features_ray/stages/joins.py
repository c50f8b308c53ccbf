"""Equi-joins and pre-aggregated grouped aggregation.

The reference has only small-side lookups (label maps,
``utils/utils.py:28-46``) — generalized here for engine completeness:

- ``broadcast_join``      — small side materialized once via ``ray.put``
  and merged per batch (no shuffle). Use for dimension tables.
- ``partial_agg``         — sum/count pre-aggregation inside
  ``map_batches`` (one row per key per batch) before the wide
  ``groupby`` — the combiner pattern that turns an all-to-all shuffle
  of raw rows into a shuffle of per-batch partials.
- ``tumbling_aggregate``  — time-bucketed grouped aggregate built on
  ``partial_agg`` (the tumbling-window generalization of the
  reference's 0.96 s VGGish examples).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def broadcast_join(
    big: "ray.data.Dataset",
    small_df: pd.DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> "ray.data.Dataset":
    keys = [on] if isinstance(on, str) else list(on)
    # SQL NULL-key semantics, matching hash_join: NULL never matches —
    # without this the two plans auto_join switches between would
    # return different rows on nullable keys
    small_df = small_df[small_df[keys].notna().all(axis=1)]
    ref = ray.put(small_df)
    small_cols = [c for c in small_df.columns if c not in keys]

    class _Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            # hash_join-compatible suffixing: overlapping RIGHT columns
            # get '_r', LEFT columns keep their names (pandas' default
            # _x/_y would rename the left side too, so auto_join's two
            # plans would return different schemas AND the left-join
            # rest-rows reindex would null out every renamed value)
            small = self.small
            overlap = [c for c in small_cols if c in batch.columns]
            if overlap:
                small = small.rename(columns={c: f"{c}_r" for c in overlap})
            valid = batch[keys].notna().all(axis=1).to_numpy()
            if how == "inner":
                return batch[valid].merge(small, on=on, how="inner")
            matched = batch[valid].merge(small, on=on, how="left")
            if valid.all():
                return matched
            rest = batch[~valid].reindex(columns=matched.columns)
            return pd.concat([matched, rest], ignore_index=True)

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how!r}")
    # num_cpus=0.25: a broadcast join is a cheap vectorized lookup, and
    # plans COMPOSE several of them (TPC-H Q2 holds 4 pools at once when
    # the joined branch feeds both an aggregate and the join-back).  At
    # the default 1.0 CPU, k pools reserve k whole CPUs while IDLE —
    # on a small cluster (tests: 4 CPUs) 4 pools starve the upstream
    # ReadParquet tasks and the stream deadlocks before the first block.
    # Fractional reservation keeps per-actor setup (one ray.get of the
    # broadcast side) while letting idle pools coexist with producers.
    return big.map_batches(_Join, batch_format="pandas",
                           concurrency=(1, 8), num_cpus=0.25)


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    num_buckets: int = 64,
    how: str = "inner",
    suffix: str = "_r",
    coalesce_blocks: int | None = None,
    bloom_prefilter_left: bool = False,
    bloom_bits: int = 1 << 23,
    schemas=None,
    salt_hot: tuple[list, int] | None = None,
) -> "ray.data.Dataset":
    """Large ⨝ large equi-join in ONE hash shuffle (the case
    ``broadcast_join`` can't serve: neither side fits a worker heap).

    Same physical plan as ``asof_join``: tag the sides, pad to the
    union schema with typed nulls, bucket by ``hash(on)``, union, and
    inside each bucket run one vectorized ``pd.merge``. A key never
    splits across buckets, so the per-bucket merge is globally exact.
    Overlapping non-key right columns get ``suffix``.

    ``how``: ``inner`` / ``left`` / ``outer`` (pd.merge semantics;
    ``outer`` is SQL FULL OUTER — both sides' unmatched rows survive
    with typed-null fills, including null-key rows, which match
    nothing but are kept), or ``semi`` /
    ``anti`` — left rows whose key does (not) appear on the right;
    these return only left columns via a per-bucket vectorized
    existence check (no row multiplication, the scale-safe EXISTS /
    NOT EXISTS). ``on`` may be a single column or a LIST (composite
    key — bucketed by a combined hash, so a key tuple never splits).

    ``salt_hot=(hot_keys, n_salts)``: spread each hot key's LEFT rows
    over n_salts sub-buckets and replicate its RIGHT rows to all of
    them (see ``TaggedUnion``) — the skew escape hatch when one key
    carries a data-sized share of the left side. Detect hot keys with
    :func:`video_features_ray.stages.skew.detect_hot_keys`.
    """
    from .shuffle import TaggedUnion

    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(
            f"hash_join supports inner/left/outer/semi/anti, got {how!r} "
            "(for right: flip the sides)")
    if salt_hot is not None and how == "outer":
        # salting REPLICATES each hot key's right rows into all n_salts
        # sub-buckets; a sub-bucket with no matching left row would emit
        # its replica as an unmatched right-outer row — n_salts× silent
        # duplication. Replication is only sound for combiners where
        # each LEFT row's output is independent (inner/left/semi/anti).
        raise ValueError("salt_hot is invalid for how='outer' (replicated "
                         "right rows would duplicate unmatched-right output); "
                         "use inner/left/semi/anti, or chunk instead of salt")
    keys = [on] if isinstance(on, str) else list(on)

    if bloom_prefilter_left:
        # lossless ONLY when a dropped-left row cannot appear in the
        # output: inner/semi (no false negatives; false positives are
        # removed by the join itself). Cuts shuffled left bytes when
        # the join is selective — the classic 100 TB bloom-join.
        if how not in ("inner", "semi"):
            raise ValueError("bloom prefilter is only lossless for inner/semi joins")
        if len(keys) != 1:
            raise ValueError("bloom prefilter supports single-column keys")
        from ..functions.sketches import bloom_prefilter, build_bloom

        left = bloom_prefilter(left, keys[0], build_bloom(right, keys[0],
                                                          n_bits=bloom_bits))

    if how in ("semi", "anti"):
        # existence checks need only the right KEYS — keep the shuffle skinny
        right = right.select_columns(keys)
        if schemas is not None:
            l_s, r_s = schemas
            schemas = (l_s, pa.schema([r_s.field(k) for k in keys]))

    tu = TaggedUnion(left, right, on, num_buckets, coalesce_blocks=coalesce_blocks,
                     schemas=schemas, salt_hot=salt_hot)
    left_cols = tu.left_cols
    left_np_dtypes = tu.np_dtypes(left_cols)
    right_np_dtypes = tu.np_dtypes(tu.right_cols)
    out_right = [c for c in tu.right_cols if c not in keys]

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = TaggedUnion.restore_dtypes(
            df[df["_side"] == 0][list(left_cols)].copy(), left_np_dtypes)
        if how in ("semi", "anti"):
            # SQL EXISTS semantics: NULL keys never match on either side
            # (pandas merge/isin would treat NaN == NaN as a hit)
            rk = df.loc[df["_side"] == 1, keys].dropna().drop_duplicates()
            m = l.merge(rk.assign(_hit=True), on=keys, how="left")
            hit = m["_hit"].notna().to_numpy()
            hit &= l[keys].notna().all(axis=1).to_numpy(dtype=bool)
            return l[hit] if how == "semi" else l[~hit]
        r = TaggedUnion.restore_dtypes(
            df[df["_side"] == 1][[*keys, *out_right]].copy(), right_np_dtypes)
        r = r.rename(columns={c: (f"{c}{suffix}" if c in left_cols else c)
                              for c in out_right})
        # SQL join semantics: a NULL key matches NOTHING (pandas merge
        # would pair NaN with NaN) — null-key right rows never match;
        # LEFT/OUTER keep null-key left rows, OUTER also keeps the
        # null-key right rows, all as unmatched
        r_valid = r[keys].notna().all(axis=1).to_numpy()
        r_null, r = r[~r_valid], r[r_valid]
        l_valid = l[keys].notna().all(axis=1).to_numpy()
        if how == "inner":
            return l[l_valid].merge(r, on=keys, how="inner")
        matched = l[l_valid].merge(r, on=keys, how=how)
        rest = [matched]
        if not l_valid.all():
            rest.append(l[~l_valid].reindex(columns=matched.columns))
        if how == "outer" and len(r_null):
            rest.append(r_null.reindex(columns=matched.columns))
        return pd.concat(rest, ignore_index=True) if len(rest) > 1 else matched

    return tu.map_buckets(_per_bucket)


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    num_buckets: int = 64,
    inclusive: str = "both",
    schemas=None,
    coalesce_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Interval (range) join: each left row ``(key, ts)`` paired with
    every right row of the same key whose ``[start, end]`` contains
    ``ts`` (``inclusive``: 'both' | 'left' | 'right' | 'neither').

    Physical plan: the shared tagged-union hash shuffle on ``key``, then
    per bucket one vectorized ``pd.merge`` on the key followed by the
    interval mask — the as-of join's sibling for WINDOWED (not
    point-in-time) containment, e.g. events→session intervals,
    readings→maintenance windows.

    Scale note: the per-bucket merge materializes |left_k| × |right_k|
    rows per key before masking — fine while per-key interval counts
    are modest (sessions, shifts, campaigns). For keys carrying
    thousands of intervals, pre-split by coarse time bucket (compose
    with ``tumbling_aggregate``'s bucketing) or salt the key.
    Non-key column names must be disjoint across sides.
    """
    from .shuffle import TaggedUnion

    tu = TaggedUnion(left, right, key, num_buckets, schemas=schemas,
                     coalesce_blocks=coalesce_blocks)
    overlap = (set(tu.left_cols) & set(tu.right_cols)) - {key}
    if overlap:
        raise ValueError(f"range_join requires disjoint non-key columns; got {overlap}")
    left_cols = tu.left_cols
    right_cols = tu.right_cols
    l_dtypes = tu.np_dtypes(left_cols)
    r_dtypes = tu.np_dtypes(right_cols)
    lo_op = {"both": "__le__", "left": "__le__", "right": "__lt__",
             "neither": "__lt__"}[inclusive]
    hi_op = {"both": "__le__", "left": "__lt__", "right": "__le__",
             "neither": "__lt__"}[inclusive]

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = TaggedUnion.restore_dtypes(
            df[df["_side"] == 0][list(left_cols)].copy(), l_dtypes)
        r = TaggedUnion.restore_dtypes(
            df[df["_side"] == 1][list(right_cols)].copy(), r_dtypes)
        # SQL NULL-key semantics (as in hash_join/broadcast_join):
        # pandas merge would pair NaN keys with each other
        l = l[l[key].notna()]
        r = r[r[key].notna()]
        m = l.merge(r, on=key, how="inner")
        keep = (getattr(m[right_start], lo_op)(m[left_ts])
                & getattr(m[left_ts], hi_op)(m[right_end]))
        return m[keep]

    return tu.map_buckets(_per_bucket)


def partial_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_col: str = "n",
    num_buckets: int = 16,
    combine: str = "distributed",
    mins: Sequence[str] = (),
    maxs: Sequence[str] = (),
) -> "ray.data.Dataset":
    """groupby(keys).agg(sum..., count) with per-batch combining.

    Exact results in two stages: (1) per-batch partial sums/counts
    (map, no shuffle), (2) combine the partials. ``combine`` picks the
    physical plan for stage 2:

    - ``"distributed"`` — hash-bucket the partials on the key tuple and
      combine each bucket with ONE vectorized pandas groupby (the outer
      Ray groupby sees only ``num_buckets`` groups — Ray's per-group
      aggregate state is O(groups) Python objects, pathological when
      #groups ≈ #rows: measured 30 s for 96k groups vs <2 s bucketed).
      Use when the key cardinality is large.
    - ``"driver"`` — partials stream to the driver and combine in one
      pandas groupby. Partial size is bounded by #keys × #blocks, so
      for LOW-cardinality keys (TPC-H Q1's 6 groups, 25 nations) this
      is the right plan at ANY input scale — the distributed sort paid
      ~6 s of task overhead to shuffle 1,600 rows.

    Column names: ``sum_<col>``, ``min_<col>``, ``max_<col>`` and
    ``count_col`` — sum/min/max are all algebraic (partial-then-combine
    with the SAME op), so any mix still needs just the one pass.
    """
    keys = list(keys)
    sums, mins, maxs = list(sums), list(mins), list(maxs)
    sum_cols = [f"sum_{c}" for c in sums]
    min_cols = [f"min_{c}" for c in mins]
    max_cols = [f"max_{c}" for c in maxs]

    def _stats(g):
        parts = []
        if sums:
            parts.append(g[sums].sum().rename(
                columns={c: f"sum_{c}" for c in sums}))
        if mins:
            parts.append(g[mins].min().rename(
                columns={c: f"min_{c}" for c in mins}))
        if maxs:
            parts.append(g[maxs].max().rename(
                columns={c: f"max_{c}" for c in maxs}))
        return pd.concat(parts, axis=1) if parts else None

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, sort=False, dropna=False)
        out = _stats(g)
        if out is None:
            out = g.size().to_frame("__sz").drop(columns="__sz")
        out[count_col] = g.size()
        out = out.reset_index()
        h = np.zeros(len(out), dtype=np.uint64)
        for k in keys:  # vectorized per-column hash combine
            h = h * np.uint64(0x100000001B3) + pd.util.hash_pandas_object(
                out[k], index=False).to_numpy()
        out["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return out

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, sort=False, dropna=False)
        out = g[sum_cols + [count_col]].sum()
        if min_cols:
            out = pd.concat([out, g[min_cols].min()], axis=1)
        if max_cols:
            out = pd.concat([out, g[max_cols].max()], axis=1)
        return out.reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas")
    if combine == "driver":
        import ray.data as rd

        pdf = partials.to_pandas()
        if pdf.empty and "_bucket" not in pdf.columns:
            # fully-empty input: to_pandas() loses the schema entirely,
            # so rebuild the (0-row) output frame by hand
            pdf = pd.DataFrame(
                columns=[*keys, *sum_cols, count_col, *min_cols, *max_cols])
        return rd.from_pandas(_final(pdf.drop(columns=["_bucket"],
                                              errors="ignore")))
    return partials.groupby("_bucket").map_groups(_final, batch_format="pandas")


def grouped_mode(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    num_buckets: int = 16,
    out_col: str | None = None,
    count_col: str = "mode_cnt",
) -> "ray.data.Dataset":
    """Most frequent ``value`` per ``key`` (the MODE aggregate), ties
    broken by the lexicographically smallest value — deterministic, so
    it hash-matches the SQL ``row_number() OVER (ORDER BY count DESC,
    value)`` formulation. NULL values are ignored (SQL ``mode``
    semantics).

    Scale shape: per-batch (key, value, cnt) partials (no raw rows
    move), bucketed by ``key`` ONLY — unlike :func:`partial_agg`'s
    key-tuple bucketing — so each bucket task holds every candidate
    value of its keys and can sum + argmax in one step: one skinny
    shuffle, one pass."""
    out_col = out_col or f"mode_{value}"

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df[value].notna()]
        g = (d.groupby([key, value], sort=False).size()
             .rename("_cnt").reset_index())
        h = pd.util.hash_pandas_object(g[key], index=False).to_numpy()
        g["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return g

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby([key, value], sort=False)["_cnt"].sum()
             .reset_index())
        c = c.sort_values(["_cnt", value], ascending=[False, True],
                          kind="mergesort")
        top = c.groupby(key, sort=False).head(1).reset_index(drop=True)
        top["_cnt"] = top["_cnt"].astype(np.int64)
        return top.rename(columns={value: out_col, "_cnt": count_col})[
            [key, out_col, count_col]]

    partials = ds.map_batches(_partial, batch_format="pandas")
    return partials.groupby("_bucket").map_groups(_final, batch_format="pandas")


def categorical_counts(
    ds: "ray.data.Dataset",
    key: str,
    cat_col: str,
    categories: Sequence[str],
    num_buckets: int = 16,
    prefix: str = "n_",
) -> "ray.data.Dataset":
    """One-hot COUNT features per key: one ``prefix<cat>`` column per
    category (the classic categorical-pivot feature block). Per-batch
    crosstab partials (one skinny row per key per batch, fixed width =
    len(categories)) → bucketed sum combine — the dense-vector
    aggregation pattern, so the shuffle never moves raw events.
    ``categories`` must be the closed category list (get it once via
    ``ds.unique(cat_col)`` — low cardinality by definition of a
    categorical column)."""
    cats = list(categories)
    out_cols = [f"{prefix}{c}" for c in cats]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df[key], df[cat_col])
        ct = ct.reindex(columns=cats, fill_value=0)
        ct.columns = out_cols
        ct = ct.reset_index()
        h = pd.util.hash_pandas_object(ct[key], index=False).to_numpy()
        ct["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return ct

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[out_cols].sum().reset_index()
        for c in out_cols:
            g[c] = g[c].astype(np.int64)
        return g

    # partials are one skinny fixed-width row per key per batch —
    # coalesce before the groupby so the sort doesn't pay its ~45 ms
    # per-block tax on dozens of near-empty blocks
    partials = ds.map_batches(_partial, batch_format="pandas").repartition(16)
    return partials.groupby("_bucket").map_groups(_final, batch_format="pandas")


def grouped_quantile_disc(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    q: float = 0.5,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """EXACT discrete quantile per group over an integer-valued column
    (DuckDB ``quantile_disc`` semantics: the element at 1-based rank
    ``ceil(n*q)``, verified empirically).

    Scale shape: per-batch (group, value) frequency partials →
    distributed bucketed combine (partials are O(groups × distinct
    values), bounded for quantized/money columns) → the driver walks
    each group's tiny CDF. No full-column sort, no per-group row
    shuffle."""
    import math

    counts = partial_agg(ds, [group_col, value_col], sums=(),
                         count_col="n", num_buckets=num_buckets)
    pdf = counts.to_pandas()
    rows = []
    for g, gdf in pdf.groupby(group_col, sort=False):
        # SQL quantile_disc ignores NULL values but still EMITS a group
        # whose values are all NULL (with a NULL quantile) — so nulls
        # are excluded here in the walk, not filtered upstream
        gdf = gdf[gdf[value_col].notna()].sort_values(value_col,
                                                      kind="mergesort")
        n = int(gdf["n"].sum())
        if n == 0:
            rows.append((g, np.nan))
            continue
        rank = max(math.ceil(n * q), 1)
        cum = gdf["n"].cumsum()
        val = gdf.loc[cum >= rank, value_col].iloc[0]
        rows.append((g, val))
    return (pd.DataFrame(rows, columns=[group_col, f"q{q}"])
            .sort_values(group_col, kind="mergesort").reset_index(drop=True))


def grouped_weighted_median(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    weight_col: str,
    num_buckets: int = 16,
    out_col: str = "wmedian",
    pct: int = 50,
) -> "ray.data.Dataset":
    """EXACT lower weighted quantile per group over integer value and
    weight columns: the smallest ``v`` with ``100 * cumweight(<= v) >=
    pct * total_weight`` (``pct=50`` is the standard weighted median,
    which equals ``quantile_disc(0.5)`` when every weight is 1; the
    comparison is pure int64 — exact as long as ``100 * Σweight`` fits,
    i.e. group weight sums below ~9.2e16).

    Scale shape: ONE hash shuffle of skinny ``(group, value, weight)``
    rows; each bucket task resolves every resident group's median in a
    single vectorized pass (lexsort + segmented cumulative weights —
    no per-group Python loop), and the driver never sees row data.
    Unlike :func:`grouped_quantile_disc` this never builds a
    per-distinct-value frequency table, so it stays exact and bounded
    when values are near-unique (prices, latencies).

    The crossing row is order-invariant under ties: for equal values
    the cumulative weight at the last row of the tie run is fixed, and
    the first row where ``2*cw >= tot`` always carries the median
    value, wherever inside the run the threshold lands."""

    def _tag(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(np.ascontiguousarray(g)).astype(np.uint64)
        return pa.table({
            group_col: b[group_col],
            value_col: b[value_col],
            weight_col: b[weight_col],
            "_bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
        })

    def _final(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(g) == 0:
            return pa.table({group_col: pa.array(g),
                             out_col: pa.array(v)})
        order = np.lexsort((v, g))
        g, v, w = g[order], v[order], w[order]
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        counts = np.diff(np.r_[starts, len(g)])
        tot = np.add.reduceat(w, starts)
        cw = np.cumsum(w)
        within = cw - np.repeat(cw[starts] - w[starts], counts)
        mask = 100 * within >= pct * np.repeat(tot, counts)
        # within is nondecreasing inside a group, so every False row
        # precedes every True row: first True = start + (#False)
        nfalse = np.add.reduceat((~mask).astype(np.int64), starts)
        pick = starts + nfalse
        return pa.table({group_col: pa.array(g[starts]),
                         out_col: pa.array(v[pick])})

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby("_bucket").map_groups(
        _final, batch_format="pyarrow")


def grouped_topk(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str],
    sort_col: str,
    k: int,
    num_buckets: int = 16,
    count_col: str = "n",
) -> pd.DataFrame:
    """Global top-k groups by ``sort_col`` (desc; ties by keys asc) over
    a HIGH-cardinality key, without ever materializing all groups.

    Plan: per-batch partials → hash-bucket combine (each key lives in
    exactly ONE bucket, so a bucket-local top-k provably retains every
    global top-k member) → driver merges ≤ k × num_buckets rows. The
    round-1 top_users pulled one partial row per (user × block) to the
    driver — O(users) driver memory; this is O(k × buckets).
    """
    keys = list(keys)
    sum_cols = [f"sum_{c}" for c in sums]
    ascending = [False] + [True] * len(keys)

    partials = partial_agg(ds, keys, sums=sums, count_col=count_col,
                           num_buckets=num_buckets, combine="distributed")
    # partial_agg already combined per bucket; a second per-block trim
    # keeps only each block's top-k before the tiny driver merge
    trimmed = partials.map_batches(
        lambda df: df.sort_values([sort_col, *keys], ascending=ascending,
                                  kind="mergesort").head(k),
        batch_format="pandas",
    )
    merged = trimmed.to_pandas()
    return (merged.sort_values([sort_col, *keys], ascending=ascending, kind="mergesort")
            .head(k).reset_index(drop=True))


def tumbling_aggregate(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    window: float,
    bucket_col: str = "window_start",
) -> "ray.data.Dataset":
    """Per-(key, floor(ts/window)) count + sum. ts numeric (epoch units)."""

    def _bucket(batch: pa.Table) -> pa.Table:
        t = batch[ts].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(t / window) * window
        return batch.append_column(bucket_col, pa.array(b))

    bucketed = ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return partial_agg(bucketed, [key, bucket_col], sums=[value])


def sliding_aggregate(
    ds: "ray.data.Dataset",
    ts: str,
    value: str,
    window: float,
    step: float,
    keys: Sequence[str] = (),
    bucket_col: str = "window_start",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Hopping-window count + sum: window starts every ``step``, each
    spanning ``window`` — a row at time t belongs to the
    ``ceil(window/step)`` windows with start in ``(t-window, t]``.

    Per-batch explode (each row duplicated once per covering window,
    vectorized) then the same partial+combine as tumbling — the
    explosion multiplies only the SKINNY pre-aggregation rows, never
    payload, and partials stay O(windows × keys) per batch.
    """
    n_per = int(np.ceil(window / step))

    skinny = [*keys, value]

    def _explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        t = batch[ts].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_per)
        k = np.tile(np.arange(n_per, dtype=np.float64), n)
        starts = (np.floor(t[idx] / step) - k) * step
        keep = starts > t[idx] - window          # t ∈ [start, start+window)
        # replicate ONLY the pre-aggregation columns — taking the whole
        # batch would duplicate every payload column n_per times
        out = batch.select(skinny).take(pa.array(idx[keep]))
        return out.append_column(bucket_col, pa.array(starts[keep]))

    exploded = ds.map_batches(_explode, batch_format="pyarrow", zero_copy_batch=True)
    return partial_agg(exploded, [*keys, bucket_col], sums=[value],
                       num_buckets=num_buckets)


def grouped_corr(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    x: str,
    y: str,
    num_buckets: int = 16,
    combine: str = "driver",
    out_col: str = "corr",
) -> "ray.data.Dataset":
    """Per-group Pearson correlation over INTEGER-scaled columns ``x``,
    ``y`` — the multi-moment aggregate (n, Σx, Σy, Σx², Σy², Σxy) as
    exact int64 partials through :func:`partial_agg`, finished with one
    closed-form float expression:

        corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ₜ)(n·Σy² − Σy²ₜ))

    Because every sum is an exact integer and the final expression is a
    fixed sequence of float64 ops, the result is bit-identical to a SQL
    oracle that spells out the same formula over the same integer sums
    (DuckDB's ``corr()`` uses streaming float updates and would differ
    in low bits).  Groups with zero variance on either side get NULL →
    coalesced to -1.0 by the caller if needed.

    Scale shape: one skinny moment row per (key, batch) moves; the
    combine is O(groups).  Int64 moment sums hold to ~10¹² rows of
    ~10³-scaled values; beyond that, pre-scale down or switch the
    product columns to float64 (documented trade: exactness → 1 ulp).
    """
    keys = list(keys)

    def _moments(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {k: batch[k] for k in keys}
        out.update({"_x": pa.array(xs), "_y": pa.array(ys),
                    "_xx": pa.array(xs * xs), "_yy": pa.array(ys * ys),
                    "_xy": pa.array(xs * ys)})
        return pa.table(out)

    agg = partial_agg(ds.map_batches(_moments, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      keys, sums=["_x", "_y", "_xx", "_yy", "_xy"],
                      count_col="n", num_buckets=num_buckets, combine=combine)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype(np.int64).to_numpy()
        sx = df["sum__x"].astype(np.int64).to_numpy()
        sy = df["sum__y"].astype(np.int64).to_numpy()
        sxx = df["sum__xx"].astype(np.int64).to_numpy()
        syy = df["sum__yy"].astype(np.int64).to_numpy()
        sxy = df["sum__xy"].astype(np.int64).to_numpy()
        # fixed float64 op order == the SQL oracle's expression tree;
        # cast each exact integer to double BEFORE multiplying (n·Σxy
        # would overflow int64 long before the doubles lose the result)
        nf, sxf, syf = (a.astype(np.float64) for a in (n, sx, sy))
        cov = nf * sxy.astype(np.float64) - sxf * syf
        vx = nf * sxx.astype(np.float64) - sxf * sxf
        vy = nf * syy.astype(np.float64) - syf * syf
        denom = np.sqrt(vx) * np.sqrt(vy)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(denom > 0, cov / denom, np.nan)
        out = df[keys].copy()
        out["n"] = n
        out[out_col] = c
        return out

    return agg.map_batches(_finish, batch_format="pandas")


def grouped_regression(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    x: str,
    y: str,
    num_buckets: int = 16,
    combine: str = "driver",
) -> "ray.data.Dataset":
    """Per-group simple linear regression y = slope·x + intercept over
    INTEGER-scaled columns (SQL ``regr_slope`` / ``regr_intercept``) —
    :func:`grouped_corr`'s sibling on the same exact moment partials
    (n, Σx, Σy, Σx², Σxy), finished closed-form:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    Bit-identical to an oracle spelling the same float64 expression
    over the same integer sums (native ``regr_slope`` streams floats).
    Zero-x-variance groups get NULL slope/intercept.  One skinny
    moment row per (key, batch) moves; combine is O(groups)."""
    keys = list(keys)

    def _moments(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {k: batch[k] for k in keys}
        out.update({"_x": pa.array(xs), "_y": pa.array(ys),
                    "_xx": pa.array(xs * xs), "_xy": pa.array(xs * ys)})
        return pa.table(out)

    agg = partial_agg(ds.map_batches(_moments, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      keys, sums=["_x", "_y", "_xx", "_xy"],
                      count_col="n", num_buckets=num_buckets, combine=combine)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype(np.int64).to_numpy()
        sx = df["sum__x"].astype(np.int64).to_numpy()
        sy = df["sum__y"].astype(np.int64).to_numpy()
        sxx = df["sum__xx"].astype(np.int64).to_numpy()
        sxy = df["sum__xy"].astype(np.int64).to_numpy()
        nf, sxf, syf = (a.astype(np.float64) for a in (n, sx, sy))
        cov = nf * sxy.astype(np.float64) - sxf * syf
        vx = nf * sxx.astype(np.float64) - sxf * sxf
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(vx > 0, cov / vx, np.nan)
            intercept = (syf - slope * sxf) / nf
        out = df[keys].copy()
        out["n"] = n
        out["slope"] = slope
        out["intercept"] = intercept
        return out

    return agg.map_batches(_finish, batch_format="pandas")


def corr_matrix(
    ds: "ray.data.Dataset",
    cols: Sequence[str],
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Full Pearson correlation matrix over INTEGER-scaled columns in
    ONE pass — :func:`grouped_corr` generalized to all C(k,2) pairs:
    a single ``map_batches`` emits every per-column sum/square and
    every pairwise product, one :func:`partial_agg` combines them, and
    the driver finishes each pair with grouped_corr's exact float64
    expression tree (so each cell is bit-identical to a SQL oracle
    spelling the same formula over the same integer sums).

    Returns one row per unordered pair (col_x < col_y by position):
    (col_x utf8, col_y utf8, n int64, corr float64; zero-variance
    pairs → -1.0 sentinel, coalesced identically by the oracle).

    Scale shape: the moment row is O(k²) wide but there is ONE row per
    batch and the combine is a single group — the k-column stream never
    shuffles.  Same int64 envelope as grouped_corr (~10¹² rows of
    ~10³-scaled values; pre-scale hot columns down past that)."""
    cols = list(cols)
    names: list[str] = []
    for i, a in enumerate(cols):
        names.append(f"_s{i}")
        names.append(f"_q{i}")
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    for i, j in pairs:
        names.append(f"_p{i}_{j}")

    def _moments(batch: pa.Table) -> pa.Table:
        vs = [batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
              for c in cols]
        out: dict[str, Any] = {"_g": pa.array(
            np.zeros(len(batch), dtype=np.int32))}
        for i, v in enumerate(vs):
            out[f"_s{i}"] = pa.array(v)
            out[f"_q{i}"] = pa.array(v * v)
        for i, j in pairs:
            out[f"_p{i}_{j}"] = pa.array(vs[i] * vs[j])
        return pa.table(out)

    agg = partial_agg(ds.map_batches(_moments, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["_g"], sums=names, count_col="n",
                      num_buckets=num_buckets, combine="driver").to_pandas()
    n = np.int64(agg["n"].iloc[0])
    nf = np.float64(n)
    rows = []
    for i, j in pairs:
        sx = np.float64(np.int64(agg[f"sum__s{i}"].iloc[0]))
        sy = np.float64(np.int64(agg[f"sum__s{j}"].iloc[0]))
        sxx = np.float64(np.int64(agg[f"sum__q{i}"].iloc[0]))
        syy = np.float64(np.int64(agg[f"sum__q{j}"].iloc[0]))
        sxy = np.float64(np.int64(agg[f"sum__p{i}_{j}"].iloc[0]))
        cov = nf * sxy - sx * sy
        vx = nf * sxx - sx * sx
        vy = nf * syy - sy * sy
        denom = np.sqrt(vx) * np.sqrt(vy)
        corr = float(cov / denom) if denom > 0 else -1.0
        rows.append({"col_x": cols[i], "col_y": cols[j],
                     "n": n, "corr": np.float64(corr)})
    return pd.DataFrame(rows)


def grouped_quantile_cont(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    q: float = 0.5,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """INTERPOLATED quantile per group over an integer-valued column
    (DuckDB ``quantile_cont`` semantics, pinned empirically over 300
    random fixtures: 0-based position ``pos = (n-1)*q``, then
    ``v[floor]*(1-f) + v[ceil]*f`` with ``f = pos - floor`` — the
    two-sided-weights form; ``v[lo] + (v[hi]-v[lo])*f`` differs in low
    bits and does NOT match).

    Same scale shape as :func:`grouped_quantile_disc`: per-batch
    (group, value) frequency partials → bucketed combine → the driver
    walks each group's tiny CDF, O(groups × distinct values)."""
    return grouped_quantiles_cont(ds, group_col, value_col, [q],
                                  num_buckets=num_buckets)


def grouped_quantiles_cont(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    num_buckets: int = 16,
) -> pd.DataFrame:
    """:func:`grouped_quantile_cont` for SEVERAL quantiles from ONE
    frequency pass (the robust-scaling fit needs p25/p50/p75 — one CDF
    walk serves all three).  Columns ``q<q>`` per requested quantile."""
    import math

    counts = partial_agg(ds, [group_col, value_col], sums=(),
                         count_col="n", num_buckets=num_buckets)
    pdf = counts.to_pandas()
    rows = []
    for g, gdf in pdf.groupby(group_col, sort=False):
        # SQL semantics: NULL values excluded, all-NULL groups kept
        gdf = gdf[gdf[value_col].notna()].sort_values(value_col,
                                                      kind="mergesort")
        n = int(gdf["n"].sum())
        if n == 0:
            rows.append((g, *[np.nan] * len(qs)))
            continue
        cum = gdf["n"].cumsum()
        vals = []
        for q in qs:
            pos = (n - 1) * q
            lo, hi = int(math.floor(pos)), int(math.ceil(pos))
            f = pos - lo
            v_lo = float(gdf.loc[cum >= lo + 1, value_col].iloc[0])
            v_hi = float(gdf.loc[cum >= hi + 1, value_col].iloc[0])
            vals.append(v_lo * (1 - f) + v_hi * f)
        rows.append((g, *vals))
    return (pd.DataFrame(rows, columns=[group_col, *[f"q{q}" for q in qs]])
            .sort_values(group_col, kind="mergesort").reset_index(drop=True))


def grouped_latest(
    ds: "ray.data.Dataset",
    key: str,
    order_col: str,
    tie_cols: Sequence[str] = (),
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """The whole row holding each key's MAX ``order_col`` (latest event
    per user, newest order per customer — the argmax lookup feature).

    Mergeable-partial plan: each batch keeps ONE candidate row per key
    (vectorized ``groupby.idxmax`` with ``tie_cols`` as descending
    tie-breaks), the bucketed combine repeats the same pick over
    candidates — so the shuffle moves O(keys × batches) rows, never the
    event stream, unlike a windowed ``row_number() = 1`` plan which
    shuffles every row.  Ties beyond ``(order_col, *tie_cols)`` would be
    nondeterministic; pass tie columns that make the order total.
    """
    sort_cols = [order_col, *tie_cols]

    def _pick(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key, *sort_cols],
                           ascending=[True] + [False] * len(sort_cols),
                           kind="mergesort")
        return d.groupby(key, sort=False).head(1)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        out = _pick(df)
        h = pd.util.hash_pandas_object(out[key], index=False).to_numpy()
        return out.assign(
            _bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return _pick(df).drop(columns=["_bucket"])

    partials = ds.map_batches(_partial, batch_format="pandas")
    return partials.groupby("_bucket").map_groups(_final, batch_format="pandas")


def grouped_string_agg(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    order_cols: Sequence[str],
    sep: str = ">",
    num_buckets: int = 16,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Ordered per-key concatenation of ``value`` (the session-path /
    user-journey string: SQL ``string_agg(value, sep ORDER BY ...)``).

    One skinny shuffle: only ``(key, order_cols, value)`` moves, 
    bucketed by key; each bucket sorts its keys' rows once and joins
    vectorized.  Row width grows with a key's event count — cap
    upstream (e.g. compose with a per-key top-N filter) for keys with
    unbounded histories; at 100 TB an uncapped journey string is a
    data-modeling bug, not an engine feature.
    """
    out_col = out_col or f"{value}_path"
    cols = [key, *order_cols, value]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        # SQL string_agg skips NULL values (a key with only NULLs still
        # appears, as NULL — dropped here: sep.join can't emit SQL NULL)
        out = df.loc[df[value].notna(), cols].copy()
        h = pd.util.hash_pandas_object(out[key], index=False).to_numpy()
        return out.assign(
            _bucket=(h % np.uint64(num_buckets)).astype(np.int32))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values([key, *order_cols], kind="mergesort")
        g = d.groupby(key, sort=False)[value].agg(sep.join)
        return g.rename(out_col).reset_index()

    partials = ds.map_batches(_partial, batch_format="pandas")
    return partials.groupby("_bucket").map_groups(_final, batch_format="pandas")


def choose_join_plan(right_bytes: int | None,
                     broadcast_limit: int = 64 << 20) -> str:
    """'broadcast' when the right side provably fits every worker heap
    (each actor holds one copy; ``ray.put`` ships it once per node),
    else 'shuffle'.  Unknown size → shuffle: the safe plan is the one
    whose memory is bounded by bucket sizing, not by a guess."""
    if right_bytes is not None and right_bytes <= broadcast_limit:
        return "broadcast"
    return "shuffle"


def auto_join(
    left: "ray.data.Dataset",
    right,
    on,
    right_bytes: int | None = None,
    how: str = "inner",
    broadcast_limit: int = 64 << 20,
    salt_threshold: float | None = None,
    salt_n: int = 16,
    **hash_kw,
):
    """Equi-join with physical-plan selection by measured bytes — the
    optimizer rule every query above applies by hand (dimension tables
    broadcast, fact×fact shuffles), packaged: pass ``right`` as a
    pandas DataFrame (size measured directly) or a Dataset with
    ``right_bytes`` from parquet footer metadata (``table_bytes``);
    never from a guess.  Broadcast serves inner/left only (semi/anti
    existence checks go through the bucketed plan, whose right side is
    already reduced to keys).  ``hash_kw`` forwards to ``hash_join``.

    ``salt_threshold``: opt-in skew rule — when the bucketed plan is
    chosen, detect LEFT keys above this row fraction
    (:func:`..skew.detect_hot_keys`, one skinny pass) and salt them
    over ``salt_n`` sub-buckets automatically. Only engaged for hows
    where replication is sound (inner/left/semi/anti — see
    ``hash_join``) and single-column keys; output is unchanged, only
    bucket balance. Costs one extra pass over ``left``, so reserve it
    for joins whose left side is known skew-prone.
    """
    import ray.data as rd

    def _salted_kw():
        if (salt_threshold is None or how == "outer"
                or not isinstance(on, str)
                or hash_kw.get("salt_hot") is not None):
            return hash_kw
        from .skew import detect_hot_keys

        hot = detect_hot_keys(left, on, threshold_frac=salt_threshold)
        if not hot:
            return hash_kw
        return {**hash_kw, "salt_hot": (hot, salt_n)}

    if isinstance(right, pd.DataFrame):
        est = int(right.memory_usage(deep=True).sum())
        if how in ("inner", "left") and \
                choose_join_plan(est, broadcast_limit) == "broadcast":
            return broadcast_join(left, right, on=on, how=how)
        return hash_join(left, rd.from_pandas(right), on, how=how,
                         **_salted_kw())
    if how in ("inner", "left") and \
            choose_join_plan(right_bytes, broadcast_limit) == "broadcast":
        # caller proved the right side small via footer metadata —
        # materializing it here is bounded by right_bytes by contract
        return broadcast_join(left, right.to_pandas(), on=on, how=how)
    return hash_join(left, right, on, how=how, **_salted_kw())


def categorical_pivot_sum(
    ds: "ray.data.Dataset",
    key: str,
    cat_col: str,
    value: str,
    categories: Sequence[str],
    num_buckets: int = 16,
    prefix: str = "sum_",
) -> "ray.data.Dataset":
    """Pivot-SUM feature block: one ``prefix<cat>`` column per category
    holding the key's summed ``value`` in that category (0 where the
    key has no such rows — SQL ``COALESCE(SUM(CASE WHEN ...), 0)``).
    Same dense-vector shape as :func:`categorical_counts`: per-batch
    pivot partials one skinny fixed-width row per key, bucketed sum
    combine — raw rows never shuffle."""
    cats = list(categories)
    out_cols = [f"{prefix}{c}" for c in cats]

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        pt = df.pivot_table(index=key, columns=cat_col, values=value,
                            aggfunc="sum", fill_value=0)
        pt = pt.reindex(columns=cats, fill_value=0)
        pt.columns = out_cols
        pt = pt.reset_index()
        h = pd.util.hash_pandas_object(pt[key], index=False).to_numpy()
        pt["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int32)
        return pt

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[out_cols].sum().reset_index()
        for c in out_cols:
            g[c] = g[c].astype(np.int64)
        return g

    partials = ds.map_batches(_partial, batch_format="pandas").repartition(16)
    return partials.groupby("_bucket").map_groups(_final, batch_format="pandas")


def grouped_ddsketch_quantile(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    q: float = 0.5,
    alpha: float = 0.01,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """APPROXIMATE per-group quantile with relative-error guarantee
    ``alpha`` — the 100 TB scale path beside the exact CDF walk of
    :func:`grouped_quantile_disc`, whose partials grow with DISTINCT
    VALUES per group (unbounded for continuous data).  Here a value
    lands in DDSketch log-bucket ``ceil(log_gamma(x))`` (gamma =
    (1+alpha)/(1-alpha)), so partials are bounded by groups × log-range
    buckets (~2.3k buckets spanning 1e-9..1e9 at alpha=0.01) no matter
    how many rows stream through.  Positive values only (standard
    DDSketch domain); zeros/negatives tracked in a dedicated bucket and
    returned as 0.0 when the quantile falls there.

    Same shape as every aggregate here: vectorized per-batch bucketing
    → ``partial_agg`` count combine → driver walk of each group's tiny
    histogram, answering with the bucket midpoint (relative error ≤
    alpha, the DDSketch guarantee)."""
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    log_gamma = math.log(gamma)

    def _bucket(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # SQL quantile ignores NULLs: drop them BEFORE bucketing, else
        # NaN rows (NaN > 0 is False) land in the non-positive sentinel
        # bucket AND inflate n, skewing the estimate toward 0.0
        keep = ~np.isnan(v)
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            v = v[keep]
        idx = np.zeros(len(v), dtype=np.int64)
        pos = v > 0
        idx[pos] = np.ceil(np.log(v[pos]) / log_gamma).astype(np.int64)
        # non-positive values share sentinel bucket far below any real one
        idx[~pos] = np.iinfo(np.int32).min
        return pa.table({group_col: batch[group_col],
                         "_ddb": pa.array(idx)})

    counts = partial_agg(
        ds.map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "_ddb"], sums=(), count_col="n", num_buckets=num_buckets)
    pdf = counts.to_pandas()
    rows = []
    for g, gdf in pdf.groupby(group_col, sort=False):
        gdf = gdf.sort_values("_ddb", kind="mergesort")
        n = int(gdf["n"].sum())
        rank = max(int(math.ceil(n * q)), 1)
        cum = gdf["n"].cumsum()
        b = int(gdf.loc[cum >= rank, "_ddb"].iloc[0])
        est = 0.0 if b == np.iinfo(np.int32).min else \
            2.0 * (gamma ** b) / (gamma + 1.0)   # bucket midpoint
        rows.append((g, est))
    return (pd.DataFrame(rows, columns=[group_col, f"q{q}_approx"])
            .sort_values(group_col, kind="mergesort").reset_index(drop=True))


def rollup_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_col: str = "n",
    num_buckets: int = 16,
    all_label: str = "ALL",
) -> pd.DataFrame:
    """SQL ``GROUP BY ROLLUP(keys)``: one row per finest group plus
    subtotals at every key prefix and a grand total — the prefix-sets
    case of :func:`grouping_sets_agg` (see it for the scale shape and
    the string-key convention)."""
    keys = list(keys)
    sets = [keys[:d] for d in range(len(keys), -1, -1)]
    return grouping_sets_agg(ds, keys, sets, sums=sums, count_col=count_col,
                             num_buckets=num_buckets, all_label=all_label)

def grouping_sets_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sets: Sequence[Sequence[str]],
    sums: Sequence[str] = (),
    count_col: str = "n",
    num_buckets: int = 16,
    all_label: str = "ALL",
) -> pd.DataFrame:
    """SQL ``GROUP BY GROUPING SETS(sets)`` over subsets of ``keys`` —
    the generalization behind :func:`rollup_agg` (prefix sets) and
    :func:`cube_agg` (all subsets).  One shuffled finest-level combine;
    every requested set re-sums finest GROUPS (driver-side, bounded by
    group count).  Key columns must be non-null (``all_label`` marks
    rolled-up levels, as SQL uses NULL)."""
    keys = list(keys)
    sum_cols = [f"sum_{c}" for c in sums]
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of {keys}")
    finest = partial_agg(ds, keys, sums=sums, count_col=count_col,
                         num_buckets=num_buckets).to_pandas()
    # output key columns are STRINGS (all_label marks rolled-up levels,
    # as SQL uses NULL): mixing the string label into an int64 key
    # column would make the final sort raise on str<int comparisons —
    # SQL users mirror with COALESCE(CAST(k AS VARCHAR), all_label)
    for c in keys:
        finest[c] = finest[c].astype(str)
    levels = []
    for s in sets:
        kept = [k for k in keys if k in set(s)]   # canonical column order
        g = (finest.groupby(kept, sort=False)[sum_cols + [count_col]].sum()
             .reset_index() if kept else
             finest[[*sum_cols, count_col]].sum().to_frame().T)
        for c in keys:
            if c not in kept:
                g[c] = all_label
        levels.append(g[keys + sum_cols + [count_col]])
    out = pd.concat(levels, ignore_index=True)
    # counts are always int64; sums stay int64 ONLY when the input was
    # integer-scaled (the bit-exactness contract every aggregate here
    # documents) — blindly casting a float sum would truncate it
    out[count_col] = out[count_col].astype(np.int64)
    for c in sum_cols:
        if pd.api.types.is_integer_dtype(finest[c]):
            out[c] = out[c].astype(np.int64)
    return out.sort_values(keys, kind="mergesort").reset_index(drop=True)


def cube_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    sums: Sequence[str] = (),
    count_col: str = "n",
    num_buckets: int = 16,
    all_label: str = "ALL",
) -> pd.DataFrame:
    """SQL ``GROUP BY CUBE(keys)``: every subset of ``keys`` (2^k sets,
    keep k small) through one finest-level shuffle."""
    from itertools import combinations

    keys = list(keys)
    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_agg(ds, keys, sets, sums=sums, count_col=count_col,
                             num_buckets=num_buckets, all_label=all_label)


def grouped_skew_kurt(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    x: str,
    num_buckets: int = 16,
    combine: str = "driver",
) -> "ray.data.Dataset":
    """Per-group SKEWNESS and EXCESS KURTOSIS over an INTEGER-scaled
    column — the 3rd/4th-moment siblings of :func:`grouped_corr`:
    exact int64 partials (n, Σx, Σx², Σx³, Σx⁴), one closed-form
    float finish over population central moments

        m_k = Σ(x − mean)^k / n      (expanded in raw moments)
        skew = m₃ / m₂^1.5           excess kurtosis = m₄ / m₂² − 3

    Keep the scale of ``x`` modest: Σx⁴ must fit int64 (e.g. unit-
    scaled values ≤ ~500 hold to ~10⁸ rows per batch-key; beyond that
    pre-divide the scale).  Zero-variance groups get NULL."""
    keys = list(keys)

    def _moments(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = xs * xs
        out = {k: batch[k] for k in keys}
        out.update({"_x": pa.array(xs), "_x2": pa.array(x2),
                    "_x3": pa.array(x2 * xs), "_x4": pa.array(x2 * x2)})
        return pa.table(out)

    agg = partial_agg(ds.map_batches(_moments, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      keys, sums=["_x", "_x2", "_x3", "_x4"],
                      count_col="n", num_buckets=num_buckets,
                      combine=combine)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype(np.int64).to_numpy()
        s1 = df["sum__x"].astype(np.int64).to_numpy().astype(np.float64)
        s2 = df["sum__x2"].astype(np.int64).to_numpy().astype(np.float64)
        s3 = df["sum__x3"].astype(np.int64).to_numpy().astype(np.float64)
        s4 = df["sum__x4"].astype(np.int64).to_numpy().astype(np.float64)
        nf = n.astype(np.float64)
        m = s1 / nf
        m2 = s2 / nf - m * m
        m3 = s3 / nf - 3.0 * m * (s2 / nf) + 2.0 * m * m * m
        m4 = (s4 / nf - 4.0 * m * (s3 / nf) + 6.0 * m * m * (s2 / nf)
              - 3.0 * m * m * m * m)
        with np.errstate(divide="ignore", invalid="ignore"):
            skew = np.where(m2 > 0, m3 / (np.sqrt(m2) * m2), np.nan)
            kurt = np.where(m2 > 0, m4 / (m2 * m2) - 3.0, np.nan)
        out = df[keys].copy()
        out["n"] = n
        out["skew"] = skew
        out["kurt"] = kurt
        return out

    return agg.map_batches(_finish, batch_format="pandas")
