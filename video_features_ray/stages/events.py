"""Per-entity event-stream operators over exploded tables.

The reference's ordering is implicit (sequential frame reads,
``utils/io.py:97-144``); here it is explicit: hash-bucket by entity key,
shuffle once, sort within the bucket, then compute lag/lead/sessionize/
forward-fill vectorized over the WHOLE bucket with key-boundary masks —
never a Python loop per entity and never one `map_groups` call per tiny
group.

Scale design: ``num_buckets`` bounds shuffle fan-in and gives each
map task a bucket of many entities (bucket >> entity granularity). A
hot entity never splits across buckets, so per-entity state stays local;
skewed buckets can be salted by raising ``num_buckets``. The bucket id
uses a deterministic vectorized hash (stable across worker processes —
NOT Python's seeded ``hash``).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def stable_hash64(values: np.ndarray) -> np.ndarray:
    """Full-width deterministic uint64 hash for int or string keys
    (vectorized, cross-process stable)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        # Fibonacci-style multiplicative mix so sequential ids spread out
        return (arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
    return pd.util.hash_array(arr.astype(object)).astype(np.uint64)


def stable_bucket(values: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic hash-bucket for int or string keys (vectorized)."""
    return (stable_hash64(values) % np.uint64(num_buckets)).astype(np.int32)


def stable_bucket_multi(arrays, num_buckets: int) -> np.ndarray:
    """Composite-key bucket: combine the per-column FULL-WIDTH hashes
    with a multiply-fold (order-sensitive, cross-process deterministic).
    Folding int32 bucket values instead of uint64 hashes — the old
    `stable_bucket(a, 1 << 62)` shape — silently wrapped each column's
    contribution to 32 sign-extended bits."""
    h = np.zeros(len(arrays[0]), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for a in arrays:
            h = h * np.uint64(0x100000001B3) + stable_hash64(np.asarray(a))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def with_bucket(ds: "ray.data.Dataset", key: str, num_buckets: int) -> "ray.data.Dataset":
    def _add(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch[key].to_numpy(zero_copy_only=False), num_buckets)
        return batch.append_column("_bucket", pa.array(b, type=pa.int32()))

    return ds.map_batches(_add, batch_format="pyarrow", zero_copy_batch=True)


def transform_buckets(
    ds: "ray.data.Dataset",
    key: str,
    sort_keys: Sequence[str],
    fn: Callable,
    num_buckets: int = 64,
    ascending: Sequence[bool] | None = None,
    batch_format: str = "pandas",
) -> "ray.data.Dataset":
    """ONE hash shuffle: bucket by ``key``, then ``fn`` over each bucket
    sorted by ``[key, *sort_keys]`` (fn sees many entities at once and is
    expected to be vectorized with key-boundary masks). ``ascending``
    optionally flips individual ``sort_keys`` (the key itself always
    sorts ascending).

    ``batch_format="pyarrow"``: the bucket stays an Arrow table end to
    end — the sort is one stable numpy ``lexsort`` + one ``take`` (no
    pandas block conversion, no object boxing), and ``fn`` receives /
    returns ``pa.Table``.  Combiners that genuinely use pandas
    merge/rolling semantics keep the default.  The Arrow path requires
    all-ascending sorts (every current arrow combiner is)."""
    asc = [True, *(ascending if ascending is not None else [True] * len(sort_keys))]

    if batch_format == "pyarrow":
        if not all(asc):
            raise ValueError("arrow transform_buckets is all-ascending")

        def _per_bucket_arrow(tbl: pa.Table) -> pa.Table:
            if tbl.num_rows and key in tbl.column_names:
                cols = [tbl[c].to_numpy(zero_copy_only=False)
                        for c in (key, *sort_keys)]
                # lexsort: LAST key is primary -> reverse; stable, so
                # tie order matches pandas' mergesort exactly
                order = np.lexsort(cols[::-1])
                tbl = tbl.take(pa.array(order))
            out = fn(tbl)
            if "_bucket" in out.column_names:
                out = out.drop_columns(["_bucket"])
            return out

        return (with_bucket(ds, key, num_buckets)
                .groupby("_bucket")
                .map_groups(_per_bucket_arrow, batch_format="pyarrow"))

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = (df.sort_values([key, *sort_keys], ascending=asc, kind="mergesort")
              .reset_index(drop=True))
        out = fn(df)
        return out.drop(columns=["_bucket"], errors="ignore")

    return (
        with_bucket(ds, key, num_buckets)
        .groupby("_bucket")
        .map_groups(_per_bucket, batch_format="pandas")
    )


def _key_change(df: pd.DataFrame, key: str) -> np.ndarray:
    k = df[key].to_numpy()
    chg = np.ones(len(df), dtype=bool)
    if len(df):
        chg[1:] = k[1:] != k[:-1]
    return chg


def partition_bounds(df: pd.DataFrame, key: str):
    """(starts, ends) index arrays of each row's key partition over a
    frame pre-sorted by [key, ...] — the shared boundary mask every
    lag/lead kernel needs (one definition; multi_lag and the fused
    feature-store block both use it)."""
    n = len(df)
    idx = np.arange(n)
    chg = _key_change(df, key)
    starts = np.maximum.accumulate(np.where(chg, idx, 0))
    s_idx = np.flatnonzero(chg)
    pos = np.searchsorted(s_idx, idx, side="right")
    nxt = np.where(pos < len(s_idx),
                   s_idx[np.minimum(pos, len(s_idx) - 1)], n)
    return starts, nxt - 1


def rolling_moment_cols(df: pd.DataFrame, key: str, ts: str, value: str,
                        span_us: int):
    """Trailing-``span_us`` windowed (n, Σx, Σx²) arrays for a bucket
    frame pre-sorted by [key, ts, ...], with the SQL RANGE tie-peer
    patch applied — the one shared kernel behind rolling_time_moments
    and the fused feature-store block (a fix here reaches both)."""
    xs = df[value].astype(np.float64)
    t = df[ts].to_numpy()
    frame = pd.DataFrame({"_x": xs, "_xx": xs * xs}, index=df.index)
    frame[key] = df[key].to_numpy()
    win = (frame.set_index(pd.to_datetime(t, unit="us"))
           .groupby(key, sort=False)
           .rolling(pd.Timedelta(microseconds=int(span_us)),
                    closed="both"))
    tmp = pd.DataFrame({"_n": win["_x"].count().to_numpy(),
                        "_sx": win["_x"].sum().to_numpy(),
                        "_sxx": win["_xx"].sum().to_numpy()})
    tmp[key] = df[key].to_numpy()
    tmp[ts] = t
    # SQL RANGE frames include ALL peers of a tied ts; the positional
    # rolling saw only earlier ones — patch to the tie group's last
    g = tmp.groupby([key, ts], sort=False)
    return (g["_n"].transform("last").to_numpy(),
            g["_sx"].transform("last").to_numpy(),
            g["_sxx"].transform("last").to_numpy())


def lag_lead(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    lags: Sequence[int] = (1,),
    leads: Sequence[int] = (1,),
    num_buckets: int = 64,
    tie_cols: Sequence[str] = (),
) -> "ray.data.Dataset":
    """Per-entity lag/lead columns (the engine's W3 ring buffer made
    columnar: reference carries the last k rows across batch boundaries,
    ``utils/io.py:120-152``). ``tie_cols``: deterministic tie-break columns
    appended to the sort — without one, equal (key, ts) rows order by
    shuffle arrival, which Ray does not guarantee stable.  Pandas-free:
    the bucket is one Arrow table, lexsorted once, lag columns appended
    as numpy arrays."""

    def _fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or key not in tbl.column_names:
            return tbl
        k = tbl[key].to_numpy(zero_copy_only=False)
        v = tbl[value].to_numpy(zero_copy_only=False)
        n = tbl.num_rows
        for d in lags:
            col = np.roll(v, d).astype(float)
            valid = np.zeros(n, dtype=bool)
            if n > d:
                valid[d:] = k[d:] == k[:-d]
            tbl = tbl.append_column(f"{value}_lag{d}",
                                    pa.array(np.where(valid, col, np.nan)))
        for d in leads:
            col = np.roll(v, -d).astype(float)
            valid = np.zeros(n, dtype=bool)
            if n > d:
                valid[:-d] = k[:-d] == k[d:]
            tbl = tbl.append_column(f"{value}_lead{d}",
                                    pa.array(np.where(valid, col, np.nan)))
        return tbl

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets,
                             batch_format="pyarrow")


def _session_id_array(k: np.ndarray, t: np.ndarray, gap: float
                      ) -> np.ndarray:
    """Shared session-boundary kernel over PRE-SORTED (key, ts) arrays:
    new session at each entity change or when ``ts - prev_ts > gap``;
    returns the 0-based session ordinal within each entity.  The ONE
    place gap/tie semantics live — sessionize and sessionize_stats
    both call it."""
    n = len(k)
    chg = np.ones(n, dtype=bool)
    if n > 1:
        chg[1:] = k[1:] != k[:-1]
    new = chg.copy()
    if n > 1:
        d = t[1:] - t[:-1]
        # datetime64 ts -> the DIFF is timedelta64 ('m'); normalize to
        # seconds so gap keeps one unit (testing t's dtype here would
        # route datetime input to the raw branch and compare gap
        # against nanoseconds)
        dt = (d / np.timedelta64(1, "s") if d.dtype.kind == "m"
              else d.astype("float64"))
        new[1:] |= dt > gap
    ord_ = np.cumsum(new) - 1  # global session ordinal in bucket
    key_base = np.maximum.accumulate(np.where(chg, ord_, -1))
    return (ord_ - key_base).astype(np.int64)


def sessionize(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    gap: float,
    num_buckets: int = 64,
    session_col: str = "session_id",
    tie_cols: Sequence[str] = (),
) -> "ray.data.Dataset":
    """Gap-based sessionization (generalizes the reference's tumbling
    0.96 s examples, ``vggish_params.py:27-35``): a new session starts at
    each entity change or when ``ts - prev_ts > gap``. ``session_id`` is
    the 0-based session ordinal within the entity.  Pandas-free Arrow
    bucket path."""

    def _fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or key not in tbl.column_names:
            return tbl
        sess = _session_id_array(
            tbl[key].to_numpy(zero_copy_only=False),
            tbl[ts].to_numpy(zero_copy_only=False), gap)
        return tbl.append_column(session_col, pa.array(sess))

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets,
                             batch_format="pyarrow")


def sessionize_stats(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    gap: float,
    num_buckets: int = 64,
    tie_cols: Sequence[str] = (),
    session_col: str = "session_id",
) -> "ray.data.Dataset":
    """Per-(key, session) count + start/end ts in ONE shuffle: the
    sessionize bucket task already holds every row of each key, so the
    per-session aggregate is exact computed right there — round 2's
    version paid a second bucketed groupby to aggregate what the first
    task could see whole (2.8 s → ~1.3 s at sf0.1/32cpu).  Pandas-free:
    the bucket is sorted by (key, ts), so each (key, session) is one
    contiguous run — counts are run lengths, t_start/t_end the run's
    first/last ts (ts ascending within the run)."""

    def _fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or key not in tbl.column_names:
            return tbl
        k = tbl[key].to_numpy(zero_copy_only=False)
        t = tbl[ts].to_numpy(zero_copy_only=False)
        sess = _session_id_array(k, t, gap)
        n = len(k)
        run_start = np.ones(n, dtype=bool)
        run_start[1:] = (k[1:] != k[:-1]) | (sess[1:] != sess[:-1])
        starts = np.flatnonzero(run_start)
        ends = np.concatenate([starts[1:], [n]]) - 1
        counts = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        return pa.table({
            key: pa.array(k[starts].tolist(), type=tbl.schema.field(key).type),
            session_col: pa.array(sess[starts]),
            "n_events": pa.array(counts),
            "t_start": pa.array(t[starts], type=tbl.schema.field(ts).type),
            "t_end": pa.array(t[ends], type=tbl.schema.field(ts).type)})

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets,
                             batch_format="pyarrow")


def rolling_agg(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    window_rows: int,
    num_buckets: int = 64,
    tie_cols: Sequence[str] = (),
    out_col: str | None = None,
    agg: str = "sum",
) -> "ray.data.Dataset":
    """Per-entity rolling aggregate over the last ``window_rows`` rows
    (inclusive, ``min_periods=1``) — the moving-window feature family.
    SQL equivalent: ``<AGG>(v) OVER (PARTITION BY key ORDER BY ts, tie
    ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW)``. One hash
    shuffle; the rolling kernel is pandas' vectorized window over the
    whole bucket.

    ``agg``: ``sum`` / ``median`` / ``min`` / ``max``. ``median``
    matches SQL ``median()`` exactly on integer inputs: both sides
    average the two middle values with one IEEE ``(a+b)/2``, so
    cent-scaled int64 values stay bit-stable."""
    if agg not in ("sum", "median", "min", "max"):
        raise ValueError(f"unsupported rolling agg {agg!r}")
    out_col = out_col or f"{value}_roll{agg}{window_rows}"

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        r = (df.groupby(key, sort=False)[value]
             .rolling(window_rows, min_periods=1))
        s = getattr(r, agg)().reset_index(level=0, drop=True)
        df[out_col] = s
        return df

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets)


def window_rank(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: Sequence[str],
    num_buckets: int = 64,
    ascending: Sequence[bool] | None = None,
    out_col: str = "rnk",
) -> "ray.data.Dataset":
    """Per-entity row_number: rank 1..n within ``key`` by ``order_cols``
    (``ascending`` flips individual columns — include a unique id as the
    last order col for deterministic ties). SQL:
    ``row_number() OVER (PARTITION BY key ORDER BY ...)``."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = (df.groupby(key, sort=False).cumcount() + 1).astype(np.int64)
        return df

    return transform_buckets(ds, key, list(order_cols), _fn, num_buckets,
                             ascending=ascending)


def dense_rank(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: Sequence[str],
    num_buckets: int = 64,
    ascending: Sequence[bool] | None = None,
    out_col: str = "drnk",
) -> "ray.data.Dataset":
    """Per-entity DENSE rank within ``key`` by ``order_cols`` — ties
    share a rank and ranks have no gaps (so no tie-break id is needed;
    the output is deterministic regardless of tie order). SQL:
    ``dense_rank() OVER (PARTITION BY key ORDER BY ...)``.

    Vectorized on the bucket-sorted frame: one boolean "order tuple
    changed vs previous row" column, cumsum, rebased per key group."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            df[out_col] = pd.Series([], dtype=np.int64)
            return df
        first = _key_change(df, key)
        chg = first.copy()
        for c in order_cols:
            a = df[c].to_numpy()
            neq = a[1:] != a[:-1]
            if a.dtype.kind == "f":
                # SQL ranks NULLs as equal; NaN != NaN would split them
                neq &= ~(np.isnan(a[1:]) & np.isnan(a[:-1]))
            chg[1:] |= neq
        total = np.cumsum(chg)
        idx_first = np.flatnonzero(first)
        sizes = np.diff(np.append(idx_first, n))
        base = np.repeat(total[idx_first] - 1, sizes)
        df[out_col] = (total - base).astype(np.int64)
        return df

    return transform_buckets(ds, key, list(order_cols), _fn, num_buckets,
                             ascending=ascending)


def ntile(
    ds: "ray.data.Dataset",
    key: str,
    order_cols: Sequence[str],
    n: int,
    num_buckets: int = 64,
    ascending: Sequence[bool] | None = None,
    out_col: str = "tile",
) -> "ray.data.Dataset":
    """Per-entity NTILE(n): rows of each ``key`` group, ordered by
    ``order_cols``, split into ``n`` buckets 1..n where the first
    ``size % n`` buckets hold ``ceil(size/n)`` rows (exact SQL NTILE
    semantics — include a unique id as the last order col so the split
    is deterministic under ties)."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        m = len(df)
        if m == 0:
            df[out_col] = pd.Series([], dtype=np.int64)
            return df
        first = _key_change(df, key)
        idx_first = np.flatnonzero(first)
        sizes = np.diff(np.append(idx_first, m))
        rn = np.arange(m, dtype=np.int64) - np.repeat(idx_first, sizes)
        s = np.repeat(sizes, sizes)
        q, r = s // n, s % n
        big = r * (q + 1)          # rows covered by the ceil-sized tiles
        tile = np.where(
            rn < big,
            rn // np.maximum(q + 1, 1),
            r + (rn - big) // np.maximum(q, 1),
        )
        df[out_col] = (tile + 1).astype(np.int64)
        return df

    return transform_buckets(ds, key, list(order_cols), _fn, num_buckets,
                             ascending=ascending)


def cumulative_sum(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    num_buckets: int = 64,
    tie_cols: Sequence[str] = (),
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Per-entity running total ordered by ``(ts, *tie_cols)`` — the
    unbounded-preceding window sum."""
    out_col = out_col or f"{value}_cumsum"

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = df.groupby(key, sort=False)[value].cumsum()
        return df

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets)


def forward_fill(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    num_buckets: int = 64,
    out_col: str | None = None,
    tie_cols: Sequence[str] = (),
) -> "ray.data.Dataset":
    """Per-entity forward-fill (backfill operator): latest non-null value
    at or before each row — the batch-boundary overlap cache of the
    reference generalized to nulls."""
    out_col = out_col or f"{value}_ffill"

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = df.groupby(key, sort=False)[value].ffill()
        return df

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets)


def group_share(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    num_buckets: int = 64,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Each row's share of its key's total (``value / SUM(value) OVER
    (PARTITION BY key)`` — the ratio-feature normalizer).  One hash
    shuffle via ``transform_buckets``; ``value`` should be an exact
    integer column so the single int/int → float64 division is
    bit-reproducible against SQL."""
    out_col = out_col or f"{value}_share"

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        tot = df.groupby(key, sort=False)[value].transform("sum")
        df[out_col] = df[value].to_numpy() / tot.to_numpy()
        return df

    return transform_buckets(ds, key, [], _fn, num_buckets)


def rolling_time_agg(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    span_us: int,
    num_buckets: int = 64,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Per-entity rolling sum over a TIME span — every row gets the sum
    of its key's values with ``ts`` in ``[t - span_us, t]`` (SQL
    ``RANGE BETWEEN span PRECEDING AND CURRENT ROW``), the time-decayed
    sibling of the row-count window in :func:`rolling_agg`.

    One hash shuffle; the kernel is pandas' vectorized datetime-window
    rolling (``closed='both'`` for the SQL-inclusive lower edge).  SQL
    RANGE frames include ALL peer rows of a tied timestamp while the
    positional rolling sees only earlier ones, so tied ``(key, ts)``
    groups are patched to the group's last (complete) value — a
    transform, not a loop."""
    out_col = out_col or f"{value}_rollsum_t"

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        idx = pd.to_datetime(df[ts], unit="us")
        s = (df.set_index(idx).groupby(key, sort=False)[value]
             .rolling(pd.Timedelta(microseconds=int(span_us)), closed="both")
             .sum())
        # df is bucket-sorted by [key, ts]; groupby(sort=False) preserves
        # that order, so positional assignment is exact
        df[out_col] = s.to_numpy()
        df[out_col] = df.groupby([key, ts], sort=False)[out_col].transform("last")
        return df

    return transform_buckets(ds, key, [ts], _fn, num_buckets)


def ewma_feature(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    halflife_us: float,
    num_buckets: int = 64,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Per-entity time-decayed exponential moving average of ``value``
    ordered by ``ts`` (halflife in the ts unit) — the feature-store
    freshness-weighted aggregate.  Not SQL-expressible (the recurrence
    is inherently sequential per key), so it carries a property-test
    oracle instead of a DuckDB hash; ties on ``ts`` are averaged within
    the tie first (deterministic under any input order).

    One hash shuffle; the kernel is vectorized groupwise cumsums over
    the adjusted-EWMA closed form
    ``ewma_i = Σ_{j<=i} v_j·2^((t_j-ref)/h) / Σ_{j<=i} 2^((t_j-ref)/h)``
    (== pandas ``ewm(times=, adjust=True)``).  A single anchor ``ref``
    underflows once a key's span exceeds ~1074 halflives (0/0 → NaN at
    the oldest rows), so rows are anchored per 256-halflife EPOCH and a
    tiny per-(key, epoch) carry chain rescales earlier epochs' partial
    sums into each epoch's frame — the only sequential walk is over
    epoch partials (span/256h rows per key), never data rows.  History
    further than float64 resolution genuinely contributes 0.
    """
    out_col = out_col or f"{value}_ewma"
    EPOCH_HL = 256.0  # halflives per epoch; inter-epoch decay stays representable

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        # collapse ts ties to their mean so the result is independent of
        # the (arbitrary) tie order
        collapsed = (df.groupby([key, ts], sort=False)[value].mean()
                     .reset_index())
        h = float(halflife_us)
        t = collapsed[ts].to_numpy(dtype=np.float64)
        g = collapsed.groupby(key, sort=False)
        t0 = g[ts].transform("min").to_numpy(dtype=np.float64)
        epoch = np.floor((t - t0) / (EPOCH_HL * h)).astype(np.int64)
        # anchor: the epoch's END boundary → exponents in (-EPOCH_HL, 0]
        anchor = t0 + (epoch + 1) * (EPOCH_HL * h)
        u = np.exp2((t - anchor) / h)
        collapsed["_ep"] = epoch
        collapsed["_wv"] = collapsed[value].to_numpy() * u
        collapsed["_w"] = u
        gke = collapsed.groupby([key, "_ep"], sort=False)
        cs = gke[["_wv", "_w"]].cumsum()
        wv, w = cs["_wv"].to_numpy().copy(), cs["_w"].to_numpy().copy()
        # carry chain: fold each epoch's total into the NEXT epoch's
        # frame, decayed by the anchor gap (representable: gap >= EPOCH_HL
        # halflives decays by >= 2^-EPOCH_HL per step and hits true 0
        # only past float64's denormal floor — where the weight IS 0)
        ep_tot = gke[["_wv", "_w"]].sum().reset_index()
        counts = gke.size().to_numpy()
        ek = ep_tot[key].to_numpy()
        ee = ep_tot["_ep"].to_numpy(dtype=np.float64)
        twv = ep_tot["_wv"].to_numpy()
        tw = ep_tot["_w"].to_numpy()
        carry_wv = np.zeros(len(ep_tot))
        carry_w = np.zeros(len(ep_tot))
        cwv = cw = 0.0
        for i in range(len(ep_tot)):  # walks EPOCH partials, not rows
            if i > 0 and ek[i] == ek[i - 1]:
                d = 2.0 ** (-(ee[i] - ee[i - 1]) * EPOCH_HL)
                cwv = (cwv + twv[i - 1]) * d
                cw = (cw + tw[i - 1]) * d
            else:
                cwv = cw = 0.0
            carry_wv[i] = cwv
            carry_w[i] = cw
        wv += np.repeat(carry_wv, counts)
        w += np.repeat(carry_w, counts)
        collapsed[out_col] = wv / w
        return df.merge(collapsed[[key, ts, out_col]], on=[key, ts], how="left")

    return transform_buckets(ds, key, [ts], _fn, num_buckets)


def backward_fill(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    num_buckets: int = 64,
    out_col: str | None = None,
    tie_cols: Sequence[str] = (),
) -> "ray.data.Dataset":
    """Per-entity backward-fill: the NEXT non-null value at or after
    each row (forward_fill's mirror — SQL ``first_value(v IGNORE
    NULLS) OVER (... ROWS BETWEEN CURRENT ROW AND UNBOUNDED
    FOLLOWING)``)."""
    out_col = out_col or f"{value}_bfill"

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        df[out_col] = df.groupby(key, sort=False)[value].bfill()
        return df

    return transform_buckets(ds, key, [ts, *tie_cols], _fn, num_buckets)


def percent_rank(
    ds: "ray.data.Dataset",
    key: str,
    sort_cols: Sequence[str],
    num_buckets: int = 64,
    ascending: Sequence[bool] | None = None,
    out_col: str = "pct_rank",
) -> "ray.data.Dataset":
    """SQL ``percent_rank()``: (rank-1)/(n-1) within the key partition
    (0.0 for single-row partitions).  With ``sort_cols`` forming a
    total order, rank == row position — pass a tie-break column, as
    every ranked operator here requires for determinism."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        chg = _key_change(df, key)
        idx = np.arange(len(df), dtype=np.int64)
        start = np.maximum.accumulate(np.where(chg, idx, -1))
        rank = idx - start  # 0-based position within key
        n = df.groupby(key, sort=False)[key].transform("size").to_numpy()
        with np.errstate(invalid="ignore"):
            pr = np.where(n > 1, rank / np.maximum(n - 1, 1), 0.0)
        df[out_col] = pr
        return df

    return transform_buckets(ds, key, list(sort_cols), _fn, num_buckets,
                             ascending=ascending)


def cume_dist(
    ds: "ray.data.Dataset",
    key: str,
    sort_cols: Sequence[str],
    num_buckets: int = 64,
    ascending: Sequence[bool] | None = None,
    out_col: str = "cume_dist",
) -> "ray.data.Dataset":
    """SQL ``cume_dist()``: (# peers ≤ current) / n within the key
    partition.  Like every ranked operator here, ``sort_cols`` must
    form a TOTAL order (pass a tie-break column) — then peers are
    singletons and cume_dist == row_position / n, one exact integer
    division per row (bit-identical to the oracle's count ratio)."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        chg = _key_change(df, key)
        idx = np.arange(len(df), dtype=np.int64)
        start = np.maximum.accumulate(np.where(chg, idx, -1))
        pos1 = idx - start + 1  # 1-based position within key
        n = df.groupby(key, sort=False)[key].transform("size").to_numpy()
        df[out_col] = pos1 / n
        return df

    return transform_buckets(ds, key, list(sort_cols), _fn, num_buckets,
                             ascending=ascending)


def rolling_time_moments(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value: str,
    span_us: int,
    num_buckets: int = 64,
    mean_col: str = "roll_mean",
    std_col: str = "roll_std",
) -> "ray.data.Dataset":
    """Per-entity rolling MEAN and SAMPLE STD over a trailing time
    span — :func:`rolling_time_agg`'s second-moment sibling and the
    standard volatility feature.  ``value`` must be INTEGER-scaled so
    the window sums (n, Σx, Σx²) are exact (float64 holds them exactly
    below 2⁵³); the finish is the same closed-form variance expression
    the grouped aggregates use, mirrored by three window aggregates in
    SQL.  Single-row windows get NULL std."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        n, sx, sxx = rolling_moment_cols(df, key, ts, value, span_us)
        df[mean_col] = sx / n
        denom = n * (n - 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = np.where(denom > 0, (n * sxx - sx * sx) / denom, np.nan)
        df[std_col] = np.sqrt(var)
        return df

    return transform_buckets(ds, key, [ts], _fn, num_buckets)


def funnel_stages(
    ds: "ray.data.Dataset",
    steps: Sequence[str],
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Ordered funnel analysis: for each entity that performed
    ``steps[0]``, the earliest strictly-increasing timestamp chain
    through ``steps`` (first step-0 → first step-1 AFTER it → …) and
    the stage reached — the conversion query of product analytics.
    The reference has no cross-event sequencing; this generalizes its
    per-stream ordering guarantee (``utils/io.py:109-154``) to a
    multi-event temporal pattern.

    Scale shape: ONE hash shuffle by entity (``transform_buckets``);
    the cascade inside a bucket is ``len(steps)`` vectorized pandas
    groupby-mins, never a per-entity Python loop. Ties on ``ts`` break
    by ``id_col`` implicitly via the min over strictly-later rows.
    Output: one row per step-0 entity — ``key``, ``funnel_stage``
    (1..len(steps)), and one ``<step>_ts`` column per step (NaT once
    the chain breaks).
    """
    steps = list(steps)

    def _cascade(df: pd.DataFrame) -> pd.DataFrame:
        prev = (df[df["event_type"] == steps[0]]
                .groupby(key, sort=False)[ts].min())
        out = prev.rename(f"{steps[0]}_ts").reset_index()
        reached = None
        for s in steps[1:]:
            cur = df["event_type"] == s
            later = df[ts] > df[key].map(prev)  # NaT-compare → False
            t = (df[cur & later].groupby(key, sort=False)[ts].min())
            out[f"{s}_ts"] = out[key].map(t)
            prev = t
        stage = np.ones(len(out), np.int64)
        for s in steps[1:]:
            stage += out[f"{s}_ts"].notna().to_numpy()
        out.insert(1, "funnel_stage", stage)
        return out

    return transform_buckets(ds, key, [ts, id_col], _cascade,
                             num_buckets=num_buckets)


def throttle_events(
    ds: "ray.data.Dataset",
    min_gap_us: int,
    key: str = "user_id",
    type_col: str = "event_type",
    ts: str = "ts",
    id_col: str = "event_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Debounce/throttle: keep an event only if it is the first of its
    (entity, type) stream or arrives more than ``min_gap_us``
    microseconds after the PREVIOUS event of the same stream (lag
    semantics — SQL's ``lag(ts) OVER (PARTITION BY key, type)``) —
    the duplicate-burst suppressor in front of an event warehouse.

    ONE hash shuffle by entity; the lag is a sorted shift with a
    stream-boundary mask (no per-row Python). Tie timestamps order by
    ``id_col`` so the kept set is deterministic.
    """
    gap = np.int64(min_gap_us)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, type_col, ts, id_col], kind="mergesort")
        t = df[ts].to_numpy().astype("datetime64[us]").view(np.int64)
        same = np.zeros(len(df), bool)
        if len(df) > 1:
            same[1:] = ((df[key].to_numpy()[1:] == df[key].to_numpy()[:-1])
                        & (df[type_col].to_numpy()[1:]
                           == df[type_col].to_numpy()[:-1]))
        prev = np.empty(len(df), np.int64)
        prev[1:] = t[:-1]
        keep = ~same | (t - prev > gap)
        return df.loc[keep, [id_col, key, type_col, ts]]

    return transform_buckets(ds, key, [type_col, ts, id_col], _keep,
                             num_buckets=num_buckets)


def cohort_retention(
    ds: "ray.data.Dataset",
    key: str = "user_id",
    ts: str = "ts",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Cohort retention matrix: users cohorted by FIRST-activity day;
    for every (cohort_day, offset_days) cell, the number of distinct
    cohort users active that many days later — the retention triangle
    of product analytics.

    Scale shape: each batch pre-dedups to distinct (user, day) pairs
    (the only rows that can affect the answer), then ONE user-bucketed
    shuffle. A user's pairs all land in one bucket, so the per-bucket
    cohort (min day) and per-user distinct offsets are globally exact;
    buckets emit O(cohorts × offsets) count partials and the final
    combine is over that tiny matrix, never row-scale. Days are int64
    day numbers (us-timestamp // 86.4e9) = SQL ``date_trunc('day')``
    day arithmetic, exactly.
    """
    _US_PER_DAY = np.int64(86_400_000_000)

    def _pairs(batch: pa.Table) -> pd.DataFrame:
        t = batch[ts].to_numpy(zero_copy_only=False)
        day = t.astype("datetime64[us]").view(np.int64) // _US_PER_DAY
        df = pd.DataFrame({key: batch[key].to_numpy(zero_copy_only=False),
                           "_day": day}).drop_duplicates()
        b = stable_bucket(df[key].to_numpy(), num_buckets)
        return df.assign(_bucket=b)

    def _cells(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates([key, "_day"])
        cohort = df.groupby(key, sort=False)["_day"].transform("min")
        cells = pd.DataFrame({
            "cohort_day": cohort.to_numpy(np.int64),
            "offset_days": df["_day"].to_numpy(np.int64)
            - cohort.to_numpy(np.int64)})
        out = (cells.groupby(["cohort_day", "offset_days"], sort=False)
               .size().rename("n_users").reset_index())
        return out

    parts = (ds.map_batches(_pairs, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("_bucket").map_groups(_cells, batch_format="pandas"))
    # partials are O(cohorts × offsets) per bucket — one tiny combine
    out = (parts.to_pandas()
           .groupby(["cohort_day", "offset_days"], sort=True)["n_users"]
           .sum().astype(np.int64).reset_index())
    return ray.data.from_pandas(out)


def event_transitions(
    ds: "ray.data.Dataset",
    key: str,
    type_col: str,
    sort_keys: Sequence[str],
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Global Markov transition matrix of ``type_col`` over each
    entity's ordered event stream: exact counts of (from_type,
    to_type) adjacent pairs plus the conditional transition
    probability ``p = n / Σ n over from_type`` (one IEEE division of
    exact int64 counts, bit-stable vs SQL). The sequence-mining sibling
    of the text bigram operators — same per-partition ordering contract
    as every window stage (SURVEY §2.3).

    Scale: ONE hash shuffle by ``key``; each bucket emits O(types²)
    partial counts, the driver combines O(types² × buckets) rows —
    entity streams never leave their bucket.
    """

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        k = df[key].to_numpy()
        last = np.ones(len(df), dtype=bool)
        last[:-1] = k[:-1] != k[1:]
        t = df[type_col].to_numpy()
        frm, to = t[:-1][~last[:-1]], t[1:][~last[:-1]]
        out = (pd.DataFrame({"from_type": frm, "to_type": to})
               .groupby(["from_type", "to_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = transform_buckets(ds, key, list(sort_keys), _pairs,
                              num_buckets).to_pandas()
    out = (parts.groupby(["from_type", "to_type"], sort=True)["n"]
           .sum().astype(np.int64).reset_index())
    tot = out.groupby("from_type", sort=False)["n"].transform("sum")
    out["p"] = out["n"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    return out


def longest_streak(
    ds: "ray.data.Dataset",
    key: str,
    ts_us: str,
    num_buckets: int = 64,
    day_us: int = 86_400_000_000,
) -> "ray.data.Dataset":
    """Longest run of CONSECUTIVE active days per entity — the
    gaps-and-islands pattern (SQL: day_number − row_number() island
    key, then max island size). Returns ``(key, longest_streak)``.

    Scale shape: per-batch distinct (entity, day) pre-combine shrinks
    the shuffle to at most one row per entity-day; ONE hash shuffle by
    entity; inside each bucket the island key and run lengths are
    computed vectorized over the sorted frame (no Python loop)."""

    def _days(batch: pa.Table) -> pd.DataFrame:
        k = batch[key].to_numpy(zero_copy_only=False)
        d = batch[ts_us].to_numpy(zero_copy_only=False) // day_us
        df = pd.DataFrame({key: k, "_day": d}).drop_duplicates()
        return df

    def _streak(df: pd.DataFrame) -> pd.DataFrame:
        # pre-combine may leave dup (entity, day) pairs across batches
        df = df.drop_duplicates([key, "_day"])
        df = df.sort_values([key, "_day"], kind="mergesort")
        k = df[key].to_numpy()
        d = df["_day"].to_numpy()
        # island id: day minus per-entity running row index
        chg = np.ones(len(df), dtype=bool)
        chg[1:] = k[1:] != k[:-1]
        starts = np.maximum.accumulate(np.where(chg, np.arange(len(df)), 0))
        rown = np.arange(len(df)) - starts
        island = d - rown
        out = (pd.DataFrame({key: k, "_isl": island})
               .groupby([key, "_isl"], sort=False).size()
               .rename("run").reset_index()
               .groupby(key, sort=False)["run"].max()
               .rename("longest_streak").reset_index())
        out["longest_streak"] = out["longest_streak"].astype(np.int64)
        return out

    return transform_buckets(ds.map_batches(_days, batch_format="pyarrow",
                                            zero_copy_batch=True),
                             key, ["_day"], _streak, num_buckets)


def grouped_lag1_moments(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact lag-1 pair moments per group: for each group's series
    ordered by ``(ts_col, tie_col)``, the six integer sufficient
    statistics of the (prev, cur) pairs — n, Σx, Σy, Σx², Σy², Σxy —
    from which Pearson autocorrelation is a pure float expression.

    ONE hash shuffle by ``key``; a group's rows co-locate in one bucket
    (the same contract as every per-group ordered op here), pairs are
    formed vectorized with a group-boundary mask, and the outputs are
    O(groups) rows of int64 — summation order can never perturb them."""

    def _moments(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy()
        v = df[value_col].to_numpy(np.int64)
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = k[1:] == k[:-1]   # row i pairs with row i-1
        x = v[np.flatnonzero(same) - 1]
        y = v[same]
        g = pd.DataFrame({key: k[same], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y})
        out = (g.groupby(key, sort=False)
               .agg(n_pairs=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                    sxx=("xx", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"))
               .reset_index())
        for c in ("n_pairs", "sx", "sy", "sxx", "syy", "sxy"):
            out[c] = out[c].astype(np.int64)
        return out

    return transform_buckets(ds, key, [ts_col, tie_col], _moments,
                             num_buckets)


def grouped_gap_stats(
    ds: "ray.data.Dataset",
    key: str,
    ts_us: str,
    tie_col: str,
    value_col: str | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Inter-arrival statistics per entity from ONE bucketed shuffle:
    consecutive-event gaps (ordered by ``(ts_us, tie_col)``), emitted
    as exact int64 sufficient statistics — ``n_gaps``, ``sum_gap_s``,
    ``sum_gap2_s`` (gaps floored to whole seconds so squares can't
    overflow int64 at realistic horizons) and, when ``value_col`` is
    given, the time-weighted numerator ``w_sum = Σ value·gap_s`` where
    each value holds until the NEXT event (left-constant step
    function). Entities with fewer than two events emit nothing."""

    def _gaps(df: pd.DataFrame) -> pd.DataFrame:
        k = df[key].to_numpy()
        t = df[ts_us].to_numpy(np.int64)
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[1:] = k[1:] == k[:-1]
        idx = np.flatnonzero(same)
        gap_s = (t[idx] - t[idx - 1]) // 1_000_000
        g = pd.DataFrame({key: k[idx], "gap": gap_s, "gap2": gap_s * gap_s})
        aggs = {"n_gaps": (key, "size"), "sum_gap_s": ("gap", "sum"),
                "sum_gap2_s": ("gap2", "sum")}
        if value_col is not None:
            v = df[value_col].to_numpy(np.int64)
            g["w"] = v[idx - 1] * gap_s     # value holds until next event
            aggs["w_sum"] = ("w", "sum")
        out = g.groupby(key, sort=False).agg(**aggs).reset_index()
        for c in out.columns:
            if c != key:
                out[c] = out[c].astype(np.int64)
        return out

    return transform_buckets(ds, key, [ts_us, tie_col], _gaps, num_buckets)


def watermark_late_stats(
    ds: "ray.data.Dataset",
    order_col: str,
    ts_col: str,
    group_col: str,
    lateness_us: int,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Streaming watermark / late-data accounting: an event is LATE
    when its timestamp is more than ``lateness_us`` behind the maximum
    timestamp of any event that ARRIVED before it (arrival order =
    ``order_col``) — the standard allowed-lateness rule of streaming
    window engines, made exact over a replayable table.

    Distributed prefix-max scan (the classic two-phase scan): the
    stream range-partitions by ``order_col`` so arrival order is
    confined per partition, each partition task computes its own
    EXCLUSIVE running max once, the driver combines O(partitions)
    partition maxima into exclusive carries, and a map-only pass
    applies ``ts + lateness < max(in-partition watermark, carry)``.
    The late test is written ``ts + L < wm`` so the -inf sentinel of
    the stream's very first events can never underflow int64.

    Returns ``(group, n_events, n_late, late_frac)`` with exact int64
    counts and one IEEE division per group.
    """
    sent = np.iinfo(np.int64).min
    lo = ds.min(order_col)
    hi = ds.max(order_col)
    if lo is None:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_events": pd.Series([], dtype=np.int64),
                             "n_late": pd.Series([], dtype=np.int64),
                             "late_frac": pd.Series([], dtype=np.float64)})
    span = int(hi) - int(lo) + 1
    P = int(num_partitions)

    def _tag(batch: pa.Table) -> pa.Table:
        oid = batch[order_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = batch[ts_col]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        rb = ((oid - np.int64(lo)) * np.int64(P)) // np.int64(span)
        return pa.table({
            "_oid": pa.array(oid, type=pa.int64()),
            "_t": t,
            "_g": batch[group_col],
            "_rb": pa.array(rb.astype(np.int32))})

    def _scan(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0 or "_oid" not in tbl.column_names:
            return pa.table({"_t": pa.array([], type=pa.int64()),
                             "_g": pa.array([], type=pa.string()),
                             "_wm": pa.array([], type=pa.int64()),
                             "_rb": pa.array([], type=pa.int32())})
        oid = tbl["_oid"].to_numpy(zero_copy_only=False)
        order = np.argsort(oid, kind="stable")
        t = tbl["_t"].to_numpy(zero_copy_only=False)[order]
        # exclusive running max with the -inf sentinel up front
        wm = np.concatenate(([sent], np.maximum.accumulate(t)[:-1]))
        return pa.table({
            "_t": pa.array(t, type=pa.int64()),
            "_g": tbl["_g"].take(pa.array(order)),
            "_wm": pa.array(wm, type=pa.int64()),
            "_rb": tbl["_rb"].take(pa.array(order))})

    scanned = (ds.map_batches(_tag, batch_format="pyarrow")
               .groupby("_rb").map_groups(_scan, batch_format="pyarrow")
               .materialize())

    # O(partitions) driver rows: per-partition ts maxima -> exclusive
    # prefix carries (missing/empty partitions keep the sentinel)
    def _pmax(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "_rb" not in df.columns:
            return pd.DataFrame({"_rb": pd.Series([], dtype=np.int32),
                                 "m": pd.Series([], dtype=np.int64)})
        return (df.groupby("_rb", sort=False)["_t"].max()
                .rename("m").reset_index())

    pm = scanned.map_batches(_pmax, batch_format="pandas").to_pandas()
    maxima = np.full(P, sent, dtype=np.int64)
    if len(pm):
        agg = pm.groupby("_rb")["m"].max()
        maxima[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    carry = np.full(P, sent, dtype=np.int64)
    if P > 1:
        carry[1:] = np.maximum.accumulate(maxima)[:-1]

    L = np.int64(lateness_us)

    def _late(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "_g" not in df.columns:
            return pd.DataFrame({"g": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "late": pd.Series([], dtype=np.int64)})
        t = df["_t"].to_numpy(np.int64)
        wm = np.maximum(df["_wm"].to_numpy(np.int64),
                        carry[df["_rb"].to_numpy(np.int64)])
        is_late = (wm != sent) & (t + L < wm)
        codes, uniq = pd.factorize(df["_g"].to_numpy())
        return pd.DataFrame({
            "g": np.asarray(uniq, dtype=object),
            "n": np.bincount(codes, minlength=len(uniq)).astype(np.int64),
            "late": np.bincount(codes[is_late], minlength=len(uniq))
            .astype(np.int64)})

    parts = scanned.map_batches(_late, batch_format="pandas").to_pandas()
    if parts.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_events": pd.Series([], dtype=np.int64),
                             "n_late": pd.Series([], dtype=np.int64),
                             "late_frac": pd.Series([], dtype=np.float64)})
    agg = parts.groupby("g", sort=False)[["n", "late"]].sum().reset_index()
    n = agg["n"].to_numpy(np.int64)
    late = agg["late"].to_numpy(np.int64)
    return (pd.DataFrame({group_col: agg["g"].astype(object),
                          "n_events": n, "n_late": late,
                          "late_frac": late / n.astype(np.float64)})
            .sort_values(group_col, kind="mergesort")
            .reset_index(drop=True))
