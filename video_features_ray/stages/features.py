"""Feature-engineering operators: normalization, encoding, binning.

The reference normalizes per-model inside its transforms
(``models/i3d/transforms/transforms.py`` Normalize / ScaleTo1_1); this
module generalizes that to the DATA-DERIVED feature transforms a
training pipeline needs — statistics learned from the corpus itself
(z-score, min-max, target encoding) and structural encodings (one-hot,
binning, multi-lag).  All of them follow the same two-phase scale
shape:

  1. **fit** — one `partial_agg` pass produces the per-group statistic
     table (O(groups) rows: sums/counts/mins/maxs, all algebraic);
  2. **transform** — the statistic table is broadcast ONCE via
     ``ray.put`` and applied inside a vectorized ``map_batches``; the
     payload never shuffles.

That is the canonical fit/transform split (sklearn-style) expressed as
Ray Data stages: the fit output is tiny (one row per category /
group), so broadcasting beats a shuffle join at any corpus size while
``#groups × row_size`` fits in worker heap (documented limit; for
billion-category vocabularies switch the transform to
:func:`..stages.joins.hash_join` on the category key).

Bit-exactness with the SQL oracles: inputs are integer-scaled
(cents), every fit statistic is an EXACT int64 sum/count/min/max, and
each finish expression is a fixed sequence of float64 ops mirrored
verbatim in the oracle SQL (see grouped_corr's rationale,
``joins.py``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .joins import partial_agg


def _broadcast_stats(agg_ds: "ray.data.Dataset", keys: Sequence[str]):
    """Materialize a (small) fit table and ``ray.put`` it once.

    Returns an ObjectRef to a pandas frame indexed by the key tuple.
    The fit table is O(groups) — the ONLY driver materialization in
    this module, bounded by category cardinality, never by corpus
    size.
    """
    pdf = agg_ds.to_pandas()
    pdf = pdf.set_index(list(keys)).sort_index()
    return ray.put(pdf)


def _key_indexer(idx: "pd.Index", batch: pa.Table, col: str) -> np.ndarray:
    """Positions of a batch's group keys in a fit index, with SQL NULL
    semantics: a NULL key matches NOTHING (-1).  pd.Index.get_indexer
    would happily match a NaN key to a NaN index entry, silently
    diverging from the join transform path and every JOIN-USING
    oracle."""
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    pos = idx.get_indexer(c.to_numpy(zero_copy_only=False))
    if c.null_count:
        pos = np.where(c.is_valid().to_numpy(zero_copy_only=False), pos, -1)
    return pos


def _fit_for_join(agg: "ray.data.Dataset", keys, renames: dict):
    """Project a fit table to key + reserved ``__fit_*`` stat names so
    a LEFT hash_join onto an arbitrary payload can never collide with
    (and silently shadow) a payload column like ``n``.

    MATERIALIZED: the fit is O(groups) and the downstream hash_join's
    TaggedUnion needs its schema — a lazy fit would execute the whole
    partial-agg shuffle once for ``Dataset.schema()`` and AGAIN for the
    join itself (blocks stay in the object store, never the driver)."""
    cols = [*keys, *renames.keys()]

    def _r(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols].rename(columns=renames)

    return agg.map_batches(_r, batch_format="pandas").materialize()


def grouped_variance(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    x: str,
    num_buckets: int = 16,
    combine: str = "driver",
    ddof: int = 1,
) -> "ray.data.Dataset":
    """Per-group variance + stddev over an INTEGER-scaled column —
    exact (n, Σx, Σx²) int64 partials, one closed-form float finish:

        var_samp = (n·Σx² − (Σx)²) / (n·(n − ddof))

    ddof=1 is SQL ``var_samp``/``stddev_samp``; ddof=0 is ``var_pop``.
    Output columns: keys, ``n``, ``var``, ``stddev``.  The SQL oracle
    spells the identical expression over the identical integer sums
    (DuckDB's native ``stddev`` uses streaming float updates → low-bit
    drift; this form is bit-stable).
    """
    keys = list(keys)

    def _moments(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {k: batch[k] for k in keys}
        out.update({"_x": pa.array(xs), "_xx": pa.array(xs * xs)})
        return pa.table(out)

    agg = partial_agg(ds.map_batches(_moments, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      keys, sums=["_x", "_xx"], count_col="n",
                      num_buckets=num_buckets, combine=combine)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype(np.int64).to_numpy()
        sx = df["sum__x"].astype(np.int64).to_numpy()
        sxx = df["sum__xx"].astype(np.int64).to_numpy()
        # cast each exact int to double BEFORE multiplying (overflow)
        nf, sxf, sxxf = (a.astype(np.float64) for a in (n, sx, sxx))
        denom = nf * (nf - float(ddof))
        with np.errstate(divide="ignore", invalid="ignore"):
            var = np.where(denom > 0,
                           (nf * sxxf - sxf * sxf) / denom, np.nan)
        out = df[keys].copy()
        out["n"] = n
        out["var"] = var
        out["stddev"] = np.sqrt(var)
        return out

    return agg.map_batches(_finish, batch_format="pandas")


def zscore_normalize(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    out_col: str = "z",
    num_buckets: int = 16,
    combine: str = "driver",
    via: str = "broadcast",
    fit_ds: "ray.data.Dataset | None" = None,
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Per-group z-score feature: ``z = (x − mean) / stddev_samp``
    attached to every row.  Fit = one exact-moment `partial_agg`
    pass; transform = broadcast the O(groups) stat table and apply it
    vectorized per batch — the payload never shuffles (vs the naive
    window-function plan, which sorts the whole table twice).

    mean = Σx/n and sd = sqrt((n·Σx² − (Σx)²)/(n·(n−1))) are computed
    in a fixed float64 op order mirrored by the oracle SQL.  Groups
    with n < 2 or zero variance get NULL z.

    ``via="join"`` is the billion-cardinality scale path: instead of
    broadcasting the stat table into every actor's heap, LEFT
    hash-join it onto the payload (one shuffle) and finish the same
    float expression per row — bit-identical output, worker memory
    O(bucket) instead of O(groups).  Pick it when #groups × row_size
    no longer fits a worker.
    """
    if via not in ("broadcast", "join"):
        raise ValueError(f"via must be broadcast|join, got {via!r}")

    # fit_ds: fit the moments on an UPSTREAM dataset carrying the same
    # (group, value) rows — e.g. the pre-shuffle input of an expensive
    # fused block — so the expensive pipeline isn't executed once for
    # the fit and again for the transform; sums are the same exact
    # integers, so the output is bit-identical
    def _moments(batch: pa.Table) -> pa.Table:
        xs = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({group_col: batch[group_col],
                         "_x": pa.array(xs), "_xx": pa.array(xs * xs)})

    src = fit_ds if fit_ds is not None else ds
    agg = partial_agg(src.map_batches(_moments, batch_format="pyarrow",
                                      zero_copy_batch=True),
                      [group_col], sums=["_x", "_xx"], count_col="n",
                      num_buckets=num_buckets, combine=combine)

    if via == "join":
        from .joins import hash_join

        fit = _fit_for_join(agg, [group_col],
                            {"sum__x": "__fit_sx", "sum__xx": "__fit_sxx",
                             "n": "__fit_n"})
        # schema: caller's payload schema — spares TaggedUnion a
        # Dataset.schema() that executes the payload's first block
        joined = hash_join(ds, fit, group_col, num_buckets=num_buckets,
                           how="left", schemas=(schema, fit.schema()))

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            # same float64 op order as the broadcast path — the sums
            # are the same exact integers, so the output is bit-equal
            n = df["__fit_n"].to_numpy(dtype=np.float64)
            sx = df["__fit_sx"].to_numpy(dtype=np.float64)
            sxx = df["__fit_sxx"].to_numpy(dtype=np.float64)
            mean = sx / n
            denom = n * (n - 1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                var = np.where(denom > 0, (n * sxx - sx * sx) / denom,
                               np.nan)
                sd = np.sqrt(var)
                sd = np.where(sd > 0, sd, np.nan)
                xs = df[value_col].to_numpy(dtype=np.float64)
                df[out_col] = (xs - mean) / sd
            return df.drop(columns=["__fit_sx", "__fit_sxx", "__fit_n"])

        return joined.map_batches(_fin, batch_format="pandas")

    stats_ref = _broadcast_stats(agg, [group_col])

    class _Apply:
        def __init__(self):
            pdf = ray.get(stats_ref)
            n = pdf["n"].astype(np.int64).to_numpy().astype(np.float64)
            sx = pdf["sum__x"].astype(np.int64).to_numpy().astype(np.float64)
            sxx = pdf["sum__xx"].astype(np.int64).to_numpy().astype(np.float64)
            self.mean = sx / n
            denom = n * (n - 1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                var = np.where(denom > 0, (n * sxx - sx * sx) / denom,
                               np.nan)
            sd = np.sqrt(var)
            self.sd = np.where(sd > 0, sd, np.nan)
            self.idx = pd.Index(pdf.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, group_col)
            xs = batch[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
            ok = pos >= 0
            z = np.full(len(xs), np.nan)
            p = pos[ok]
            z[ok] = (xs[ok] - self.mean[p]) / self.sd[p]
            return batch.append_column(out_col, pa.array(z))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def minmax_normalize(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    out_col: str = "mm",
    num_buckets: int = 16,
    combine: str = "driver",
    via: str = "broadcast",
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Per-group min-max scaling ``(x − min) / (max − min)`` attached
    to every row.  Same fit/transform shape as :func:`zscore_normalize`
    with algebraic min/max partials (and the same ``via="join"``
    billion-cardinality path).  Constant groups (max == min) get
    NULL."""
    if via not in ("broadcast", "join"):
        raise ValueError(f"via must be broadcast|join, got {via!r}")
    agg = partial_agg(ds, [group_col], mins=[value_col], maxs=[value_col],
                      num_buckets=num_buckets, combine=combine)
    lo_c, hi_c = f"min_{value_col}", f"max_{value_col}"

    if via == "join":
        from .joins import hash_join

        fit = _fit_for_join(agg, [group_col],
                            {lo_c: "__fit_lo", hi_c: "__fit_hi"})
        joined = hash_join(ds, fit, group_col, num_buckets=num_buckets,
                           how="left", schemas=(schema, fit.schema()))

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            lo = df["__fit_lo"].to_numpy(dtype=np.float64)
            hi = df["__fit_hi"].to_numpy(dtype=np.float64)
            rng = hi - lo
            rng = np.where(rng > 0, rng, np.nan)
            xs = df[value_col].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore"):
                df[out_col] = (xs - lo) / rng
            return df.drop(columns=["__fit_lo", "__fit_hi"])

        return joined.map_batches(_fin, batch_format="pandas")

    stats_ref = _broadcast_stats(agg, [group_col])

    class _Apply:
        def __init__(self):
            pdf = ray.get(stats_ref)
            self.lo = pdf[f"min_{value_col}"].to_numpy().astype(np.float64)
            hi = pdf[f"max_{value_col}"].to_numpy().astype(np.float64)
            rng = hi - self.lo
            self.rng = np.where(rng > 0, rng, np.nan)
            self.idx = pd.Index(pdf.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, group_col)
            xs = batch[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
            ok = pos >= 0
            m = np.full(len(xs), np.nan)
            p = pos[ok]
            m[ok] = (xs[ok] - self.lo[p]) / self.rng[p]
            return batch.append_column(out_col, pa.array(m))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def mean_target_encode(
    ds: "ray.data.Dataset",
    cat_col: str,
    target_col: str,
    out_col: str = "te",
    num_buckets: int = 16,
    combine: str = "driver",
    via: str = "broadcast",
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Mean target encoding: replace/annotate a categorical with the
    corpus mean of an INTEGER-scaled target within that category —
    ``te = Σtarget / n`` (one float64 division, oracle-mirrored).
    Categories unseen in the fit pass (impossible here — fit and
    transform read the same corpus — but possible with a frozen
    encoder) get NULL."""
    if via not in ("broadcast", "join"):
        raise ValueError(f"via must be broadcast|join, got {via!r}")

    def _cast(batch: pa.Table) -> pa.Table:
        xs = batch[target_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({cat_col: batch[cat_col], "_t": pa.array(xs)})

    agg = partial_agg(ds.map_batches(_cast, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      [cat_col], sums=["_t"], count_col="n",
                      num_buckets=num_buckets, combine=combine)

    if via == "join":
        from .joins import hash_join

        fit = _fit_for_join(agg, [cat_col],
                            {"sum__t": "__fit_st", "n": "__fit_n"})
        joined = hash_join(ds, fit, cat_col, num_buckets=num_buckets,
                           how="left", schemas=(schema, fit.schema()))

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            st = df["__fit_st"].to_numpy(dtype=np.float64)
            n = df["__fit_n"].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore"):
                df[out_col] = st / n
            return df.drop(columns=["__fit_st", "__fit_n"])

        return joined.map_batches(_fin, batch_format="pandas")

    stats_ref = _broadcast_stats(agg, [cat_col])

    class _Apply:
        def __init__(self):
            pdf = ray.get(stats_ref)
            st = pdf["sum__t"].astype(np.int64).to_numpy().astype(np.float64)
            n = pdf["n"].astype(np.int64).to_numpy().astype(np.float64)
            self.te = st / n
            self.idx = pd.Index(pdf.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, cat_col)
            ok = pos >= 0
            te = np.full(len(pos), np.nan)
            te[ok] = self.te[pos[ok]]
            return batch.append_column(out_col, pa.array(te))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def one_hot(
    ds: "ray.data.Dataset",
    cat_col: str,
    categories: Sequence[str] | None = None,
    prefix: str = "is_",
) -> "ray.data.Dataset":
    """One-hot encode a categorical column into int64 0/1 columns
    ``<prefix><category>``.

    ``categories=None`` discovers the vocabulary with one distinct
    aggregate (sorted for a deterministic column order) — a tiny
    shuffle of unique values only.  Pass an explicit list to freeze
    the encoding (the production path: vocabularies belong in config,
    not re-derived per run).  Unlisted values encode as all-zeros —
    the standard handle-unknown=ignore behavior.  Map-only transform,
    no shuffle of the payload.
    """
    if categories is None:
        uniq = partial_agg(ds.select_columns([cat_col]), [cat_col],
                           combine="driver").to_pandas()
        categories = sorted(uniq[cat_col].dropna().tolist())
    categories = list(categories)

    def _encode(batch: pa.Table) -> pa.Table:
        vals = batch[cat_col].to_numpy(zero_copy_only=False)
        for c in categories:
            batch = batch.append_column(
                f"{prefix}{c}", pa.array((vals == c).astype(np.int64)))
        return batch

    return ds.map_batches(_encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def fixed_width_bin(
    ds: "ray.data.Dataset",
    value_col: str,
    width: float,
    bin_col: str = "bin",
) -> "ray.data.Dataset":
    """Discretize a numeric column into fixed-width bins:
    ``bin = floor(x / width)`` (int64).  Map-only; compose with
    `partial_agg` on ``bin_col`` for a histogram.  floor (not round)
    matches SQL ``floor()`` bit-for-bit for negatives too; NULL/NaN
    values get a NULL bin (SQL ``floor(NULL)``), never a garbage
    int-cast."""
    def _bin(batch: pa.Table) -> pa.Table:
        xs = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            b = np.floor(xs / width)
        bad = np.isnan(b)
        arr = pa.array(np.where(bad, 0, b).astype(np.int64), mask=bad)
        return batch.append_column(bin_col, arr)

    return ds.map_batches(_bin, batch_format="pyarrow", zero_copy_batch=True)


def histogram(
    ds: "ray.data.Dataset",
    value_col: str,
    width: float,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Fixed-width histogram: bin then count per bin.  The combine is
    O(bins) — bins are value-range-bounded, not corpus-bounded, so the
    driver plan is safe at any scale."""
    binned = fixed_width_bin(ds.select_columns([value_col]), value_col, width)
    return partial_agg(binned.select_columns(["bin"]), ["bin"],
                       num_buckets=num_buckets, combine="driver")


def multi_lag(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value_col: str,
    lags: Sequence[int] = (1, 2, 3),
    num_buckets: int = 16,
    extra_order: Sequence[str] = (),
    leads: Sequence[int] = (),
) -> "ray.data.Dataset":
    """Lag/lead-feature matrix: one shuffle, one sort per bucket, then
    ALL requested lags AND leads as shifted views with key-boundary
    masks — the standard autoregressive feature block (``lag_k`` /
    ``lead_k`` columns), every offset for the price of one shuffle
    (the naive plan re-shuffles per offset).

    SQL: ``LAG(v, k)`` / ``LEAD(v, k)`` ``OVER (PARTITION BY key
    ORDER BY ts, ...)``.
    """
    from .events import partition_bounds, transform_buckets

    lags, leads = list(lags), list(leads)
    order = [ts, *extra_order]

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        # transform_buckets hands fn the bucket pre-sorted by [key, *order]
        n = len(df)
        v = df[value_col].to_numpy().astype(np.float64)
        starts, ends = partition_bounds(df, key)
        idx = np.arange(n)
        for k in lags:
            shifted = np.concatenate([np.full(k, np.nan), v[:-k]]) \
                if k < n else np.full(n, np.nan)
            # mask rows whose lag-k source crosses the partition start
            bad = idx - k < starts
            df[f"lag_{k}"] = np.where(bad, np.nan, shifted)
        for k in leads:
            shifted = np.concatenate([v[k:], np.full(k, np.nan)]) \
                if k < n else np.full(n, np.nan)
            bad = idx + k > ends
            df[f"lead_{k}"] = np.where(bad, np.nan, shifted)
        return df

    return transform_buckets(ds, key, order, _fn, num_buckets=num_buckets)


def robust_scale(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    out_col: str = "rs",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-group robust scaling ``(x − median) / (p75 − p25)`` — the
    outlier-insensitive alternative to z-score (sklearn RobustScaler).

    Fit = ONE frequency pass through :func:`..stages.joins
    .grouped_quantiles_cont` (p25/p50/p75 from a single CDF walk,
    O(groups × distinct values) on the driver); transform = broadcast
    + vectorized apply, payload never shuffles.  Zero-IQR groups get
    NULL.  Quantiles follow DuckDB ``quantile_cont`` bit-for-bit (the
    pinned two-sided-weights form), so the whole feature is
    SQL-checkable."""
    from .joins import grouped_quantiles_cont

    pdf = grouped_quantiles_cont(ds.select_columns([group_col, value_col]),
                                 group_col, value_col, [0.25, 0.5, 0.75],
                                 num_buckets=num_buckets)
    pdf = pdf.set_index(group_col).sort_index()
    stats_ref = ray.put(pdf)

    class _Apply:
        def __init__(self):
            t = ray.get(stats_ref)
            self.med = t["q0.5"].to_numpy()
            iqr = t["q0.75"].to_numpy() - t["q0.25"].to_numpy()
            self.iqr = np.where(iqr > 0, iqr, np.nan)
            self.idx = pd.Index(t.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, group_col)
            xs = batch[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
            ok = pos >= 0
            r = np.full(len(xs), np.nan)
            p = pos[ok]
            r[ok] = (xs[ok] - self.med[p]) / self.iqr[p]
            return batch.append_column(out_col, pa.array(r))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def count_encode(
    ds: "ray.data.Dataset",
    cat_col: str,
    out_col: str = "ce",
    num_buckets: int = 16,
    combine: str = "driver",
    via: str = "broadcast",
    schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Frequency (count) encoding: annotate each row with its
    category's corpus count — the cheapest high-signal categorical
    feature.  Fit = one count partial_agg; transform = broadcast +
    vectorized lookup (int64, exact); ``via="join"`` for
    billion-cardinality vocabularies (see :func:`zscore_normalize`)."""
    if via not in ("broadcast", "join"):
        raise ValueError(f"via must be broadcast|join, got {via!r}")
    agg = partial_agg(ds.select_columns([cat_col]), [cat_col],
                      count_col="n", num_buckets=num_buckets,
                      combine=combine)

    if via == "join":
        from .joins import hash_join

        fit = _fit_for_join(agg, [cat_col], {"n": "__fit_n"})
        joined = hash_join(ds, fit, cat_col, num_buckets=num_buckets,
                           how="left", schemas=(schema, fit.schema()))

        def _fin(df: pd.DataFrame) -> pd.DataFrame:
            df[out_col] = (df["__fit_n"].fillna(0).astype(np.int64))
            return df.drop(columns=["__fit_n"])

        return joined.map_batches(_fin, batch_format="pandas")

    stats_ref = _broadcast_stats(agg, [cat_col])

    class _Apply:
        def __init__(self):
            pdf = ray.get(stats_ref)
            self.n = pdf["n"].astype(np.int64).to_numpy()
            self.idx = pd.Index(pdf.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, cat_col)
            ok = pos >= 0
            ce = np.zeros(len(pos), dtype=np.int64)  # unseen → 0
            ce[ok] = self.n[pos[ok]]
            return batch.append_column(out_col, pa.array(ce))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def feature_cross(
    ds: "ray.data.Dataset",
    cols: Sequence[str],
    out_col: str = "cross",
    sep: str = "|",
) -> "ray.data.Dataset":
    """Feature crossing: concatenate categorical columns into one
    composite key (``a|b``) — the interaction feature fed to one-hot /
    target / count encoders.  Pure Arrow kernel (binary_join_element_
    wise), map-only, zero shuffle; NULL in any input → NULL cross
    (SQL ``||`` semantics)."""
    import pyarrow.compute as pc

    cols = list(cols)

    def _cross(batch: pa.Table) -> pa.Table:
        parts = [batch[c].cast(pa.string()) for c in cols]
        crossed = pc.binary_join_element_wise(*parts, sep)
        return batch.append_column(out_col, crossed)

    return ds.map_batches(_cross, batch_format="pyarrow",
                          zero_copy_batch=True)


def unpivot(
    ds: "ray.data.Dataset",
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_col: str = "variable",
    value_col: str = "value",
) -> "ray.data.Dataset":
    """Wide → long (SQL UNPIVOT / pandas melt): one output row per
    (input row × value column), the inverse of the categorical-pivot
    block.  Pure Arrow per batch — id/value arrays pass through
    zero-copy, only the constant ``variable`` label is materialized;
    no shuffle.  Value columns are cast to float64 (the long-form
    value axis must be one type)."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def _melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        parts = []
        for vc in value_cols:
            cols = {c: batch[c] for c in id_cols}
            cols[var_col] = pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, dtype=np.int32)), pa.array([vc]))
            cols[value_col] = batch[vc].cast(pa.float64())
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        # emit plain strings (dictionary was just the cheap constant)
        i = out.column_names.index(var_col)
        return out.set_column(i, var_col, out[var_col].cast(pa.string()))

    return ds.map_batches(_melt, batch_format="pyarrow",
                          zero_copy_batch=True)


def quantile_bin(
    ds: "ray.data.Dataset",
    value_col: str,
    k: int = 4,
    bin_col: str = "qbin",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Equal-frequency (quantile) binning: fit the k−1 interior
    boundaries ``quantile_cont(i/k)`` over the INTEGER-valued column
    (one frequency pass + driver CDF walk, DuckDB-parity pinned), then
    ``bin = #boundaries ≤ x`` via one broadcast ``searchsorted`` —
    sklearn KBinsDiscretizer(strategy='quantile') as two Ray stages.
    Duplicate boundaries (heavy ties) skip bins on both engines
    identically, since the comparison set is the same floats."""
    from .joins import grouped_quantiles_cont

    qs = [i / k for i in range(1, k)]

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({"_g": pa.array(np.zeros(len(batch), dtype=np.int8)),
                         value_col: batch[value_col]})

    pdf = grouped_quantiles_cont(
        ds.select_columns([value_col]).map_batches(
            _tag, batch_format="pyarrow", zero_copy_batch=True),
        "_g", value_col, qs, num_buckets=num_buckets)
    bounds = pdf[[f"q{q}" for q in qs]].to_numpy().ravel().astype(np.float64)
    bounds_ref = ray.put(np.sort(bounds))

    class _Apply:
        def __init__(self):
            self.bounds = ray.get(bounds_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            xs = batch[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
            b = np.searchsorted(self.bounds, xs, side="right").astype(np.int64)
            return batch.append_column(bin_col, pa.array(b))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds: "ray.data.Dataset",
    id_col: str,
    fractions: Sequence[tuple[str, float]] = (
        ("train", 0.90), ("val", 0.05), ("test", 0.05)),
    out_col: str = "split",
    basis: int = 10000,
) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment by ENTITY hash —
    ``split = cut(hash(id) % basis)`` with cumulative integer cuts, so
    every row of one entity lands in the same split (the leakage-safe
    split: hash the USER/doc key, not the row id).  Map-only, no
    shuffle, reproducible across runs/cluster sizes; the hash is the
    bit-exact DuckDB ``hash(BIGINT)`` replica so the oracle is one
    CASE expression.  Fractions are quantized to 1/basis."""
    from ..functions.sketches import duckdb_hash_int64

    cuts, acc = [], 0.0
    for name, frac in fractions:
        acc += frac
        cuts.append((name, int(round(acc * basis))))
    if cuts[-1][1] != basis:
        raise ValueError(f"fractions must sum to 1, got cuts {cuts}")

    def _assign(batch: pa.Table) -> pa.Table:
        h = duckdb_hash_int64(
            batch[id_col].to_numpy(zero_copy_only=False)) % np.uint64(basis)
        out = np.full(len(h), cuts[-1][0], dtype=object)
        prev = np.uint64(0)
        for name, hi in cuts[:-1]:
            out[(h >= prev) & (h < np.uint64(hi))] = name
            prev = np.uint64(hi)
        return batch.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def winsorize(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    out_col: str = "w",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-group winsorization: clip values to the [lo_q, hi_q]
    quantile band — the standard outlier treatment before scaling.
    Same fit/transform shape as :func:`robust_scale` (both quantile
    bounds from ONE CDF walk, DuckDB quantile_cont parity), clip is
    one vectorized ``np.minimum/maximum`` per batch."""
    from .joins import grouped_quantiles_cont

    pdf = grouped_quantiles_cont(ds.select_columns([group_col, value_col]),
                                 group_col, value_col, [lo_q, hi_q],
                                 num_buckets=num_buckets)
    pdf = pdf.set_index(group_col).sort_index()
    lo_name, hi_name = f"q{lo_q}", f"q{hi_q}"
    stats_ref = ray.put(pdf)

    class _Apply:
        def __init__(self):
            t = ray.get(stats_ref)
            self.lo = t[lo_name].to_numpy()
            self.hi = t[hi_name].to_numpy()
            self.idx = pd.Index(t.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, group_col)
            xs = batch[value_col].to_numpy(
                zero_copy_only=False).astype(np.float64)
            ok = pos >= 0
            w = xs.copy()
            p = pos[ok]
            w[ok] = np.minimum(np.maximum(xs[ok], self.lo[p]), self.hi[p])
            return batch.append_column(out_col, pa.array(w))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def ordered_target_encode(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    target_col: str,
    out_col: str = "ote",
    num_buckets: int = 16,
    extra_order: Sequence[str] = (),
    time_bucket_us: int | None = None,
) -> "ray.data.Dataset":
    """LEAKAGE-FREE (ordered / CatBoost-style) target encoding: each
    row gets the mean target over STRICTLY EARLIER rows of its
    category — the time-respecting alternative to
    :func:`mean_target_encode`, whose corpus mean leaks the row's own
    target and the future.  First row(s) of a category get NULL
    (no history).  ``target_col`` must be integer-scaled (the running
    sums are exact ints on both paths).

    Default plan: one shuffle + per-bucket sort (the category never
    splits), groupwise shifted cumsum/cumcount, one float division per
    row — mirrored by a ``ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    PRECEDING`` window in SQL.  With a LOW-cardinality key every bucket
    holds a category's FULL history, so a single task's frame grows
    with the corpus — the OOM shape at 100 TB.

    ``time_bucket_us`` is the scale path (the :func:`..stages.events
    .ewma_feature` epoch-carry pattern): rows chunk by
    ``(key, ts // time_bucket_us)``, each task computes intra-chunk
    prefixes over ONE bounded chunk, a tiny O(categories × buckets)
    per-chunk total table is exclusive-prefix-summed per key on the
    driver and broadcast, and each row's encoding is
    ``(carry_sum + intra_sum) / (carry_cnt + intra_cnt)`` — the SAME
    exact integers as the unchunked plan, so output is bit-equal
    (pinned in tests) and the SQL oracle is unchanged."""
    from .events import transform_buckets

    if time_bucket_us is None:
        def _fn(df: pd.DataFrame) -> pd.DataFrame:
            v = df[target_col].to_numpy()
            g = df.groupby(key, sort=False)
            csum = g[target_col].cumsum().to_numpy() - v   # Σ earlier
            cnt = g.cumcount().to_numpy()                  # # earlier
            with np.errstate(invalid="ignore", divide="ignore"):
                ote = np.where(cnt > 0,
                               csum.astype(np.float64) / cnt.astype(np.float64),
                               np.nan)
            df[out_col] = ote
            return df

        return transform_buckets(ds, key, [ts, *extra_order], _fn,
                                 num_buckets)

    def _tag(batch: pa.Table) -> pa.Table:
        t = batch[ts].to_numpy(zero_copy_only=False)
        tb = (t // np.int64(time_bucket_us)).astype(np.int64)
        k = batch[key].to_numpy(zero_copy_only=False)
        ktb = np.char.add(np.char.add(k.astype(str), "|"), tb.astype(str))
        return (batch.append_column("_tb", pa.array(tb))
                     .append_column("_ktb", pa.array(ktb)))

    tagged = ds.map_batches(_tag, batch_format="pyarrow",
                            zero_copy_batch=True)

    # tiny per-chunk totals → exclusive prefix per key on the driver
    tot = partial_agg(tagged, [key, "_tb"], sums=[target_col],
                      count_col="_cn", num_buckets=num_buckets,
                      combine="driver").to_pandas()
    tot = tot.sort_values([key, "_tb"], kind="mergesort")
    sc = f"sum_{target_col}"
    tot["_carry_s"] = (tot.groupby(key)[sc].cumsum() - tot[sc]).astype(np.int64)
    tot["_carry_n"] = (tot.groupby(key)["_cn"].cumsum() - tot["_cn"]).astype(np.int64)
    carry_ref = ray.put(
        tot.set_index([key, "_tb"])[["_carry_s", "_carry_n"]].sort_index())

    def _chunk_fn(df: pd.DataFrame) -> pd.DataFrame:
        v = df[target_col].to_numpy()
        g = df.groupby("_ktb", sort=False)
        df["_cs"] = (g[target_col].cumsum().to_numpy() - v).astype(np.int64)
        df["_cc"] = g.cumcount().to_numpy().astype(np.int64)
        return df

    chunked = transform_buckets(tagged, "_ktb", [ts, *extra_order],
                                _chunk_fn, num_buckets)

    class _AddCarry:
        def __init__(self):
            t = ray.get(carry_ref)
            self.idx = t.index
            self.cs = t["_carry_s"].to_numpy()
            self.cn = t["_carry_n"].to_numpy()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pos = self.idx.get_indexer(
                pd.MultiIndex.from_arrays([df[key], df["_tb"]]))
            ok = pos >= 0  # unmatched (NULL key / drift) -> NULL, never
            p = np.maximum(pos, 0)  # a silent read of the last carry row
            s = self.cs[p] + df["_cs"].to_numpy()
            n = self.cn[p] + df["_cc"].to_numpy()
            with np.errstate(invalid="ignore", divide="ignore"):
                df[out_col] = np.where(
                    ok & (n > 0),
                    s.astype(np.float64) / n.astype(np.float64), np.nan)
            return df.drop(columns=["_tb", "_ktb", "_cs", "_cc"])

    return chunked.map_batches(_AddCarry, concurrency=(1, 8), num_cpus=0.25,
                               batch_format="pandas")


def cumulative_extrema(
    ds: "ray.data.Dataset",
    key: str,
    ts: str,
    value_col: str,
    num_buckets: int = 16,
    extra_order: Sequence[str] = (),
    max_col: str = "cummax",
    min_col: str = "cummin",
) -> "ray.data.Dataset":
    """Running peak/trough per entity: expanding MAX/MIN of ``value``
    up to and including each row (drawdown / high-watermark features).
    Same one-shuffle bucket plan as every windowed operator here; raw
    values pass through untouched, so SQL parity is exact."""
    from .events import transform_buckets

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, sort=False)[value_col]
        df[max_col] = g.cummax()
        df[min_col] = g.cummin()
        return df

    return transform_buckets(ds, key, [ts, *extra_order], _fn, num_buckets)


def mean_impute(
    ds: "ray.data.Dataset",
    group_col: str,
    value_col: str,
    out_col: str = "imputed",
    num_buckets: int = 16,
    combine: str = "driver",
) -> "ray.data.Dataset":
    """Per-group mean imputation: fill NULLs with the group mean of
    the NON-NULL values (exact int sums over the observed rows, one
    float division) — the baseline numeric-missing-value treatment.
    Groups that are entirely NULL stay NULL."""
    def _observed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch[value_col]
        mask = pc.is_valid(col)
        if pa.types.is_floating(col.type):  # treat NaN as missing too
            mask = pc.and_(mask, pc.invert(pc.is_nan(col)))
        t = batch.filter(mask)
        xs = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({group_col: t[group_col], "_x": pa.array(xs)})

    agg = partial_agg(ds.map_batches(_observed, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      [group_col], sums=["_x"], count_col="n",
                      num_buckets=num_buckets, combine=combine)
    stats_ref = _broadcast_stats(agg, [group_col])

    class _Apply:
        def __init__(self):
            pdf = ray.get(stats_ref)
            sx = pdf["sum__x"].astype(np.int64).to_numpy().astype(np.float64)
            n = pdf["n"].astype(np.int64).to_numpy().astype(np.float64)
            self.mean = sx / n
            self.idx = pd.Index(pdf.index)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _key_indexer(self.idx, batch, group_col)
            xs = batch[value_col].to_numpy(zero_copy_only=False)
            xs = np.asarray(xs, dtype=np.float64)
            out = xs.copy()
            fill = np.isnan(xs) & (pos >= 0)
            out[fill] = self.mean[pos[fill]]
            return batch.append_column(out_col, pa.array(out))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def ordinal_encode(
    ds: "ray.data.Dataset",
    cat_col: str,
    categories: Sequence[str] | None = None,
    out_col: str = "oe",
) -> "ray.data.Dataset":
    """Ordinal (label) encoding: category → its index in the SORTED
    vocabulary (deterministic, reproducible across runs).  Vocabulary
    discovered with one distinct aggregate or frozen via
    ``categories``; unknown values get −1 (sklearn
    handle_unknown=use_encoded_value)."""
    if categories is None:
        uniq = partial_agg(ds.select_columns([cat_col]), [cat_col],
                           combine="driver").to_pandas()
        categories = sorted(uniq[cat_col].dropna().tolist())
    idx = pd.Index(list(categories))

    def _encode(batch: pa.Table) -> pa.Table:
        pos = idx.get_indexer(batch[cat_col].to_numpy(zero_copy_only=False))
        return batch.append_column(out_col, pa.array(pos.astype(np.int64)))

    return ds.map_batches(_encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def quantile_transform(
    ds: "ray.data.Dataset",
    value_col: str,
    out_col: str = "q",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Global ECDF (percentile) transform: each value → the fraction
    of the corpus ≤ it — sklearn QuantileTransformer's rank step, and
    exactly SQL ``cume_dist() OVER (ORDER BY value)``.

    Fit = one frequency ``partial_agg`` over the INTEGER-scaled value
    (the table is bounded by the VALUE DOMAIN — e.g. ≤ ~50k distinct
    cents — not the corpus; for unbounded continuous values substitute
    the DDSketch path); the cumulative-count table broadcasts once and
    the transform is one ``searchsorted`` per batch.  Exact integer
    counts → one float division, bit-equal to the oracle."""
    counts = partial_agg(ds.select_columns([value_col]), [value_col],
                         count_col="n", num_buckets=num_buckets,
                         combine="distributed").to_pandas()
    if len(counts) == 0 or value_col not in counts.columns:
        total = 0.0   # empty fit: the combine emitted no (value, n) rows
    else:
        counts = counts.sort_values(value_col, kind="mergesort")
        vals = counts[value_col].to_numpy()
        cum = counts["n"].astype(np.int64).cumsum().to_numpy()
        total = float(cum[-1]) if len(cum) else 0.0
    if total <= 0.0:
        # nothing to fit an ECDF on (empty input): emit a typed all-NULL
        # column instead of dividing by a 0.0 total downstream
        def _null(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                out_col, pa.nulls(len(batch), type=pa.float64()))

        return ds.map_batches(_null, batch_format="pyarrow",
                              zero_copy_batch=True)
    ref = ray.put((vals, cum, total))

    class _Apply:
        def __init__(self):
            self.vals, self.cum, self.total = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            x = batch[value_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.vals, x, side="right")
            c = np.where(pos > 0, self.cum[np.maximum(pos - 1, 0)], 0)
            q = c.astype(np.float64) / self.total
            return batch.append_column(out_col, pa.array(q))

    return ds.map_batches(_Apply, concurrency=(1, 8), num_cpus=0.25,
                          batch_format="pyarrow", zero_copy_batch=True)


def kfold_assign(
    ds: "ray.data.Dataset",
    id_col: str,
    k: int = 5,
    out_col: str = "fold",
    basis: int = 10000,
) -> "ray.data.Dataset":
    """Deterministic k-fold assignment by ENTITY hash —
    :func:`hash_split`'s cross-validation sibling: ``fold =
    (hash(id) % basis) % k`` (two mods so fold boundaries and the
    train/val/test cuts quantize the SAME hash axis — an entity's fold
    is stable whether or not a split ran first).  Map-only,
    reproducible, leakage-safe, oracle-checkable as one expression."""
    from ..functions.sketches import duckdb_hash_int64

    def _assign(batch: pa.Table) -> pa.Table:
        h = duckdb_hash_int64(
            batch[id_col].to_numpy(zero_copy_only=False)) % np.uint64(basis)
        fold = (h % np.uint64(k)).astype(np.int64)
        return batch.append_column(out_col, pa.array(fold))

    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def pivot_counts(
    ds: "ray.data.Dataset",
    group_col: str,
    pivot_col: str,
    categories: Sequence[str],
    num_buckets: int = 16,
    prefix: str = "n_",
) -> "ray.data.Dataset":
    """Long-to-wide pivot: one row per group, one count column per
    category (the inverse of ``unpivot_columns``; SQL ``COUNT(*) FILTER
    (WHERE pivot = c)``).

    ``categories`` is the FROZEN output vocabulary (the one-hot rule:
    stable schema at any scale, unseen categories are ignored and a
    missing category still gets its zero column — schema never depends
    on which values a partition happened to see). Physical plan: one
    stateless pass derives the indicator columns, then the shared
    :func:`~video_features_ray.stages.joins.partial_agg` combines —
    per-batch partials first, ONE bucketed shuffle of O(groups) skinny
    rows, never row-scale.
    """
    cats = list(categories)
    cols = [f"{prefix}{c}" for c in cats]

    def _indicators(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = {group_col: batch[group_col]}
        for c, name in zip(cats, cols):
            eq = pc.equal(batch[pivot_col], c)
            eq = pc.fill_null(eq, False)
            out[name] = pc.cast(eq, pa.int64())
        return pa.table(out)

    agg = partial_agg(ds.map_batches(_indicators, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      [group_col], sums=cols, count_col="n_total",
                      num_buckets=num_buckets)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        keep = {group_col: df[group_col],
                "n_total": df["n_total"].astype(np.int64)}
        for name in cols:
            keep[name] = df[f"sum_{name}"].astype(np.int64)
        return pd.DataFrame(keep)

    return agg.map_batches(_finish, batch_format="pandas")


def gini_exact(ds: "ray.data.Dataset", value_col: str) -> tuple[int, float]:
    """Exact Gini coefficient of an int64 value column (one row per
    entity), returned as ``(n, gini)``.

    Distribution-sketch plan: per-batch value-count partials shrink the
    stream to (value, count) rows, the driver combines O(distinct
    values) of them (the same exact-fit contract as the quantile /
    winsorize fitters), and the ranked sum Σ i·x_i evaluates exactly in
    arbitrary-precision Python ints via the grouped closed form
    Σ_v v · (c_v·N_before + c_v·(c_v+1)/2) — no float enters until the
    final expression (2·Σi·x − (n+1)·Σx) / (n·Σx)."""

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(value_col, sort=False).size()
        return g.rename("c").reset_index()

    parts = ds.map_batches(_counts, batch_format="pandas").to_pandas()
    if parts.empty:  # 0-row to_pandas loses the schema entirely
        raise ValueError("gini_exact: empty input")
    cdf = (parts.groupby(value_col, sort=True)["c"].sum()
           .reset_index().sort_values(value_col))
    vals = [int(v) for v in cdf[value_col]]
    cnts = [int(c) for c in cdf["c"]]
    n = sum(cnts)
    if n == 0:
        raise ValueError("gini_exact: empty input")
    six = 0      # Σ i·x_i over the ascending ranking (exact)
    sx = 0
    before = 0
    for v, c in zip(vals, cnts):
        six += v * (c * before + c * (c + 1) // 2)
        sx += v * c
        before += c
    gini = (2.0 * six - (n + 1.0) * sx) / (float(n) * sx)
    return n, gini
