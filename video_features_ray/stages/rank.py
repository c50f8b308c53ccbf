"""Global rank / NTILE over a high-cardinality key — the corpus-wide
order statistic (spend deciles, popularity percentiles) that SQL writes
as ``NTILE(k) OVER (ORDER BY v, id)`` with no PARTITION BY.

Per-entity rank (``events.window_rank``) shuffles by entity and sorts
within buckets; a GLOBAL rank has no partitioning key, so the plan here
is the distributed counting-sort scan, a sibling of the packing
prefix-sum (``stages/packing.py``):

  1. one pass tags each row with a VALUE-RANGE bucket (min/max come
     from an O(1)-driver partial agg — no sample, fully deterministic)
     and counts rows per (block, bucket);
  2. the driver exclusive-scans the per-bucket counts — O(num_buckets)
     integers, never rows — into global base offsets;
  3. the rows shuffle ONCE by range bucket; each bucket task sorts its
     slice by ``(v, id)``, adds its broadcast base, and the global rank
     (and any rank-derived feature: NTILE, percentile, topN flag) is
     closed-form.

Partitioning assumption (documented per the custom-operator rule):
range bucketing by value is skew-prone when the value distribution is
heavily concentrated — a single value held by >1 bucket's share of rows
lands in one task.  Salting CANNOT apply (rank is order-dependent);
the mitigation is raising ``num_buckets`` (tasks stay O(rows/buckets)
for any non-degenerate distribution) or a pre-binned CDF pass.

Reference parity: the reference ranks nothing globally; this is part
of the §2.9 extension surface (SURVEY.md) for training-data curation
(e.g. keep the top decile of quality scores corpus-wide).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def global_ntile(
    ds: "ray.data.Dataset",
    value_col: str,
    id_col: str,
    n: int = 10,
    num_buckets: int = 64,
    out_col: str = "tile",
) -> "ray.data.Dataset":
    """Exact SQL ``NTILE(n) OVER (ORDER BY value_col, id_col)`` over an
    integer value column (scale floats to ints upstream — float ties
    under summation reorder would break the total order anyway).

    Rows must be unique per ``id_col``; the (value, id) pair is the
    total order.  Returns the input columns plus ``out_col`` (1..n).
    """
    from .joins import partial_agg

    # the plan reads its input three times (min/max, counts, shuffle) —
    # materialize ONCE so the upstream pipeline doesn't re-execute.
    # Inputs here are skinny aggregates (id, value) — O(keys) x 16 B in
    # the object store, the "small result" the streaming rule allows
    ds = ds.materialize()

    # --- pass 0: O(1)-driver min/max for deterministic range buckets
    def _const(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_g": np.zeros(len(df), np.int32),
                             value_col: df[value_col].to_numpy(np.int64)})

    mm = partial_agg(ds.map_batches(_const, batch_format="pandas"),
                     ["_g"], mins=[value_col], maxs=[value_col],
                     combine="driver").to_pandas()
    if len(mm) == 0 or mm["n"].iloc[0] == 0:
        def _empty(df: pd.DataFrame) -> pd.DataFrame:
            df[out_col] = pd.Series([], dtype=np.int64)
            return df
        return ds.map_batches(_empty, batch_format="pandas")
    lo = int(mm[f"min_{value_col}"].iloc[0])
    hi = int(mm[f"max_{value_col}"].iloc[0])
    span = max(hi - lo + 1, 1)
    nb = int(num_buckets)

    def _bucket_of(v: np.ndarray) -> np.ndarray:
        # integer arithmetic only — identical on every worker
        return ((v.astype(np.int64) - lo) * nb // span).astype(np.int32)

    # --- pass 1: per-bucket row counts (O(blocks x buckets) partials)
    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        b = _bucket_of(df[value_col].to_numpy(np.int64))
        c = np.bincount(b, minlength=nb)
        return pd.DataFrame({"_bucket": np.arange(nb, dtype=np.int32),
                             "cnt": c.astype(np.int64)})

    pdf = ds.map_batches(_counts, batch_format="pandas").to_pandas()
    agg = pdf.groupby("_bucket")["cnt"].sum()
    totals = np.zeros(nb + 1, np.int64)
    totals[np.asarray(agg.index, np.int64) + 1] = agg.to_numpy(np.int64)
    base = np.cumsum(totals)  # base[b] = rows in buckets < b
    total = int(base[-1])
    q, r = divmod(total, int(n))

    # --- pass 2: ONE shuffle by range bucket; closed-form tile from
    # the global 0-based rank (SQL NTILE: first r tiles get q+1 rows)
    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = _bucket_of(df[value_col].to_numpy(np.int64))
        return df

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["_bucket"].iloc[0]) if len(df) else 0
        df = (df.sort_values([value_col, id_col], kind="mergesort")
              .drop(columns=["_bucket"]).reset_index(drop=True))
        rank0 = base[b] + np.arange(len(df), dtype=np.int64)
        big = r * (q + 1)
        tile = np.where(rank0 < big,
                        rank0 // max(q + 1, 1),
                        r + (rank0 - big) // max(q, 1))
        df[out_col] = (tile + 1).astype(np.int64)
        return df

    return (ds.map_batches(_tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(_rank, batch_format="pandas"))
