"""Distributed Pareto frontier (skyline) over a (minimize, maximize)
pair of integer columns — "cheapest part at every size class", the
2-D dominance query SQL writes as a quadratic NOT EXISTS.

Dominance rule (matches the SQL oracle exactly): row *a* dominates *b*
iff a.min_col <= b.min_col AND a.max_col >= b.max_col AND at least one
is strict.  Rows with identical (min_col, max_col) do not dominate each
other — ALL duplicates of a frontier point are kept.

Plan: the frontier operator has the classic skyline combine property —
the global frontier is a subset of the union of per-block local
frontiers — so the distributed shape is

  1. ``map_batches`` computes each block's LOCAL frontier (vectorized:
     one lexsort by (min asc, max desc), per-price-class maxima, one
     ``np.maximum.accumulate`` — no Python row loop);
  2. the surviving rows (tiny: bounded by the true frontier size ×
     blocks) stream to one final task where the SAME vectorized routine
     runs once more.

Raw rows never shuffle; only local-frontier rows move.  Partitioning
assumption (documented per the custom-operator rule): the merge input
is O(frontier × blocks) — degenerate inputs that are one giant
anti-chain (every row on the frontier) make the frontier itself the
output size, at which point the merge should become a range-partitioned
reduce by ``min_col`` (each range computes its slice's frontier given
the running max of all cheaper ranges — the same prefix-scan shape as
``stages/rank.py``).  For real catalogs the frontier is tiny.

Reference parity: no analogue in the reference (it extracts features);
§2.9 extension surface — the data-profiling / catalog-curation op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def _local_frontier(df: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Vectorized 2-D Pareto frontier of one in-memory frame."""
    if len(df) == 0:
        return df
    lo = df[min_col].to_numpy(np.int64)
    hi = df[max_col].to_numpy(np.int64)
    order = np.lexsort((-hi, lo))  # min_col asc, max_col desc
    lo_s, hi_s = lo[order], hi[order]
    # one row per distinct min_col value; within a class the first row
    # (sorted desc) holds the class max of max_col
    starts = np.flatnonzero(np.r_[True, lo_s[1:] != lo_s[:-1]])
    class_max = hi_s[starts]
    # running max of class maxima over all STRICTLY cheaper classes
    prev_max = np.r_[np.int64(np.iinfo(np.int64).min),
                     np.maximum.accumulate(class_max)[:-1]]
    class_survives = class_max > prev_max
    # a row survives iff its class survives and it ties the class max
    class_id = np.cumsum(np.r_[0, (lo_s[1:] != lo_s[:-1]).astype(np.int64)])
    keep_sorted = class_survives[class_id] & (hi_s == class_max[class_id])
    keep = np.zeros(len(df), dtype=bool)
    keep[order[keep_sorted]] = True
    return df.loc[keep]


def pareto_frontier(
    ds: "ray.data.Dataset",
    min_col: str,
    max_col: str,
) -> pd.DataFrame:
    """Exact global Pareto frontier (minimize ``min_col``, maximize
    ``max_col``; both int64).  Returns a pandas frame of the surviving
    input rows — small by the frontier property documented above."""
    local = ds.map_batches(
        lambda df: _local_frontier(df, min_col, max_col),
        batch_format="pandas")
    return _local_frontier(local.to_pandas(), min_col, max_col)
