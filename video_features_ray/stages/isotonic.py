"""Isotonic regression (pool-adjacent-violators) calibration.

The exact monotone calibration curve beside the binned calibration
table (`pipelines/queries.py:q_calibration_value`): fit the best
nondecreasing step function of P(label | score) in least squares —
the standard probability-calibration post-processor (Zadrozny &
Elkan, KDD'02; sklearn's ``IsotonicRegression``) and a classic
exactly-poolable aggregate.

Distribution plan: PAV is inherently sequential in the SCORE order,
but its sufficient statistics are per-distinct-score (count,
positive-count) pairs — an algebraic combine.  So the cluster does
ONE (score, label) count shuffle and the driver runs PAV over the
O(distinct scores) histogram, bounded by the score DOMAIN (cents
here), never row count.  Pool-mean comparisons cross-multiply
Python-int numerators/denominators, so pooling decisions are exact —
no float drift can merge the wrong pools — and each emitted rate is
the single final division.

Reference anchor: the reference's softmax-confidence path
(`models/_base/base_framewise_extractor.py:75-79` show-pred) is the
score being calibrated; no reference counterpart exists (training-
data-pipeline operator mandated by the brief).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def pav_pool(counts_n: np.ndarray, counts_s: np.ndarray
             ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PAV over per-distinct-score histograms (ascending score order).

    ``counts_n[i]`` rows and ``counts_s[i]`` positives at score i.
    Returns ``(pool_id, pool_s, pool_n)`` per input position: the pool
    each score lands in and that pool's exact (positives, rows) pair.
    Merging uses >= on cross-multiplied means so equal-mean neighbors
    collapse into one pool (canonical form; the fitted VALUES are
    identical either way, this just makes pool ids deterministic).
    """
    pools: list[list[int]] = []  # [s, n, first_idx]
    for i in range(len(counts_n)):
        cs, cn = int(counts_s[i]), int(counts_n[i])
        st = i
        # violation: previous pool mean >= current mean  ⇔
        # ps * cn >= cs * pn   (exact ints)
        while pools and pools[-1][0] * cn >= cs * pools[-1][1]:
            ps, pn, pst = pools.pop()
            cs += ps
            cn += pn
            st = pst
        pools.append([cs, cn, st])
    pool_id = np.empty(len(counts_n), np.int64)
    pool_s = np.empty(len(counts_n), np.int64)
    pool_n = np.empty(len(counts_n), np.int64)
    bounds = [p[2] for p in pools] + [len(counts_n)]
    for k, p in enumerate(pools):
        sl = slice(bounds[k], bounds[k + 1])
        pool_id[sl] = k
        pool_s[sl] = p[0]
        pool_n[sl] = p[1]
    return pool_id, pool_s, pool_n


def isotonic_calibration(
    ds: "object",
    score_col: str,
    label_col: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Fit P(label | score) isotonic in ``score_col`` over a Dataset.

    ``score_col``: int64 scores (pre-gridded, e.g. cents);
    ``label_col``: 0/1 int64.  Returns one row per distinct score:
    ``(score, n, pos, pool_id, rate)`` with ``rate`` the pooled
    exact-ratio calibrated probability (nondecreasing in score).
    """
    from .joins import partial_agg

    c = partial_agg(ds, [score_col], sums=[label_col],
                    num_buckets=num_buckets,
                    combine="distributed").to_pandas()
    c = c.sort_values(score_col, kind="mergesort").reset_index(
        drop=True)
    n = c["n"].to_numpy(np.int64)
    s = c[f"sum_{label_col}"].to_numpy(np.int64)
    pool_id, pool_s, pool_n = pav_pool(n, s)
    return pd.DataFrame({
        "score": c[score_col].astype(np.int64),
        "n": n,
        "pos": s,
        "pool_id": pool_id,
        "rate": pool_s.astype(np.float64) / pool_n.astype(np.float64),
    })
