"""Model-evaluation aggregates — exact distributed AUC (Mann–Whitney)
and calibration / lift bins over a (score, binary-label) stream.

These are the offline-eval ops a training-data pipeline runs after
scoring a corpus (quality classifiers, dedup confidence, toxicity
models): rank-based AUC and a reliability diagram, both exact and both
computed WITHOUT ever ranking individual rows.

Plan shape (shared by both ops): the only distributed pass is a
frequency aggregation per DISTINCT integer score — per-batch partials
(map, no shuffle of raw rows) → one bucketed combine — and the finish
is a CDF walk over the O(distinct-scores) table.  This is the same
contract as the exact-quantile machinery (`joins.grouped_quantile_*`,
rfm's quintile fit): the driver holds one row per distinct score value,
never one per input row.  Scores are integer-scaled upstream (cents),
so the distinct domain is bounded by the score's value range — at
100 TB of rows the walk table is unchanged.  For genuinely unbounded
continuous scores, pre-bucket with `grouped_ddsketch_quantile`'s
log-bucketing and the same walk gives a rel-err-bounded AUC (documented
trade; not needed for bounded cent scores).

Exactness: the AUC numerator Σ pos_v·(2·negs_below_v + neg_v) is
accumulated in PYTHON ints (arbitrary precision — at 10^12 rows the
int64 product pos·neg overflows long before the table does), and the
single final division mirrors the oracle's expression tree
token-for-token, so the float64 result is bit-identical to DuckDB
evaluating the same closed form (HUGEINT sums, one CAST, one divide).

Reference parity: the reference evaluates nothing — this is §2.9
extension surface (SURVEY.md), the eval counterpart of the curation
family's quality filters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _score_freq_table(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Distinct-score frequency table (score, n, pos) — the shared
    distributed pass.  ``score_col`` must be int64, ``label_col`` a 0/1
    int64.  Returns one driver-side row per distinct score, ascending.
    """
    from .joins import partial_agg

    freq = partial_agg(ds, [score_col], sums=[label_col], count_col="n",
                       num_buckets=num_buckets, combine="distributed")
    tbl = freq.to_pandas()
    out = pd.DataFrame({
        "score": tbl[score_col].to_numpy(np.int64),
        "n": tbl["n"].to_numpy(np.int64),
        "pos": tbl[f"sum_{label_col}"].to_numpy(np.int64),
    })
    return out.sort_values("score", kind="mergesort").reset_index(drop=True)


def auc_exact(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Exact tie-corrected ROC AUC (Mann–Whitney U / (P·N)) of an
    integer score against a 0/1 label.

    AUC = Σ_v pos_v · (negs_strictly_below_v + neg_v / 2) / (P·N),
    kept integral as numer2 = Σ pos_v·(2·cnb_v + neg_v) over the
    distinct-score CDF, then ONE float division — bit-stable vs the
    SQL window-function oracle.  Returns one row:
    (n_pos int64, n_neg int64, auc float64); auc is -1.0 when either
    class is empty (SQL side coalesces identically).
    """
    t = _score_freq_table(ds, score_col, label_col, num_buckets)
    pos = t["pos"].to_numpy(np.int64)
    neg = (t["n"] - t["pos"]).to_numpy(np.int64)
    p_total = int(pos.sum())
    n_total = int(neg.sum())
    numer2 = 0
    cnb = 0  # negatives strictly below the current score (Python int)
    for pv, nv in zip(pos.tolist(), neg.tolist()):
        numer2 += pv * (2 * cnb + nv)
        cnb += nv
    if p_total == 0 or n_total == 0:
        auc = -1.0
    else:
        # expression-tree mirror of the oracle: CAST(numer AS DOUBLE)
        # / (2.0 * CAST(p AS DOUBLE) * CAST(n AS DOUBLE))
        auc = float(numer2) / (2.0 * float(p_total) * float(n_total))
    return pd.DataFrame({"n_pos": [np.int64(p_total)],
                         "n_neg": [np.int64(n_total)],
                         "auc": [np.float64(auc)]})


def calibration_bins(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    num_buckets: int = 16,
    scale: float = 100.0,
) -> pd.DataFrame:
    """Reliability-diagram bins over score quantiles: bin boundaries
    are exact ``quantile_disc`` cut points (1-based rank ceil(n·q) over
    the row distribution — the rfm/winsorize fit contract), bin code =
    1 + Σ (score > bound_i), and per bin the exact row count, positive
    rate, mean score (descaled by ``scale``) and lift vs the overall
    positive rate.  All per-bin sums are integral; the three float
    columns are each ONE division (lift: one more), mirrored
    token-for-token in the SQL.  O(distinct scores) driver math after
    the one distributed frequency pass.
    """
    t = _score_freq_table(ds, score_col, label_col, num_buckets)
    if len(t) == 0:
        return pd.DataFrame({"bin": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "mean_score": pd.Series([], dtype=np.float64),
                             "pos_rate": pd.Series([], dtype=np.float64),
                             "lift": pd.Series([], dtype=np.float64)})
    vals = t["score"].to_numpy(np.int64)
    cnt = t["n"].to_numpy(np.int64)
    pos = t["pos"].to_numpy(np.int64)
    cum = cnt.cumsum()
    total = int(cum[-1])
    total_pos = int(pos.sum())
    # quantile_disc rank ceil(total·i/n_bins), computed in exact ints
    # (float ceil(n·q) misrounds when n·q sits on a representability
    # edge; the integer ceil-div never does)
    bounds = [int(vals[np.searchsorted(cum, -(-total * i // n_bins))])
              for i in range(1, n_bins)]
    bins = np.ones(len(t), dtype=np.int64)
    for b in bounds:
        bins += (vals > b).astype(np.int64)
    g = pd.DataFrame({"bin": bins, "n": cnt, "pos": pos,
                      "s": vals * cnt}).groupby("bin", sort=True).sum()
    n = g["n"].to_numpy(np.int64)
    cp = g["pos"].to_numpy(np.int64)
    ss = g["s"].to_numpy(np.int64)
    nf = n.astype(np.float64)
    pos_rate = cp.astype(np.float64) / nf
    overall = float(total_pos) / float(total)
    return pd.DataFrame({
        "bin": g.index.to_numpy(np.int64),
        "n": n,
        "mean_score": ss.astype(np.float64) / nf / scale,
        "pos_rate": pos_rate,
        "lift": pos_rate / overall,
    })
