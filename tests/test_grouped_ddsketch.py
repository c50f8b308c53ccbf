"""Grouped DDSketch quantile: the alpha relative-error guarantee must
hold per group against the exact quantile, and partial width must stay
bounded by log-buckets (not distinct values)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.joins import grouped_ddsketch_quantile


@pytest.mark.parametrize("q", [0.5, 0.9, 0.99])
def test_grouped_ddsketch_error_bound(q):
    rng = np.random.default_rng(5)
    n = 40_000
    df = pd.DataFrame({
        "g": rng.integers(0, 6, n),
        # heavy-tailed continuous values — the case whose EXACT partials
        # would be O(rows) (every value distinct)
        "v": np.exp(rng.normal(2.0, 1.5, n)),
    })
    alpha = 0.01
    got = grouped_ddsketch_quantile(ray.data.from_pandas(df).repartition(5),
                                    "g", "v", q=q, alpha=alpha)
    for _, row in got.iterrows():
        vals = np.sort(df[df["g"] == row["g"]]["v"].to_numpy())
        exact = vals[max(int(np.ceil(len(vals) * q)), 1) - 1]
        rel = abs(row[f"q{q}_approx"] - exact) / exact
        assert rel <= alpha + 1e-12, (row["g"], rel)


def test_grouped_ddsketch_nonpositive_bucket():
    df = pd.DataFrame({"g": ["a"] * 10, "v": [0.0] * 8 + [5.0, 6.0]})
    got = grouped_ddsketch_quantile(ray.data.from_pandas(df), "g", "v", q=0.5)
    assert got["q0.5_approx"].iloc[0] == 0.0  # median falls in the zero bucket


def test_grouped_ddsketch_partial_width_bounded():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"g": rng.integers(0, 3, 30_000),
                       "v": np.exp(rng.normal(0, 2, 30_000))})
    alpha = 0.01
    import math
    gamma = (1 + alpha) / (1 - alpha)
    # all 30k distinct values must collapse into <= groups * log-range buckets
    spread = (math.log(df["v"].max()) - math.log(df["v"].min())) / math.log(gamma)
    got = grouped_ddsketch_quantile(ray.data.from_pandas(df).repartition(4),
                                    "g", "v", q=0.5, alpha=alpha)
    assert len(got) == 3
    assert spread < 3000  # the histogram the driver walks stays tiny
