"""PAV isotonic regression: monotonicity, mass preservation, max-min
closed form, brute-force parity, and the distributed fit."""

import numpy as np
import pandas as pd
import pytest

from video_features_ray.stages.isotonic import isotonic_calibration, pav_pool


def _brute_pav(n, s):
    """O(k²) reference: repeatedly merge ANY adjacent violator pair
    until none remain (order of merges provably doesn't change the
    fitted values)."""
    pools = [[int(si), int(ni)] for si, ni in zip(s, n)]
    changed = True
    while changed:
        changed = False
        for i in range(len(pools) - 1):
            a, b = pools[i], pools[i + 1]
            if a[0] * b[1] >= b[0] * a[1]:  # mean_a >= mean_b
                pools[i] = [a[0] + b[0], a[1] + b[1]]
                del pools[i + 1]
                changed = True
                break
    out = []
    for ps, pn in pools:
        out.append((ps, pn))
    return out


def _rates_from_pools(pools, n):
    rates = []
    for ps, pn in pools:
        rates.extend([ps / pn] * 0)
    return rates


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_pav_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(1, 40))
    n = rng.integers(1, 6, size=k).astype(np.int64)
    s = np.array([rng.integers(0, ni + 1) for ni in n], np.int64)
    pool_id, pool_s, pool_n = pav_pool(n, s)
    got = pool_s / pool_n
    # brute force pools -> expand to per-position rates
    pools = _brute_pav(n, s)
    want = np.concatenate([[ps / pn] * 0 for ps, pn in pools] or [[]])
    exp = []
    # expansion: brute pools are in order; sizes = sum of member n —
    # recover member counts by walking original until mass matches
    i = 0
    for ps, pn in pools:
        acc = 0
        while acc < pn:
            acc += int(n[i])
            exp.append(ps / pn)
            i += 1
        assert acc == pn
    assert np.allclose(got, np.array(exp))
    # monotone nondecreasing
    assert np.all(np.diff(got) >= -1e-15)
    # mass preserved: sum rate*n == sum s
    assert np.isclose(float((got * n).sum()), float(s.sum()))


def test_pav_maxmin_closed_form():
    # y = per-unit labels; fit_i = max_{j<=i} min_{k>=i} avg(y[j..k])
    rng = np.random.default_rng(7)
    k = 12
    n = np.ones(k, np.int64)
    s = rng.integers(0, 2, size=k).astype(np.int64)
    _, pool_s, pool_n = pav_pool(n, s)
    got = pool_s / pool_n
    cs = np.concatenate(([0], np.cumsum(s)))
    for i in range(k):
        best = -np.inf
        for j in range(i + 1):
            worst = np.inf
            for kk in range(i, k):
                worst = min(worst, (cs[kk + 1] - cs[j]) / (kk + 1 - j))
            best = max(best, worst)
        assert abs(got[i] - best) < 1e-12


def test_pav_already_monotone_identity():
    n = np.array([2, 3, 4], np.int64)
    s = np.array([0, 2, 4], np.int64)  # means 0, 2/3, 1: increasing
    pool_id, pool_s, pool_n = pav_pool(n, s)
    assert list(pool_id) == [0, 1, 2]
    assert np.allclose(pool_s / pool_n, [0.0, 2 / 3, 1.0])


def test_pav_all_violating_single_pool():
    n = np.array([1, 1, 1], np.int64)
    s = np.array([1, 1, 0], np.int64)  # decreasing -> one pool
    pool_id, pool_s, pool_n = pav_pool(n, s)
    assert list(pool_id) == [0, 0, 0]
    assert np.allclose(pool_s / pool_n, [2 / 3] * 3)


def test_isotonic_calibration_distributed(ray_session):
    import ray as _ray

    rng = np.random.default_rng(3)
    score = rng.integers(0, 50, size=2000).astype(np.int64)
    # labels correlated with score + noise
    label = (rng.random(2000) < (score / 60.0)).astype(np.int64)
    df = pd.DataFrame({"score": score, "label": label})
    ds = _ray.data.from_pandas(df).repartition(8)
    out = isotonic_calibration(ds, "score", "label", num_buckets=4)
    # distinct scores, ascending, monotone rates
    assert out["score"].is_monotonic_increasing
    assert np.all(np.diff(out["rate"].to_numpy()) >= -1e-15)
    # sufficient statistics match pandas
    want = df.groupby("score").agg(n=("label", "size"),
                                   pos=("label", "sum")).reset_index()
    got = out[["score", "n", "pos"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))
    # block-count invariance: same result from one block
    out1 = isotonic_calibration(_ray.data.from_pandas(df),
                                "score", "label", num_buckets=2)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out1.reset_index(drop=True))
