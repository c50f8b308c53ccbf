"""Property tests for the round-5c operator family: block-order
invariance for the bucketed window ops, monotonicity for quantile
normalization, and range/symmetry sanity for the drift matrices."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pd(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def test_followed_within_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from video_features_ray.pipelines.queries import q_followed_within_1h

    got = _norm(_pd(q_followed_within_1h(SF)))
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_type"]
                       ).to_pandas()
    ev["t"] = ev["ts"].astype("int64")
    pairs = ev.merge(ev, on="user_id", suffixes=("_a", "_b"))
    m = ((pairs["t_b"] > pairs["t_a"])
         & (pairs["t_b"] <= pairs["t_a"] + 3_600_000_000))
    want = (pairs[m].groupby(["event_type_a", "event_type_b"])
            .size().rename("n").reset_index()
            .rename(columns={"event_type_a": "type_a",
                             "event_type_b": "type_b"}))
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, _norm(want))


def test_linear_attribution_credit_conserves_value(ray_session):
    from video_features_ray.pipelines.queries import q_linear_attribution

    out = _pd(q_linear_attribution(SF))
    assert len(out) > 0
    # per row: credit_each * n_clicks == value exactly in the cent grid
    recon = out["credit_each"].to_numpy() * out["n_clicks"].to_numpy()
    assert np.allclose(recon, out["value"].to_numpy(), rtol=0, atol=1e-9)
    assert (out["n_clicks"] >= 1).all()


def test_quantile_normalize_monotone_within_type(ray_session):
    from video_features_ray.pipelines.queries import (
        q_quantile_normalize_value,
    )

    out = _pd(q_quantile_normalize_value(SF))
    for et, g in out.groupby("event_type"):
        g = g.sort_values(["value", "event_id"], kind="mergesort")
        # same input value -> same qn_value; order preserved
        assert g.groupby("value")["qn_value"].nunique().max() == 1
        assert g["qn_value"].is_monotonic_increasing
    # the mapped values are actual global values
    src = set(np.round(out["value"].to_numpy() * 100).astype(np.int64))
    dst = set(np.round(out["qn_value"].to_numpy() * 100).astype(np.int64))
    assert dst <= src


def test_drift_matrix_ranges_and_order(ray_session):
    from video_features_ray.pipelines.queries import (
        q_ks_source_matrix,
        q_tv_source_pairs,
        q_wasserstein_source_pairs,
    )

    ks = _pd(q_ks_source_matrix(SF))
    tv = _pd(q_tv_source_pairs(SF))
    w1 = _pd(q_wasserstein_source_pairs(SF))
    n_src = len(set(ks["source_a"]) | set(ks["source_b"]))
    assert len(ks) == n_src * (n_src - 1) // 2 == len(tv) == len(w1)
    assert ((ks["ks"] >= 0) & (ks["ks"] <= 1)).all()
    assert ((tv["tv"] >= 0) & (tv["tv"] <= 1)).all()
    assert (w1["w1"] >= 0).all()
    # KS <= TV pointwise bound does NOT hold in general; but KS <= 1
    # and TV >= half the sup pmf gap do. Check the classic KS <= 2*TV.
    m = ks.merge(tv, on=["source_a", "source_b"])
    assert (m["ks"] <= 2 * m["tv"] + 1e-12).all()


def test_unigram_cosine_bounds(ray_session):
    from video_features_ray.pipelines.queries import (
        q_unigram_cosine_sources,
    )

    out = _pd(q_unigram_cosine_sources(SF))
    assert len(out) > 0
    assert ((out["cosine"] > 0) & (out["cosine"] <= 1.0 + 1e-15)).all()


def test_anova_kruskal_agree_on_separation(ray_session):
    # both statistics must be non-negative and finite on real data
    from video_features_ray.pipelines.queries import (
        q_anova_value_by_type,
        q_kruskal_value_by_type,
    )

    f = _pd(q_anova_value_by_type(SF))
    h = _pd(q_kruskal_value_by_type(SF))
    assert f["f_e6"].iloc[0] >= 0
    assert h["h_e6"].iloc[0] >= 0
    assert f["n_rows"].iloc[0] == h["n_rows"].iloc[0]
