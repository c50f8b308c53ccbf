"""Operator-level tests for stages/features.py (the feature-eng family).

The SQL-parity gate lives in test_oracle_parity; here we pin the edge
cases SQL can't isolate: partition-boundary lag masks, frozen-vocab
unknown handling, degenerate fit groups, and bucket-width invariance.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.features import (
    fixed_width_bin,
    grouped_variance,
    histogram,
    mean_target_encode,
    minmax_normalize,
    multi_lag,
    one_hot,
    zscore_normalize,
)


def _events_df():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, 7, n).astype(np.int64),
        "ts": rng.permutation(n).astype(np.int64),
        "x": rng.randint(-500, 500, n).astype(np.int64),
    })


def test_multi_lag_never_crosses_partition():
    df = _events_df()
    out = multi_lag(ray.data.from_pandas(df), "k", "ts", "x",
                    lags=(1, 2, 3), num_buckets=4).to_pandas()
    out = out.sort_values(["k", "ts"]).reset_index(drop=True)
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    for k in (1, 2, 3):
        want = ref.groupby("k")["x"].shift(k)
        got = out[f"lag_{k}"]
        assert np.allclose(got.to_numpy(), want.to_numpy(), equal_nan=True)


def test_multi_lag_lag_longer_than_group():
    df = pd.DataFrame({"k": [1, 1, 2], "ts": [0, 1, 0],
                       "x": [10.0, 20.0, 30.0]})
    out = multi_lag(ray.data.from_pandas(df), "k", "ts", "x",
                    lags=(5,), num_buckets=2).to_pandas()
    assert out["lag_5"].isna().all()


def test_one_hot_frozen_vocab_unknown_is_all_zeros():
    df = pd.DataFrame({"c": ["a", "b", "zz", "a"]})
    out = one_hot(ray.data.from_pandas(df), "c",
                  categories=["a", "b"]).to_pandas()
    zz = out[out["c"] == "zz"]
    assert (zz[["is_a", "is_b"]].to_numpy() == 0).all()
    assert out["is_a"].sum() == 2 and out["is_b"].sum() == 1


def test_one_hot_discovers_sorted_vocab():
    df = pd.DataFrame({"c": ["b", "a", "b"]})
    out = one_hot(ray.data.from_pandas(df), "c").to_pandas()
    assert [c for c in out.columns if c.startswith("is_")] == ["is_a", "is_b"]


def test_zscore_singleton_and_constant_groups_are_null():
    df = pd.DataFrame({"g": ["s", "c", "c", "n", "n"],
                       "x": [5, 7, 7, 1, 3]})
    out = zscore_normalize(ray.data.from_pandas(df), "g", "x").to_pandas()
    assert out.loc[out["g"] == "s", "z"].isna().all()     # n = 1
    assert out.loc[out["g"] == "c", "z"].isna().all()     # zero variance
    z = out.loc[out["g"] == "n", "z"].to_numpy()
    assert np.allclose(sorted(z), [-np.sqrt(0.5), np.sqrt(0.5)])


def test_minmax_constant_group_is_null():
    df = pd.DataFrame({"g": ["a", "a", "b"], "x": [2, 6, 9]})
    out = minmax_normalize(ray.data.from_pandas(df), "g", "x").to_pandas()
    a = out.loc[out["g"] == "a"].sort_values("x")["mm"].to_numpy()
    assert np.allclose(a, [0.0, 1.0])
    assert out.loc[out["g"] == "b", "mm"].isna().all()


def test_mean_target_encode_values():
    df = pd.DataFrame({"c": ["a", "a", "b"], "t": [10, 20, 7]})
    out = mean_target_encode(ray.data.from_pandas(df), "c", "t").to_pandas()
    assert np.allclose(out.loc[out["c"] == "a", "te"], 15.0)
    assert np.allclose(out.loc[out["c"] == "b", "te"], 7.0)


def test_fixed_width_bin_negatives_floor():
    df = pd.DataFrame({"x": [-10.0, -0.1, 0.0, 0.1, 10.0]})
    out = fixed_width_bin(ray.data.from_pandas(df), "x", 5.0).to_pandas()
    assert out.sort_values("x")["bin"].tolist() == [-2, -1, 0, 0, 2]


def test_histogram_counts():
    df = pd.DataFrame({"x": [0.0, 1.0, 4.9, 5.0, 9.9, 10.0]})
    out = histogram(ray.data.from_pandas(df), "x", 5.0).to_pandas()
    got = dict(zip(out["bin"], out["n"]))
    assert got == {0: 3, 1: 2, 2: 1}


@pytest.mark.parametrize("width", [2, 16])
def test_grouped_variance_bucket_invariance(width):
    df = _events_df()
    out = grouped_variance(ray.data.from_pandas(df), ["k"], "x",
                           num_buckets=width).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    ref = df.groupby("k")["x"].agg(["count", "var", "std"]).reset_index()
    assert (out["n"].to_numpy() == ref["count"].to_numpy()).all()
    assert np.allclose(out["var"].to_numpy(), ref["var"].to_numpy())
    assert np.allclose(out["stddev"].to_numpy(), ref["std"].to_numpy())


def test_robust_scale_constant_iqr_is_null():
    from video_features_ray.stages.features import robust_scale
    # 5 identical values → IQR 0 → NULL; spread group scales exactly
    df = pd.DataFrame({"g": ["c"] * 5 + ["s"] * 5,
                       "x": [7] * 5 + [0, 10, 20, 30, 40]})
    out = robust_scale(ray.data.from_pandas(df), "g", "x").to_pandas()
    assert out.loc[out["g"] == "c", "rs"].isna().all()
    s = out.loc[out["g"] == "s"].sort_values("x")["rs"].to_numpy()
    assert np.allclose(s, ([0, 10, 20, 30, 40] - np.float64(20.0)) / 20.0)


def test_count_encode_unseen_is_zero_and_counts_exact():
    from video_features_ray.stages.features import count_encode

    df = pd.DataFrame({"c": ["a", "a", "b", "a"]})
    out = count_encode(ray.data.from_pandas(df), "c").to_pandas()
    assert (out.loc[out["c"] == "a", "ce"] == 3).all()
    assert (out.loc[out["c"] == "b", "ce"] == 1).all()
    assert out["ce"].dtype == np.int64


def test_feature_cross_null_propagates():
    from video_features_ray.stages.features import feature_cross

    df = pd.DataFrame({"a": ["x", None, "y"], "b": ["1", "2", None]})
    out = feature_cross(ray.data.from_pandas(df), ["a", "b"]).to_pandas()
    assert out["cross"].tolist()[0] == "x|1"
    assert pd.isna(out["cross"].tolist()[1]) and pd.isna(out["cross"].tolist()[2])


def test_unpivot_shape_and_values():
    from video_features_ray.stages.features import unpivot

    df = pd.DataFrame({"id": [1, 2], "a": [10.0, 20.0], "b": [0.5, 0.6]})
    out = unpivot(ray.data.from_pandas(df), ["id"], ["a", "b"]).to_pandas()
    assert len(out) == 4
    want = df.melt(id_vars=["id"], value_vars=["a", "b"])
    got = out.sort_values(["id", "variable"]).reset_index(drop=True)
    want = want.sort_values(["id", "variable"]).reset_index(drop=True)
    assert got["value"].tolist() == want["value"].tolist()
    assert got["variable"].tolist() == want["variable"].tolist()


def test_quantile_bin_equal_frequency():
    from video_features_ray.stages.features import quantile_bin

    # 0..99 → quartiles should land 25 rows per bin
    df = pd.DataFrame({"x": np.arange(100, dtype=np.int64)})
    out = quantile_bin(ray.data.from_pandas(df), "x", k=4).to_pandas()
    counts = out["qbin"].value_counts().sort_index()
    assert counts.index.tolist() == [0, 1, 2, 3]
    # interpolated boundaries → 25/25/25/25 up to boundary rounding
    assert all(24 <= c <= 26 for c in counts)
    # monotone: larger x never gets a smaller bin
    s = out.sort_values("x")["qbin"].to_numpy()
    assert (np.diff(s) >= 0).all()


def test_quantile_bin_heavy_ties_skip_bins_consistently():
    from video_features_ray.stages.features import quantile_bin

    # >75% identical values → b1 == b2 == b3 → only bins 0 and 3 exist
    df = pd.DataFrame({"x": np.array([0] * 90 + list(range(1, 11)),
                                     dtype=np.int64)})
    out = quantile_bin(ray.data.from_pandas(df), "x", k=4).to_pandas()
    assert set(out["qbin"].unique()) == {3}  # all x >= all boundaries (0.0)
    # and a spread corpus still uses bin 0
    df2 = pd.DataFrame({"x": np.arange(20, dtype=np.int64)})
    out2 = quantile_bin(ray.data.from_pandas(df2), "x", k=4).to_pandas()
    assert (out2["qbin"] == 0).any()


def test_hash_split_entity_consistent_and_proportioned():
    from video_features_ray.stages.features import hash_split

    rng = np.random.RandomState(5)
    df = pd.DataFrame({"row": np.arange(5000, dtype=np.int64),
                       "uid": rng.randint(0, 800, 5000).astype(np.int64)})
    out = hash_split(ray.data.from_pandas(df), "uid").to_pandas()
    # every entity maps to exactly one split (leakage-safe)
    assert (out.groupby("uid")["split"].nunique() == 1).all()
    # proportions near 90/5/5 at the ENTITY level
    ent = out.drop_duplicates("uid")["split"].value_counts(normalize=True)
    assert abs(ent.get("train", 0) - 0.90) < 0.04
    assert abs(ent.get("val", 0) - 0.05) < 0.03
    assert abs(ent.get("test", 0) - 0.05) < 0.03
    # deterministic: a second run is identical
    out2 = hash_split(ray.data.from_pandas(df), "uid").to_pandas()
    assert out.sort_values("row")["split"].tolist() == \
        out2.sort_values("row")["split"].tolist()


def test_hash_split_rejects_bad_fractions():
    from video_features_ray.stages.features import hash_split

    df = pd.DataFrame({"uid": [1]})
    with pytest.raises(ValueError):
        hash_split(ray.data.from_pandas(df), "uid",
                   fractions=[("train", 0.5), ("test", 0.3)])


def test_multi_lag_leads_never_cross_partition():
    from video_features_ray.stages.features import multi_lag

    df = _events_df()
    out = multi_lag(ray.data.from_pandas(df), "k", "ts", "x",
                    lags=(1,), leads=(1, 2), num_buckets=4).to_pandas()
    out = out.sort_values(["k", "ts"]).reset_index(drop=True)
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    for k in (1, 2):
        want = ref.groupby("k")["x"].shift(-k)
        assert np.allclose(out[f"lead_{k}"].to_numpy(), want.to_numpy(),
                           equal_nan=True)


def test_winsorize_clips_to_band():
    from video_features_ray.stages.features import winsorize

    df = pd.DataFrame({"g": ["a"] * 101,
                       "x": np.arange(101, dtype=np.int64)})
    out = winsorize(ray.data.from_pandas(df), "g", "x",
                    lo_q=0.05, hi_q=0.95).to_pandas()
    # p05 = 5.0, p95 = 95.0 on 0..100
    assert out["w"].min() == 5.0 and out["w"].max() == 95.0
    mid = out[(out["x"] >= 10) & (out["x"] <= 90)]
    assert np.array_equal(mid["w"].to_numpy(), mid["x"].to_numpy().astype(float))


@pytest.mark.parametrize("op,kwargs,col", [
    ("zscore_normalize", {}, "z"),
    ("minmax_normalize", {}, "mm"),
    ("mean_target_encode", {}, "te"),
    ("count_encode", {}, "ce"),
])
def test_join_transform_path_bit_equals_broadcast(op, kwargs, col):
    import video_features_ray.stages.features as F

    rng = np.random.RandomState(13)
    n = 500
    df = pd.DataFrame({"row": np.arange(n, dtype=np.int64),
                       "g": rng.randint(0, 40, n).astype(np.int64),
                       "x": rng.randint(-100, 100, n).astype(np.int64)})
    fn = getattr(F, op)
    args = (ray.data.from_pandas(df).repartition(3), "g", "x")
    if op == "count_encode":
        args = (ray.data.from_pandas(df).repartition(3), "g")
    a = fn(*args, via="broadcast", **kwargs).to_pandas()
    b = fn(*args, via="join", **kwargs).to_pandas()
    a = a.sort_values("row").reset_index(drop=True)
    b = b.sort_values("row").reset_index(drop=True)
    ga, gb = a[col].to_numpy(), b[col].to_numpy()
    if ga.dtype.kind == "f":
        # bit-exact, not just allclose: same exact int sums, same op order
        assert np.array_equal(ga, gb, equal_nan=True)
    else:
        assert np.array_equal(ga, gb)


def test_ordered_te_no_leakage():
    from video_features_ray.stages.features import ordered_target_encode

    # three rows per key in time order: ote must use ONLY earlier rows
    df = pd.DataFrame({"k": ["a", "a", "a", "b"],
                       "ts": [1, 2, 3, 1],
                       "t": [10, 20, 40, 7]})
    out = (ordered_target_encode(ray.data.from_pandas(df), "k", "ts", "t",
                                 num_buckets=2)
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    a = out[out["k"] == "a"]["ote"].tolist()
    assert np.isnan(a[0]) and a[1] == 10.0 and a[2] == 15.0
    assert np.isnan(out[out["k"] == "b"]["ote"].iloc[0])


def test_cumulative_extrema_matches_pandas():
    from video_features_ray.stages.features import cumulative_extrema

    df = _events_df()
    out = (cumulative_extrema(ray.data.from_pandas(df), "k", "ts", "x",
                              num_buckets=4)
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    ref = df.sort_values(["k", "ts"]).reset_index(drop=True)
    want_max = ref.groupby("k")["x"].cummax().to_numpy()
    want_min = ref.groupby("k")["x"].cummin().to_numpy()
    assert np.array_equal(out["cummax"].to_numpy(), want_max)
    assert np.array_equal(out["cummin"].to_numpy(), want_min)


def test_mean_impute_fills_only_missing():
    from video_features_ray.stages.features import mean_impute

    df = pd.DataFrame({"g": ["a", "a", "a", "b"],
                       "x": [10.0, np.nan, 20.0, np.nan]})
    out = mean_impute(ray.data.from_pandas(df), "g", "x").to_pandas()
    a = out[out["g"] == "a"].sort_values("x")["imputed"].tolist()
    assert sorted(a) == [10.0, 15.0, 20.0]
    # group with no observed values stays NULL
    assert out.loc[out["g"] == "b", "imputed"].isna().all()


def test_ordinal_encode_sorted_vocab_and_unknown():
    from video_features_ray.stages.features import ordinal_encode

    df = pd.DataFrame({"c": ["b", "a", "c", "zz"]})
    out = ordinal_encode(ray.data.from_pandas(df), "c",
                         categories=["a", "b", "c"]).to_pandas()
    got = dict(zip(out["c"], out["oe"]))
    assert got == {"a": 0, "b": 1, "c": 2, "zz": -1}


def test_ordered_te_chunked_bit_equals_unchunked():
    from video_features_ray.stages.features import ordered_target_encode

    rng = np.random.RandomState(31)
    n = 700
    df = pd.DataFrame({
        "row": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, 4, n).astype(np.int64),
        "ts": np.sort(rng.randint(0, 100_000, n)).astype(np.int64),
        "t": rng.randint(0, 500, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(3)
    a = (ordered_target_encode(ds, "k", "ts", "t", num_buckets=4,
                               extra_order=["row"])
         .to_pandas().sort_values("row").reset_index(drop=True))
    b = (ordered_target_encode(ds, "k", "ts", "t", num_buckets=4,
                               extra_order=["row"], time_bucket_us=7_000)
         .to_pandas().sort_values("row").reset_index(drop=True))
    # bit-equal: both paths divide the same exact integers
    assert np.array_equal(a["ote"].to_numpy(), b["ote"].to_numpy(),
                          equal_nan=True)
    # and both match the strictly-earlier pandas reference
    ref = df.sort_values(["k", "ts", "row"]).reset_index(drop=True)
    g = ref.groupby("k")["t"]
    want = ((g.cumsum() - ref["t"]) / g.cumcount()).to_numpy()
    got = (a.sort_values("row").merge(ref[["row"]], on="row")
           .set_index("row").loc[ref["row"]]["ote"].to_numpy())
    assert np.allclose(got, want, equal_nan=True)


def test_quantile_transform_ecdf():
    from video_features_ray.stages.features import quantile_transform

    df = pd.DataFrame({"x": np.array([10, 20, 20, 30], dtype=np.int64)})
    out = quantile_transform(ray.data.from_pandas(df), "x",
                             out_col="q").to_pandas()
    got = dict(zip(out["x"], out["q"]))
    assert got == {10: 0.25, 20: 0.75, 30: 1.0}


def test_grouped_skew_kurt_known_values():
    from video_features_ray.stages.joins import grouped_skew_kurt

    rng = np.random.RandomState(41)
    x = rng.randint(0, 200, 3000).astype(np.int64)
    df = pd.DataFrame({"g": ["a"] * len(x), "x": x})
    out = grouped_skew_kurt(ray.data.from_pandas(df).repartition(4),
                            ["g"], "x").to_pandas()
    xf = x.astype(np.float64)
    m = xf.mean()
    m2 = ((xf - m) ** 2).mean()
    want_skew = ((xf - m) ** 3).mean() / m2 ** 1.5
    want_kurt = ((xf - m) ** 4).mean() / m2 ** 2 - 3.0
    assert np.isclose(out["skew"].iloc[0], want_skew)
    assert np.isclose(out["kurt"].iloc[0], want_kurt)
    # constant group -> NULL
    dfc = pd.DataFrame({"g": ["c"] * 5, "x": [7] * 5})
    outc = grouped_skew_kurt(ray.data.from_pandas(dfc), ["g"], "x").to_pandas()
    assert outc["skew"].isna().all() and outc["kurt"].isna().all()


def test_kfold_entity_consistent_and_balanced():
    from video_features_ray.stages.features import kfold_assign

    rng = np.random.RandomState(8)
    df = pd.DataFrame({"row": np.arange(3000, dtype=np.int64),
                       "uid": rng.randint(0, 500, 3000).astype(np.int64)})
    out = kfold_assign(ray.data.from_pandas(df), "uid", k=5).to_pandas()
    assert (out.groupby("uid")["fold"].nunique() == 1).all()
    ent = out.drop_duplicates("uid")["fold"].value_counts(normalize=True)
    assert set(ent.index) == {0, 1, 2, 3, 4}
    assert all(abs(f - 0.2) < 0.07 for f in ent)


def test_join_transform_survives_payload_column_named_n():
    from video_features_ray.stages.features import count_encode

    # payload already carries a column 'n' — must NOT shadow the fit count
    df = pd.DataFrame({"c": ["a", "a", "b"], "n": [99, 98, 97]})
    out = count_encode(ray.data.from_pandas(df), "c", via="join").to_pandas()
    assert sorted(out.loc[out["c"] == "a", "ce"]) == [2, 2]
    assert (out.loc[out["c"] == "b", "ce"] == 1).all()
    assert sorted(out["n"]) == [97, 98, 99]  # payload column intact


def test_one_hot_discovery_with_nulls():
    df = pd.DataFrame({"c": ["b", None, "a"]})
    out = one_hot(ray.data.from_pandas(df), "c").to_pandas()
    assert [c for c in out.columns if c.startswith("is_")] == ["is_a", "is_b"]
    nul = out[out["c"].isna()]
    assert (nul[["is_a", "is_b"]].to_numpy() == 0).all()


def test_fixed_width_bin_null_propagates():
    import pyarrow as pa
    t = pa.table({"x": pa.array([1.0, None, 7.5], type=pa.float64())})
    out = fixed_width_bin(ray.data.from_arrow(t), "x", 5.0).to_pandas()
    assert out["bin"].isna().sum() == 1
    assert sorted(out["bin"].dropna()) == [0, 1]


def test_via_typo_fails_fast():
    from video_features_ray.stages.features import (
        count_encode,
        mean_target_encode,
        minmax_normalize,
    )

    df = pd.DataFrame({"g": ["a"], "x": [1]})
    ds = ray.data.from_pandas(df)
    for fn, args in ((minmax_normalize, (ds, "g", "x")),
                     (mean_target_encode, (ds, "g", "x")),
                     (count_encode, (ds, "g"))):
        with pytest.raises(ValueError):
            fn(*args, via="Join")


def test_broadcast_null_group_key_matches_join_semantics():
    from video_features_ray.stages.features import mean_target_encode
    import pyarrow as pa

    t = pa.table({"g": pa.array(["a", "a", None]),
                  "x": pa.array([10, 20, 7], type=pa.int64())})
    b = mean_target_encode(ray.data.from_arrow(t), "g", "x",
                           via="broadcast").to_pandas()
    j = mean_target_encode(ray.data.from_arrow(t), "g", "x",
                           via="join").to_pandas()
    # NULL key → NULL encoding on BOTH paths (SQL: NULL matches nothing)
    assert b.loc[b["g"].isna(), "te"].isna().all()
    assert j.loc[j["g"].isna(), "te"].isna().all()
    assert np.allclose(sorted(b["te"].dropna()), sorted(j["te"].dropna()))
