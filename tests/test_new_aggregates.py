"""sliding_aggregate / distinct_count_per_group / stratified_bottom_k —
edge semantics + block-layout invariance (the SQL-hash parity for the
wired queries lives in test_oracle_parity via oracle_sql())."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.functions.sketches import stratified_bottom_k
from video_features_ray.stages.dedup import distinct_count_per_group
from video_features_ray.stages.joins import sliding_aggregate


def test_sliding_window_membership():
    """t=0 belongs to starts {0, -step}; a row on a window edge belongs
    to the window starting there but not the one ending there."""
    t = pa.table({"ts": pa.array([0.0, 100.0, 200.0, 199.999])})
    out = (sliding_aggregate(
        ray.data.from_arrow(t.append_column("v", pa.array([1, 1, 1, 1]))),
        "ts", "v", window=200.0, step=100.0)
        .to_pandas().sort_values("window_start").reset_index(drop=True))
    got = dict(zip(out["window_start"], out["n"]))
    assert got[-100.0] == 1          # only t=0 — windows are end-exclusive
    assert got[0.0] == 3             # 0, 100, 199.999
    assert got[100.0] == 3           # 100, 199.999, 200
    assert got[200.0] == 1           # 200 only


def test_distinct_count_partition_invariant():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 5000),
                       "v": rng.integers(0, 300, 5000)})
    want = df.groupby("g")["v"].nunique()
    for nblocks in (2, 17):
        out = distinct_count_per_group(
            ray.data.from_pandas(df).repartition(nblocks), "g", "v"
        ).to_pandas().set_index("g")["n_distinct"]
        for g in want.index:
            assert out[g] == want[g], (nblocks, g)


def test_hash_join_matches_pandas_and_preserves_dtypes():
    from video_features_ray.stages.joins import hash_join

    rng = np.random.default_rng(9)
    left = pd.DataFrame({"k": rng.integers(0, 50, 2000).astype(np.int64),
                         "lx": np.arange(2000, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(40, dtype=np.int64),
                          "rx": (np.arange(40) * 10).astype(np.int64),
                          "lx": np.arange(40, dtype=np.int64) + 777})  # name clash
    for nb in (8, 32):
        out = hash_join(ray.data.from_pandas(left).repartition(5),
                        ray.data.from_pandas(right).repartition(3),
                        on="k", num_buckets=nb).to_pandas()
        want = left.merge(right.rename(columns={"rx": "rx", "lx": "lx_r"}), on="k")
        key = ["k", "lx", "rx"]
        got_s = out.sort_values(key).reset_index(drop=True)
        want_s = want.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got_s[sorted(got_s.columns)],
                                      want_s[sorted(want_s.columns)])
        assert got_s["lx"].dtype == np.int64 and got_s["rx"].dtype == np.int64


def test_bloom_filter_no_false_negatives_and_merge():
    import pyarrow as pa_

    from video_features_ray.functions.sketches import (
        BloomFilter, _hash_values, bloom_prefilter, build_bloom)

    rng = np.random.default_rng(6)
    present = rng.choice(1 << 40, 5000, replace=False).astype(np.int64)
    absent = (rng.choice(1 << 40, 5000, replace=False).astype(np.int64)
              + (1 << 41))
    h_p = _hash_values(pa_.array(present))
    h_a = _hash_values(pa_.array(absent))
    a, b = BloomFilter(1 << 16, 4), BloomFilter(1 << 16, 4)
    a.add_hashes(h_p[:2500]); b.add_hashes(h_p[2500:])
    m = a.merge(b)
    assert m.contains_hashes(h_p).all()            # NEVER a false negative
    fpr = m.contains_hashes(h_a).mean()
    assert fpr < 0.1, fpr                          # 64k bits / 5k keys

    # distributed build + prefilter: lossless for the matched set
    right = pd.DataFrame({"k": present[:500]})
    left = pd.DataFrame({"k": np.concatenate([present[:500], absent]),
                         "x": np.arange(5500)})
    bf = build_bloom(ray.data.from_pandas(right).repartition(4), "k")
    kept = bloom_prefilter(ray.data.from_pandas(left).repartition(4), "k", bf).to_pandas()
    assert set(present[:500]) <= set(kept["k"])    # every true match survives
    assert len(kept) < len(left)                   # and it actually filters


def test_hash_join_bloom_prefilter_equals_plain():
    from video_features_ray.stages.joins import hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 10_000, 4000).astype(np.int64),
                         "lx": np.arange(4000, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.integers(0, 300, 50).astype(np.int64),
                          "rx": np.arange(50, dtype=np.int64)})
    plain = hash_join(ray.data.from_pandas(left).repartition(4),
                      ray.data.from_pandas(right), on="k").to_pandas()
    pre = hash_join(ray.data.from_pandas(left).repartition(4),
                    ray.data.from_pandas(right), on="k",
                    bloom_prefilter_left=True, bloom_bits=1 << 12).to_pandas()
    key = ["k", "lx", "rx"]
    pd.testing.assert_frame_equal(plain.sort_values(key).reset_index(drop=True),
                                  pre.sort_values(key).reset_index(drop=True))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lossless"):
        hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                  on="k", how="left", bloom_prefilter_left=True)


def test_hash_join_left_how():
    from video_features_ray.stages.joins import hash_join

    left = pd.DataFrame({"k": [1, 2, 3], "lx": [10, 20, 30]})
    right = pd.DataFrame({"k": [2], "rx": [99]})
    out = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="k", how="left").to_pandas().sort_values("k")
    assert out["rx"].fillna(-1).tolist() == [-1, 99, -1]


def test_semi_anti_null_keys_follow_exists_semantics():
    from video_features_ray.stages.joins import hash_join

    left = pd.DataFrame({"k": [1.0, 2.0, np.nan], "lx": [10, 20, 30]})
    right = pd.DataFrame({"k": [2.0, np.nan]})
    anti = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="k", how="anti").to_pandas()
    # NOT EXISTS never matches NULL: both k=1 and the NULL-key row survive
    assert sorted(anti["lx"]) == [10, 30]
    semi = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                     on="k", how="semi").to_pandas()
    assert sorted(semi["lx"]) == [20]


def test_codepoints_dictionary_encoded_strings():
    import pyarrow as pa_

    from video_features_ray.sources.sequences import _codepoints_batch

    arr = pa_.array(["abc", "abc", "de"]).dictionary_encode()
    flat, off = _codepoints_batch(arr)
    assert flat.tolist() == [97, 98, 99, 97, 98, 99, 100, 101]
    assert off.tolist() == [0, 3, 6, 8]


def test_rolling_agg_matches_pandas_reference():
    from video_features_ray.stages.events import rolling_agg

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"eid": np.arange(3000, dtype=np.int64),
                       "u": rng.integers(0, 25, 3000).astype(np.int64),
                       "t": rng.integers(0, 400, 3000).astype(np.int64),
                       "v": rng.integers(0, 1000, 3000).astype(np.int64)})
    out = rolling_agg(ray.data.from_pandas(df).repartition(6), "u", "t", "v",
                      window_rows=4, tie_cols=["eid"]).to_pandas()
    ref = df.sort_values(["u", "t", "eid"], kind="mergesort").copy()
    ref["want"] = (ref.groupby("u", sort=False)["v"]
                   .rolling(4, min_periods=1).sum().reset_index(level=0, drop=True))
    merged = out.merge(ref[["eid", "want"]], on="eid")
    assert (merged["v_rollsum4"] == merged["want"]).all()


def test_grouped_quantile_matches_duckdb_rule():
    import duckdb

    from video_features_ray.stages.joins import grouped_quantile_disc

    rng = np.random.default_rng(8)
    df = pd.DataFrame({"g": rng.choice(["a", "b", "c"], 4001),
                       "v": rng.integers(0, 500, 4001).astype(np.int64)})
    for q in (0.5, 0.25, 0.9):
        got = grouped_quantile_disc(
            ray.data.from_pandas(df).repartition(7), "g", "v", q=q)
        want = duckdb.sql(
            f"SELECT g, quantile_disc(v, {q}) AS w FROM df GROUP BY g ORDER BY g"
        ).df()
        assert got[f"q{q}"].tolist() == want["w"].tolist(), q


def test_stratified_bottom_k_partition_invariant_and_exact():
    import hashlib

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"src": rng.choice(["w", "x", "y"], 900),
                       "id": np.arange(900)})
    a = stratified_bottom_k(ray.data.from_pandas(df).repartition(3), "src", "id", k=4)
    b = stratified_bottom_k(ray.data.from_pandas(df).repartition(19), "src", "id", k=4)
    pd.testing.assert_frame_equal(a, b)
    # matches the naive definition exactly
    from video_features_ray.functions.sketches import duckdb_hash_int64

    df2 = df.assign(h=duckdb_hash_int64(df["id"].to_numpy()))
    want = (df2.sort_values(["h", "id"]).groupby("src", sort=False).head(4))
    for src in ("w", "x", "y"):
        assert sorted(a[a.src == src]["id"]) == sorted(want[want.src == src]["id"])
