"""Round-3 ADVICE regression tests: NULL semantics in sketches /
distinct counts, and the CLI's cluster-address resolution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def test_hash_values_nullable_int_matches_sql_semantics():
    """HLL over a nullable int column must ignore NULLs (COUNT(DISTINCT))."""
    from video_features_ray.functions.sketches import approx_distinct

    vals = [1, 2, 3, None, None, 2, 3, None]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 3) < 0.5  # p=12 is exact at this cardinality


def test_hash_values_valid_mask_alignment():
    from video_features_ray.functions.sketches import _hash_values

    col = pa.array([5, None, 7, None], pa.int64())
    h, valid = _hash_values(col, with_valid=True)
    assert len(h) == 4 and valid.tolist() == [True, False, True, False]
    # non-null hashes must equal the no-null path's hashes
    h2 = _hash_values(pa.array([5, 7], pa.int64()))
    assert h[0] == h2[0] and h[2] == h2[1]

    s, sv = _hash_values(pa.array(["a", None, "b"], pa.string()), with_valid=True)
    assert len(s) == 3 and sv.tolist() == [True, False, True]


def test_bloom_prefilter_drops_null_keys():
    from video_features_ray.functions.sketches import bloom_prefilter, build_bloom

    right = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None, 3, 99], pa.int64())}))
    bf = build_bloom(right, "k", n_bits=1 << 12)
    out = bloom_prefilter(left, "k", bf).to_pandas()
    # NULL keys never match an inner join → must be filtered out
    assert out["k"].notna().all()
    assert set(out["k"].astype(int)) <= {1, 3, 99}  # 99 may FP, nulls never
    assert {1, 3} <= set(out["k"].astype(int))      # no false negatives


def test_distinct_count_per_group_ignores_nulls():
    import duckdb

    from video_features_ray.stages.dedup import distinct_count_per_group

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": [1.0, 1.0, None, 2.0, None, 3.0, 3.0],
    })
    ds = ray.data.from_pandas(df)
    got = distinct_count_per_group(ds, "g", "v").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT g, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct "
        "FROM df GROUP BY g ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want)


def test_cli_uses_ray_address_env(monkeypatch):
    """The CLI must route RAY_ADDRESS to ray.init (ray job submit
    contract) instead of hardcoding a private local instance."""
    import video_features_ray.__main__ as m

    calls = {}

    class _FakeRay:
        @staticmethod
        def is_initialized():
            return False

        @staticmethod
        def init(**kw):
            calls.update(kw)
            raise RuntimeError("stop-after-init")  # don't run the pipeline

        @staticmethod
        def shutdown():
            pass

    monkeypatch.setitem(__import__("sys").modules, "ray", _FakeRay)
    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    with pytest.raises(RuntimeError, match="stop-after-init"):
        m.main(["extract", "--input", "/tmp/nope*.parquet", "--out", "/tmp/o",
                "--spec", "r21d_like_16_16", "--num-cpus", "4"])
    assert calls == {"address": "ray://head:10001"}
