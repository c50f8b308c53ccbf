"""Regression pins for the round-4 ADVICE findings.

1. hash_join(salt_hot=..., how='outer') must refuse — replicated hot
   right rows would re-emit as unmatched right-outer rows n_salts×.
2. grouped_ddsketch_quantile ignores NULL/NaN values (SQL semantics)
   instead of counting them in the non-positive sentinel bucket.
3. quantile_transform on an empty input short-circuits to a typed
   all-NULL column instead of dividing by a 0.0 total.
4. the via='join' feature paths and jaccard_verify_joined thread
   explicit schemas so TaggedUnion never calls Dataset.schema() on the
   payload (which can execute its first block just for inference).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data


def test_salt_hot_outer_join_refused():
    from video_features_ray.stages.joins import hash_join

    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "a": [1.0, 2.0]}))
    right = ray.data.from_pandas(pd.DataFrame({"k": [2, 3], "b": [5.0, 6.0]}))
    with pytest.raises(ValueError, match="outer"):
        hash_join(left, right, on="k", how="outer", salt_hot=([2], 4))


def test_salt_hot_left_join_no_duplication():
    """A right-ONLY hot key replicated into n_salts sub-buckets must not
    multiply output under the allowed hows (the ADVICE repro was outer)."""
    from video_features_ray.stages.joins import hash_join

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 1, 2], "a": [1.0, 2.0, 3.0]}))
    # hot key 9 exists ONLY on the right
    right = ray.data.from_pandas(pd.DataFrame(
        {"k": [1, 9], "b": [10.0, 99.0]}))
    for how, want in (("inner", 2), ("left", 3), ("semi", 2), ("anti", 1)):
        out = hash_join(left, right, on="k", how=how,
                        salt_hot=([9], 4), num_buckets=4).to_pandas()
        assert len(out) == want, (how, out)


def test_grouped_ddsketch_quantile_ignores_nulls():
    from video_features_ray.stages.joins import grouped_ddsketch_quantile

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    clean = pd.DataFrame({"g": ["a"] * 5, "v": vals})
    dirty = pd.DataFrame({"g": ["a"] * 9, "v": vals + [None] * 4})
    q_clean = grouped_ddsketch_quantile(
        ray.data.from_pandas(clean), "g", "v", q=0.5)
    q_dirty = grouped_ddsketch_quantile(
        ray.data.from_pandas(dirty), "g", "v", q=0.5)
    # same rank walk, same estimate — NULLs contribute to neither the
    # sentinel bucket nor n
    assert q_clean["q0.5_approx"].iloc[0] == q_dirty["q0.5_approx"].iloc[0]
    assert q_dirty["q0.5_approx"].iloc[0] == pytest.approx(3.0, rel=0.02)


def test_quantile_transform_empty_input():
    """Empty fit → clean empty result, no 0.0-division warnings (Ray
    collapses a fully-empty dataset's pandas schema; the contract here
    is 0 rows and no RuntimeWarning, with the column present whenever a
    block survives)."""
    import warnings

    from video_features_ray.stages.features import quantile_transform

    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = quantile_transform(empty, "v", out_col="q").to_pandas()
    assert len(out) == 0

    # empty-after-filter: fit sees zero rows but blocks still flow —
    # the typed all-NULL column must be present
    one = ray.data.from_arrow(pa.table({"v": pa.array([1], pa.int64())}))
    one = one.filter(lambda r: False)
    out2 = quantile_transform(one, "v", out_col="q").to_pandas()
    assert len(out2) == 0


def test_via_join_schema_threading_bit_equal():
    """Passing the payload schema through the via='join' path must be a
    pure plumbing change: output bit-equal to the broadcast path."""
    from video_features_ray.stages.features import (minmax_normalize,
                                                    zscore_normalize)

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"u": rng.integers(0, 5, 200),
                       "xs": rng.integers(0, 10_000, 200)})
    sch = pa.schema([("u", pa.int64()), ("xs", pa.int64())])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    for fn, col in ((zscore_normalize, "z"), (minmax_normalize, "mm")):
        a = (fn(ds, "u", "xs", via="broadcast").to_pandas()
             .sort_values(["u", "xs"]).reset_index(drop=True))
        b = (fn(ds, "u", "xs", via="join", schema=sch).to_pandas()
             .sort_values(["u", "xs"]).reset_index(drop=True))
        pd.testing.assert_series_equal(a[col], b[col], check_exact=True)


def test_jaccard_verify_joined_with_pairs_schema():
    from video_features_ray.stages.dedup import jaccard_verify_joined

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": ["1", "2", "3"],
        "text": ["the quick brown fox jumps over the dog",
                 "the quick brown fox jumps over the cat",
                 "completely different text with no overlap at all"]}))
    pairs = ray.data.from_pandas(pd.DataFrame(
        {"id_a": ["1", "1"], "id_b": ["2", "3"]}))
    out = jaccard_verify_joined(
        pairs, docs, threshold=0.3,
        pairs_schema=pa.schema([("id_a", pa.string()),
                                ("id_b", pa.string())])).to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == {("1", "2")}
