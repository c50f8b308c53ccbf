"""Salted hot-key joins: identical output, bounded buckets.

One key carrying a data-sized share of the left side turns its hash
bucket into a single giant task — the skew case byte-sized bucket
counts can't fix.  ``hash_join(salt_hot=(keys, s))`` must (a) leave the
join RESULT untouched for inner/semi/anti, (b) provably shrink the
largest bucket, and (c) be discoverable via ``detect_hot_keys``.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from video_features_ray.stages.joins import hash_join
from video_features_ray.stages.shuffle import TaggedUnion
from video_features_ray.stages.skew import detect_hot_keys

N_LEFT = 20_000
HOT_FRAC = 0.4


def _sides(seed=7):
    rng = np.random.default_rng(seed)
    n_hot = int(N_LEFT * HOT_FRAC)
    keys = np.concatenate([
        np.full(n_hot, 3, dtype=np.int64),                      # the hot key
        rng.integers(0, 100, N_LEFT - n_hot).astype(np.int64),  # the rest
    ])
    rng.shuffle(keys)
    left = pd.DataFrame({"k": keys, "v": np.arange(N_LEFT, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 90, dtype=np.int64),
                          "attr": [f"a{i}" for i in range(90)]})
    return left, right


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("how", ["inner", "semi", "anti"])
def test_salted_join_matches_unsalted(how):
    left_df, right_df = _sides()
    kw = dict(on="k", num_buckets=8)
    plain = hash_join(ray.data.from_pandas(left_df),
                      ray.data.from_pandas(right_df), how=how, **kw).to_pandas()
    salted = hash_join(ray.data.from_pandas(left_df),
                       ray.data.from_pandas(right_df), how=how,
                       salt_hot=([3], 6), **kw).to_pandas()
    pd.testing.assert_frame_equal(_norm(plain), _norm(salted))


def test_salting_bounds_bucket_size():
    left_df, right_df = _sides()
    n_salts = 8

    def max_bucket(salt_hot):
        tu = TaggedUnion(ray.data.from_pandas(left_df),
                         ray.data.from_pandas(right_df), "k", 8,
                         salt_hot=salt_hot)
        sizes = tu.both.groupby("_bucket").count().to_pandas()
        return int(sizes["count()"].max())

    plain, salted = max_bucket(None), max_bucket(([3], n_salts))
    # the hot bucket held >= 8k rows; salted sub-buckets hold ~1k each
    assert plain >= int(N_LEFT * HOT_FRAC)
    assert salted < plain / (n_salts / 2)


def test_salting_rejects_asof_and_composite():
    left_df, right_df = _sides()
    l, r = ray.data.from_pandas(left_df), ray.data.from_pandas(right_df)
    with pytest.raises(ValueError):
        TaggedUnion(l, r, ["k", "v"], 8, salt_hot=([3], 4))
    with pytest.raises(ValueError):
        TaggedUnion(l, r, "k", 8, ts_cols=("v", "attr"), salt_hot=([3], 4))


def test_detect_hot_keys_finds_planted():
    left_df, _ = _sides()
    ds = ray.data.from_pandas(left_df)
    hot = detect_hot_keys(ds, "k", threshold_frac=0.1)
    assert hot == [3]
    # nothing is hot at a threshold above the planted share
    assert detect_hot_keys(ds, "k", threshold_frac=0.5) == []
