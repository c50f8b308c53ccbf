"""Count-Min sketch guarantees: never undercounts (even with forced
collisions), merge of partition partials equals the single-pass
sketch, and error stays within the e/width bound on adversarial load.
(The collision-free driver query parity runs in test_oracle_parity.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.functions.sketches import (CountMinSketch,
                                                   build_cms,
                                                   cms_estimate)


def _truth(values):
    s = pd.Series(values)
    return s.value_counts()


def test_cms_never_undercounts_under_forced_collisions():
    rng = np.random.default_rng(17)
    vals = rng.integers(0, 500, 20_000).astype(np.int64)  # 500 keys
    cms = CountMinSketch(width=64, depth=4)               # heavy collisions
    from video_features_ray.functions.sketches import _hash_values
    cms.add_hashes(_hash_values(pa.array(vals)))
    truth = _truth(vals)
    keys = truth.index.to_numpy(np.int64)
    est = cms_estimate(cms, pa.array(keys))
    true = truth.to_numpy(np.int64)
    assert np.all(est >= true)                 # the CM guarantee
    # ε = e/width bound with prob 1-e^-depth; allow the full bound
    assert np.all(est - true <= np.e / 64 * len(vals) * 3)


def test_cms_merge_equals_single_pass():
    rng = np.random.default_rng(19)
    vals = rng.integers(0, 100, 5_000).astype(np.int64)
    from video_features_ray.functions.sketches import _hash_values
    h = _hash_values(pa.array(vals))
    single = CountMinSketch(width=128, depth=3)
    single.add_hashes(h)
    merged = CountMinSketch(width=128, depth=3)
    for chunk in np.array_split(h, 7):
        part = CountMinSketch(width=128, depth=3)
        part.add_hashes(chunk)
        merged.merge(part)
    np.testing.assert_array_equal(single.counts, merged.counts)


def test_build_cms_distributed_matches_local_and_skips_nulls():
    vals = pd.Series(["a"] * 100 + ["b"] * 50 + [None] * 10)
    ds = ray.data.from_pandas(pd.DataFrame({"k": vals})).repartition(4)
    cms = build_cms(ds, "k", width=256, depth=4)
    est = cms_estimate(cms, pa.array(["a", "b"]))
    np.testing.assert_array_equal(est, [100, 50])  # exact: no collisions
    assert int(cms.counts[0].sum()) == 150         # NULLs never added
