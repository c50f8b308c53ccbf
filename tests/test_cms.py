"""Count-Min sketch guarantees (the point-estimate surface around the
existing mergeable sketch): never undercounts even with forced
collisions, partition partials merge to the single-pass sketch, error
stays within the e/width bound, NULLs are skipped.  Also the image
dHash near-dup planted test (shares the banded-Hamming machinery).
(The collision-free driver query parity runs in test_oracle_parity.)"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.functions.sketches import (CountMinSketch,
                                                   _hash_values,
                                                   cms_counts,
                                                   cms_estimate)


def _truth(values):
    s = pd.Series(values)
    return s.value_counts()


def test_cms_never_undercounts_under_forced_collisions():
    rng = np.random.default_rng(17)
    vals = rng.integers(0, 500, 20_000).astype(np.int64)  # 500 keys
    cms = CountMinSketch(width=64, depth=4)               # heavy collisions
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
    h = _hash_values(pa.array(vals))
    single = CountMinSketch(width=128, depth=3)
    single.add_hashes(h)
    merged = CountMinSketch(width=128, depth=3)
    for chunk in np.array_split(h, 7):
        part = CountMinSketch(width=128, depth=3)
        part.add_hashes(chunk)
        merged = merged.merge(part)
    np.testing.assert_array_equal(single.counts, merged.counts)
    assert merged.n == single.n


def test_cms_counts_distributed_matches_local_and_skips_nulls():
    vals = pd.Series(["a"] * 100 + ["b"] * 50 + [None] * 10)
    ds = ray.data.from_pandas(pd.DataFrame({"k": vals})).repartition(4)
    cms = cms_counts(ds, "k", width=256, depth=4)
    est = cms_estimate(cms, pa.array(["a", "b"]))
    np.testing.assert_array_equal(est, [100, 50])  # exact: no collisions
    assert cms.n == 150                            # NULLs never added


def test_image_dhash_neardup_planted_pairs():
    """Planted image near-dups (tiny noise on a copy) are found by the
    banded-Hamming plan with recall 1.0; unrelated images are not
    paired at hamming_max=3."""
    from video_features_ray.stages.multimodal import (encode_ppm,
                                                      image_neardup_candidates)

    rng = np.random.default_rng(23)
    rows = []
    for i in range(12):
        base = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        rows.append((f"img{i:03d}", encode_ppm(base)))
        if i < 4:  # planted near-dup: copy + faint noise
            noisy = np.clip(base.astype(np.int16)
                            + rng.integers(-2, 3, base.shape), 0,
                            255).astype(np.uint8)
            rows.append((f"img{i:03d}_dup", encode_ppm(noisy)))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows]),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
        "media_type": pa.array(["image"] * len(rows))})
    ds = ray.data.from_arrow(tbl).repartition(3)
    pairs = image_neardup_candidates(ds, hamming_max=3).to_pandas()
    got = {tuple(sorted((a, b)))
           for a, b in zip(pairs["id_a"], pairs["id_b"])}
    want = {(f"img{i:03d}", f"img{i:03d}_dup") for i in range(4)}
    missing = {p for p in want
               if _dhash_dist(rows, p) <= 3} - got   # pigeonhole: must find
    assert not missing
    # no unrelated pair sneaks under the verify threshold
    for a, b in got - want:
        assert _dhash_dist(rows, (a, b)) <= 3


def _dhash_dist(rows, pair):
    from video_features_ray.stages.multimodal import decode_ppm, dhash64
    d = dict(rows)
    h = [int(dhash64(decode_ppm(d[p]))) for p in pair]
    return bin(h[0] ^ h[1]).count("1")
