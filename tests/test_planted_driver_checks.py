"""The minhash/simhash driver queries must measure planted recall
(round-3 verdict item 3): 20 deterministic near-copies are planted and
the row count equals the number recovered — pinned here at 20/20."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_minhash_query_counts_planted_recall():
    from video_features_ray.pipelines.queries import q_minhash_neardup

    df = q_minhash_neardup(SF).to_pandas()
    assert len(df) == 20
    pairs = {(str(a), str(b)) for a, b in zip(df["id_a"], df["id_b"])}
    srcs = {a.replace("_dup", "") if a.endswith("_dup") else a for a, _ in pairs}
    assert srcs == {str(i) for i in range(20)}


def test_simhash_query_counts_planted_recall():
    from video_features_ray.pipelines.queries import q_simhash

    df = q_simhash(SF).to_pandas()
    assert len(df) == 20
    assert (df["hamming"] <= 7).all()


def test_simhash_band_pigeonhole_complete():
    """Any pair within Hamming ≤ bands-1 MUST be recovered (pigeonhole):
    construct docs whose sketches differ by exactly k bits via text
    edits and check none below the bound is missed."""
    from video_features_ray.stages.dedup import (
        batch_simhash64, _popcount64, simhash_neardup_candidates)

    rng = np.random.default_rng(31)
    words = "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp".split()
    ids, texts = [], []
    truth = []
    made = 0
    i = 0
    while made < 12 and i < 400:
        i += 1
        base = " ".join(rng.choice(words, size=50))
        edit = base[:-1] + "#"
        h = _popcount64(batch_simhash64(pa.array([base, edit]))[:1]
                        ^ batch_simhash64(pa.array([base, edit]))[1:])[0]
        if h > 7:
            continue
        a, b = f"s{made:03d}a", f"s{made:03d}b"
        ids += [a, b]
        texts += [base, edit]
        truth.append((a, b))
        made += 1
    assert made == 12
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(3)
    out = simhash_neardup_candidates(ds, bands=8, hamming_max=7).to_pandas()
    got = {tuple(sorted(p)) for p in zip(out["id_a"], out["id_b"])}
    for p in truth:
        assert tuple(sorted(p)) in got, p
