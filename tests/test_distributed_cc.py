"""Distributed connected components (round-3 verdict item 2): the
hash-to-min Dataset implementation must agree with the driver
union-find on arbitrary graphs, converge on long chains (multi-round),
and survive an adversarial corpus where MOST docs are near-dups —
without the driver ever holding the pair set."""

import pytest
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from video_features_ray.stages.dedup import (
    cluster_pairs,
    cluster_pairs_distributed,
    jaccard_verify_joined,
    minhash_lsh_candidates,
    neardup_dedup,
)


def _cc_maps_equal(pairs_df: pd.DataFrame):
    want = cluster_pairs(pairs_df)
    want_map = dict(zip(want["doc_id"], want["root"]))
    want_losers = {k: v for k, v in want_map.items() if k != v}
    got = cluster_pairs_distributed(
        ray.data.from_pandas(pairs_df).repartition(4), num_buckets=8).to_pandas()
    got_map = dict(zip(got["doc_id"], got["root"]))
    assert got_map == want_losers, (got_map, want_losers)


@pytest.mark.slow
def test_cc_random_graphs_match_union_find():
    rng = np.random.default_rng(17)
    for trial in range(3):
        n_edges = 300
        a = rng.integers(0, 120, n_edges)
        b = rng.integers(0, 120, n_edges)
        df = pd.DataFrame({"id_a": [f"n{x:04d}" for x in a],
                           "id_b": [f"n{x:04d}" for x in b]})
        df = df[df["id_a"] != df["id_b"]].drop_duplicates()
        _cc_maps_equal(df)


def test_cc_long_chain_converges():
    """A 200-node path graph needs multiple hash-to-min rounds — the
    log-round pointer behavior, not one-hop propagation."""
    n = 200
    df = pd.DataFrame({"id_a": [f"c{i:04d}" for i in range(n - 1)],
                       "id_b": [f"c{i + 1:04d}" for i in range(n - 1)]})
    got = cluster_pairs_distributed(
        ray.data.from_pandas(df).repartition(4), num_buckets=8).to_pandas()
    assert len(got) == n - 1
    assert (got["root"] == "c0000").all()


def test_cc_star_and_isolated_pairs():
    df = pd.DataFrame({
        "id_a": ["h", "h", "h", "p1", "q9"],
        "id_b": ["x", "y", "z", "p2", "q1"],
    })
    _cc_maps_equal(df)


def _boilerplate_corpus(n_clusters=40, cluster_size=6, n_unique=20, seed=23):
    """>50% of docs are near-dups: n_clusters templates, each with
    cluster_size light edits; plus a few unique docs."""
    rng = np.random.default_rng(seed)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo "
             "sierra tango uniform victor whiskey xray yankee zulu").split()
    ids, texts = [], []
    truth = {}  # doc -> cluster min id
    for c in range(n_clusters):
        base = " ".join(rng.choice(words, size=80))
        members = []
        for m in range(cluster_size):
            w = base.split()
            w[-1 - m] = f"edit{m}"          # one-word edit → Jaccard ≥ 0.9
            ids.append(f"c{c:03d}m{m}")
            texts.append(" ".join(w))
            members.append(f"c{c:03d}m{m}")
        root = min(members)
        for m in members:
            truth[m] = root
    for u in range(n_unique):
        ids.append(f"u{u:04d}")
        texts.append(" ".join(rng.choice(words, size=80)))
    return pd.DataFrame({"doc_id": ids, "text": texts}), truth


@pytest.mark.slow
def test_adversarial_majority_neardup_corpus():
    """240 of 260 docs are near-dups (>50%): the composed pipeline must
    still collapse every cluster to its min id, entirely distributed."""
    df, truth = _boilerplate_corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    losers = neardup_dedup(ds, threshold=0.7, concurrency=(1, 2),
                           num_buckets=8).to_pandas()
    got = dict(zip(losers["doc_id"], losers["keep_id"]))
    roots = {v for v in truth.values()}
    for doc, root in truth.items():
        if doc == root:
            assert doc not in got, f"winner {doc} marked loser"
        else:
            assert got.get(doc) == root, (doc, got.get(doc), root)
    # unique docs never appear
    assert not {k for k in got if k.startswith("u")}
    # loser count is exactly clusters × (size-1)
    assert len(got) == len(truth) - len(roots)


def test_jaccard_verify_joined_matches_broadcast_stage():
    from video_features_ray.stages.dedup import jaccard_verify_stage

    df, _ = _boilerplate_corpus(n_clusters=10, cluster_size=3, n_unique=5)
    ds = ray.data.from_pandas(df).repartition(4)
    cand = minhash_lsh_candidates(ds, num_perm=64, bands=16,
                                  concurrency=(1, 2)).materialize()
    joined = jaccard_verify_joined(cand, ds, threshold=0.7,
                                   num_buckets=8).to_pandas()
    broad = jaccard_verify_stage(cand, df, threshold=0.7,
                                 concurrency=(1, 2)).to_pandas()

    def norm(d):
        return (d.sort_values(["id_a", "id_b"], kind="mergesort")
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(norm(joined), norm(broad))
