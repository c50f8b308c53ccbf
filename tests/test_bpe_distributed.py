"""Distributed BPE training (round-3 verdict item 7): merges must be
identical to the single-process trainer on the fixture corpus, at two
input partitionings (the cluster-width determinism requirement)."""

import pandas as pd
import ray.data

from video_features_ray.functions.bpe import (
    BpeTokenizer,
    train_bpe,
    train_bpe_distributed,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps under the warm sun",
    "a lazy dog and a quick cat share the brown rug",
    "quick quick quick brown brown the the the dog",
    "don't stop the running, it's the runner's run 42 times",
    "",
] * 4


def test_distributed_merges_match_single_process():
    want = train_bpe(CORPUS, num_merges=16)
    ds = ray.data.from_pandas(pd.DataFrame({"text": CORPUS})).repartition(4)
    got = train_bpe_distributed(ds, num_merges=16)
    assert got == want


def test_distributed_merges_partition_invariant():
    ds2 = ray.data.from_pandas(pd.DataFrame({"text": CORPUS})).repartition(2)
    ds8 = ray.data.from_pandas(pd.DataFrame({"text": CORPUS})).repartition(8)
    m2 = train_bpe_distributed(ds2, num_merges=12)
    m8 = train_bpe_distributed(ds8, num_merges=12)
    assert m2 == m8
    # and the learned table encodes identically
    t2, t8 = BpeTokenizer(m2), BpeTokenizer(m8)
    for s in CORPUS:
        assert t2.encode(s) == t8.encode(s)


def test_distributed_early_stop_on_exhausted_pairs():
    tiny = ["ab", "ab", "ab"]
    want = train_bpe(tiny, num_merges=50)   # exhausts merges early
    ds = ray.data.from_pandas(pd.DataFrame({"text": tiny}))
    got = train_bpe_distributed(ds, num_merges=50)
    assert got == want
