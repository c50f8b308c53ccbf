"""BPE tokenizer (M13) + dead-letter row isolation (M22)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.functions.bpe import (
    BpeTokenizer,
    bpe_tokenize,
    train_bpe,
)
from video_features_ray.stages.deadletter import isolating, split_deadletters

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "it's the fox's box, isn't it",
] * 10


def test_bpe_train_deterministic():
    m1 = train_bpe(CORPUS, num_merges=64)
    m2 = train_bpe(list(CORPUS), num_merges=64)
    assert m1 == m2 and 30 < len(m1) <= 64  # small corpus exhausts pairs early


def test_bpe_roundtrip():
    tok = BpeTokenizer(train_bpe(CORPUS, num_merges=128))
    for text in ["the quick brown fox", "lazy dog box"]:
        ids = tok.encode(text)
        assert all(isinstance(i, int) for i in ids)
        assert tok.decode(ids) == text
    # contractions split at the word regex, so decode re-spaces them —
    # same lossy behavior as the reference's `</w> → ' '` decode
    assert tok.decode(tok.encode("it's a fox")) == "it 's a fox"
    # frequent words compress to fewer tokens than characters
    assert len(tok.encode("the the the")) < len("the the the".replace(" ", ""))


def test_bpe_cache_and_vocab():
    tok = BpeTokenizer(train_bpe(CORPUS, num_merges=32))
    a = tok.encode("quick quick quick")
    b = tok.encode("quick")
    assert a == b * 3
    assert tok.vocab_size > 26


def test_bpe_encode_history_independent():
    """Token ids must not depend on an actor's encode history (the round-1
    lazy-_sid bug): two tokenizers fed different texts first still agree."""
    merges = train_bpe(CORPUS, num_merges=64)
    t1, t2 = BpeTokenizer(merges), BpeTokenizer(merges)
    t1.encode("zebra xylophone qqq unseen-symbols ###")  # pollute t1's history
    probe = "the quick brown fox over jugs"
    assert t1.encode(probe) == t2.encode(probe)
    # unknown symbols map to a stable <unk> id, never a fresh one
    v1 = t1.vocab_size
    t1.encode("ééé 中文")
    assert t1.vocab_size == v1


def test_bpe_stage_over_dataset():
    merges = train_bpe(CORPUS, num_merges=64)
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the quick fox", "lazy dog"]),
        "source": pa.array(["a", "b"]),
    })
    out = bpe_tokenize(ray.data.from_arrow(docs), merges).to_pandas()
    assert set(out.columns) == {"doc_id", "tokens", "n_tok", "source"}
    tok = BpeTokenizer(merges)
    got = list(out.sort_values("doc_id")["tokens"])
    assert list(got[0]) == tok.encode("the quick fox")
    assert list(got[1]) == tok.encode("lazy dog")


# ---------------------------------------------------------------------------
# dead letters
# ---------------------------------------------------------------------------

def _poison_fn(batch: pa.Table) -> pa.Table:
    """Fails whenever the batch contains doc 'bad'."""
    ids = batch["doc_id"].to_pylist()
    if "bad" in ids:
        raise ValueError("poison row")
    return batch.append_column("ok", pa.array([1] * len(batch), pa.int64()))


def test_isolating_bisects_poison_rows():
    t = pa.table({"doc_id": pa.array([f"d{i}" for i in range(10)] + ["bad"] + [f"e{i}" for i in range(5)])})
    wrapped = isolating(_poison_fn, "poison_stage")
    out = wrapped(t)
    good = out.filter(pa.compute.is_null(out["_error"]))
    dead = out.filter(pa.compute.is_valid(out["_error"]))
    assert len(good) == 15 and len(dead) == 1
    assert dead["doc_id"][0].as_py() == "bad"
    assert "poison row" in dead["_error"][0].as_py()


def test_split_deadletters_dataset():
    # local def → cloudpickle by-value, importable-free on workers
    def poison(batch: pa.Table) -> pa.Table:
        if "bad" in batch["doc_id"].to_pylist():
            raise ValueError("poison row")
        return batch.append_column("ok", pa.array([1] * len(batch), pa.int64()))

    t = pa.table({"doc_id": pa.array(["a", "bad", "b", "c"])})
    ds = ray.data.from_arrow(t).map_batches(isolating(poison), batch_format="pyarrow")
    good, dead = split_deadletters(ds)
    g = good.to_pandas()
    d = dead.to_pandas()
    assert sorted(g["doc_id"]) == ["a", "b", "c"]
    assert "_error" not in g.columns
    assert list(d["doc_id"]) == ["bad"]


def test_isolating_zero_overhead_happy_path():
    t = pa.table({"doc_id": pa.array(["a", "b"])})
    calls = []

    def f(b):
        calls.append(len(b))
        return b

    isolating(f)(t)
    assert calls == [2]  # single call, no bisection
