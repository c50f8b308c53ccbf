"""Unit tests for round-4b operators: duplicated-span detection,
exact all-pairs cosine, triangle counting, shard-shuffle export,
calendar-spine densification."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.stages.graph import triangle_count
from video_features_ray.stages.spans import (
    cosine_pairs_topk,
    doc_vectors,
    dup_span_stats,
    fit_vocab,
    window_keys,
)


# ---------------------------------------------------------------- window keys
def test_window_keys_match_python_substrings():
    texts = pa.array(["abcdefg", "xyz", "abcd", "", "aaaaa"])
    keys, rows = window_keys(texts, 4)
    expect = []
    for i, t in enumerate(["abcdefg", "xyz", "abcd", "", "aaaaa"]):
        for j in range(max(len(t) - 3, 0)):
            expect.append((i, t[j:j + 4]))
    assert len(keys) == len(expect)
    # full-width compare: item access on an S array strips trailing
    # NULs, so build the expected side as an S array too (stripping is
    # injective at fixed width — two stripped-equal 16-byte keys are
    # byte-identical)
    want = np.array([np.frombuffer(sub.encode("utf-32-le"),
                                   dtype=np.uint32).astype(np.int32)
                     .tobytes() for _, sub in expect], dtype="|S16")
    assert (keys == want).all()
    assert list(rows) == [e[0] for e in expect]


def test_window_keys_injective_on_tricky_codepoints():
    # '\x00'-adjacent codepoints and multi-byte chars must not collide
    texts = pa.array(["aĀb", "ab", "abĀ", "αβγδ"])
    keys, _ = window_keys(texts, 3)
    assert len(np.unique(keys)) == len(keys)


def test_window_keys_short_rows_emit_nothing():
    keys, rows = window_keys(pa.array(["ab", "a", ""]), 3)
    assert len(keys) == 0 and len(rows) == 0


# ------------------------------------------------------------- dup span stats
def test_dup_span_stats_planted_duplicates():
    # two docs share an exact 40-char span; a third is unique
    span = "0123456789" * 4
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["AAA" + span + "BBB", "CCC" + span + "DDD",
                 "unique text " * 8],
        "source": ["s1", "s1", "s2"],
    })
    out = dup_span_stats(ray.data.from_pandas(docs), k=40, num_buckets=4)
    s1 = out[out["source"] == "s1"].iloc[0]
    s2 = out[out["source"] == "s2"].iloc[0]
    # each s1 doc has 7 positions (46-40+1); only position of the
    # exact shared span (offset 3) is duplicated in both docs
    assert s1["n_positions"] == 14
    assert s1["n_dup_positions"] == 2
    assert s2["n_dup_positions"] == 0
    assert s1["dup_frac"] == 2 / 14


def test_dup_span_stats_within_doc_repeat_not_counted():
    # a span repeated INSIDE one doc only is not a cross-doc duplicate
    t = ("Z" * 40) + "m" + ("Z" * 40)
    docs = pd.DataFrame({"doc_id": [1, 2], "text": [t, "w" * 45],
                         "source": ["a", "a"]})
    out = dup_span_stats(ray.data.from_pandas(docs), k=40, num_buckets=2)
    assert out.iloc[0]["n_dup_positions"] == 0


# ------------------------------------------------------------------- cosine
def test_cosine_pairs_matches_numpy_bruteforce():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})
    got = cosine_pairs_topk(ray.data.from_pandas(df), topk=10)

    # brute force
    terms = sorted({t for s in texts for t in s.split(" ")})
    M = np.zeros((40, len(terms)), dtype=np.int64)
    for i, s in enumerate(texts):
        for t in s.split(" "):
            M[i, terms.index(t)] += 1
    na = (M * M).sum(axis=1)
    rows = []
    for i in range(40):
        for j in range(i + 1, 40):
            dot = int(M[i] @ M[j])
            if dot > 0:
                rows.append((i, j, dot,
                             dot / np.sqrt(float(na[i] * na[j]))))
    want = (pd.DataFrame(rows, columns=["doc_a", "doc_b", "dot", "cos"])
            .sort_values(["cos", "doc_a", "doc_b"],
                         ascending=[False, True, True],
                         kind="mergesort").head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_a": np.int64, "doc_b": np.int64,
                    "dot": np.int64}), want.astype({
                        "doc_a": np.int64, "doc_b": np.int64,
                        "dot": np.int64}))


def test_doc_vectors_empty_and_null_rows():
    vocab = fit_vocab(ray.data.from_pandas(
        pd.DataFrame({"text": ["a b", "", None], "doc_id": [1, 2, 3]})))
    # '' splits to [''] (DuckDB string_split semantics); NULL -> no terms
    assert "" in vocab and "a" in vocab and "b" in vocab
    ids, mat = doc_vectors(
        pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(["a b", "", None])}), vocab)
    assert mat[0].sum() == 2
    assert mat[1].sum() == 1          # the single empty term
    assert mat[2].sum() == 0          # NULL contributes nothing


# ------------------------------------------------------------------ triangles
def test_triangle_count_known_graphs():
    # K4 has 4 triangles; adding a pendant edge changes nothing
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    e = pd.DataFrame(k4 + [(4, 9)], columns=["src", "dst"]).astype(np.int64)
    out = triangle_count(ray.data.from_pandas(e), num_buckets=4)
    assert out.iloc[0]["n_triangles"] == 4
    assert out.iloc[0]["n_edges"] == 7
    assert out.iloc[0]["n_nodes"] == 5


def test_triangle_count_triangle_free():
    # a path + a star: no triangles
    e = pd.DataFrame([(1, 2), (2, 3), (3, 4), (1, 5), (1, 6)],
                     columns=["src", "dst"]).astype(np.int64)
    out = triangle_count(ray.data.from_pandas(e), num_buckets=2)
    assert out.iloc[0]["n_triangles"] == 0


def test_triangle_count_rejects_unoriented():
    e = pd.DataFrame([(2, 1)], columns=["src", "dst"]).astype(np.int64)
    with pytest.raises(Exception):
        triangle_count(ray.data.from_pandas(e), num_buckets=2)


# ------------------------------------------------------------------- shards
def test_shuffled_shards_deterministic_and_complete(tmp_path):
    from video_features_ray.sources.sinks import write_shuffled_shards

    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "payload": np.arange(200) * 3})
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    s1 = write_shuffled_shards(ray.data.from_pandas(df), d1,
                               n_shards=8).to_pandas()
    s2 = write_shuffled_shards(ray.data.from_pandas(df), d2,
                               n_shards=8).to_pandas()
    assert s1["n_rows"].sum() == 200
    # byte-identical shard files across runs (resumability contract)
    for f in sorted(os.listdir(d1)):
        b1 = open(os.path.join(d1, f), "rb").read()
        b2 = open(os.path.join(d2, f), "rb").read()
        assert b1 == b2, f
    # every row lands in its hash shard, exactly once
    import pyarrow.parquet as pq
    seen = []
    for f in sorted(os.listdir(d1)):
        t = pq.read_table(os.path.join(d1, f))
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        shard = int(f.split("-")[1].split(".")[0])
        assert ((k * 2654435761) % 4294967296 % 8 == shard).all()
        seen.extend(k.tolist())
    assert sorted(seen) == list(range(200))


# ------------------------------------------------------------- edit distance
def test_lev_le1_scalar():
    from video_features_ray.stages.dedup import _lev_le1

    assert _lev_le1("abc", "abc")
    assert _lev_le1("abc", "abd")
    assert _lev_le1("abc", "ab")
    assert _lev_le1("abc", "abcd")
    assert _lev_le1("abc", "xabc")
    assert not _lev_le1("abc", "adc_")
    assert not _lev_le1("abc", "cba")
    assert not _lev_le1("abc", "a")


def test_edit1_pairs_matches_bruteforce():
    from video_features_ray.stages.dedup import _lev_le1, edit1_pairs

    rng = np.random.default_rng(3)
    alphabet = list("abcd")
    names = ["".join(rng.choice(alphabet, size=rng.integers(3, 7)))
             for _ in range(120)]
    df = pd.DataFrame({"id": np.arange(120, dtype=np.int64),
                       "name": names})
    got = (edit1_pairs(ray.data.from_pandas(df), key_col="id",
                       text_col="name", num_buckets=4)
           .to_pandas().sort_values(["ka", "kb"])
           .reset_index(drop=True))
    want = sorted((i, j) for i in range(120) for j in range(i + 1, 120)
                  if _lev_le1(names[i], names[j]))
    assert list(map(tuple, got[["ka", "kb"]].to_numpy())) == want
    assert len(want) > 0          # fixture actually exercises pairs


# -------------------------------------------------------------------- k-core
def test_k_core_planted_clique():
    from video_features_ray.stages.graph import k_core

    # K6 on nodes 0..5 (every node degree 5) + a long path of pendants
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    path = [(10 + i, 11 + i) for i in range(20)] + [(5, 10)]
    e = pd.DataFrame(k6 + path, columns=["src", "dst"]).astype(np.int64)
    core, rounds, n_nodes = k_core(ray.data.from_pandas(e), k=5,
                                   num_buckets=4, local_finish=0)
    got = (core.to_pandas().sort_values(["src", "dst"])
           .reset_index(drop=True))
    assert n_nodes == 6
    assert list(map(tuple, got.to_numpy())) == k6
    assert rounds >= 2


def test_k_core_tree_has_empty_2core():
    from video_features_ray.stages.graph import k_core

    # a tree peels to nothing at k=2 (needs several rounds)
    e = pd.DataFrame([(1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (3, 7)],
                     columns=["src", "dst"]).astype(np.int64)
    core, rounds, n_nodes = k_core(ray.data.from_pandas(e), k=2,
                                   num_buckets=2, local_finish=0)
    assert n_nodes == 0
    assert core.count() == 0
    assert rounds > 2


def test_k_core_whole_graph_is_core():
    from video_features_ray.stages.graph import k_core

    # a cycle IS its own 2-core: one round, nothing peeled
    e = pd.DataFrame([(1, 2), (2, 3), (3, 4), (1, 4)],
                     columns=["src", "dst"]).astype(np.int64)
    core, rounds, n_nodes = k_core(ray.data.from_pandas(e), k=2,
                                   num_buckets=2, local_finish=0)
    assert n_nodes == 4 and rounds == 1 and core.count() == 4


def test_k_core_local_finish_equivalent():
    from video_features_ray.stages.graph import k_core

    rng = np.random.default_rng(11)
    raw = {(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2))
           if a != b}
    e = pd.DataFrame(sorted((min(a, b), max(a, b)) for a, b in raw),
                     columns=["src", "dst"]).drop_duplicates()
    e = e.astype(np.int64)
    c1, _, n1 = k_core(ray.data.from_pandas(e), k=4, num_buckets=4,
                       local_finish=0)
    c2, _, n2 = k_core(ray.data.from_pandas(e), k=4, num_buckets=4,
                       local_finish=10_000)
    p1 = (c1.to_pandas().sort_values(["src", "dst"])
          .reset_index(drop=True))
    p2 = (c2.to_pandas().sort_values(["src", "dst"])
          .reset_index(drop=True))
    assert n1 == n2
    pd.testing.assert_frame_equal(p1, p2)


def test_k_core_max_iter_exhaustion_forces_fixpoint():
    from video_features_ray.stages.graph import k_core

    # a long path at k=2 peels ~2 nodes per distributed round; with
    # max_iter too small the peel MUST force the single-task finish
    # and still return the true (empty) 2-core, not a partial graph
    e = pd.DataFrame([(i, i + 1) for i in range(30)],
                     columns=["src", "dst"]).astype(np.int64)
    core, rounds, n_nodes = k_core(ray.data.from_pandas(e), k=2,
                                   num_buckets=2, max_iter=3,
                                   local_finish=0)
    assert n_nodes == 0 and core.count() == 0
    assert rounds == 4          # 3 distributed + 1 forced local finish


def test_k_core_default_local_finish_engages():
    from video_features_ray.stages.graph import k_core

    # with the default threshold a small graph takes ONE local round
    e = pd.DataFrame([(1, 2), (2, 3), (3, 4), (4, 5)],
                     columns=["src", "dst"]).astype(np.int64)
    core, rounds, n_nodes = k_core(ray.data.from_pandas(e), k=2,
                                   num_buckets=2)
    assert rounds == 1 and n_nodes == 0 and core.count() == 0


# ------------------------------------------- dup span stats: round-5 modes
def test_dup_span_stats_hashed_equals_exact_keys():
    # the 128-bit hashed-key scale path must be output-identical to the
    # injective |S160 raw-key path on a real mixed corpus
    rng = np.random.default_rng(5)
    base = "the quick brown fox jumps over the lazy dog 0123456789 "
    span = "SHARED-SPAN-" + "x" * 50
    texts, srcs = [], []
    for i in range(60):
        t = "".join(rng.choice(list("abcdef ghij"), size=rng.integers(20, 120)))
        if i % 7 == 0:
            t = t[:10] + span + t[10:]
        if i % 11 == 0:
            t = base + t
        texts.append(t)
        srcs.append(f"s{i % 3}")
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts, "source": srcs})
    a = dup_span_stats(ray.data.from_pandas(docs), k=40, num_buckets=4,
                       hashed_keys=True)
    b = dup_span_stats(ray.data.from_pandas(docs), k=40, num_buckets=4,
                       hashed_keys=False)
    pd.testing.assert_frame_equal(a, b)
    assert a["n_dup_positions"].sum() > 0       # fixture has real dups


def test_dup_span_stats_null_group_distinct_from_empty():
    # SQL GROUP BY keeps NULL as its own group, distinct from ''
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a" * 45, "b" * 45, "c" * 45],
        "source": ["", None, ""]})
    out = dup_span_stats(ray.data.from_pandas(docs), k=40, num_buckets=2)
    assert len(out) == 2
    empties = out[out["source"] == ""]
    assert len(empties) == 1 and empties.iloc[0]["n_positions"] == 12
    nulls = out[out["source"].isna()]
    assert len(nulls) == 1 and nulls.iloc[0]["n_positions"] == 6


def test_dup_span_stats_winnow_detects_long_spans():
    # winnowing guarantee: spans of length >= k + w - 1 shared by two
    # docs are ALWAYS detected through the selected fingerprints
    k, w = 20, 8
    span = "SHARED" * 10                       # 60 chars >= k + w - 1
    rng = np.random.default_rng(9)

    def noise(n):
        return "".join(rng.choice(list("abcdefghij"), size=n))

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [noise(30) + span + noise(25),
                 noise(40) + span + noise(15),
                 noise(90)],
        "source": ["dup", "dup", "clean"]})
    out = dup_span_stats(ray.data.from_pandas(docs), k=k, num_buckets=2,
                         winnow_w=w)
    dup = out[out["source"] == "dup"].iloc[0]
    clean = out[out["source"] == "clean"].iloc[0]
    assert dup["n_dup_positions"] > 0          # guarantee held
    assert clean["n_dup_positions"] == 0
    # winnowing selects ~2/(w+1) of positions: far fewer than all
    full = dup_span_stats(ray.data.from_pandas(docs), k=k,
                          num_buckets=2)
    assert dup["n_positions"] < 0.6 * full[
        full["source"] == "dup"].iloc[0]["n_positions"]


def test_cosine_pairs_matrix_budget_guard():
    df = pd.DataFrame({"doc_id": np.arange(50, dtype=np.int64),
                       "text": [f"w{i} w{i + 1} w{i + 2}"
                                for i in range(50)]})
    with pytest.raises(ValueError, match="matrix"):
        cosine_pairs_topk(ray.data.from_pandas(df), topk=5,
                          matrix_budget=100)
