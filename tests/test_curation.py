"""Curation-family operator tests: planted recall, exactness edges, and
scale-shape invariants (output identical under different partitioning).

The SQL-vs-Ray parity for the five oracled queries lives in
test_oracle_parity.py (auto-discovered); here we pin the behaviors SQL
can't see: Bloom no-false-negatives, semantic-dedup planted recall,
unknown-source fail-loud, budget boundary ties, and batch-boundary
independence of the per-doc n-gram kernels.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data

from video_features_ray.stages.curation import (
    bloom_new_docs,
    collect_benchmark_ngrams,
    contamination_check,
    mixture_sample,
    ngram_repetition,
    semantic_dedup,
    token_budget_select,
)


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


# ---------------------------------------------------------------- repetition

def test_ngram_repetition_edges(ray_session):
    texts = ["a b a b a",      # top2 'a b' x2 of 4; dup3: 'a b a' x2 of 3
             "x y z",          # no repeats
             "a",              # too short for any gram
             "",               # split(' ') of '' is one empty word
             "q q q q"]        # total repetition
    out = (ngram_repetition(ray.data.from_arrow(_docs(texts)))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "top2"] == 2 and out.loc[0, "n2"] == 4
    assert out.loc[0, "dup3"] == 1 and out.loc[0, "n3"] == 3
    assert out.loc[1, "dup3_frac"] == 0.0
    # short docs: exact zeros, never NaN
    assert (out.loc[2:3, ["n2", "n3", "top2_frac", "dup3_frac"]]
            .to_numpy() == 0).all()
    assert out.loc[4, "top2_frac"] == 1.0 and out.loc[4, "dup3_frac"] == 0.5


def test_ngram_repetition_partition_independent(ray_session):
    """Per-doc stats must not depend on how docs batch together (the
    dictionary codes are per-batch; results must be batch-invariant)."""
    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice(list("abcdef"), size=rng.integers(1, 40)))
             for _ in range(120)]
    tbl = _docs(texts)
    one = (ngram_repetition(ray.data.from_arrow(tbl))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = (ngram_repetition(ray.data.from_arrow(tbl).repartition(13))
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)


# ------------------------------------------------------------ contamination

def test_contamination_planted(ray_session):
    bench_texts = ["the quick brown fox jumps", "pack my box with jugs"]
    bench = ray.data.from_arrow(_docs(bench_texts, ids=[0, 50]))
    grams = collect_benchmark_ngrams(bench, n=3)
    scored_texts = [
        "the quick brown fox jumps",       # full copy -> frac 1.0
        "alpha beta the quick brown fox",  # partial overlap
        "totally different words here now",
    ]
    scored = ray.data.from_arrow(_docs(scored_texts, ids=[1, 2, 3]))
    out = (contamination_check(scored, grams, n=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "contam_frac"] == 1.0 and out.loc[0, "contaminated"] == 1
    assert 0.0 < out.loc[1, "contam_frac"] < 1.0
    assert out.loc[2, "n_hit"] == 0 and out.loc[2, "contaminated"] == 0


def test_contamination_drops_gramless_docs(ray_session):
    grams = frozenset({"a b c"})
    out = contamination_check(
        ray.data.from_arrow(_docs(["a b", "a b c d"])), grams, n=3
    ).to_pandas()
    assert set(out["doc_id"]) == {1}


# ------------------------------------------------------------------- bloom

def test_bloom_new_docs_exact_under_heavy_fp(ray_session):
    """With a deliberately tiny filter (high false-positive rate) the
    output must STILL be exact anti-join semantics — false positives
    only cost shuffle, never correctness."""
    rng = np.random.default_rng(5)
    corpus_texts = [f"doc {i} " + " ".join(
        rng.choice(list("xyz"), size=5)) for i in range(0, 100, 5)]
    new_texts, new_ids, dup_ids = [], [], set()
    for i in range(100):
        if i % 5 == 0:
            continue
        if i % 7 == 0:  # planted exact duplicate of a corpus doc
            new_texts.append(corpus_texts[(i // 5)])
            dup_ids.add(i)
        else:
            new_texts.append(f"new {i} unique")
        new_ids.append(i)
    corpus = ray.data.from_arrow(
        _docs(corpus_texts, ids=list(range(0, 100, 5))))
    new = ray.data.from_arrow(_docs(new_texts, ids=new_ids))
    out = bloom_new_docs(new, corpus, n_bits=64, num_buckets=4).to_pandas()
    assert set(out["doc_id"]) == set(new_ids) - dup_ids


# ------------------------------------------------------------ token budget

def test_token_budget_boundary_and_ties(ray_session):
    # five docs of 10 words each, budget 50% = 25 words -> exactly 2 docs
    texts = [" ".join(["w"] * 10) for _ in range(5)]
    out = (token_budget_select(ray.data.from_arrow(_docs(texts, ids=[3, 1, 4, 2, 5])),
                               budget_frac=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # equal n_words -> doc_id ASC tie-break: ids 1 and 2 selected
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["cum_words"]) == [10, 20]


def test_token_budget_partition_independent(ray_session):
    rng = np.random.default_rng(4)
    texts = [" ".join(rng.choice(list("ab"), size=rng.integers(1, 30)))
             for _ in range(200)]
    tbl = _docs(texts, ids=list(range(1, 201)))
    a = (token_budget_select(ray.data.from_arrow(tbl), 0.3)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (token_budget_select(ray.data.from_arrow(tbl).repartition(17), 0.3,
                             num_id_buckets=5)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------- mixture

def test_mixture_sample_unknown_source_dropped(ray_session):
    tbl = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                    "source": pa.array(["known"] * 50 + ["typo"] * 50)})
    out = mixture_sample(ray.data.from_arrow(tbl),
                         {"known": 10000}).to_pandas()
    assert set(out["source"]) == {"known"} and len(out) == 50


def test_mixture_sample_stability_under_repartition(ray_session):
    tbl = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                    "source": pa.array([f"s{i % 3}" for i in range(500)])})
    rates = {"s0": 2500, "s1": 5000, "s2": 7500}
    a = set(mixture_sample(ray.data.from_arrow(tbl), rates)
            .to_pandas()["doc_id"])
    b = set(mixture_sample(ray.data.from_arrow(tbl).repartition(11), rates)
            .to_pandas()["doc_id"])
    assert a == b


# ---------------------------------------------------------- semantic dedup

def test_semantic_dedup_planted(ray_session):
    rng = np.random.default_rng(0)
    dim = 16
    base = rng.standard_normal((40, dim)).astype(np.float32) * 5
    rows, ids, losers = [], [], set()
    vid = 0
    for i, b in enumerate(base):
        rows.append(b)
        ids.append(vid)
        vid += 1
        if i % 4 == 0:  # plant 10 near-copies right after their source
            rows.append(b + rng.standard_normal(dim).astype(np.float32) * .01)
            losers.add(vid)
            ids.append(vid)
            vid += 1
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              pa.list_(pa.float32()))})
    surv = semantic_dedup(ray.data.from_arrow(tbl), dim=dim, n_clusters=4,
                          tau=0.99).to_pandas()
    assert set(ids) - set(surv["vec_id"]) == losers
    # survivors keep their cluster assignment column
    assert set(surv.columns) == {"vec_id", "cluster"}


# ------------------------------------------------------------------- pivot

def test_pivot_counts_frozen_vocab(ray_session):
    from video_features_ray.stages.features import pivot_counts

    tbl = pa.table({
        "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "zz", "a"])})
    out = (pivot_counts(ray.data.from_arrow(tbl), "user_id", "event_type",
                        ["a", "b", "c"], num_buckets=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # frozen vocab: 'c' present as a zero column, unseen 'zz' ignored
    # but still counted in n_total
    assert list(out.columns) == ["user_id", "n_total", "n_a", "n_b", "n_c"]
    assert out.loc[0].tolist() == [1, 2, 1, 1, 0]
    assert out.loc[1].tolist() == [2, 3, 2, 0, 0]


# ------------------------------------------------------ composed curation

def test_curate_equals_component_composition(ray_session):
    """The fused curation pipeline must be bit-equal to running the
    component operators one after another."""
    from video_features_ray.stages.curation import curate

    rng = np.random.default_rng(21)
    texts, ids = [], []
    for i in range(150):
        nw = int(rng.integers(5, 60))
        texts.append(" ".join(rng.choice(list("abcdefgh"), size=nw)))
        ids.append(i)
    tbl = _docs(texts, ids=ids)
    bench = ray.data.from_arrow(tbl).filter(lambda r: r["doc_id"] % 50 == 0)
    grams = collect_benchmark_ngrams(bench, n=3)
    scored_tbl = tbl.filter(
        pa.array([i % 50 != 0 for i in ids]))
    scored = ray.data.from_arrow(scored_tbl)

    fused = (curate(scored, grams, min_words=20, max_dup3_frac=0.2,
                    budget_frac=0.5, n_docs=150)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))

    # composition: repetition stats + contamination + budget select
    rep = ngram_repetition(scored).to_pandas().set_index("doc_id")
    con = (contamination_check(scored, grams, n=3)
           .to_pandas().set_index("doc_id"))
    keep_ids = []
    for i in scored_tbl["doc_id"].to_pylist():
        nw = len(scored_tbl["text"][
            scored_tbl["doc_id"].to_pylist().index(i)].as_py().split(" "))
        r = rep.loc[i]
        ok = (nw >= 20 and float(r["dup3"]) <= float(r["n3"]) * 0.2)
        if i in con.index:
            c = con.loc[i]
            ok = ok and (int(c["n_hit"]) * 5 < int(c["n_grams"]) * 1)
        if ok:
            keep_ids.append(i)
    keep_tbl = scored_tbl.filter(
        pa.array([i in set(keep_ids)
                  for i in scored_tbl["doc_id"].to_pylist()]))
    want = (token_budget_select(ray.data.from_arrow(keep_tbl), 0.5,
                                n_docs=150)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(fused, want)


# ------------------------------------------------------------ chunk dedup

def test_chunk_dedup_planted(ray_session):
    """Shared chunks survive only at their first (doc_id, cidx)
    occurrence; a fully-duplicated doc disappears; order is kept."""
    from video_features_ray.stages.curation import chunk_dedup

    boiler = "b0 b1 b2 b3"  # one full 4-word chunk
    texts = [
        boiler + " u0 u1 u2 u3",          # doc 0: boiler + unique
        boiler + " v0 v1 v2 v3",          # doc 1: loses its boiler copy
        boiler,                           # doc 2: fully duplicated → gone
        "w0 w1 w2 w3 " + boiler,          # doc 3: boiler at cidx 1 → gone
    ]
    out = (chunk_dedup(ray.data.from_arrow(_docs(texts)), chunk_words=4,
                       num_buckets=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 3]
    assert out.loc[0, "text"] == boiler + " u0 u1 u2 u3"
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[1, "text"] == "v0 v1 v2 v3"     # boiler removed
    assert out.loc[2, "text"] == "w0 w1 w2 w3"     # trailing boiler removed


def test_chunk_dedup_partition_invariant(ray_session):
    """Same output at any batch/bucket partitioning (the local
    pre-combine must not change winners)."""
    from video_features_ray.stages.curation import chunk_dedup

    rng = np.random.default_rng(3)
    texts = [" ".join(rng.choice(list("abcd"), size=int(rng.integers(1, 20))))
             for _ in range(60)]
    tbl = _docs(texts)

    def run(nblocks, nb):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        return (chunk_dedup(ds, chunk_words=4, num_buckets=nb)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    pd.testing.assert_frame_equal(run(1, 2), run(7, 5))


# ------------------------------------------------------- vocabulary / OOV

def test_vocab_topv_tiebreak_and_oov(ray_session):
    from video_features_ray.stages.text import fit_vocab_topv, oov_rate

    # counts: a=3, b=3, c=2, d=1 → top-2 is {a, b} (tie c<b impossible;
    # tie a/b at 3 broken word-ascending, both kept)
    texts = ["a b a", "b a b c", "c d"]
    ds = ray.data.from_arrow(_docs(texts))
    vocab = fit_vocab_topv(ds, 2, num_buckets=3)
    assert sorted(vocab) == ["a", "b"]

    out = (oov_rate(ds, vocab).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [3, 4, 2]
    assert out["n_oov"].tolist() == [0, 1, 2]
    assert out.loc[2, "oov_rate"] == 1.0


def test_oov_rate_empty_vocab(ray_session):
    import pandas as pd_
    from video_features_ray.stages.text import oov_rate

    ds = ray.data.from_arrow(_docs(["a b", "c"]))
    out = (oov_rate(ds, pd_.Index([])).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_oov"].tolist() == out["n_words"].tolist()


# ------------------------------------------------------- class balancing

def test_balanced_sample_downsamples_to_min(ray_session):
    from video_features_ray.functions.sketches import stratified_bottom_k
    from video_features_ray.stages.joins import partial_agg

    tbl = pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "lang": pa.array(["en"] * 5 + ["de"] * 3 + ["fr"] * 2)})
    ds = ray.data.from_arrow(tbl)
    counts = partial_agg(ds, ["lang"], sums=(), count_col="n",
                         num_buckets=2).to_pandas()
    k = int(counts["n"].min())
    assert k == 2
    out = stratified_bottom_k(ds, "lang", "doc_id", k=k, num_buckets=3)
    assert out.groupby("lang").size().tolist() == [2, 2, 2]


def test_chunk_dedup_local_within_doc_only(ray_session):
    """Intra-doc dedup removes repeats inside one doc but NEVER across
    docs (that's chunk_dedup's job)."""
    from video_features_ray.stages.curation import chunk_dedup_local

    rep = "r0 r1 r2 r3"
    texts = [rep + " " + rep + " u0 u1 u2 u3",  # doc 0: internal repeat
             rep]                                # doc 1: same chunk, kept
    out = (chunk_dedup_local(ray.data.from_arrow(_docs(texts)),
                             chunk_words=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0, "text"] == rep + " u0 u1 u2 u3"
    assert out.loc[0, "n_kept"] == 2
    assert out.loc[1, "text"] == rep          # cross-doc copy untouched
    assert out.loc[1, "n_kept"] == 1


def test_temperature_sample_flattens(ray_session):
    """alpha=0.5 keeps sqrt-scaled class sizes: the head class is cut
    hard, the tail class survives whole; partition-invariant."""
    from video_features_ray.stages.curation import temperature_sample

    tbl = pa.table({
        "doc_id": pa.array(list(range(120)), pa.int64()),
        "lang": pa.array(["en"] * 100 + ["de"] * 16 + ["fr"] * 4)})

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        return temperature_sample(ds, "lang", "doc_id", alpha=0.5,
                                  scale=1.0, num_buckets=3)

    out = run(1)
    sizes = out.groupby("lang").size().to_dict()
    assert sizes == {"en": 10, "de": 4, "fr": 2}  # ceil(sqrt(n))
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), run(6).reset_index(drop=True))


# ------------------------------------------------------------ n-gram novelty

def test_ngram_novelty_planted(ray_session):
    """Doc 0 owns every gram it has; doc 1 copies doc 0 (novelty 0);
    doc 2 is half copy, half fresh."""
    from video_features_ray.stages.curation import ngram_novelty

    texts = ["a b c d",            # grams: abc, bcd → owner 0
             "a b c d",            # same grams → novelty 0
             "a b c x y z",        # abc(owned by 0), bcx, cxy, xyz → 3/4
             "q"]                  # no 3-grams → no row
    out = (ngram_novelty(ray.data.from_arrow(_docs(texts)), n=3,
                         num_buckets=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["novelty"].tolist() == [1.0, 0.0, 0.75]
    assert out["n_grams"].tolist() == [2, 2, 4]
