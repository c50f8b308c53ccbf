"""Dedup / similarity / text-analysis / multimodal plumbing tests."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.stages.dedup import (
    MinHasher,
    _shingle_hashes,
    add_simhash,
    embedding_neardup_candidates,
    exact_dedup,
    jaccard_verify_pairs,
    minhash_lsh_candidates,
    simhash64,
)
from video_features_ray.stages.multimodal import (
    MediaDecoder,
    decode_pipeline,
    synthetic_media_table,
)
from video_features_ray.stages.similarity import (
    build_ivf_codebook,
    cosine_topk,
    ivf_assign,
    ivf_topk,
)
from video_features_ray.stages.text import LangId, fingerprint, quality_score, token_stats


def docs_table():
    base = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about ray data pipelines",
        "der hund und die katze sind nicht ein fisch",
        "le chat et le chien dans la maison pour que",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "short",
        "",
    ]
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(base))]),
            "text": pa.array(base),
            "source": pa.array(["web"] * len(base)),
        }
    )


def test_exact_dedup():
    t = docs_table()
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 7  # 8 docs, one exact dup pair
    dup = out[out["n_dupes"] == 2]
    assert len(dup) == 1 and dup.iloc[0]["keep_id"] == "d0"
    h = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert dup.iloc[0]["content_hash"] == h


def test_minhash_lsh_finds_near_dups():
    t = docs_table()
    cands = minhash_lsh_candidates(
        ray.data.from_arrow(t), num_perm=64, bands=16, concurrency=2
    ).to_pandas()
    pairs = set(zip(cands["id_a"], cands["id_b"]))
    assert ("d0", "d5") in pairs  # exact dup always collides
    assert ("d0", "d1") in pairs or ("d1", "d5") in pairs  # near dup
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    verified = jaccard_verify_pairs(cands, texts, threshold=0.5)
    vpairs = set(zip(verified["id_a"], verified["id_b"]))
    assert ("d0", "d5") in vpairs
    assert all(j >= 0.5 for j in verified["jaccard"])


def test_minhash_jaccard_estimate():
    """Minhash signature agreement ≈ true Jaccard."""
    mh = MinHasher(num_perm=256)
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    b = "the quick brown fox jumps over the lazy cat and runs away fast"
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    ha, hb = set(_shingle_hashes(a).tolist()), set(_shingle_hashes(b).tolist())
    true_j = len(ha & hb) / len(ha | hb)
    assert abs(est - true_j) < 0.15


def test_simhash_near_dup_closer_than_random():
    t = docs_table()
    out = add_simhash(t).to_pandas()
    sh = dict(zip(out["doc_id"], out["simhash"]))
    def hamming(x, y):
        return bin(int(x) ^ int(y)).count("1")
    assert hamming(sh["d0"], sh["d5"]) == 0
    assert hamming(sh["d0"], sh["d1"]) < hamming(sh["d0"], sh["d2"])
    assert simhash64("the quick brown fox jumps over the lazy dog") == sh["d0"]


def _emb_table(n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    mat[17] = mat[3] + rng.standard_normal(dim).astype(np.float32) * 0.01  # planted near-dup
    flat = mat.reshape(-1)
    off = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
    emb = pa.ListArray.from_arrays(pa.array(off, pa.int32()), pa.array(flat, pa.float32()))
    return pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)), "embedding": emb}), mat


def test_embedding_neardup():
    t, mat = _emb_table()
    out = embedding_neardup_candidates(
        ray.data.from_arrow(t), dim=16, num_planes=8, cosine_threshold=0.99
    ).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (3, 17) in pairs


def test_cosine_topk_and_ivf():
    t, mat = _emb_table()
    q = mat[3].astype(np.float64)
    top = cosine_topk(ray.data.from_arrow(t).repartition(4), q, k=5)
    assert top.iloc[0]["vec_id"] == 3 and abs(top.iloc[0]["cosine"] - 1.0) < 1e-9
    assert top.iloc[1]["vec_id"] == 17  # planted neighbor

    # brute-force oracle for full top-5
    norm = mat.astype(np.float64) / np.linalg.norm(mat.astype(np.float64), axis=1, keepdims=True)
    sims = norm @ (q / np.linalg.norm(q))
    want = set(np.argsort(-sims)[:5].tolist())
    assert set(top["vec_id"].tolist()) == want

    cb = build_ivf_codebook(mat.astype(np.float64), n_centroids=8)
    assigned = ivf_assign(ray.data.from_arrow(t), cb)
    ivf = ivf_topk(assigned, cb, q, k=5, n_probe=4)
    assert ivf.iloc[0]["vec_id"] == 3
    assert 17 in set(ivf["vec_id"].tolist())  # same coarse region as query


def test_text_stats_and_quality():
    t = docs_table()
    ts = token_stats(t).to_pandas()
    row = ts[ts["doc_id"] == "d0"].iloc[0]
    assert row["n_words"] == 9 and row["n_chars"] == 43
    q = quality_score(t).to_pandas()
    r6 = q[q["doc_id"] == "d6"].iloc[0]
    assert r6["n_chars"] == 5 and r6["n_punct"] == 0
    r0 = q[q["doc_id"] == "d0"].iloc[0]
    assert r0["n_stop"] == 2  # 'the' twice
    assert r0["punct_ratio"] == 0.0


def test_langid():
    t = docs_table()
    out = LangId()(t).to_pandas().set_index("doc_id")
    assert out.loc["d0", "lang_pred"] == "en"
    assert out.loc["d3", "lang_pred"] == "de"
    assert out.loc["d4", "lang_pred"] == "fr"
    assert out.loc["d7", "lang_pred"] == "unknown"


def test_fingerprint_deterministic():
    t = docs_table()
    a = fingerprint(t).to_pandas()
    b = fingerprint(t).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a.set_index("doc_id").loc["d0", "fingerprint"] == a.set_index("doc_id").loc["d5", "fingerprint"]


def test_multimodal_plumbing():
    t = synthetic_media_table(n=12)
    out = decode_pipeline(ray.data.from_arrow(t), concurrency=2).to_pandas()
    assert set(out.columns) == {"media_id", "frame_idx", "frame_feature"}
    assert all(len(f) == 16 for f in out["frame_feature"])
    # deterministic across runs
    out2 = decode_pipeline(ray.data.from_arrow(t), concurrency=2).to_pandas()
    a = out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    for x, y in zip(a["frame_feature"], b["frame_feature"]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # compressed/opaque media without a codec is explicitly stubbed
    dec = MediaDecoder(fake_decode=False)
    with pytest.raises(NotImplementedError):
        dec._decode_rows(b"\x00opaque-no-codec", 1)
