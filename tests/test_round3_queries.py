"""Round-3 coverage additions: grouped top-N, interval (range) join,
tf/df term stats — each pinned against DuckDB at sf0.001 — plus the
range_join operator's inclusivity semantics and the cross-modality
embedding-winners composition."""

import pytest
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def _oracle(name):
    import __ray_entry__ as em

    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(em.oracle_sql()[name]).df()


def _norm(d):
    d = d[sorted(d.columns)].copy()
    return d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)


def _check(name):
    import __ray_entry__ as em

    got = em.queries()[name](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = _oracle(name).astype({c: got[c].dtype for c in got.columns})
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_top3_per_user_matches_sql():
    _check("top3_per_user")


def test_session_range_join_matches_sql():
    _check("session_range_join")


def test_term_df_topk_matches_sql():
    _check("term_df_topk")


@pytest.mark.slow
def test_embedding_neardup_winners_planted_recall():
    import __ray_entry__ as em

    df = em.queries()["embedding_neardup_winners"](SF).to_pandas()
    # every loser is a planted copy (vec_id + 10^6) losing to its source
    assert (df["doc_id"] >= 1_000_000).all()
    assert (df["keep_id"] == df["doc_id"] - 1_000_000).all()
    assert len(df) >= 16  # multi-table LSH recall ≥ 0.8 of 20 plants


def test_range_join_inclusive_variants():
    from video_features_ray.stages.joins import range_join

    left = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 1, 2], "ts": [5, 10, 15, 10], "lid": [0, 1, 2, 3]}))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 2], "lo": [5, 12, 0], "hi": [10, 20, 9], "rid": [7, 8, 9]}))

    def go(inclusive):
        out = range_join(left, right, key="k", left_ts="ts",
                         right_start="lo", right_end="hi",
                         num_buckets=4, inclusive=inclusive).to_pandas()
        return sorted(zip(out["lid"], out["rid"]))

    assert go("both") == [(0, 7), (1, 7), (2, 8)]
    # neither → lo < ts < hi: only ts=15 ∈ (12, 20) survives
    assert go("neither") == [(2, 8)]
    # left-inclusive: lo <= ts < hi → ts=5 ∈ [5,10) only (10 hits hi)
    assert go("left") == [(0, 7), (2, 8)]
    # right-inclusive: lo < ts <= hi → ts=10 ∈ (5,10] only (5 hits lo)
    assert go("right") == [(1, 7), (2, 8)]


def test_range_join_rejects_column_overlap():
    import pytest

    from video_features_ray.stages.joins import range_join

    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "ts": [1], "x": [1]}))
    r = ray.data.from_pandas(pd.DataFrame({"k": [1], "lo": [0], "hi": [2], "x": [9]}))
    with pytest.raises(ValueError, match="disjoint"):
        range_join(l, r, key="k", left_ts="ts", right_start="lo", right_end="hi")


def test_dense_rank_events_matches_sql():
    _check("dense_rank_events")


def test_ntile_events_matches_sql():
    _check("ntile_events")


def test_mode_event_type_matches_sql():
    _check("mode_event_type")


def test_ngram_jaccard_matches_sql():
    _check("ngram_jaccard")


def test_ngram_jaccard_max_df_caps_pairs():
    """df-capping drops every pair that only a high-df gram connects,
    and never invents pairs the exact path lacks."""
    from video_features_ray.stages.dedup import ngram_jaccard_pairs

    boiler = "the same boilerplate footer text"
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            f"unique body {i} words here plus {boiler}" for i in range(4)
        ] + ["a near dup pair of docs one", "a near dup pair of docs two"],
    })
    ds = ray.data.from_pandas(docs)
    exact = ngram_jaccard_pairs(ds, n=3, threshold=0.05,
                                num_buckets=4).to_pandas()
    capped = ngram_jaccard_pairs(ds, n=3, threshold=0.05, num_buckets=4,
                                 max_df=2).to_pandas()
    e = set(zip(exact["id_a"], exact["id_b"]))
    c = set(zip(capped["id_a"], capped["id_b"]))
    assert (4, 5) in e and (4, 5) in c      # true near-dup survives the cap
    assert c <= e                            # cap only removes pairs
    assert len(c) < len(e)                   # boilerplate pairs dropped


def test_pack_sequences_matches_sql():
    _check("pack_sequences")


def test_pack_sequences_invariants():
    """Manifest reconstructs the concat-and-chunk layout: every chunk
    except the last is exactly full, spans tile each chunk without
    gaps, and each doc's spans tile the doc."""
    import __ray_entry__ as em

    df = em.queries()["pack_sequences"](SF).to_pandas()
    df["span"] = df["tok_end"] - df["tok_start"]
    per_chunk = df.groupby("chunk_id")["span"].sum()
    last = per_chunk.index.max()
    assert (per_chunk.drop(last) == 512).all()
    assert 0 < per_chunk[last] <= 512
    # spans tile each chunk contiguously
    s = df.sort_values(["chunk_id", "chunk_off"])
    for cid, g in s.groupby("chunk_id"):
        assert g["chunk_off"].iloc[0] == 0
        assert (g["chunk_off"].to_numpy()[1:]
                == (g["chunk_off"] + g["span"]).to_numpy()[:-1]).all()
    # each doc's spans tile the doc: starts at 0, contiguous, ends at cnt
    d = df.sort_values(["doc_id", "tok_start"])
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    cnt = {r.doc_id: len(r.text.split(" ")) for r in docs.itertuples()}
    for did, g in d.groupby("doc_id"):
        assert g["tok_start"].iloc[0] == 0
        assert (g["tok_start"].to_numpy()[1:] == g["tok_end"].to_numpy()[:-1]).all()
        assert g["tok_end"].iloc[-1] == cnt[did]
