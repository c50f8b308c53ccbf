"""Round-4 late operators: rolling-median window, weighted sampling,
LM familiarity, Q13/Q18 shapes — edge semantics the sf corpus doesn't
exercise (ties, zero-weights, hapax-only docs, zero-order customers)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from video_features_ray.functions.sketches import weighted_bottom_k_sample
from video_features_ray.stages.curation import lm_familiarity
from video_features_ray.stages.events import rolling_agg


def test_rolling_median_matches_pandas_across_blocks():
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "ts_us": rng.integers(0, 1000, n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(13)
    out = rolling_agg(ds, "user_id", "ts_us", "v", window_rows=5,
                      tie_cols=["event_id"], agg="median",
                      num_buckets=5).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts_us", "event_id"],
                         kind="mergesort").copy()
    ref["want"] = (ref.groupby("user_id")["v"]
                   .rolling(5, min_periods=1).median()
                   .reset_index(level=0, drop=True))
    ref = ref.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_array_equal(out["v_rollmedian5"].to_numpy(),
                                  ref["want"].to_numpy())


def test_rolling_agg_rejects_unknown_agg():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"k": [1], "t": [1], "v": [1.0]}))
    with pytest.raises(ValueError):
        rolling_agg(ds, "k", "t", "v", window_rows=3, agg="mean")


def test_weighted_sample_skips_nonpositive_and_null_weights():
    df = pd.DataFrame({
        "id": np.arange(40, dtype=np.int64),
        "w": [0] * 10 + [-3] * 5 + [100] * 25,
    })
    df.loc[39, "w"] = None
    ds = ray.data.from_pandas(df).repartition(4)
    out = weighted_bottom_k_sample(ds, "id", "w", k=30)
    # only the 24 positive-weight rows (ids 15..38) are eligible
    assert len(out) == 24
    assert (out["id"] >= 15).all() and 39 not in set(out["id"])


def test_weighted_sample_weight_monotone_and_partition_invariant():
    # one row with overwhelming weight is (near-)always selected;
    # result identical at any partitioning
    df = pd.DataFrame({"id": np.arange(200, dtype=np.int64),
                       "w": np.ones(200, dtype=np.int64)})
    df.loc[17, "w"] = 10**9
    a = weighted_bottom_k_sample(
        ray.data.from_pandas(df).repartition(2), "id", "w", k=5)
    b = weighted_bottom_k_sample(
        ray.data.from_pandas(df).repartition(19), "id", "w", k=5)
    pd.testing.assert_frame_equal(a, b)
    assert 17 in set(a["id"])
    # priorities match an explicit driver-side computation exactly
    from video_features_ray.functions.sketches import duckdb_hash_int64

    flat = pd.DataFrame({"id": np.arange(200, dtype=np.int64),
                         "w": np.full(200, 7, dtype=np.int64)})
    got = weighted_bottom_k_sample(
        ray.data.from_pandas(flat).repartition(3), "id", "w", k=10)
    pri = (duckdb_hash_int64(flat["id"].to_numpy()) % np.uint64(1 << 53)
           ).astype(np.float64) / 7.0
    want = flat.assign(_p=pri).sort_values(["_p", "id"]).head(10)
    assert got["id"].tolist() == want["id"].tolist()


def test_lm_familiarity_hand_corpus():
    # bigrams: doc0 "a b","b c"; doc1 "a b","a b" (dup occurrence);
    # doc2 "x y" (hapax only)
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b c", "a b a b", "x y"]),
    })
    # counts: "a b" appears 1 (doc0) + 2 (doc1) = 3; "b c" 1; "b a" 1; "x y" 1
    out = (lm_familiarity(ray.data.from_arrow(t).repartition(3),
                          n=2, num_buckets=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_grams"].tolist() == [2, 3, 1]
    assert out["sum_count"].tolist() == [3 + 1, 3 + 3 + 1, 1]
    assert out["n_hapax"].tolist() == [1, 1, 1]
    np.testing.assert_allclose(out["familiarity"].to_numpy(),
                               [4 / 2, 7 / 3, 1.0])


def test_lm_familiarity_partition_invariant():
    rng = np.random.default_rng(3)
    words = np.array(["w%d" % i for i in range(30)])
    texts = [" ".join(rng.choice(words, rng.integers(0, 12)))
             for _ in range(120)]
    t = pa.table({"doc_id": pa.array(np.arange(120), pa.int64()),
                  "text": pa.array(texts)})
    outs = []
    for parts, nb in [(1, 2), (11, 9)]:
        o = (lm_familiarity(ray.data.from_arrow(t).repartition(parts),
                            n=2, num_buckets=nb)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_q13_includes_zero_order_customers(tmp_path):
    import pyarrow.parquet as pq

    from video_features_ray.pipelines.queries import (
        q_orders_per_customer_dist,
    )

    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
                   str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        # q_large_orders reads more orders cols; Q13 prunes to o_custkey
    }), str(tmp_path / "orders.parquet"))
    out = (q_orders_per_customer_dist(str(tmp_path)).to_pandas()
           .sort_values("c_count").reset_index(drop=True))
    # customers 2 and 4 have zero orders; 3 has one; 1 has two
    assert out["c_count"].tolist() == [0, 1, 2]
    assert out["custdist"].tolist() == [2, 1, 1]


def test_event_transitions_hand_stream():
    from video_features_ray.stages.events import event_transitions

    # user 1: a -> b -> a ; user 2: a -> b ; singleton user 3: a
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
        "ts_us": np.array([1, 2, 3, 1, 2, 1], dtype=np.int64),
        "event_id": np.arange(6, dtype=np.int64),
        "event_type": ["a", "b", "a", "a", "b", "a"],
    })
    out = event_transitions(ray.data.from_pandas(df).repartition(3),
                            "user_id", "event_type",
                            ["ts_us", "event_id"], num_buckets=2)
    out = out.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    assert out[["from_type", "to_type"]].values.tolist() == [
        ["a", "b"], ["b", "a"]]
    assert out["n"].tolist() == [2, 1]
    np.testing.assert_allclose(out["p"].to_numpy(), [1.0, 1.0])


def test_compact_parquet_row_identical_and_resumable(tmp_path):
    import pyarrow.parquet as pq

    from video_features_ray.sources.sinks import (
        compact_parquet,
        plan_compaction,
    )

    src = tmp_path / "small"
    src.mkdir()
    total = []
    for i in range(17):
        t = pa.table({"id": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
                      "v": pa.array([float(i)] * 10)})
        pq.write_table(t, str(src / f"part-{i:03d}.parquet"))
        total.append(t)
    want = pa.concat_tables(total).sort_by("id")

    out = tmp_path / "compact"
    # tiny target -> several groups; every file in exactly one group
    groups = plan_compaction(str(src), target_bytes=3000)
    assert sum(len(g) for g in groups) == 17
    n = compact_parquet(str(src), str(out), target_bytes=3000)
    files = sorted(out.glob("*.parquet"))
    assert len(files) == n and n > 1
    got = pa.concat_tables([pq.read_table(str(f)) for f in files]).sort_by("id")
    assert got.equals(want)
    # resume: delete one output, re-run — only that group is rebuilt,
    # rows still identical
    files[0].unlink()
    compact_parquet(str(src), str(out), target_bytes=3000)
    files2 = sorted(out.glob("*.parquet"))
    assert len(files2) == n
    got2 = pa.concat_tables([pq.read_table(str(f))
                             for f in files2]).sort_by("id")
    assert got2.equals(want)
