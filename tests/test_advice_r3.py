"""Round-3 ADVICE regression tests: NULL semantics in sketches /
distinct counts, and the CLI's cluster-address resolution."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def test_hash_values_nullable_int_matches_sql_semantics():
    """HLL over a nullable int column must ignore NULLs (COUNT(DISTINCT))."""
    from video_features_ray.functions.sketches import approx_distinct

    vals = [1, 2, 3, None, None, 2, 3, None]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 3) < 0.5  # p=12 is exact at this cardinality


def test_hash_values_valid_mask_alignment():
    from video_features_ray.functions.sketches import _hash_values

    col = pa.array([5, None, 7, None], pa.int64())
    h, valid = _hash_values(col, with_valid=True)
    assert len(h) == 4 and valid.tolist() == [True, False, True, False]
    # non-null hashes must equal the no-null path's hashes
    h2 = _hash_values(pa.array([5, 7], pa.int64()))
    assert h[0] == h2[0] and h[2] == h2[1]

    s, sv = _hash_values(pa.array(["a", None, "b"], pa.string()), with_valid=True)
    assert len(s) == 3 and sv.tolist() == [True, False, True]


def test_bloom_prefilter_drops_null_keys():
    from video_features_ray.functions.sketches import bloom_prefilter, build_bloom

    right = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, None, 3, 99], pa.int64())}))
    bf = build_bloom(right, "k", n_bits=1 << 12)
    out = bloom_prefilter(left, "k", bf).to_pandas()
    # NULL keys never match an inner join → must be filtered out
    assert out["k"].notna().all()
    assert set(out["k"].astype(int)) <= {1, 3, 99}  # 99 may FP, nulls never
    assert {1, 3} <= set(out["k"].astype(int))      # no false negatives


def test_distinct_count_per_group_ignores_nulls():
    import duckdb

    from video_features_ray.stages.dedup import distinct_count_per_group

    df = pd.DataFrame({
        "g": ["a"] * 4 + ["b"] * 3,
        "v": [1.0, 1.0, None, 2.0, None, 3.0, 3.0],
    })
    ds = ray.data.from_pandas(df)
    got = distinct_count_per_group(ds, "g", "v").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT g, CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct "
        "FROM df GROUP BY g ORDER BY g").df()
    pd.testing.assert_frame_equal(got, want)


def test_cli_uses_ray_address_env(monkeypatch):
    """The CLI must route RAY_ADDRESS to ray.init (ray job submit
    contract) instead of hardcoding a private local instance."""
    import video_features_ray.__main__ as m

    calls = {}

    class _FakeRay:
        @staticmethod
        def is_initialized():
            return False

        @staticmethod
        def init(**kw):
            calls.update(kw)
            raise RuntimeError("stop-after-init")  # don't run the pipeline

        @staticmethod
        def shutdown():
            pass

    monkeypatch.setitem(__import__("sys").modules, "ray", _FakeRay)
    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    with pytest.raises(RuntimeError, match="stop-after-init"):
        m.main(["extract", "--input", "/tmp/nope*.parquet", "--out", "/tmp/o",
                "--spec", "r21d_like_16_16", "--num-cpus", "4"])
    assert calls == {"address": "ray://head:10001"}


# --- second code-review batch (round-3 self-review) regressions ---

def test_sessionize_datetime64_ts():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.events import sessionize

    # two events 10 min apart, then a 2-h gap -> sessions 0,0,1 with
    # gap given in SECONDS for a datetime64 column
    df = pd.DataFrame({
        "k": [1, 1, 1],
        "t": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                             "2024-01-01 02:10"]),
        "i": [0, 1, 2],
    })
    out = (sessionize(ray.data.from_pandas(df), "k", "t", gap=1800.0,
                      num_buckets=2, tie_cols=["i"])
           .to_pandas().sort_values("i"))
    assert out["session_id"].tolist() == [0, 0, 1]


def test_range_join_null_keys_match_nothing():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.joins import range_join

    l = pd.DataFrame({"k": [1.0, np.nan], "ts": [5, 5]})
    r = pd.DataFrame({"k": [1.0, np.nan], "lo": [0, 0], "hi": [10, 10]})
    out = range_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                     "k", "ts", "lo", "hi", num_buckets=2).to_pandas()
    assert len(out) == 1 and out["k"].iloc[0] == 1.0


def test_broadcast_join_suffixes_match_hash_join():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.joins import broadcast_join, hash_join

    big = pd.DataFrame({"k": [1.0, 2.0, np.nan], "a": [10, 20, 30]})
    small = pd.DataFrame({"k": [1.0, 2.0], "a": [100, 200], "b": [7, 8]})
    b = broadcast_join(ray.data.from_pandas(big), small, "k",
                       how="left").to_pandas()
    h = hash_join(ray.data.from_pandas(big),
                  ray.data.from_pandas(small), "k", how="left",
                  num_buckets=2).to_pandas()
    assert set(b.columns) == set(h.columns) == {"k", "a", "a_r", "b"}
    # the null-key left row keeps its own 'a' value in BOTH plans
    assert b.loc[b["k"].isna(), "a"].iloc[0] == 30
    assert h.loc[h["k"].isna(), "a"].iloc[0] == 30


def test_encoder_empty_batch_reduce_stats_schema():
    import pyarrow as pa

    from video_features_ray.specs import EncoderSpec
    from video_features_ray.stages.encode import Encoder

    spec = EncoderSpec("t_empty_rs", "w1", 4, 2, 8)
    enc = Encoder(spec, reduce_stats=True)
    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "window_tokens": pa.array([], pa.list_(pa.int32()))})
    out = enc(empty)
    assert out.column_names == ["rows", "toks", "feat_abs_sum"]
    assert len(out) == 0


def test_profile_columns_timestamp_and_bool():
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from video_features_ray.stages.prep import profile_columns

    t = pa.table({
        "ts": pa.array(pd.to_datetime(["2024-01-02", "2024-01-01", None])),
        "flag": pa.array([True, False, True]),
    })
    out = profile_columns(ray.data.from_arrow(t), ["ts", "flag"]
                          ).set_index("column")
    assert out.loc["ts", "n_nulls"] == 1
    assert str(out.loc["ts", "min"]).startswith("2024-01-01")
    assert abs(out.loc["flag", "approx_distinct"] - 2) < 0.5


def test_summarize_features_sliced_list_column():
    import pyarrow as pa
    import ray.data

    from video_features_ray.stages.prep import summarize_features

    arr = pa.array([[1.0, 2.0], [3.0, 4.0], [100.0, 200.0]],
                   type=pa.list_(pa.float64()))
    sliced = pa.table({"feature": arr.slice(0, 2)})  # excludes 100/200
    got = summarize_features(ray.data.from_arrow(sliced))
    assert got["max"] == 4.0 and got["count"] == 4


# --- third review batch (asof/shuffle/checkpoint/windows) regressions ---

def test_asof_join_integer_ts_distinct_names():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.asof import asof_join

    l = pd.DataFrame({"k": [1, 1], "t_l": np.array([10, 20], np.int64),
                      "x": [1.0, 2.0]})
    r = pd.DataFrame({"k": [1, 1], "t_r": np.array([5, 15], np.int64),
                      "y": [100.0, 200.0]})
    out = asof_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    key="k", left_ts="t_l", right_ts="t_r",
                    num_buckets=2).to_pandas().sort_values("t_l")
    # int64 ts on both sides used to raise MergeError (right side's
    # ts came back float64 from the union padding)
    assert out["y_r"].tolist() == [100.0, 200.0]


def test_asof_join_null_ts_rows_survive_unmatched():
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.stages.asof import asof_join

    l = pd.DataFrame({"k": [1, 1], "t": [10.0, np.nan], "x": [1, 2]})
    r = pd.DataFrame({"k": [1], "t": [5.0], "y": [100.0]})
    out = asof_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    key="k", left_ts="t", num_buckets=2).to_pandas()
    assert len(out) == 2  # merge_asof used to refuse the whole bucket
    assert out.loc[out["t"].isna(), "y_r"].isna().all()
    assert out.loc[out["t"] == 10.0, "y_r"].iloc[0] == 100.0


def test_asof_rename_collision_raises():
    import pandas as pd
    import pytest
    import ray.data

    from video_features_ray.stages.asof import asof_join_broadcast

    l = ray.data.from_pandas(pd.DataFrame({"k": [1], "ts": [1.0]}))
    r = pd.DataFrame({"k": [1], "rts": [1.0], "ts": [9.9]})
    with pytest.raises(Exception):
        asof_join_broadcast(l, r, key="k", left_ts="ts",
                            right_ts="rts").to_pandas()


def test_checkpoint_duplicate_basenames_get_distinct_ids(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from video_features_ray.state.checkpoint import plan_partitions

    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(pa.table({"x": list(range(10))}),
                       str(d / "part-0.parquet"))
    parts = plan_partitions([str(tmp_path / "a" / "part-0.parquet"),
                             str(tmp_path / "b" / "part-0.parquet")])
    ids = [p.partition_id for p in parts]
    assert len(ids) == len(set(ids)), ids


# --- fourth review batch (sources/bpe/training-data/multimodal) ---

def test_tokenize_documents_empty_batch_schema_stable():
    import pyarrow as pa

    from video_features_ray.sources.sequences import tokenize_documents

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = tokenize_documents(empty)
    assert out.schema.field("source").type == pa.string()


def test_skip_existing_requires_complete_triple(tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.sources.sinks import skip_existing

    out = str(tmp_path)
    # complete triple for doc "a"; HALF-written doc "b" (crash between
    # the three np.save calls) must NOT be skipped
    for stem, complete in (("a", True), ("b", False)):
        np.save(f"{out}/{stem}_feature.npy", np.zeros(2))
        if complete:
            np.save(f"{out}/{stem}_timestamps_ms.npy", np.zeros(2))
            np.save(f"{out}/{stem}_fps.npy", np.array(0.0))
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ["a", "b", "c"]}))
    kept = skip_existing(ds, out).to_pandas()["doc_id"].tolist()
    assert sorted(kept) == ["b", "c"]


def test_write_entity_files_slash_ids(tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data

    from video_features_ray.sources.sinks import write_entity_files

    df = pd.DataFrame({
        "doc_id": ["web/2024/doc1", "web/2024/doc1", "plain"],
        "window_id": [0, 1, 0],
        "feature": [np.zeros(4, np.float32)] * 3,
        "ts_ms": [0.0, 1.0, 0.0],
    })
    n = write_entity_files(ray.data.from_pandas(df), str(tmp_path))
    assert n == 2
    import os
    files = os.listdir(tmp_path)
    assert any(f.startswith("web%2F2024%2Fdoc1_") for f in files)
