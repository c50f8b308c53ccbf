"""Round-3 vectorization rewrites must be bit-identical to the per-row
kernels they replace: duckdb-hash sampling, pad_truncate offset-scatter,
and the giant-sequence chunker's fast/vector paths."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from video_features_ray.functions.sketches import (
    bottom_k_sample, duckdb_hash_int64, stratified_bottom_k)
from video_features_ray.specs import EncoderSpec
from video_features_ray.stages.prep import EOT, SOT, pad_truncate


def test_duckdb_hash_int64_bit_exact():
    con = duckdb.connect()
    vals = np.array([-1, -123456, 2**63 - 1, -(2**63), 0, 7, 42,
                     999_999_999_999, 2**32, 2**32 - 1], dtype=np.int64)
    got = duckdb_hash_int64(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        want = con.execute(f"SELECT hash(CAST({v} AS BIGINT))").fetchone()[0]
        assert int(g) == want, v


def test_bottom_k_sample_matches_sql():
    con = duckdb.connect()
    rng = np.random.default_rng(2)
    ids = rng.permutation(np.arange(10_000, dtype=np.int64))
    df = pd.DataFrame({"doc_id": ids, "payload": ids * 3})
    ds = ray.data.from_pandas(df).repartition(7)
    got = bottom_k_sample(ds, "doc_id", k=25)
    want = con.execute(
        "SELECT doc_id, payload FROM df ORDER BY hash(doc_id), doc_id LIMIT 25"
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype(np.int64), want.astype(np.int64))


def test_stratified_bottom_k_matches_sql():
    con = duckdb.connect()
    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], 3000),
        "doc_id": rng.permutation(np.arange(3000, dtype=np.int64)),
    })
    ds = ray.data.from_pandas(df).repartition(5)
    got = stratified_bottom_k(ds, "g", "doc_id", k=4)[["g", "doc_id"]]
    want = con.execute(
        "SELECT g, doc_id FROM (SELECT g, doc_id, row_number() OVER "
        "(PARTITION BY g ORDER BY hash(doc_id), doc_id) AS rn FROM df) "
        "WHERE rn <= 4 ORDER BY g, hash(doc_id), doc_id").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def _tokens_table(lists):
    flat = np.concatenate([np.asarray(t, np.int32) for t in lists]) if lists else np.array([], np.int32)
    offs = np.concatenate(([0], np.cumsum([len(t) for t in lists])))
    return pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(lists))], pa.string()),
        "tokens": pa.ListArray.from_arrays(
            pa.array(offs, pa.int64()).cast(pa.int32()),
            pa.array(flat, pa.int32())),
    })


def test_pad_truncate_scatter_matches_reference_loop():
    rng = np.random.default_rng(6)
    lists = [rng.integers(0, 1000, rng.integers(0, 120)).tolist()
             for _ in range(50)] + [[], [1], list(range(75)), list(range(76))]
    out = pad_truncate(_tokens_table(lists), context_length=77)
    col = out["tokens"].combine_chunks()
    mat = col.values.to_numpy(zero_copy_only=False).reshape(len(lists), 77)
    for i, toks in enumerate(lists):  # reference per-row construction
        want = np.zeros(77, np.int32)
        t = np.asarray(toks[:75], np.int32)
        want[0] = SOT
        want[1:1 + len(t)] = t
        want[1 + len(t)] = EOT
        np.testing.assert_array_equal(mat[i], want)


def test_pad_truncate_overflow_raises():
    with pytest.raises(ValueError, match="tokens exceed context"):
        pad_truncate(_tokens_table([[1] * 80]), context_length=77, truncate=False)


def test_split_giant_fast_path_passthrough():
    from video_features_ray.stages.skew import split_giant_sequences

    spec = EncoderSpec("t_sg", "w1", 8, 4, 8)
    lists = [list(range(20)), list(range(5)), []]
    t = _tokens_table(lists)
    t = t.append_column("n_tok", pa.array([len(x) for x in lists], pa.int32()))
    t = t.append_column("source", pa.array(["s"] * 3, pa.string()))
    out = split_giant_sequences(ray.data.from_arrow(t), spec,
                                max_tokens=64).to_pandas()
    assert len(out) == 3 and (out["pos_offset"] == 0).all()
    assert [len(x) for x in out["tokens"]] == [20, 5, 0]


def test_split_giant_vector_path_windows_identical():
    """Mixed giant/normal batch: windows from the chunked path must be
    bit-identical to the unsplit pipeline (existing guarantee, now over
    the vectorized chunker)."""
    from video_features_ray.stages.skew import (
        make_offset_window_stage, split_giant_sequences)
    from video_features_ray.stages.windows import make_window_stage

    spec = EncoderSpec("t_sg2", "w1", 8, 4, 8)
    rng = np.random.default_rng(9)
    lists = [rng.integers(0, 99, n).tolist()
             for n in (500, 3, 130, 0, 257, 64, 1000)]
    t = _tokens_table(lists)
    t = t.append_column("n_tok", pa.array([len(x) for x in lists], pa.int32()))
    t = t.append_column("source", pa.array(["s"] * len(lists), pa.string()))
    ds = ray.data.from_arrow(t)

    def _norm(df):
        df["window_tokens"] = df["window_tokens"].apply(
            lambda a: tuple(np.asarray(a).tolist()))
        df = df[sorted(df.columns)]
        return df.sort_values(["doc_id", "window_id"],
                              kind="mergesort").reset_index(drop=True)

    plain = _norm(ds.map_batches(make_window_stage(spec),
                                 batch_format="pyarrow").to_pandas())
    chunked = split_giant_sequences(ds, spec, max_tokens=100)
    split = _norm(chunked.map_batches(make_offset_window_stage(spec),
                                      batch_format="pyarrow").to_pandas())
    pd.testing.assert_frame_equal(plain, split)
