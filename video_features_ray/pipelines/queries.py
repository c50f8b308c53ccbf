"""Driver-facing query callables — one per operator family (SURVEY §2).

Each function takes ``sf_dir`` and returns a Ray Dataset / pandas frame
whose columns are EXACTLY reproducible by the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` (same names, same types, bit-identical
values where floats are involved):

- integer results stay int64 end-to-end;
- float aggregates go through the scaled-integer trick (per-row
  ``round(x * 10^k)`` → int64 sums → one final division) so summation
  order cannot perturb low bits;
- nullable outputs are coalesced to sentinels (-1 / -1.0) on both sides.

Ray is assumed to be initialised by the caller (driver / bench / tests);
nothing here calls ray.init.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.sequences import sequences_from_documents
from ..specs import EncoderSpec
from ..stages.asof import asof_join
from ..stages.dedup import _fixed_list_matrix, exact_dedup
from ..stages.events import forward_fill, lag_lead, sessionize
from ..stages.joins import broadcast_join, grouped_topk, partial_agg, tumbling_aggregate
from ..stages.similarity import cosine_topk
from ..stages.text import quality_score, token_stats
from ..stages.windows import make_window_stage

#: per-bucket byte budget for ``groupby(_bucket).map_groups`` stages —
#: each bucket materializes as ONE pandas frame in one task, so the
#: bucket count must grow with the DATA, not just the cluster
TARGET_BUCKET_BYTES = 256 << 20


def shuffle_width(input_bytes: int | None = None, floor: int = 16,
                  cluster_cap: int = 256,
                  target_bucket_bytes: int = TARGET_BUCKET_BYTES) -> int:
    """Bucket count for wide ops = max(cluster term, data term).

    - cluster term: ≥2× CPUs (shuffle parallelism scales with a 256-node
      cluster), floored at 16 (measured-right at sf0.1), capped at
      ``cluster_cap`` so tiny clusters aren't over-split.
    - data term: ``ceil(input_bytes / target_bucket_bytes)`` and
      UNCAPPED — every ``transform_buckets`` / ``TaggedUnion`` /
      bucketed-dedup task holds one whole bucket as a pandas frame, so
      at 100 TB the count must be ~bytes/256 MB regardless of CPUs
      (the round-2 design flaw: a fixed 256 ceiling meant per-task
      memory grew linearly with input).

    ``input_bytes`` should be the UNCOMPRESSED estimate of what is
    actually shuffled (see :func:`table_bytes` for parquet inputs).
    """
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    w = int(min(max(floor, 2 * cpus), cluster_cap))
    if input_bytes:
        w = max(w, -(-int(input_bytes) // int(target_bucket_bytes)))
    return w


def table_bytes(sf_dir: str, *tables: str) -> int:
    """Uncompressed byte estimate of parquet tables from row-group
    metadata — footer reads only, never data."""
    import pyarrow.parquet as pq

    total = 0
    for t in tables:
        md = pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata
        total += sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
    return total


def _w(sf_dir: str, *tables: str) -> int:
    """shuffle width sized to the named input tables."""
    return shuffle_width(table_bytes(sf_dir, *tables))


def table_rows(sf_dir: str, table: str) -> int:
    """Row count from the parquet footer — metadata only, never data."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _skinny_w(sf_dir: str, table: str, bytes_per_row: int,
              min_bucket_bytes: int = 1 << 20) -> int:
    """Bucket count for shuffles whose payload is a SKINNY derivative of
    a table — LSH band rows, minhash signatures, (id, hash) pairs — not
    the table's own (text-dominated) bytes.  Sizing the width from
    ``table_bytes`` over-splits these: at sf0.1 the band shuffle is
    ~2 MB, and 64 near-empty ``map_groups`` buckets each pay Ray's
    ~45 ms/block sort tax (the r3 ``minhash_neardup`` 3.3× regression).

    width = max(data term bytes/256 MB, floor 8), additionally capped so
    no bucket drops below ``min_bucket_bytes`` — the cluster term only
    engages once the data can actually feed 2×CPU buckets."""
    payload = table_rows(sf_dir, table) * int(bytes_per_row)
    cluster_w = shuffle_width(payload)
    tiny_cap = max(8, -(-payload // int(min_bucket_bytes)))
    return max(min(cluster_w, tiny_cap),
               -(-payload // TARGET_BUCKET_BYTES))


# window-query specs (small geometry so the ~500-char docs emit windows)
Q_W1 = EncoderSpec("q_w1_32_16", "w1", 32, 16, 8)
Q_W2 = EncoderSpec("q_w2_16_8", "w2", 16, 8, 8)
Q_TOTAL5 = EncoderSpec("q_total5", "framewise", 1, 1, 8, resample_total=5)
Q_FPS10 = EncoderSpec("q_fps10", "framewise", 1, 1, 8, resample_fps=10.0)
Q_FLOW = EncoderSpec("q_flow", "flow", 2, 1, 8)


def _window_sums(batch: pa.Table) -> pa.Table:
    """window rows → (doc_id, window_id:int64, ts_ms, window_sum:int64)."""
    col = batch["window_tokens"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(batch) == 0:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "window_id": pa.array([], pa.int64()),
                         "ts_ms": pa.array([], pa.float64()),
                         "window_sum": pa.array([], pa.int64())})
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    start, end = off[0], off[-1]
    flat = flat[start:end]
    sums = np.add.reduceat(flat, (off[:-1] - start)) if len(flat) else np.zeros(len(batch), np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "window_id": batch["window_id"].cast(pa.int64()),
            "ts_ms": batch["ts_ms"],
            "window_sum": pa.array(sums, type=pa.int64()),
        }
    )


def _windows(sf_dir: str, spec: EncoderSpec) -> "ray.data.Dataset":
    seq = sequences_from_documents(sf_dir)
    return seq.map_batches(make_window_stage(spec), batch_format="pyarrow", zero_copy_batch=True)


def q_w1_windows(sf_dir: str):
    return _windows(sf_dir, Q_W1).map_batches(_window_sums, batch_format="pyarrow")


def q_w2_windows(sf_dir: str):
    return _windows(sf_dir, Q_W2).map_batches(_window_sums, batch_format="pyarrow")


def _tokens_at(batch: pa.Table) -> pa.Table:
    """framewise window rows → token value per position (int64)."""
    col = batch["window_tokens"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(batch):
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        toks = flat[off[:-1]]
    else:
        toks = np.array([], np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pos": batch["window_id"].cast(pa.int64()),
            "ts_ms": batch["ts_ms"],
            "token": pa.array(toks, type=pa.int64()),
        }
    )


def q_resample_total5(sf_dir: str):
    return _windows(sf_dir, Q_TOTAL5).map_batches(_tokens_at, batch_format="pyarrow")


def q_resample_fps10(sf_dir: str):
    return _windows(sf_dir, Q_FPS10).map_batches(_tokens_at, batch_format="pyarrow")


def q_flow_pairs(sf_dir: str):
    def _pairs(batch: pa.Table) -> pa.Table:
        col = batch["window_tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "window_id": pa.array([], pa.int64()),
                             "ts_ms": pa.array([], pa.float64()),
                             "tok_a": pa.array([], pa.int64()),
                             "tok_b": pa.array([], pa.int64())})
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        a = flat[off[:-1]]
        b = flat[off[:-1] + 1]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "window_id": batch["window_id"].cast(pa.int64()),
                "ts_ms": batch["ts_ms"],
                "tok_a": pa.array(a, type=pa.int64()),
                "tok_b": pa.array(b, type=pa.int64()),
            }
        )

    return _windows(sf_dir, Q_FLOW).map_batches(_pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# as-of join: probe grid ⨝ backward w1 feature windows
# ---------------------------------------------------------------------------

ASOF_GRID_N = 16
ASOF_GRID_STEP = 937.0


def _asof_grid_query(sf_dir: str, direction: str):
    """Shared body of the backward/forward as-of feature queries: the
    w1 window table joined as-of onto a fixed per-doc probe grid, with
    sentinel fills — ONE definition of the grid/schemas/finish."""
    windows = q_w1_windows(sf_dir).map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "ts_ms": b["ts_ms"],
                            "window_id": b["window_id"], "win_ts": b["ts_ms"]}),
        batch_format="pyarrow",
    )

    def _grid(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.string()).to_pylist()
        g = np.arange(ASOF_GRID_N, dtype=np.float64) * ASOF_GRID_STEP
        out_ids = np.repeat(np.array(ids, dtype=object), ASOF_GRID_N)
        out_ts = np.tile(g, len(ids))
        return pa.table({"doc_id": pa.array(out_ids.tolist(), pa.string()),
                         "ts_q": pa.array(out_ts, pa.float64())})

    probes = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id"]).map_batches(
        _grid, batch_format="pyarrow")
    # num_buckets scales with the cluster (merge parallelism); the
    # coalesce stays 16 — it exists to merge skinny input blocks before
    # the sort, and more blocks just re-pay the ~45 ms/block sort tax
    joined = asof_join(
        probes, windows, key="doc_id", left_ts="ts_q", right_ts="ts_ms",
        direction=direction, num_buckets=_w(sf_dir, "documents"),
        coalesce_blocks=16,
        # explicit schemas: both sides are transformed datasets, so
        # .schema() would execute their first blocks twice (item r3-9)
        schemas=(pa.schema([("doc_id", pa.string()), ("ts_q", pa.float64())]),
                 pa.schema([("doc_id", pa.string()), ("ts_ms", pa.float64()),
                            ("window_id", pa.int64()), ("win_ts", pa.float64())])))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["window_id_r"] = df["window_id_r"].fillna(-1).astype(np.int64)
        df["win_ts_r"] = df["win_ts_r"].fillna(-1.0).astype(np.float64)
        return df[["doc_id", "ts_q", "window_id_r", "win_ts_r"]]

    return joined.map_batches(_finish, batch_format="pandas")


def q_asof_features(sf_dir: str):
    """BACKWARD as-of: each probe joined to the latest window at or
    before it (zero temporal leakage)."""
    return _asof_grid_query(sf_dir, "backward")


# ---------------------------------------------------------------------------
# event-stream operators (events table; ts in integer microseconds)
# ---------------------------------------------------------------------------

def _events_us(sf_dir: str, cols) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=list(cols))

    def _us(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64())  # timestamp[us] → epoch microseconds
        cols_out = {c: batch[c] for c in batch.column_names if c != "ts"}
        cols_out["ts_us"] = t
        return pa.table(cols_out)

    return ds.map_batches(_us, batch_format="pyarrow", zero_copy_batch=True)


def q_lag_lead_events(sf_dir: str):
    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = lag_lead(ds, "user_id", "ts_us", "value", lags=[1], leads=[1],
                   num_buckets=_w(sf_dir, "events"), tie_cols=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["value_lag1"] = df["value_lag1"].fillna(-1.0)
        df["value_lead1"] = df["value_lead1"].fillna(-1.0)
        return df[["event_id", "user_id", "ts_us", "value", "value_lag1", "value_lead1"]]

    return out.map_batches(_finish, batch_format="pandas")


SESSION_GAP_US = 1_800_000_000  # 30 min


def q_sessionize_events(sf_dir: str):
    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    out = sessionize(ds, "user_id", "ts_us", gap=SESSION_GAP_US,
                     num_buckets=_w(sf_dir, "events"), tie_cols=["event_id"])
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "session_id"]], batch_format="pandas"
    )


def q_ffill_events(sf_dir: str):
    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value", "event_type"])

    def _nullify(df: pd.DataFrame) -> pd.DataFrame:
        df["click_value"] = df["value"].where(df["event_type"] == "click")
        return df[["event_id", "user_id", "ts_us", "click_value"]]

    out = forward_fill(ds.map_batches(_nullify, batch_format="pandas"),
                       "user_id", "ts_us", "click_value", num_buckets=_w(sf_dir, "events"),
                       tie_cols=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["click_value_ffill"] = df["click_value_ffill"].fillna(-1.0)
        return df[["event_id", "user_id", "ts_us", "click_value_ffill"]]

    return out.map_batches(_finish, batch_format="pandas")


HOUR_US = 3_600_000_000


def q_tumbling_hourly(sf_dir: str):
    ds = _events_us(sf_dir, ["user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        scaled = np.round(v * 10000.0).astype(np.int64)
        return pa.table({"user_id": batch["user_id"], "ts_us": batch["ts_us"],
                         "value_s": pa.array(scaled)})

    agg = tumbling_aggregate(
        ds.map_batches(_scale, batch_format="pyarrow"), "user_id", "ts_us", "value_s",
        window=float(HOUR_US), bucket_col="window_start",
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["window_start_us"] = df["window_start"].astype(np.int64)
        df["sum_value"] = df["sum_value_s"].astype(np.int64) / 10000.0
        df["n"] = df["n"].astype(np.int64)
        return df[["user_id", "window_start_us", "n", "sum_value"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_top_users(sf_dir: str):
    ds = _events_us(sf_dir, ["user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch["user_id"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    top = grouped_topk(ds.map_batches(_scale, batch_format="pyarrow"),
                       ["user_id"], sums=["value_s"], sort_col="sum_value_s", k=10)
    top["total_value"] = top["sum_value_s"].astype(np.int64) / 10000.0
    top["n"] = top["n"].astype(np.int64)
    return top[["user_id", "n", "total_value"]]


# ---------------------------------------------------------------------------
# TPC-H-style relational ops
# ---------------------------------------------------------------------------

def q_q1_pricing(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        t = batch.filter(mask)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        disc_price = price * (1.0 - disc)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": pa.array(qty.astype(np.int64)),
                "price_c": pa.array(np.round(price * 100.0).astype(np.int64)),
                "disc_price_s": pa.array(np.round(disc_price * 10000.0).astype(np.int64)),
            }
        )

    agg = partial_agg(ds.map_batches(_prep, batch_format="pyarrow", zero_copy_batch=True),
                      ["l_returnflag", "l_linestatus"], sums=["qty", "price_c", "disc_price_s"],
                      count_col="count_order", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_qty"] = df["sum_qty"].astype(np.int64)
        df["sum_base_price"] = df["sum_price_c"].astype(np.int64) / 100.0
        df["sum_disc_price"] = df["sum_disc_price_s"].astype(np.int64) / 10000.0
        df["avg_qty"] = df["sum_qty"] / df["count_order"].astype(np.int64)
        df["count_order"] = df["count_order"].astype(np.int64)
        return df[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                   "sum_disc_price", "avg_qty", "count_order"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_revenue_per_nation(sf_dir: str):
    """lineitem ⨝ supplier ⨝ nation via broadcast of the small sides."""
    import pyarrow.parquet as pq

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    small = supp.merge(nat, left_on="s_nationkey", right_on="n_nationkey")[["s_suppkey", "n_name"]]
    small = small.rename(columns={"s_suppkey": "l_suppkey"})

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def _scale(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table({"l_suppkey": batch["l_suppkey"], "rev_s": pa.array(rev)})

    joined = broadcast_join(ds.map_batches(_scale, batch_format="pyarrow", zero_copy_batch=True),
                            small, on="l_suppkey")
    agg = partial_agg(joined, ["n_name"], sums=["rev_s"], count_col="n_items", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["sum_rev_s"].astype(np.int64) / 10000.0
        df["n_items"] = df["n_items"].astype(np.int64)
        return df[["n_name", "revenue", "n_items"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_docs_per_source(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    agg = partial_agg(ds, ["source"], sums=["n_chars"], count_col="n_docs", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_docs"] = df["n_docs"].astype(np.int64)
        df["sum_n_chars"] = df["sum_n_chars"].astype(np.int64)
        return df[["source", "n_docs", "sum_n_chars"]]

    return agg.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# dedup / text / similarity
# ---------------------------------------------------------------------------

def q_exact_dedup(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = exact_dedup(ds, id_col="doc_id", text_col="text",
                      num_buckets=_w(sf_dir, "documents"))
    return out.map_batches(
        lambda df: df.assign(keep_id=df["keep_id"].astype(np.int64),
                             n_dupes=df["n_dupes"].astype(np.int64))[
            ["content_hash", "keep_id", "n_dupes"]],
        batch_format="pandas",
    )


def q_token_stats(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(token_stats, batch_format="pyarrow", zero_copy_batch=True)


def q_quality_score(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(quality_score, batch_format="pyarrow", zero_copy_batch=True)


def q_similarity_topk(sf_dir: str):
    import pyarrow.parquet as pq

    # predicate pushdown: only the ONE query row lands on the driver
    # (a plain read_table would materialize the whole vector corpus)
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    qvec = np.asarray(qtab["embedding"][0].as_py(), dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    top = cosine_topk(ds, qvec, k=10)
    top["vec_id"] = top["vec_id"].astype(np.int64)
    return top[["vec_id", "rank"]]


# ---------------------------------------------------------------------------
# non-SQL-expressible pipelines (driver records rows-only checks)
# ---------------------------------------------------------------------------

def _string_docs(sf_dir: str) -> "ray.data.Dataset":
    """documents with doc_id cast to string (the near-dup family keys on
    string ids)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"].cast(pa.string()), "text": b["text"]}),
        batch_format="pyarrow",
    )


N_PLANT_TEXT = 20


def _planted_docs(sf_dir: str, n_plant: int = N_PLANT_TEXT) -> "ray.data.Dataset":
    """documents (string ids) + ``n_plant`` deterministic near-copies:
    doc i < n_plant re-appears as id ``<i>_dup`` with its LAST character
    replaced — one changed char perturbs ≤ shingle_k shingles of a
    ~150-500 char doc, so shingle-Jaccard ≈ 0.97+ and simhash Hamming
    measured ≤ 4 on sf0.01. Gives the rows-only driver checks a KNOWN
    planted-pair ground truth (the embedding_neardup pattern)."""
    import pyarrow.compute as pc

    def _with_plants(b: pa.Table) -> pa.Table:
        # base rows + planted copies emitted from the SAME batch — one
        # read, one fused map (a union of two reads halved throughput)
        base = pa.table({"doc_id": b["doc_id"].cast(pa.string()), "text": b["text"]})
        t = b.filter(pc.less(b["doc_id"], n_plant))
        if len(t) == 0:
            return base
        ids = pc.binary_join_element_wise(t["doc_id"].cast(pa.string()), "dup", "_")
        texts = [(x[:-1] + "~") if x else "~" for x in t["text"].to_pylist()]
        plants = pa.table({"doc_id": ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids,
                           "text": pa.array(texts, pa.string())})
        return pa.concat_tables([base, plants])

    raw = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                columns=["doc_id", "text"])
    return raw.map_batches(_with_plants, batch_format="pyarrow")


def _planted_pairs_only(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep only the exact (source, source_dup) planted pairs, so the
    driver's row count IS planted-pair recall out of N_PLANT_TEXT — not
    candidate volume (the corpus is template-generated and full of
    natural near-dups that would otherwise drown the signal)."""

    def _f(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].astype(str)
        b = df["id_b"].astype(str)
        m = (a + "_dup" == b) | (b + "_dup" == a)
        return df[m]

    return ds.map_batches(_f, batch_format="pandas")


def q_minhash_neardup(sf_dir: str):
    """Banded-minhash LSH with 20 PLANTED near-copies; returns exactly
    the recovered (source, source_dup) pairs, so rows == recall out of
    20 (detection prob ≥ 0.999 per plant at J ≈ 0.97 with b=8, r=4;
    deterministic pipeline — measures exactly 20 at sf0.001 and
    sf0.01)."""
    from ..stages.dedup import minhash_lsh_candidates

    # the wide op here shuffles (id, band_id, band_hash) rows — ~48 B ×
    # bands per doc, NOT document text — so size buckets from that
    cand = minhash_lsh_candidates(_planted_docs(sf_dir), num_perm=32, bands=8,
                                  concurrency=(1, 8),
                                  num_buckets=_skinny_w(sf_dir, "documents",
                                                        8 * 48))
    return _planted_pairs_only(cand)


def q_neardup_winners(sf_dir: str):
    """Composed near-dup dedup: LSH candidates → distributed Jaccard
    verify → connected components → (loser doc_id, keep_id)."""
    from ..stages.dedup import neardup_dedup

    return neardup_dedup(_string_docs(sf_dir), threshold=0.7, concurrency=(1, 2))


def q_simhash(sf_dir: str):
    """SimHash near-dup candidates over the corpus + 20 planted
    near-copies, banded at 8×8 bits with Hamming verify ≤ 7 — the
    pigeonhole bound makes recall EXACTLY 1.0 for pairs within Hamming 7
    (all 20 plants measure ≤ 4 on sf0.01), so the driver's row count is
    a recall check, not arbitrary volume."""
    from ..stages.dedup import simhash_neardup_candidates

    # shuffled payload = (id, band, key, simhash) rows, ~48 B × 8 bands
    pairs = simhash_neardup_candidates(_planted_docs(sf_dir), bands=8,
                                       hamming_max=7,
                                       num_buckets=_skinny_w(sf_dir,
                                                             "documents",
                                                             8 * 48))
    return _planted_pairs_only(pairs)


def q_langid(sf_dir: str):
    from ..stages.text import LangId

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 2))


def q_fingerprint(sf_dir: str):
    from ..stages.text import fingerprint

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint, batch_format="pyarrow")


def q_embedding_neardup(sf_dir: str):
    """Multi-table hyperplane LSH near-dup at cosine ≥ 0.95. The driver
    table is pure gaussian noise (measured max pairwise cosine ≈ 0.51),
    so the query PLANTS 20 deterministic near-copies (vec_id + 10^6,
    seeded 2% perturbation) — the rows-only driver check then reflects
    actual recall (~17-20 found) instead of a vacuous 0."""
    from ..stages.dedup import embedding_neardup_candidates

    DIM, N_PLANT = 64, 20

    def _plant(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.less(batch["vec_id"], N_PLANT))
        if len(keep) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": pa.array([], batch["embedding"].type)})
        ids = keep["vec_id"].to_numpy(zero_copy_only=False)
        col = keep["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = col.values.to_numpy(zero_copy_only=False).reshape(len(keep), DIM).astype(np.float64)
        out = np.empty_like(mat, dtype=np.float32)
        for i, vid in enumerate(ids):  # tiny: ≤ N_PLANT rows total
            rng = np.random.default_rng(1_000_000 + int(vid))
            v = mat[i] + rng.standard_normal(DIM) * 0.02 * np.linalg.norm(mat[i]) / np.sqrt(DIM)
            out[i] = v.astype(np.float32)
        flat = out.reshape(-1)
        off = np.arange(0, (len(keep) + 1) * DIM, DIM, dtype=np.int32)
        emb = pa.ListArray.from_arrays(pa.array(off, pa.int32()),
                                       pa.array(flat, pa.float32()))
        return pa.table({"vec_id": pa.array(ids + 1_000_000),
                         "embedding": emb})

    base = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    planted = base.map_batches(_plant, batch_format="pyarrow")
    return embedding_neardup_candidates(base.union(planted), dim=DIM,
                                        num_planes=8, num_tables=4,
                                        cosine_threshold=0.95,
                                        num_buckets=_w(sf_dir, "embeddings"))


def q_kmeans_centroids(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings (iterative
    algorithm: broadcast centroids, per-batch partial sums, driver
    update). Rows-only; equivalence to single-process Lloyd from the
    same deterministic init is pinned in tests."""
    from ..stages.similarity import distributed_kmeans

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cent = distributed_kmeans(ds, dim=64, n_centroids=8, iters=5)
    return pd.DataFrame({
        "centroid_id": np.arange(len(cent), dtype=np.int64),
        "norm": np.linalg.norm(cent, axis=1),
        "dim0": cent[:, 0],
    })


def q_ivf_topk(sf_dir: str):
    """IVF coarse-quantized top-k. The codebook trains on a DISTRIBUTED
    deterministic sample (bottom-256 by hash(vec_id) — hash-spread, not
    the first rows of one file), and the query probes ALL centroids so
    the bucketed path is provably exact: its oracle is the brute-force
    cosine SQL. Pruned-probe recall is separately pinned in tests."""
    import pyarrow.parquet as pq

    from ..functions.sketches import bottom_k_sample
    from ..stages.similarity import build_ivf_codebook, ivf_assign, ivf_topk

    N_CENTROIDS = 8
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sample = bottom_k_sample(ds, "vec_id", k=256)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    cb = build_ivf_codebook(mat, n_centroids=N_CENTROIDS)
    # predicate-pushdown read of the single query row (row-group pruned)
    # — never the full vector corpus onto the driver
    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    qvec = np.asarray(qtab["embedding"][0].as_py(), dtype=np.float64)
    top = ivf_topk(ivf_assign(ds, cb), cb, qvec, k=10, n_probe=N_CENTROIDS)
    top["vec_id"] = top["vec_id"].astype(np.int64)
    return top[["vec_id", "rank"]]


def q_flagship_features(sf_dir: str):
    """Full extraction (windows + deterministic encoder features).

    The encoder actor pool RUNS in the checked path (its output feeds the
    final projection), but the driver-checkable columns are the window
    sums — SQL-reproducible via the w1 CTE (geometry 32/16 == w1_windows).
    Feature values themselves are pinned by the allclose fixture tests
    (``tests/test_reference_geometry.py``), which SQL can't express."""
    from .extract import extract

    spec = EncoderSpec("flagship_w1_32_16_d64", "w1", 32, 16, 64)
    seq = sequences_from_documents(sf_dir)
    # encoder_concurrency=None → auto-sized to ~3/4 of cluster CPUs so the
    # actor pool never starves the read/window stages (4-CPU test clusters
    # deadlock if the pool reserves every CPU)
    out = extract(seq, spec)

    def _check_cols(b: pa.Table) -> pa.Table:
        if "feature" not in b.column_names:  # encoder really ran
            raise ValueError("flagship pipeline lost the feature column")
        return _window_sums(b)

    return out.map_batches(_check_cols, batch_format="pyarrow")


def q_media_decode(sf_dir: str):
    """PRODUCTION decode (no fake): 24 mixed media rows → 8 real PPM
    images (1 frame each) + 8 real WAVs (5 × 100 ms frames each) = 48
    good rows; the 8 opaque video payloads dead-letter (see
    ``media_deadletter``) instead of fabricating features."""
    from ..stages.multimodal import decode_pipeline, synthetic_media_table

    ds = ray.data.from_arrow(synthetic_media_table(n=24, seed=42))
    return decode_pipeline(ds, concurrency=(1, 2))


def q_media_deadletter(sf_dir: str):
    """The dead-letter side of q_media_decode: exactly the 8 opaque
    compressed-video payloads this host cannot decode, one row each
    with the captured error."""
    from ..stages.multimodal import decode_pipeline, synthetic_media_table

    ds = ray.data.from_arrow(synthetic_media_table(n=24, seed=42))
    _good, dead = decode_pipeline(ds, concurrency=(1, 2), return_deadletters=True)
    return dead.map_batches(
        lambda b: pa.table({"media_id": b["media_id"],
                            "error": b["_error"]}),
        batch_format="pyarrow")


def q_checkpointed_extract(sf_dir: str):
    """Checkpointed flagship run into /tmp (exercises lineage + commit)."""
    import tempfile

    from ..state.checkpoint import run_checkpointed

    from .extract import extract

    spec = EncoderSpec("ckpt_w1_32_16", "w1", 32, 16, 16)

    from ..sources.sequences import tokenize_documents

    def _pipe(ds):
        seqs = ds.map_batches(tokenize_documents, batch_format="pyarrow")
        return extract(seqs, spec, encoder_concurrency=(1, 2), with_features=False)

    import os
    import shutil

    # deterministic per-sf dir, wiped before the run: mkdtemp leaked a
    # full corpus-sized output copy on EVERY invocation
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"{tempfile.gettempdir()}/vfr_ckpt_query_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)
    run_checkpointed([f"{sf_dir}/documents.parquet"], _pipe, out_dir,
                     target_rows=100_000, wave_size=2)
    return ray.data.read_parquet(out_dir, file_extensions=["parquet"]).map_batches(
        _window_sums, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# additional SQL-checked queries (round 1 extension)
# ---------------------------------------------------------------------------

def q_asof_purchase_click(sf_dir: str):
    """events-on-events as-of: each purchase joined backward to the same
    user's latest click (the classic point-in-time feature lookup)."""
    ev = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def _purchases(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "purchase"]
        return d[["event_id", "user_id", "ts_us", "value"]]

    def _clicks(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "click"].copy()
        d = d.rename(columns={"event_id": "c_event", "value": "c_value"})
        return d[["c_event", "user_id", "ts_us", "c_value"]]

    purchases = ev.map_batches(_purchases, batch_format="pandas")
    clicks = ev.map_batches(_clicks, batch_format="pandas")
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts_us",
        right_ts="ts_us", direction="backward",
        num_buckets=_w(sf_dir, "events"), coalesce_blocks=16,
        schemas=(pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                            ("ts_us", pa.int64()), ("value", pa.float64())]),
                 pa.schema([("c_event", pa.int64()), ("user_id", pa.int64()),
                            ("ts_us", pa.int64()), ("c_value", pa.float64())])))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["c_event_r"] = df["c_event_r"].fillna(-1).astype(np.int64)
        df["c_value_r"] = df["c_value_r"].fillna(-1.0).astype(np.float64)
        return df[["event_id", "user_id", "ts_us", "value", "c_event_r", "c_value_r"]]

    return joined.map_batches(_finish, batch_format="pandas")


def q_session_stats(sf_dir: str):
    """per (user, session): event count + start/end ts — computed INSIDE
    the sessionize bucket task (one shuffle; a bucket holds every row of
    each user, so the aggregate is exact with no second groupby)."""
    from ..stages.events import sessionize_stats

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    return sessionize_stats(ds, "user_id", "ts_us", gap=SESSION_GAP_US,
                            num_buckets=_w(sf_dir, "events"),
                            tie_cols=["event_id"])


def q_unique_sources(sf_dir: str):
    """distinct values of one column (Dataset.unique — a shuffle op)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    vals = sorted(ds.unique("source"))
    return pd.DataFrame({"source": vals})


Q_VGG = EncoderSpec("q_vgg_8_8", "vggish", 8, 8, 8, inner_win=40, inner_hop=16)
Q_W2R = EncoderSpec("q_w2r_16_8_f10", "w2", 16, 8, 8, resample_fps=10.0)


def q_vggish_windows(sf_dir: str):
    """Two-level framing (W5): inner 40/16 token-sum frames, outer 8/8
    tumbling windows; window_sum = sum of the 8 inner sums."""
    return _windows(sf_dir, Q_VGG).map_batches(_window_sums, batch_format="pyarrow")


def q_w2_resampled(sf_dir: str):
    """W7 composition: fps resample (25→10) BEFORE the W2 streaming stack."""
    return _windows(sf_dir, Q_W2R).map_batches(_window_sums, batch_format="pyarrow")


def q_sample_bottomk(sf_dir: str):
    """Deterministic consistent sample: 20 docs with smallest DuckDB-hash(doc_id)."""
    from ..functions.sketches import bottom_k_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    out = bottom_k_sample(ds, "doc_id", k=20)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["doc_id", "n_chars"]]


def q_token_freq_top50(sf_dir: str):
    """Corpus token histogram via dense bincount partials (no shuffle)."""
    from ..functions.sketches import token_frequencies

    seq = sequences_from_documents(sf_dir)
    return token_frequencies(seq, top_k=50)


def q_revenue_per_segment(sf_dir: str):
    """orders ⨝ customer — BOTH sides large at scale, so this is the
    shuffled hash_join (one tagged-union shuffle), not a broadcast."""
    from ..stages.joins import hash_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda b: pa.table({"custkey": b["c_custkey"], "c_mktsegment": b["c_mktsegment"]}),
        batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def _scale(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"custkey": batch["o_custkey"],
                         "price_c": pa.array(np.round(p * 100.0).astype(np.int64))})

    joined = hash_join(
        orders.map_batches(_scale, batch_format="pyarrow"), cust,
        on="custkey", num_buckets=_w(sf_dir, "orders", "customer"),
        coalesce_blocks=16,
        schemas=(pa.schema([("custkey", pa.int64()), ("price_c", pa.int64())]),
                 pa.schema([("custkey", pa.int64()), ("c_mktsegment", pa.string())])))
    agg = partial_agg(joined, ["c_mktsegment"], sums=["price_c"],
                      count_col="n_orders", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["sum_price_c"].astype(np.int64) / 100.0
        df["n_orders"] = df["n_orders"].astype(np.int64)
        return df[["c_mktsegment", "revenue", "n_orders"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_rolling_sum(sf_dir: str):
    """Per-user rolling 5-row sum (moving-window feature), scaled-int."""
    from ..stages.events import rolling_agg

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"], "user_id": batch["user_id"],
                         "ts_us": batch["ts_us"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    out = rolling_agg(ds.map_batches(_scale, batch_format="pyarrow"),
                      "user_id", "ts_us", "value_s", window_rows=5,
                      num_buckets=_w(sf_dir, "events"), tie_cols=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["roll5"] = df["value_s_rollsum5"].astype(np.int64) / 10000.0
        return df[["event_id", "user_id", "ts_us", "roll5"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_median_value_per_type(sf_dir: str):
    """Exact per-group median (quantile_disc 0.5) over the cent-scaled
    value — frequency partials, no full sort."""
    from ..stages.joins import grouped_quantile_disc

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "value_c": pa.array(np.round(v * 100.0).astype(np.int64))})

    out = grouped_quantile_disc(ds.map_batches(_scale, batch_format="pyarrow"),
                                "event_type", "value_c", q=0.5)
    out["median_value"] = out["q0.5"].astype(np.int64) / 100.0
    return out[["event_type", "median_value"]]


def q_customers_without_orders(sf_dir: str):
    """Bucketed ANTI join: customers with no 1998 orders (NOT EXISTS) —
    the distributed counterpart of the broadcast skip-existing anti-join
    (the date filter keeps the result non-degenerate at every SF)."""
    import pyarrow.compute as pc

    from ..stages.joins import hash_join

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda b: pa.table({"custkey": b["c_custkey"],
                            "c_mktsegment": b["c_mktsegment"]}),
        batch_format="pyarrow")

    def _recent(b: pa.Table) -> pa.Table:
        m = pc.greater_equal(b["o_orderdate"], pa.scalar(pd.Timestamp("1998-06-01")))
        return pa.table({"custkey": b.filter(m)["o_custkey"]})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(_recent, batch_format="pyarrow")
    out = hash_join(
        cust, orders, on="custkey", how="anti",
        num_buckets=_w(sf_dir, "orders", "customer"),
        schemas=(pa.schema([("custkey", pa.int64()), ("c_mktsegment", pa.string())]),
                 pa.schema([("custkey", pa.int64())])))
    return out.map_batches(
        lambda df: df.assign(c_custkey=df["custkey"].astype(np.int64))[
            ["c_custkey", "c_mktsegment"]],
        batch_format="pandas")


def q_rank_events(sf_dir: str):
    """Per-user value rank (row_number desc, event_id tie-break)."""
    from ..stages.events import window_rank

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = window_rank(ds, "user_id", ["value", "event_id"],
                      ascending=[False, True], num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "rnk"]], batch_format="pandas")


def q_cumsum_events(sf_dir: str):
    """Per-user running total (unbounded-preceding sum), scaled-int."""
    from ..stages.events import cumulative_sum

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"], "user_id": batch["user_id"],
                         "ts_us": batch["ts_us"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    out = cumulative_sum(ds.map_batches(_scale, batch_format="pyarrow"),
                         "user_id", "ts_us", "value_s",
                         num_buckets=_w(sf_dir, "events"), tie_cols=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["cum_value"] = df["value_s_cumsum"].astype(np.int64) / 10000.0
        return df[["event_id", "user_id", "ts_us", "cum_value"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_sliding_hourly(sf_dir: str):
    """Hopping windows (1 h span, 30 min hop): global count + sum per
    window start — each event lands in 2 windows via a vectorized
    explode of skinny pre-aggregation rows."""
    from ..stages.joins import sliding_aggregate

    ds = _events_us(sf_dir, ["ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"ts_us": batch["ts_us"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    agg = sliding_aggregate(ds.map_batches(_scale, batch_format="pyarrow"),
                            "ts_us", "value_s", window=float(HOUR_US),
                            step=float(HOUR_US // 2))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["window_start_us"] = df["window_start"].astype(np.int64)
        df["sum_value"] = df["sum_value_s"].astype(np.int64) / 10000.0
        df["n"] = df["n"].astype(np.int64)
        return df[["window_start_us", "n", "sum_value"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_distinct_users_per_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type — value-bucketed
    distinct so the shuffle moves deduped skinny pairs only."""
    from ..stages.dedup import distinct_count_per_group

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    return distinct_count_per_group(ds, "event_type", "user_id",
                                    num_buckets=_w(sf_dir, "events"))


def q_stratified_docs(sf_dir: str):
    """Per-source deterministic sample: 3 docs with smallest DuckDB-hash(doc_id)
    per source (group-bucketed bottom-k)."""
    from ..functions.sketches import stratified_bottom_k

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    out = stratified_bottom_k(ds, "source", "doc_id", k=3,
                              num_buckets=_w(sf_dir, "documents"))
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["source", "doc_id", "n_chars"]]


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # frozen vocabulary


def q_user_type_counts(sf_dir: str):
    """One-hot categorical COUNT features per user (n_click, n_view, …)
    — the pivot feature block every tabular training pipeline emits."""
    from ..stages.joins import categorical_counts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    # FROZEN vocabulary (like DOC_LANGS): the oracle hard-codes these
    # five columns, so discovering the set from data would change the
    # output SCHEMA on a corpus missing a type — and it cost an extra
    # distinct scan per invocation
    return categorical_counts(ds, "user_id", "event_type", EVENT_TYPES,
                              num_buckets=_w(sf_dir, "events"))


def q_time_since_prev(sf_dir: str):
    """Per-user time-since-previous-event (µs) — the inter-arrival
    feature, a lag-1 on the timestamp itself."""
    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])

    def _dup_ts(batch: pa.Table) -> pa.Table:
        return batch.append_column("tsv", batch["ts_us"])

    out = lag_lead(ds.map_batches(_dup_ts, batch_format="pyarrow"),
                   "user_id", "ts_us", "tsv", lags=[1], leads=[],
                   num_buckets=_w(sf_dir, "events"), tie_cols=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        gap = df["ts_us"] - df["tsv_lag1"]
        df["gap_us"] = gap.fillna(-1).astype(np.int64)
        return df[["event_id", "user_id", "ts_us", "gap_us"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_top100_events(sf_dir: str):
    """Global ORDER BY ... LIMIT via Ray Data's native distributed sort
    (range-partitioned shuffle) — the full-sort counterpart of the
    partial-combine grouped_topk."""
    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = ds.sort(["value", "event_id"], descending=[True, False]).limit(100)
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "ts_us", "value"]],
        batch_format="pandas")


def q_asof_features_forward(sf_dir: str):
    """FORWARD as-of: each probe joined to the EARLIEST window at or
    after it (the leakage-free backward join's mirror — schedule "next
    feature refresh" lookups). Right timestamps are unique per doc, so
    the DuckDB ASOF tie behavior (order-dependent on ties) cannot bite."""
    return _asof_grid_query(sf_dir, "forward")


def q_session_enriched(sf_dir: str):
    """COMPOSITE-KEY join: every sessionized event annotated with its
    session's event count — hash_join on (user_id, session_id), the
    multi-column key path of the shared shuffle plan."""
    from ..stages.events import sessionize_stats
    from ..stages.joins import hash_join

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    w = _w(sf_dir, "events")
    # ONE sessionize shuffle feeds both join sides: the stats side is a
    # skinny partial+combine over the materialized session rows (the
    # first version ran sessionize twice — 4 shuffles for a 3-shuffle plan)
    sess = sessionize(ds, "user_id", "ts_us", gap=SESSION_GAP_US, num_buckets=w,
                      tie_cols=["event_id"]).map_batches(
        lambda df: df[["event_id", "user_id", "ts_us", "session_id"]],
        batch_format="pandas").materialize()
    stats = partial_agg(sess, ["user_id", "session_id"], sums=(),
                        count_col="n_events", num_buckets=w)
    # explicit schemas: stats is a lazy partial_agg lineage and
    # TaggedUnion's .schema() fallback would execute part of it just
    # for type inference (the double-execution tax fixed elsewhere)
    out = hash_join(sess, stats, on=["user_id", "session_id"], num_buckets=w,
                    coalesce_blocks=16,
                    schemas=(pa.schema([("event_id", pa.int64()),
                                        ("user_id", pa.int64()),
                                        ("ts_us", pa.int64()),
                                        ("session_id", pa.int64())]),
                             pa.schema([("user_id", pa.int64()),
                                        ("session_id", pa.int64()),
                                        ("n_events", pa.int64())])))
    return out.map_batches(
        lambda df: df.assign(n_events=df["n_events"].astype(np.int64))[
            ["event_id", "user_id", "session_id", "n_events"]],
        batch_format="pandas")


def q_top3_per_user(sf_dir: str):
    """Top-3 events per user by value (grouped top-N via window_rank +
    filter — the per-group counterpart of the global grouped_topk)."""
    from ..stages.events import window_rank

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    ranked = window_rank(ds, "user_id", ["value", "event_id"],
                         ascending=[False, True],
                         num_buckets=_w(sf_dir, "events"))
    return ranked.map_batches(
        lambda df: df[df["rnk"] <= 3][["event_id", "user_id", "value", "rnk"]],
        batch_format="pandas")


def q_session_range_join(sf_dir: str):
    """Interval (range) join: every event joined to its user's session
    interval [t_start, t_end] — the general range-join operator
    cross-checked against sessionize (each event lands in exactly one
    session, so rows == events and the mapping must agree with the
    window-based sessionizer bit-for-bit)."""
    from ..stages.joins import range_join

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    sess = q_session_stats(sf_dir).map_batches(
        lambda df: df[["user_id", "session_id", "t_start", "t_end"]],
        batch_format="pandas")
    out = range_join(ds, sess, key="user_id", left_ts="ts_us",
                     right_start="t_start", right_end="t_end",
                     num_buckets=_w(sf_dir, "events"), coalesce_blocks=16)
    return out.map_batches(
        lambda df: df.assign(session_id=df["session_id"].astype(np.int64))[
            ["event_id", "user_id", "ts_us", "session_id"]],
        batch_format="pandas")


def q_embedding_neardup_winners(sf_dir: str):
    """Cross-modality composition: embedding LSH candidate pairs →
    DISTRIBUTED hash-to-min components → (doc_id, keep_id) winners.
    With the 20 planted near-copies the expected loser count equals the
    planted recall (~17-20; each planted vec_id+10^6 loses to its
    source, the component min)."""
    from ..stages.dedup import cluster_pairs_distributed

    pairs = q_embedding_neardup(sf_dir)
    comp = cluster_pairs_distributed(pairs, num_buckets=_w(sf_dir, "embeddings"))
    return comp.map_batches(
        lambda df: df.rename(columns={"root": "keep_id"}), batch_format="pandas")


def q_term_df_topk(sf_dir: str):
    """Per-doc top-3 terms by tf joined with each term's global document
    frequency — the tf-idf building blocks as pure ints (bit-exact vs
    SQL; the float idf is one driver-side log away)."""
    from ..stages.text import term_df_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return term_df_topk(ds, k=3, num_buckets=_w(sf_dir, "documents"))


def q_approx_quantiles_price(sf_dir: str):
    """DDSketch order-price quantiles. The estimate itself can't be
    SQL-hashed (log-bucket libm ulps), so — like ``p99_price_sketch`` —
    the query hashes the sketch's GUARANTEE: it also computes the exact
    interpolated quantile (bit-matching ``quantile_cont`` on the cents
    grid) and emits ``within_alpha = |est/exact − 1| ≤ α``. The oracle
    asserts TRUE per q; a sketch or merge bug flips the flag."""
    from ..functions.sketches import approx_quantile
    from ..stages.joins import grouped_quantiles_cont

    qs = [0.5, 0.9, 0.99]
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    got = approx_quantile(ds, "o_totalprice", qs=qs, alpha=0.01)

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"_g": pa.array(np.zeros(len(v), dtype=np.int32)),
                         "price_c": pa.array(
                             np.round(v * 100.0).astype(np.int64))})

    exact = grouped_quantiles_cont(
        ds.map_batches(_scale, batch_format="pyarrow"), "_g", "price_c",
        qs)
    out = pd.DataFrame({
        "q": np.asarray(qs, dtype=np.float64),
        "exact_q": [float(exact[f"q{q}"].iloc[0]) / 100.0 for q in qs],
        "est": [got[q] for q in qs]})
    out["within_alpha"] = (np.abs(out["est"] / out["exact_q"] - 1.0)
                           <= 0.01 + 1e-9)
    return out[["q", "exact_q", "within_alpha"]]


def q_approx_distinct_users(sf_dir: str):
    """HLL(p=12) distinct-user estimate, hash-checked via its GUARANTEE:
    the exact distinct count runs beside it (value-bucketed exact
    distinct, O(buckets) driver combine) and the query emits
    ``within_rel = |est/exact − 1| ≤ 5%`` (3× the p=12 std error
    1.04/√4096 ≈ 1.6%). The oracle asserts the exact count and TRUE."""
    from ..functions.sketches import approx_distinct
    from ..stages.dedup import distinct_count_per_group

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({"_g": pa.array(
            np.zeros(len(batch), dtype=np.int32)),
            "user_id": batch["user_id"]})

    exact_df = distinct_count_per_group(
        ds.map_batches(_tag, batch_format="pyarrow"), "_g", "user_id"
    ).to_pandas()
    exact = int(exact_df["n_distinct"].iloc[0])
    return pd.DataFrame({
        "exact_distinct": np.asarray([exact], dtype=np.int64),
        "within_rel": [abs(est / exact - 1.0) <= 0.05]})


def q_dense_rank_events(sf_dir: str):
    """Per-user DENSE rank by value desc — ties share a rank so no
    tie-break column is needed for determinism."""
    from ..stages.events import dense_rank

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = dense_rank(ds, "user_id", ["value"], ascending=[False],
                     num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "drnk"]], batch_format="pandas")


def q_ntile_events(sf_dir: str):
    """Per-user NTILE(4) quartile assignment (value desc, event_id
    tie-break so the split is deterministic)."""
    from ..stages.events import ntile

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = ntile(ds, "user_id", ["value", "event_id"], n=4,
                ascending=[False, True], num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "tile"]], batch_format="pandas")


def q_mode_event_type(sf_dir: str):
    """Most frequent event_type per user (deterministic MODE: ties go to
    the lexicographically smallest type)."""
    from ..stages.joins import grouped_mode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return grouped_mode(ds, "user_id", "event_type",
                        num_buckets=_w(sf_dir, "events"))


def q_ngram_jaccard(sf_dir: str):
    """Exact word-3-gram Jaccard near-dup pairs (J >= 0.1) over the
    documents corpus — the inverted-index exact baseline to the
    MinHash-LSH candidate path, bit-exact vs the SQL self-join oracle."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, n=3, threshold=0.1,
                               num_buckets=_w(sf_dir, "documents"))


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk packing manifest (context 512) over the
    documents corpus — global token prefix-sum via the distributed-scan
    pattern, bit-exact vs the SQL window oracle."""
    from ..stages.packing import pack_sequences

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return pack_sequences(ds, context_len=512,
                          num_buckets=_w(sf_dir, "documents"))


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the chained multi-join plan no other query
    composes: filtered scans -> SEMI hash join (orders that belong to
    BUILDING customers; only keys move for the right side) -> large x
    large INNER hash join (lineitem x orders) -> pre-aggregated grouped
    revenue -> distributed top-10.  Both joins are bucketed tagged-union
    shuffles sized by input bytes; the aggregate moves one skinny
    partial row per (order, batch); the driver merges <= k x buckets
    rows.  Reference analogue: the engine's join/top-k generalization of
    the label-map lookup + top-5 path (utils/utils.py:28-46)."""
    import pyarrow.compute as pc

    from ..stages.joins import grouped_topk, hash_join

    cutoff = pd.Timestamp("1997-03-15")

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table({"custkey": b.filter(
            pc.equal(b["c_mktsegment"], "BUILDING"))["c_custkey"]}),
        batch_format="pyarrow")

    def _orders(b: pa.Table) -> pa.Table:
        f = b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff)))
        return pa.table({"custkey": f["o_custkey"],
                         "orderkey": f["o_orderkey"],
                         "o_date_us": f["o_orderdate"].cast(pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_orders, batch_format="pyarrow")

    o_building = hash_join(
        orders, cust, on="custkey", how="semi",
        num_buckets=_w(sf_dir, "orders", "customer"), coalesce_blocks=16,
        schemas=(pa.schema([("custkey", pa.int64()), ("orderkey", pa.int64()),
                            ("o_date_us", pa.int64())]),
                 pa.schema([("custkey", pa.int64())])),
    ).map_batches(lambda df: df[["orderkey", "o_date_us"]],
                  batch_format="pandas")

    def _items(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b["l_shipdate"], pa.scalar(cutoff)))
        price = f["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = f["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table({"orderkey": f["l_orderkey"], "rev_s": pa.array(rev)})

    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(_items, batch_format="pyarrow")

    joined = hash_join(
        items, o_building, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("rev_s", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()), ("o_date_us", pa.int64())])))

    top = grouped_topk(joined, ["orderkey", "o_date_us"], sums=["rev_s"],
                       sort_col="sum_rev_s", k=10,
                       num_buckets=_w(sf_dir, "lineitem"))
    top["l_orderkey"] = top["orderkey"].astype(np.int64)
    top["o_date_us"] = top["o_date_us"].astype(np.int64)
    top["revenue"] = top["sum_rev_s"].astype(np.int64) / 10000.0
    return top[["l_orderkey", "o_date_us", "revenue"]]


def q_corr_qty_price(sf_dir: str):
    """Pearson corr(quantity, price) per returnflag — the multi-moment
    aggregate: exact int64 moment partials, one closed-form float
    finish whose op order the SQL oracle mirrors bit-for-bit."""
    from ..stages.joins import grouped_corr

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def _scale(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        # floor, not round: np.round is half-to-even, SQL round() is
        # half-away-from-zero, and whole-unit prices DO land on .50
        # exactly; floor is bit-identical in both engines
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "qs": pa.array(np.floor(q).astype(np.int64)),
                         "ps": pa.array(np.floor(p).astype(np.int64))})

    return grouped_corr(ds.map_batches(_scale, batch_format="pyarrow",
                                       zero_copy_batch=True),
                        ["l_returnflag"], "qs", "ps")


def q_p90_value_per_type(sf_dir: str):
    """Interpolated p90 of the cent-scaled value per event_type
    (quantile_cont semantics) — frequency partials + CDF walk, no full
    sort; the interpolation op order mirrors DuckDB exactly."""
    from ..stages.joins import grouped_quantile_cont

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "value_c": pa.array(np.round(v * 100.0).astype(np.int64))})

    out = grouped_quantile_cont(ds.map_batches(_scale, batch_format="pyarrow"),
                                "event_type", "value_c", q=0.9)
    out["p90_value"] = out["q0.9"] / 100.0
    return out[["event_type", "p90_value"]]


def q_latest_event_per_user(sf_dir: str):
    """Each user's most recent event row (argmax lookup feature) via
    mergeable per-batch candidates — the shuffle moves one row per
    (user, batch), never the event stream."""
    from ..stages.joins import grouped_latest

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
    out = grouped_latest(ds, "user_id", "ts_us", tie_cols=["event_id"],
                         num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df[["user_id", "event_id", "ts_us", "event_type", "value"]],
        batch_format="pandas")


def q_user_journey(sf_dir: str):
    """Per-user ordered event-type path string (the session-journey
    feature: string_agg ORDER BY ts)."""
    from ..stages.joins import grouped_string_agg

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    return grouped_string_agg(ds, "user_id", "event_type",
                              order_cols=["ts_us", "event_id"], sep=">",
                              num_buckets=_w(sf_dir, "events"),
                              out_col="journey")


def q_order_stats_per_status(sf_dir: str):
    """count/sum/min/max of cent-scaled totalprice per order status in
    ONE partial+combine pass (all three stats are algebraic, so they
    share the same skinny shuffle)."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderstatus", "o_totalprice"])

    def _scale(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderstatus": batch["o_orderstatus"],
                         "price_c": pa.array(np.round(p * 100.0).astype(np.int64))})

    agg = partial_agg(ds.map_batches(_scale, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["o_orderstatus"], sums=["price_c"], mins=["price_c"],
                      maxs=["price_c"], count_col="n_orders", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].astype(np.int64)
        df["total_price"] = df["sum_price_c"].astype(np.int64) / 100.0
        df["min_price"] = df["min_price_c"].astype(np.int64) / 100.0
        df["max_price"] = df["max_price_c"].astype(np.int64) / 100.0
        return df[["o_orderstatus", "n_orders", "total_price",
                   "min_price", "max_price"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_share_of_user_total(sf_dir: str):
    """Each event's share of its user's total value (the percent-of-
    total ratio feature) — one hash shuffle, single int/int division
    for bit-parity."""
    from ..stages.events import group_share

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    out = group_share(ds.map_batches(_scale, batch_format="pyarrow"),
                      "user_id", "value_s", num_buckets=_w(sf_dir, "events"),
                      out_col="share")
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "share"]], batch_format="pandas")


def q_user_type_spend(sf_dir: str):
    """Per-user summed value pivoted by event_type (the pivot-SUM
    feature block beside user_type_counts' pivot-COUNT)."""
    from ..stages.joins import categorical_pivot_sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch["user_id"],
                         "event_type": batch["event_type"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    scaled = ds.map_batches(_scale, batch_format="pyarrow", zero_copy_batch=True)
    # FROZEN vocabulary — schema-stable vs the hard-coded oracle
    # columns, and no per-invocation distinct scan
    cats = EVENT_TYPES
    out = categorical_pivot_sum(scaled, "user_id", "event_type", "value_s",
                                cats, num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        res = df[["user_id"]].copy()
        for c in cats:
            res[f"spend_{c}"] = df[f"sum_{c}"].astype(np.int64) / 10000.0
        return res

    return out.map_batches(_finish, batch_format="pandas")


def q_hourly_active_users(sf_dir: str):
    """COUNT(DISTINCT user_id) per hour window — the windowed-distinct
    engagement metric, composed from the value-bucketed exact distinct
    (shuffle moves deduped skinny pairs only)."""
    from ..stages.dedup import distinct_count_per_group

    ds = _events_us(sf_dir, ["user_id", "ts"])

    def _bucket(batch: pa.Table) -> pa.Table:
        t = batch["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"hour_us": pa.array((t // HOUR_US) * HOUR_US),
                         "user_id": batch["user_id"]})

    out = distinct_count_per_group(
        ds.map_batches(_bucket, batch_format="pyarrow"),
        "hour_us", "user_id", num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df.rename(columns={"n_distinct": "active_users"})[
            ["hour_us", "active_users"]],
        batch_format="pandas")


def q_asof_click_within_1h(sf_dir: str):
    """Tolerance-bounded as-of: each purchase joined backward to the
    user's latest click ONLY if it happened within the last hour
    (stale lookups dropped — merge_asof's inclusive ``tolerance``,
    exercised nowhere else in the suite)."""
    ev = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def _purchases(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "purchase"]
        return d[["event_id", "user_id", "ts_us", "value"]]

    def _clicks(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "click"].copy()
        d = d.rename(columns={"event_id": "c_event"})
        return d[["c_event", "user_id", "ts_us"]]

    purchases = ev.map_batches(_purchases, batch_format="pandas")
    clicks = ev.map_batches(_clicks, batch_format="pandas")
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts_us",
        right_ts="ts_us", direction="backward", tolerance=HOUR_US,
        num_buckets=_w(sf_dir, "events"), coalesce_blocks=16,
        schemas=(pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                            ("ts_us", pa.int64()), ("value", pa.float64())]),
                 pa.schema([("c_event", pa.int64()), ("user_id", pa.int64()),
                            ("ts_us", pa.int64())])))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["c_event_r"] = df["c_event_r"].fillna(-1).astype(np.int64)
        return df[["event_id", "user_id", "ts_us", "value", "c_event_r"]]

    return joined.map_batches(_finish, batch_format="pandas")






def q_rolling_1h_sum(sf_dir: str):
    """Per-user trailing-1h value sum at every event (time-RANGE rolling
    window, the row-count window's time-decayed sibling), scaled-int."""
    from ..stages.events import rolling_time_agg

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"], "user_id": batch["user_id"],
                         "ts_us": batch["ts_us"],
                         "value_s": pa.array(np.round(v * 10000.0).astype(np.int64))})

    out = rolling_time_agg(ds.map_batches(_scale, batch_format="pyarrow"),
                           "user_id", "ts_us", "value_s", span_us=HOUR_US,
                           num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["roll_1h"] = df["value_s_rollsum_t"].astype(np.int64) / 10000.0
        return df[["event_id", "user_id", "ts_us", "roll_1h"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_ewma_value(sf_dir: str):
    """Per-user time-decayed EWMA of value (halflife 1 h) at every
    event — feature-store freshness weighting. The engine's recurrence
    is epoch-anchored (events.py ewma_feature); DuckDB can express the
    adjusted CLOSED form (cumulative Σ v·2^((t−t0)/h) / Σ 2^((t−t0)/h)
    anchored at each user's first event — exponents stay representable
    while a key spans < 1024 halflives, true for this corpus). The two
    op orders agree to ~3e-12 abs, so BOTH sides hash a 1e-4-rounded
    int column (zero boundary hits measured at sf0.001 and sf0.01)."""
    from ..stages.events import ewma_feature

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = ewma_feature(ds, "user_id", "ts_us", "value",
                       halflife_us=float(HOUR_US),
                       num_buckets=_w(sf_dir, "events"))

    def _r4(df: pd.DataFrame) -> pd.DataFrame:
        df["ewma_r4"] = np.round(
            df["value_ewma"].to_numpy(dtype=np.float64) * 1e4).astype(np.int64)
        return df[["event_id", "user_id", "ts_us", "ewma_r4"]]

    return out.map_batches(_r4, batch_format="pandas")


def q_p99_price_sketch(sf_dir: str):
    """Approximate p99 totalprice per order status via the grouped
    DDSketch histogram (partials bounded by log-buckets, not distinct
    prices — the quantile scale path). The sketch estimate itself can't
    be SQL-hashed (a 1-ulp libm difference at a log-bucket edge moves
    it), so the query hashes the sketch's GUARANTEE instead: it also
    computes the exact interpolated p99 (bit-matching quantile_cont on
    the cents grid) and emits ``within_alpha = |est/exact − 1| ≤ α``.
    The oracle asserts TRUE — a sketch bug (or broken merge) flips the
    flag and fails the value hash."""
    from ..stages.joins import grouped_ddsketch_quantile, grouped_quantile_cont

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderstatus", "o_totalprice"])
    est = grouped_ddsketch_quantile(ds, "o_orderstatus", "o_totalprice",
                                    q=0.99, alpha=0.01)

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderstatus": batch["o_orderstatus"],
                         "price_c": pa.array(
                             np.round(v * 100.0).astype(np.int64))})

    exact = grouped_quantile_cont(ds.map_batches(_scale,
                                                 batch_format="pyarrow"),
                                  "o_orderstatus", "price_c", q=0.99)
    exact["p99_exact"] = exact["q0.99"] / 100.0
    m = exact[["o_orderstatus", "p99_exact"]].merge(
        est.rename(columns={"q0.99_approx": "_est"}), on="o_orderstatus")
    m["within_alpha"] = (np.abs(m["_est"] / m["p99_exact"] - 1.0)
                         <= 0.01 + 1e-9)
    return m[["o_orderstatus", "p99_exact", "within_alpha"]]


def q_prev_same_type_event(sf_dir: str):
    """COMPOSITE-KEY as-of: each event joined backward to the user's
    previous event of the SAME type — key (user_id, event_type), strict
    inequality via an integer-µs probe shift (ts-1), so it equals SQL
    lag() per (user, type) on this tie-free corpus."""
    from ..stages.asof import asof_join

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def _left(b: pa.Table) -> pa.Table:
        t = b["ts_us"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "ts_us": b["ts_us"],
                         "probe_us": pa.array(t - 1)})

    def _right(b: pa.Table) -> pa.Table:
        return pa.table({"prev_event": b["event_id"], "user_id": b["user_id"],
                         "event_type": b["event_type"],
                         "probe_us": b["ts_us"]})

    left = ds.map_batches(_left, batch_format="pyarrow", zero_copy_batch=True)
    right = ds.map_batches(_right, batch_format="pyarrow", zero_copy_batch=True)
    joined = asof_join(
        left, right, key=["user_id", "event_type"], left_ts="probe_us",
        right_ts="probe_us", direction="backward",
        num_buckets=_w(sf_dir, "events"), coalesce_blocks=16,
        schemas=(pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                            ("event_type", pa.string()), ("ts_us", pa.int64()),
                            ("probe_us", pa.int64())]),
                 pa.schema([("prev_event", pa.int64()), ("user_id", pa.int64()),
                            ("event_type", pa.string()), ("probe_us", pa.int64())])))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["prev_event_r"] = df["prev_event_r"].fillna(-1).astype(np.int64)
        return df[["event_id", "user_id", "event_type", "ts_us", "prev_event_r"]]

    return joined.map_batches(_finish, batch_format="pandas")


def _order_cohort_customers(sf_dir: str, how: str):
    """Shared ONE-pass cohort set-op: distinct pre-1996 customers
    EXCEPT (``how='anti'``) / INTERSECT (``how='semi'``) distinct
    1999+ customers.  A single orders scan tags each row's cohort
    side, per-batch distinct (custkey, side) pairs bucket by custkey,
    and each bucket answers the existence check locally — one scan,
    one skinny shuffle, vs. the naive two-scans-per-cohort plan."""
    import pyarrow.compute as pc

    w = _w(sf_dir, "orders")

    def _tag(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"]
        early = pc.less(d, pa.scalar(pd.Timestamp("1996-01-01")))
        late = pc.greater_equal(d, pa.scalar(pd.Timestamp("1999-01-01")))
        keep = pc.or_(early, late)
        f = b.filter(keep)
        side = pc.greater_equal(f["o_orderdate"],
                                pa.scalar(pd.Timestamp("1999-01-01")))
        t = pa.table({"custkey": f["o_custkey"],
                      "_side": side.cast(pa.int8())})
        # per-batch distinct pairs: only deduped skinny rows shuffle
        df = t.to_pandas().drop_duplicates()
        h = pd.util.hash_pandas_object(df["custkey"], index=False).to_numpy()
        df["_bucket"] = (h % np.uint64(w)).astype(np.int32)
        return pa.Table.from_pandas(df, preserve_index=False)

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        early = df.loc[df["_side"] == 0, ["custkey"]].drop_duplicates()
        late = set(df.loc[df["_side"] == 1, "custkey"].tolist())
        m = early["custkey"].isin(late).to_numpy()
        out = early[m] if how == "semi" else early[~m]
        return out.assign(c_custkey=out["custkey"].astype(np.int64))[["c_custkey"]]

    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderdate"])
    tagged = ds.map_batches(_tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("_bucket").map_groups(_per_bucket,
                                                batch_format="pandas")


def q_churned_customers(sf_dir: str):
    """SQL EXCEPT as a composition (customers ordering before 1996 but
    not in 1999+); see ``_order_cohort_customers``. Event-type cohorts
    are degenerate in this corpus (every user has every type), so the
    split is date-based."""
    return _order_cohort_customers(sf_dir, "anti")


def q_loyal_customers(sf_dir: str):
    """SQL INTERSECT: customers ordering both before 1996 AND in 1999+
    — the EXCEPT query's twin over the same one-pass cohort shuffle."""
    return _order_cohort_customers(sf_dir, "semi")


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape — the 6-table plan: region/nation resolved on the
    driver (tiny dims), customers of the region hash-joined onto
    date-filtered orders, lineitem hash-joined onto that (the two
    fact×fact shuffles), supplier resolved by broadcast, the
    same-nation condition applied as a vectorized filter, and revenue
    pre-aggregated per nation (driver combine: ≤25 groups at any SF)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    asia = int(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    nat = nat[nat["n_regionkey"] == asia]
    nat_keys = set(nat["n_nationkey"].astype(int).tolist())
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def _cust(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["c_nationkey"].cast(pa.int64()),
                     pa.array(sorted(nat_keys), pa.int64()))
        f = b.filter(m)
        return pa.table({"custkey": f["c_custkey"],
                         "c_nat": f["c_nationkey"].cast(pa.int64())})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_cust, batch_format="pyarrow")

    def _orders(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"]
        m = pc.and_(pc.greater_equal(d, pa.scalar(pd.Timestamp("1996-01-01"))),
                    pc.less(d, pa.scalar(pd.Timestamp("1997-01-01"))))
        f = b.filter(m)
        return pa.table({"custkey": f["o_custkey"], "orderkey": f["o_orderkey"]})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_orders, batch_format="pyarrow")

    o_cust = hash_join(
        orders, cust, on="custkey",
        num_buckets=_w(sf_dir, "orders", "customer"), coalesce_blocks=16,
        schemas=(pa.schema([("custkey", pa.int64()), ("orderkey", pa.int64())]),
                 pa.schema([("custkey", pa.int64()), ("c_nat", pa.int64())])),
    ).map_batches(lambda df: df[["orderkey", "c_nat"]], batch_format="pandas")

    def _items(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table({"orderkey": b["l_orderkey"],
                         "suppkey": b["l_suppkey"], "rev_s": pa.array(rev)})

    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(_items, batch_format="pyarrow")

    joined = hash_join(
        items, o_cust, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("suppkey", pa.int64()),
                            ("rev_s", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()), ("c_nat", pa.int64())])))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp.rename(columns={"s_suppkey": "suppkey"})
    supp["s_nat"] = supp["s_nationkey"].astype(np.int64)
    enriched = broadcast_join(joined, supp[["suppkey", "s_nat"]], on="suppkey")

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_nat"] == df["s_nat"]].copy()
        d["n_name"] = d["s_nat"].astype(int).map(name_of)
        return d[["n_name", "rev_s"]]

    agg = partial_agg(enriched.map_batches(_local, batch_format="pandas"),
                      ["n_name"], sums=["rev_s"], count_col="n_items",
                      combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["sum_rev_s"].astype(np.int64) / 10000.0
        df["n_items"] = df["n_items"].astype(np.int64)
        return df[["n_name", "revenue", "n_items"]]

    return agg.map_batches(_finish, batch_format="pandas")


def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(status, priority) over orders — subtotals at
    every level from one shuffled pass (finest groups combine once;
    coarser levels re-sum groups, not rows)."""
    from ..stages.joins import rollup_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def _scale(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderstatus": batch["o_orderstatus"],
                         "o_orderpriority": batch["o_orderpriority"],
                         "price_c": pa.array(np.round(p * 100.0).astype(np.int64))})

    out = rollup_agg(ds.map_batches(_scale, batch_format="pyarrow",
                                    zero_copy_batch=True),
                     ["o_orderstatus", "o_orderpriority"], sums=["price_c"],
                     count_col="n_orders")
    out["revenue"] = out["sum_price_c"].astype(np.int64) / 100.0
    return out[["o_orderstatus", "o_orderpriority", "n_orders", "revenue"]]


def q_revenue_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority): all four aggregation levels from
    one shuffled finest-level pass."""
    from ..stages.joins import cube_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def _scale(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"o_orderstatus": batch["o_orderstatus"],
                         "o_orderpriority": batch["o_orderpriority"],
                         "price_c": pa.array(np.round(p * 100.0).astype(np.int64))})

    out = cube_agg(ds.map_batches(_scale, batch_format="pyarrow",
                                  zero_copy_batch=True),
                   ["o_orderstatus", "o_orderpriority"], sums=["price_c"],
                   count_col="n_orders")
    out["revenue"] = out["sum_price_c"].astype(np.int64) / 100.0
    return out[["o_orderstatus", "o_orderpriority", "n_orders", "revenue"]]


def q_pq_topk(sf_dir: str):
    """Product-quantization ANN: codebooks from the hash-spread sample,
    one encode pass (64 floats → 8 bytes/vector), ADC shortlist-128,
    exact re-rank to top-10. Approximate by design → rows-only at the
    driver; recall/identity bounds pinned in tests/test_pq.py."""
    import pyarrow.parquet as pqt

    from ..functions.sketches import bottom_k_sample
    from ..stages.similarity import pq_encode, pq_topk_rerank, pq_train

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    sample = bottom_k_sample(ds, "vec_id", k=256)
    smat = np.stack([np.asarray(v, np.float64) for v in sample["embedding"]])
    books = pq_train(smat, m=8, k=32, iters=12)
    codes = pq_encode(ds, books)
    qtab = pqt.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "=", 0)])
    q = np.asarray(qtab["embedding"][0].as_py(), dtype=np.float64)
    return pq_topk_rerank(codes, ds, books, q, k=10, shortlist=128)


def q_pct_rank_events(sf_dir: str):
    """Per-user percent_rank by value desc (the normalized-rank
    feature), tie-broken by event_id for a total order."""
    from ..stages.events import percent_rank

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = percent_rank(ds, "user_id", ["value", "event_id"],
                       ascending=[False, True],
                       num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "pct_rank"]],
        batch_format="pandas")


def q_bfill_events(sf_dir: str):
    """Per-user backward fill of the value column over planted nulls
    (forward_fill's mirror); nulls planted deterministically on
    event_id % 5 == 0 so the operator has work at every SF."""
    import pyarrow.compute as pc

    from ..stages.events import backward_fill

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _plant(b: pa.Table) -> pa.Table:
        # null out rows where event_id % 5 == 0 (vectorized arithmetic)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False).copy()
        v[eid % 5 == 0] = np.nan
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "ts_us": b["ts_us"], "value": pa.array(v)})

    out = backward_fill(ds.map_batches(_plant, batch_format="pyarrow"),
                        "user_id", "ts_us", "value",
                        num_buckets=_w(sf_dir, "events"),
                        tie_cols=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["v_bfill"] = df["value_bfill"].fillna(-1.0)
        return df[["event_id", "user_id", "ts_us", "v_bfill"]]

    return out.map_batches(_finish, batch_format="pandas")


# --- feature-engineering family (stages/features.py) -------------------

def _events_scaled(sf_dir: str, keep, scale: float = 100.0,
                   value_col: str = "value",
                   out_col: str = "xs") -> "ray.data.Dataset":
    """events with ``value`` → int64 ``out_col`` = round(value*scale).

    value is cent-exact in the fixture, so scale=100 is lossless and
    keeps Σx² inside int64 out to ~10^9 rows per group (beyond that,
    switch the moment partials to float128/hugeint).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=[*keep, value_col])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        out = {c: batch[c] for c in keep}
        out[out_col] = pa.array(np.round(v * scale).astype(np.int64))
        return pa.table(out)

    return ds.map_batches(_scale, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_stddev_value_per_type(sf_dir: str):
    """Per-type variance/stddev of the cent-scaled value: exact int64
    moment partials, closed-form float finish (grouped_variance),
    unscaled by one final division pair the oracle mirrors."""
    from ..stages.features import grouped_variance

    ds = _events_scaled(sf_dir, ["event_type"])
    out = grouped_variance(ds, ["event_type"], "xs").to_pandas()
    out["var_value"] = out["var"] / 1e4
    out["stddev_value"] = out["stddev"] / 1e2
    return out[["event_type", "n", "var_value", "stddev_value"]]


def q_zscore_value(sf_dir: str):
    """Per-row z-score of value within its event_type — the
    fit/transform split: one moment pass, broadcast stat table, no
    payload shuffle (the window-function plan sorts the corpus)."""
    from ..stages.features import zscore_normalize

    ds = _events_scaled(sf_dir, ["event_id", "event_type"])
    out = zscore_normalize(ds, "event_type", "xs", out_col="z")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["z"] = df["z"].fillna(-999.0)
        return df[["event_id", "event_type", "z"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_minmax_value(sf_dir: str):
    """Per-row min-max scaling of value within its user — per-user
    min/max fit broadcast to a map-only transform."""
    from ..stages.features import minmax_normalize

    ds = _events_scaled(sf_dir, ["event_id", "user_id"])
    # user_id is the high-cardinality case -> exercise the JOIN
    # transform path (worker memory O(bucket), not O(users)); the
    # oracle is unchanged because both paths share one float op order
    out = minmax_normalize(ds, "user_id", "xs", out_col="mm",
                           combine="distributed", via="join",
                           num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["mm"] = df["mm"].fillna(-1.0)
        return df[["event_id", "user_id", "mm"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_target_encode_type(sf_dir: str):
    """Mean-target encoding of event_type by value (the classic
    categorical feature): exact int sums, one division, broadcast."""
    from ..stages.features import mean_target_encode

    ds = _events_scaled(sf_dir, ["event_id", "event_type"])
    out = mean_target_encode(ds, "event_type", "xs", out_col="te_s")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["te"] = (df["te_s"] / 100.0).fillna(-1.0)
        return df[["event_id", "event_type", "te"]]

    return out.map_batches(_finish, batch_format="pandas")


DOC_LANGS = ["de", "en", "es", "fr", "zh"]  # frozen vocabulary


def q_lang_onehot_per_source(sf_dir: str):
    """One-hot encode documents.lang (frozen 5-lang vocabulary), then
    sum the indicator block per source — the lang-mix design matrix.
    Map-only encode; the only shuffle is the O(sources) aggregate."""
    from ..stages.features import one_hot

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])
    hot = one_hot(ds, "lang", categories=DOC_LANGS)
    out = partial_agg(hot.drop_columns(["lang"]), ["source"],
                      sums=[f"is_{c}" for c in DOC_LANGS],
                      count_col="n_docs", combine="driver").to_pandas()
    cols = {f"sum_is_{c}": f"n_{c}" for c in DOC_LANGS}
    out = out.rename(columns=cols)
    return out[["source", "n_docs", *cols.values()]]


HIST_WIDTH = 250.0  # 2.50 value units on the cent-scaled axis


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram of the scaled value: floor-binning map +
    O(bins) count aggregate — bins bounded by value range, not corpus."""
    from ..stages.features import histogram

    ds = _events_scaled(sf_dir, [])
    out = histogram(ds, "xs", HIST_WIDTH).to_pandas()
    out = out.rename(columns={"n": "n_rows"})
    return out[["bin", "n_rows"]]


def q_multi_lag_value(sf_dir: str):
    """lag-1/2/3 value features per user (autoregressive block): ONE
    shuffle + per-bucket sort produces all three lag columns."""
    from ..stages.features import multi_lag

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = multi_lag(ds, "user_id", "ts_us", "value", lags=(1, 2, 3),
                    num_buckets=_w(sf_dir, "events"),
                    extra_order=["event_id"], leads=(1,))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        for k in (1, 2, 3):
            df[f"lag_{k}"] = df[f"lag_{k}"].fillna(-1.0)
        df["lead_1"] = df["lead_1"].fillna(-1.0)
        return df[["event_id", "user_id", "ts_us", "value",
                   "lag_1", "lag_2", "lag_3", "lead_1"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_cume_dist_events(sf_dir: str):
    """Per-user cume_dist by value (the ECDF feature beside
    percent_rank), tie-broken by event_id for a total order."""
    from ..stages.events import cume_dist

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = cume_dist(ds, "user_id", ["value", "event_id"],
                    num_buckets=_w(sf_dir, "events"))
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "cume_dist"]],
        batch_format="pandas")


def q_price_qty_regression(sf_dir: str):
    """regr_slope/intercept of extendedprice on quantity per
    returnflag — grouped_corr's sibling moment aggregate; floor-int
    inputs, closed-form float finish mirrored by the oracle."""
    from ..stages.joins import grouped_regression

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def _scale(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "qs": pa.array(np.floor(q).astype(np.int64)),
                         "ps": pa.array(np.floor(p).astype(np.int64))})

    return grouped_regression(ds.map_batches(_scale, batch_format="pyarrow",
                                             zero_copy_batch=True),
                              ["l_returnflag"], "qs", "ps")


DAY_US = 86_400_000_000


def q_daily_order_vs_ship(sf_dir: str):
    """FULL OUTER join of two daily aggregates — orders placed vs
    quantity shipped per day (ship days extend past order days on both
    ends, so both unmatched directions are exercised).  Two O(days)
    partial_aggs, one outer hash_join, sentinel fills."""
    from ..stages.joins import hash_join

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderdate"])
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_shipdate", "l_quantity"])

    def _oday(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(d // DAY_US)})

    def _lday(batch: pa.Table) -> pa.Table:
        d = batch["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(d // DAY_US),
                         "qs": pa.array(np.floor(q).astype(np.int64))})

    # both aggregates are O(days) — driver combine is the right plan at
    # ANY corpus size (partial size = days x blocks; a distributed
    # combine paid 3 shuffles of overhead to move ~2,500 rows), and it
    # materializes the sides so the outer join's TaggedUnion cannot
    # re-execute the upstream for schema inference
    o_agg = partial_agg(orders.map_batches(_oday, batch_format="pyarrow"),
                        ["day"], count_col="n_orders", combine="driver")
    l_agg = partial_agg(li.map_batches(_lday, batch_format="pyarrow"),
                        ["day"], sums=["qs"], combine="driver")
    l_agg = l_agg.map_batches(
        lambda df: df[["day", "sum_qs"]], batch_format="pandas")

    joined = hash_join(o_agg, l_agg, "day", how="outer", num_buckets=8)

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].fillna(-1).astype(np.int64)
        df["ship_qty"] = df["sum_qs"].fillna(-1).astype(np.int64)
        return df[["day", "n_orders", "ship_qty"]]

    return joined.map_batches(_finish, batch_format="pandas")


def q_robust_value_per_type(sf_dir: str):
    """Robust scaling (x − median)/IQR of value within its event_type —
    quantile fit (one CDF walk, DuckDB quantile_cont-exact) broadcast
    to a map-only transform."""
    from ..stages.features import robust_scale

    ds = _events_scaled(sf_dir, ["event_id", "event_type"])
    out = robust_scale(ds, "event_type", "xs", out_col="rs")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["rs"] = df["rs"].fillna(-999.0)
        return df[["event_id", "event_type", "rs"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_count_encode_type(sf_dir: str):
    """Frequency encoding of event_type: each row annotated with its
    category's corpus count (exact int64)."""
    from ..stages.features import count_encode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type"])
    out = count_encode(ds, "event_type", out_col="ce")
    return out.map_batches(
        lambda df: df[["event_id", "event_type", "ce"]],
        batch_format="pandas")


def q_lang_source_cross(sf_dir: str):
    """Feature crossing lang × source on documents (Arrow string-join
    kernel, map-only) then the crossed-category count table — the
    interaction feature's vocabulary with frequencies."""
    from ..stages.features import feature_cross

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"])
    crossed = feature_cross(ds, ["lang", "source"], out_col="lang_source")
    out = partial_agg(crossed.select_columns(["lang_source"]),
                      ["lang_source"], count_col="n_docs",
                      combine="driver").to_pandas()
    return out[["lang_source", "n_docs"]]


def q_lineitem_unpivot(sf_dir: str):
    """Wide → long on lineitem's four measure columns (the melt that
    feeds long-form feature stores) — map-only Arrow kernel, raw
    doubles pass through untouched so parity is trivial."""
    from ..stages.features import unpivot

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"])
    out = unpivot(ds, ["l_orderkey", "l_linenumber"],
                  ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
                  var_col="measure", value_col="value")

    def _cast(df: pd.DataFrame) -> pd.DataFrame:
        df["l_linenumber"] = df["l_linenumber"].astype(np.int64)
        return df

    return out.map_batches(_cast, batch_format="pandas")


def q_quantile_bin_value(sf_dir: str):
    """Quartile (equal-frequency) binning of the cent-scaled value —
    quantile-fit boundaries broadcast to one searchsorted per batch."""
    from ..stages.features import quantile_bin

    ds = _events_scaled(sf_dir, ["event_id"])
    out = quantile_bin(ds, "xs", k=4)
    return out.map_batches(lambda df: df[["event_id", "qbin"]],
                           batch_format="pandas")


def q_train_test_split(sf_dir: str):
    """Leakage-safe 90/5/5 split assigned by USER hash (all of a
    user's events share a split), plus the per-split row counts as a
    compact check surface.  Map-only assignment + O(3) aggregate."""
    from ..stages.features import hash_split

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    out = hash_split(ds, "user_id")
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "split"]],
        batch_format="pandas")


def q_winsorized_value(sf_dir: str):
    """Per-type winsorization of the cent-scaled value to the
    [p05, p95] band (outlier clipping before scaling) — quantile fit
    broadcast to one vectorized clip per batch."""
    from ..stages.features import winsorize

    ds = _events_scaled(sf_dir, ["event_id", "event_type"])
    out = winsorize(ds, "event_type", "xs", lo_q=0.05, hi_q=0.95,
                    out_col="ws")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["w"] = df["ws"] / 100.0
        return df[["event_id", "event_type", "w"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_ordered_te_value(sf_dir: str):
    """Leakage-free (ordered/CatBoost) target encoding: each event's
    mean value over STRICTLY EARLIER events of its type — the
    time-respecting sibling of target_encode_type."""
    from ..stages.features import ordered_target_encode

    ds = _events_us(sf_dir, ["event_id", "event_type", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "ts_us": batch["ts_us"],
                         "xs": pa.array(np.round(v * 100.0).astype(np.int64))})

    out = ordered_target_encode(
        ds.map_batches(_scale, batch_format="pyarrow"),
        "event_type", "ts_us", "xs", out_col="ote_s",
        num_buckets=_w(sf_dir, "events"), extra_order=["event_id"])

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["ote"] = (df["ote_s"] / 100.0).fillna(-1.0)
        return df[["event_id", "event_type", "ote"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_running_peak_value(sf_dir: str):
    """Per-user running max/min of value (high-watermark / drawdown
    features) — expanding extrema from the one-shuffle bucket plan."""
    from ..stages.features import cumulative_extrema

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = cumulative_extrema(ds, "user_id", "ts_us", "value",
                             num_buckets=_w(sf_dir, "events"),
                             extra_order=["event_id"],
                             max_col="vmax", min_col="vmin")
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "ts_us", "vmax", "vmin"]],
        batch_format="pandas")


def q_pca_embeddings(sf_dir: str):
    """Distributed PCA: fit on the embeddings table (one two-moment
    partial pass, driver eigh of the 64x64 covariance), then project
    every vector to the top-8 components. Not SQL-expressible (eigh);
    pinned against single-process numpy PCA in tests/test_pca.py."""
    from ..stages.encode import fit_pca, pca_project

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    mean, comps, vals = fit_pca(ds, "embedding", k=8)
    out = pca_project(ds, mean, comps, "embedding", out_col="pca")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        # expose the leading coordinate as a scalar check surface
        df["pc1"] = [float(v[0]) for v in df["pca"]]
        return df[["vec_id", "pc1"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_impute_value(sf_dir: str):
    """Mean imputation over planted nulls (event_id % 7 == 0 nulled,
    as in bfill_events): per-type mean of the OBSERVED cent values
    fills the holes."""
    from ..stages.features import mean_impute

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "value"])

    def _plant(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy(zero_copy_only=False)
        xs = np.round(v * 100.0)
        xs[eid % 7 == 0] = np.nan
        # from_pandas=True: NaN becomes a true Arrow NULL, not a float
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "xs": pa.array(xs, from_pandas=True)})

    out = mean_impute(ds.map_batches(_plant, batch_format="pyarrow"),
                      "event_type", "xs", out_col="filled")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["v_filled"] = df["filled"] / 100.0
        return df[["event_id", "event_type", "v_filled"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_ordinal_encode_type(sf_dir: str):
    """Ordinal (label) encoding of event_type by sorted-vocabulary
    index — map-only after one distinct aggregate."""
    from ..stages.features import ordinal_encode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type"])
    out = ordinal_encode(ds, "event_type", out_col="oe")
    return out.map_batches(
        lambda df: df[["event_id", "event_type", "oe"]],
        batch_format="pandas")


def q_rolling_1h_stats(sf_dir: str):
    """Per-user trailing-1h mean AND std of the cent value — the
    volatility window feature (rolling_1h_sum's second moment)."""
    from ..stages.events import rolling_time_moments

    ds = _events_scaled(sf_dir, ["event_id", "user_id", "ts"])

    def _us(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64())
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts_us": t, "xs": batch["xs"]})

    out = rolling_time_moments(ds.map_batches(_us, batch_format="pyarrow"),
                               "user_id", "ts_us", "xs", span_us=HOUR_US,
                               num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["roll_mean_v"] = df["roll_mean"] / 100.0
        df["roll_std_v"] = (df["roll_std"] / 100.0).fillna(-1.0)
        return df[["event_id", "user_id", "ts_us",
                   "roll_mean_v", "roll_std_v"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_feature_store_events(sf_dir: str):
    """THE composed feature_eng flagship: one-shuffle per-user window
    block (lags/lead/rolling 1h mean+std/extrema/dt_prev) + broadcast
    z-score + hash split — the full per-event training feature table,
    every column DuckDB-hash-checked in one query."""
    from .feature_store import feature_store_pipeline

    out = feature_store_pipeline(sf_dir, num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("lag_1", "lag_2", "lead_1", "dt_prev"):
            df[c] = df[c].fillna(-1.0)
        df["roll_mean_v"] = df["roll_mean"] / 100.0
        df["roll_std_v"] = (df["roll_std"] / 100.0).fillna(-1.0)
        df["z"] = df["z"].fillna(-999.0)
        return df[["event_id", "user_id", "ts_us", "value",
                   "lag_1", "lag_2", "lead_1", "dt_prev",
                   "vmax", "vmin", "roll_mean_v", "roll_std_v",
                   "z", "split"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_skew_kurt_per_type(sf_dir: str):
    """Skewness + excess kurtosis of the unit-scaled value per type —
    the 3rd/4th-moment aggregate (exact int64 moment partials, one
    mirrored float finish; floor-unit scale keeps Σx⁴ in int64)."""
    from ..stages.joins import grouped_skew_kurt

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "xs": pa.array(np.floor(v).astype(np.int64))})

    out = grouped_skew_kurt(ds.map_batches(_scale, batch_format="pyarrow",
                                           zero_copy_batch=True),
                            ["event_type"], "xs").to_pandas()
    out["skew"] = out["skew"].fillna(-999.0)
    out["kurt"] = out["kurt"].fillna(-999.0)
    return out[["event_type", "n", "skew", "kurt"]]


def q_value_percentile(sf_dir: str):
    """Global ECDF transform of the cent value (QuantileTransformer's
    rank step == cume_dist over the whole corpus): value-domain-bounded
    frequency fit broadcast to one searchsorted per batch."""
    from ..stages.features import quantile_transform

    ds = _events_scaled(sf_dir, ["event_id"])
    out = quantile_transform(ds, "xs", out_col="pctl")
    return out.map_batches(lambda df: df[["event_id", "pctl"]],
                           batch_format="pandas")


def q_profile_events(sf_dir: str):
    """Single-pass numeric profile of the events table (row/null
    counts, min/max per column) — the pre-training hygiene report;
    the exact fields are SQL-checked, the HLL distinct estimate is
    covered separately (approx_distinct_users)."""
    from ..stages.prep import profile_columns

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])
    out = profile_columns(ds, ["event_id", "user_id", "value"])
    out = out.rename(columns={"min": "min_v", "max": "max_v"})
    out["min_v"] = out["min_v"].astype(np.float64)
    out["max_v"] = out["max_v"].astype(np.float64)
    return out[["column", "n_rows", "n_nulls", "min_v", "max_v"]]


def q_kfold_users(sf_dir: str):
    """5-fold CV assignment by user hash (all of a user's events share
    a fold) — hash_split's cross-validation sibling."""
    from ..stages.features import kfold_assign

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id"])
    out = kfold_assign(ds, "user_id", k=5)
    return out.map_batches(
        lambda df: df[["event_id", "user_id", "fold"]],
        batch_format="pandas")


# ---------------------------------------------------------------------------
# round-4 skew machinery (chunked as-of, auto-salted join)
# ---------------------------------------------------------------------------

def q_asof_chunked_hot(sf_dir: str):
    """The purchase→click point-in-time join run through the HOT-ENTITY
    CHUNKED as-of path: every user above 0.5% of click rows is treated
    as hot and split into ~16-row time-range chunks with boundary-carry
    halo rows (stages/asof.py asof_join_chunked). Output must be
    bit-identical to the plain as-of — same oracle SQL as
    ``asof_purchase_click`` — while no bucket task ever holds a hot
    key's full history (the 100 TB skew case TaggedUnion refuses to
    salt)."""
    from ..stages.asof import asof_join_chunked, plan_hot_chunks
    from ..stages.skew import detect_hot_keys

    ev = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])

    def _purchases(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "purchase"]
        return d[["event_id", "user_id", "ts_us", "value"]]

    def _clicks(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["event_type"] == "click"].copy()
        d = d.rename(columns={"event_id": "c_event", "value": "c_value"})
        return d[["c_event", "user_id", "ts_us", "c_value"]]

    purchases = ev.map_batches(_purchases, batch_format="pandas")
    clicks = ev.map_batches(_clicks, batch_format="pandas")
    hot = detect_hot_keys(clicks, "user_id", threshold_frac=0.005)
    cuts = plan_hot_chunks(clicks, "user_id", "ts_us", hot,
                           rows_per_chunk=16)
    joined = asof_join_chunked(
        purchases, clicks, key="user_id", left_ts="ts_us",
        right_ts="ts_us", direction="backward", hot_cuts=cuts,
        num_buckets=_w(sf_dir, "events"), coalesce_blocks=16,
        schemas=(pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                            ("ts_us", pa.int64()), ("value", pa.float64())]),
                 pa.schema([("c_event", pa.int64()), ("user_id", pa.int64()),
                            ("ts_us", pa.int64()), ("c_value", pa.float64())])))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["c_event_r"] = df["c_event_r"].fillna(-1).astype(np.int64)
        df["c_value_r"] = df["c_value_r"].fillna(-1.0).astype(np.float64)
        return df[["event_id", "user_id", "ts_us", "value",
                   "c_event_r", "c_value_r"]]

    return joined.map_batches(_finish, batch_format="pandas")


def q_salted_join_revenue(sf_dir: str):
    """revenue_per_nation routed through ``auto_join(salt_threshold=)``
    — the bucketed fact⨝dim plan with AUTOMATIC hot-key detection and
    salting composed inside one call (detect_hot_keys → salt_hot). At
    sf each supplier carries ~1/#suppliers of lineitem, so the 0.4%
    threshold flags real keys and the whole join runs salted; the
    oracle (same SQL as revenue_per_nation) pins that salting never
    changes output."""
    import pyarrow.parquet as pq

    from ..stages.joins import auto_join

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    small = supp.merge(nat, left_on="s_nationkey",
                       right_on="n_nationkey")[["s_suppkey", "n_name"]]
    small = small.rename(columns={"s_suppkey": "l_suppkey"})

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_extendedprice",
                                        "l_discount"])

    def _scale(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        return pa.table({"l_suppkey": batch["l_suppkey"],
                         "rev_s": pa.array(rev)})

    left = ds.map_batches(_scale, batch_format="pyarrow",
                          zero_copy_batch=True)
    joined = auto_join(
        left, ray.data.from_pandas(small), on="l_suppkey", how="inner",
        broadcast_limit=0,            # force the bucketed plan
        salt_threshold=0.004, salt_n=4,
        num_buckets=_w(sf_dir, "lineitem"), coalesce_blocks=16,
        schemas=(pa.schema([("l_suppkey", pa.int64()),
                            ("rev_s", pa.int64())]),
                 pa.schema([("l_suppkey", pa.int64()),
                            ("n_name", pa.string())])))
    agg = partial_agg(joined, ["n_name"], sums=["rev_s"],
                      count_col="n_items", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["sum_rev_s"].astype(np.int64) / 10000.0
        df["n_items"] = df["n_items"].astype(np.int64)
        return df[["n_name", "revenue", "n_items"]]

    return agg.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# round 4: corpus-curation family (stages/curation.py)
# ---------------------------------------------------------------------------

def q_ngram_repetition(sf_dir: str):
    """Gopher-style repetition quality stats per document (top-2-gram
    fraction + duplicate-3-gram fraction), exact word-n-gram counts on
    per-batch dictionary codes — bit-exact vs the SQL gram-grouping
    oracle. Stateless map: streams at any scale."""
    from ..stages.curation import ngram_repetition

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ngram_repetition(ds)


def _docs_mod_filter(sf_dir: str, mod: int, want_eq: bool):
    """documents rows with (doc_id % mod == 0) == want_eq, pruned read +
    vectorized mask."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def _mask(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % mod == 0) == want_eq
        return batch.filter(pa.array(m))

    return ds.map_batches(_mask, batch_format="pyarrow", zero_copy_batch=True)


def q_contamination(sf_dir: str):
    """GPT-3-style benchmark decontamination scoring: every 50th doc
    plays the eval benchmark; the remaining corpus is scored by the
    fraction of its DISTINCT word-3-grams that appear in the benchmark
    gram set (broadcast once per actor). Flag at >= 1/5 overlap."""
    from ..stages.curation import collect_benchmark_ngrams, contamination_check

    bench = _docs_mod_filter(sf_dir, 50, True)
    grams = collect_benchmark_ngrams(bench, n=3)
    scored = _docs_mod_filter(sf_dir, 50, False)
    return contamination_check(scored, grams, n=3)


def q_bloom_new_docs(sf_dir: str):
    """Incremental dedup of a new corpus slice against the existing
    corpus: Bloom-miss rows ship straight through (provably new, zero
    shuffle); only Bloom-hit candidates enter the exact bucketed ANTI
    join. Output is bit-exact NOT EXISTS semantics."""
    from ..stages.curation import bloom_new_docs

    corpus = _docs_mod_filter(sf_dir, 5, True)
    new = _docs_mod_filter(sf_dir, 5, False)
    sch = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    return bloom_new_docs(new, corpus, num_buckets=_w(sf_dir, "documents"),
                          schemas=(sch, sch))


def q_token_budget(sf_dir: str):
    """Token-budget selection: longest-docs-first (n_words DESC, doc_id)
    until 50% of the corpus words — the distributed ordered prefix-sum
    (pack_sequences' scan pattern over a composite order key)."""
    from ..stages.curation import token_budget_select

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return token_budget_select(ds, budget_frac=0.5,
                               n_docs=table_rows(sf_dir, "documents"))


def q_mixture_sample(sf_dir: str):
    """Deterministic domain-mixture downsampling: per-source keep rates
    (src k -> (k%4+1)*25%) applied by the DuckDB-pinned hash of doc_id —
    map-only, stable under repartitioning, native-SQL oracle."""
    from ..stages.curation import mixture_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    srcs = sorted(ds.unique("source"))     # O(sources) on the driver
    rates = {s: (int(s[3:]) % 4 + 1) * 2500 for s in srcs}
    return mixture_sample(ds, rates)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the embeddings: k-means clusters -> within-cluster
    cosine pairs -> distributed components -> keep min id. Rows-only
    (iterative k-means isn't SQL); planted recall pinned in tests."""
    from ..stages.curation import semantic_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    # iterative stages (Lloyd rounds + CC rounds): width from the data
    # term with a small floor — the 64-wide cluster default multiplies
    # fixed per-bucket overhead by every iteration
    return semantic_dedup(ds, dim=64, n_clusters=8, tau=0.95,
                          num_buckets=shuffle_width(
                              table_bytes(sf_dir, "embeddings"),
                              floor=8, cluster_cap=8))


def q_pivot_event_counts(sf_dir: str):
    """Long-to-wide pivot: per user, one count column per event type
    (frozen 5-type vocabulary) — the inverse of lineitem_unpivot.
    Per-batch indicator partials -> ONE bucketed skinny shuffle."""
    from ..stages.features import pivot_counts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return pivot_counts(ds, "user_id", "event_type",
                        ["click", "error", "purchase", "signup", "view"],
                        num_buckets=_w(sf_dir, "events"))


def q_curation_pipeline(sf_dir: str):
    """The composed curation flagship: quality filter (>= 20 words,
    dup-3-gram fraction <= 0.2) -> decontaminate vs the every-50th-doc
    benchmark (< 1/5 distinct-gram overlap) -> token-budget select 50%
    of the survivors' words, longest-first. One fused read pass
    computes all three per-doc signals; only skinny (doc_id, n_words)
    rows enter the budget scan."""
    from ..stages.curation import collect_benchmark_ngrams, curate

    bench = _docs_mod_filter(sf_dir, 50, True)
    grams = collect_benchmark_ngrams(bench, n=3)
    scored = _docs_mod_filter(sf_dir, 50, False)
    return curate(scored, grams, min_words=20, max_dup3_frac=0.2,
                  budget_frac=0.5, n_docs=table_rows(sf_dir, "documents"))


def q_chunk_dedup(sf_dir: str):
    """C4-style paragraph dedup: 8-word chunks, keep each distinct
    chunk string only at its first (doc_id, chunk_idx) occurrence,
    reassemble the surviving chunks per document."""
    from ..stages.curation import chunk_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return chunk_dedup(ds, chunk_words=8,
                       num_buckets=_w(sf_dir, "documents"))


def q_oov_rate(sf_dir: str):
    """Vocabulary pruning: fit the global top-20 words by term
    frequency (ties word-ascending), then score every document's
    out-of-vocabulary word fraction against the broadcast vocabulary —
    the tokenizer-coverage gate of a curation pipeline."""
    from ..stages.text import fit_vocab_topv, oov_rate

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    vocab = fit_vocab_topv(ds, 20, num_buckets=_w(sf_dir, "documents"))
    return oov_rate(ds, vocab)


def q_balanced_docs(sf_dir: str):
    """Class balancing: downsample every language to the size of the
    SMALLEST language class, deterministically (smallest DuckDB-hash
    doc_ids win) — the class-equalization step before training."""
    from ..functions.sketches import stratified_bottom_k
    from ..stages.joins import partial_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    counts = partial_agg(ds, ["lang"], sums=(), count_col="n",
                         num_buckets=4).to_pandas()  # O(languages)
    k = int(counts["n"].min())
    out = stratified_bottom_k(ds, "lang", "doc_id", k=k,
                              num_buckets=_w(sf_dir, "documents"))
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["lang", "doc_id"]]


def q_chunk_dedup_local(sf_dir: str):
    """Intra-document chunk dedup: drop repeated 8-word chunks within
    the SAME document (keep first), reassemble — zero-shuffle map."""
    from ..stages.curation import chunk_dedup_local

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return chunk_dedup_local(ds, chunk_words=8)


def q_temperature_sample(sf_dir: str):
    """Temperature-flattened language sampling (alpha = 0.5): keep
    min(n, ceil(sqrt(n) * 4)) docs per language, smallest-hash-first —
    the multilingual head-flattening rule."""
    from ..stages.curation import temperature_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])
    out = temperature_sample(ds, "lang", "doc_id", alpha=0.5, scale=4.0,
                             num_buckets=_w(sf_dir, "documents"))
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["lang", "doc_id"]]


def q_funnel_stages(sf_dir: str):
    """Ordered conversion funnel signup -> click -> purchase: per user
    the earliest strictly-increasing timestamp chain and the stage
    reached. ONE user-bucketed shuffle, vectorized cascade."""
    from ..stages.events import funnel_stages

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id",
                                        "event_type", "ts"])
    return funnel_stages(ds, ["signup", "click", "purchase"],
                         num_buckets=_w(sf_dir, "events"))


def q_throttle_events(sf_dir: str):
    """Debounce: drop events within 1 hour of the previous event of the
    same (user, type) stream (lag semantics, deterministic ties)."""
    from ..stages.events import throttle_events

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id",
                                        "event_type", "ts"])
    return throttle_events(ds, 3_600_000_000,
                           num_buckets=_w(sf_dir, "events"))


def q_ngram_novelty(sf_dir: str):
    """Per-doc novelty: fraction of the doc's distinct 3-grams whose
    global first owner (min doc_id) is the doc itself."""
    from ..stages.curation import ngram_novelty

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ngram_novelty(ds, n=3, num_buckets=_w(sf_dir, "documents"))


def q_cohort_retention(sf_dir: str):
    """Retention triangle: distinct users per (first-activity cohort
    day, day offset) — per-batch (user, day) distinct pre-combine,
    one user-bucketed shuffle, O(cohorts x offsets) combine."""
    from ..stages.events import cohort_retention

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])
    return cohort_retention(ds, num_buckets=_w(sf_dir, "events"))


# ---------------------------------------------------------------------------
# round 4: PII detection / redaction (stages/pii.py)
# ---------------------------------------------------------------------------

def q_redact_pii(sf_dir: str):
    """Compliance scrub: deterministic synthetic-PII augmentation (so
    the fixture corpus has REAL matches), then per-row RE2 counts +
    sequential redaction. Two stateless zero-copy Arrow maps — no
    shuffle, no state; bit-identical to the DuckDB RE2 oracle."""
    from ..stages.pii import augment_with_pii, redact_pii

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return (ds
            .map_batches(augment_with_pii, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(redact_pii, batch_format="pyarrow",
                         zero_copy_batch=True))


def q_pii_per_source(sf_dir: str):
    """Per-source PII prevalence rollup: augmented detection flags ->
    per-batch partial sums -> O(sources) driver combine. The routing
    report a redaction job emits alongside the scrubbed corpus."""
    import pyarrow.compute as pc

    from ..stages.pii import augment_with_pii, pii_flags

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    aug = ds.map_batches(augment_with_pii, batch_format="pyarrow",
                         zero_copy_batch=True)

    def _flags(batch: pa.Table) -> pa.Table:
        t = pii_flags(batch, id_col="source")
        return t.set_column(t.schema.get_field_index("has_pii"),
                            "pii_docs", pc.cast(t["has_pii"], pa.int64()))

    flat = aug.map_batches(_flags, batch_format="pyarrow",
                           zero_copy_batch=True)
    agg = partial_agg(flat, ["source"],
                      sums=["n_email", "n_ipv4", "n_phone", "pii_docs"],
                      count_col="n_docs", combine="driver")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        for c in ["sum_n_email", "sum_n_ipv4", "sum_n_phone",
                  "sum_pii_docs", "n_docs"]:
            df[c] = df[c].astype(np.int64)
        return df[["source", "sum_n_email", "sum_n_ipv4", "sum_n_phone",
                   "sum_pii_docs", "n_docs"]]

    return agg.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# round 4: LM familiarity, weighted sampling, Q13/Q18 shapes, rolling median
# ---------------------------------------------------------------------------

def q_lm_familiarity(sf_dir: str):
    """Count-weighted bigram familiarity per document (n-gram LM
    cross-entropy stand-in with exact-integer fields)."""
    from ..stages.curation import lm_familiarity

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return lm_familiarity(ds, n=2, num_buckets=_w(sf_dir, "documents"))


def q_weighted_sample_docs(sf_dir: str):
    """Deterministic weight-proportional sample: 20 docs by smallest
    hash/n_chars priority (longer docs more likely). Per-batch partial
    bottom-k, O(k x blocks) driver merge."""
    from ..functions.sketches import weighted_bottom_k_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars"])
    out = weighted_bottom_k_sample(ds, "doc_id", "n_chars", k=20)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["doc_id", "n_chars"]]


def q_orders_per_customer_dist(sf_dir: str):
    """TPC-H Q13 shape: order count per customer INCLUDING zero-order
    customers (the left-outer wrinkle), then the count-of-counts
    distribution. Plan: distributed per-customer order counts (exact
    partials, one bucketed combine) -> large x large LEFT hash join
    against the customer key column -> O(distinct counts) driver
    combine. Customers never broadcast; both fact scans are pruned to
    the key columns."""
    from ..stages.joins import hash_join, partial_agg

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(lambda b: pa.table({"custkey": b["c_custkey"]}),
                  batch_format="pyarrow")

    oc = partial_agg(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"]),
        ["o_custkey"], count_col="c_count", combine="distributed",
        num_buckets=_w(sf_dir, "orders"),
    ).map_batches(
        lambda df: df.rename(columns={"o_custkey": "custkey"}),
        batch_format="pandas")

    joined = hash_join(
        cust, oc, on="custkey", how="left",
        num_buckets=_w(sf_dir, "customer", "orders"),
        schemas=(pa.schema([("custkey", pa.int64())]),
                 pa.schema([("custkey", pa.int64()),
                            ("c_count", pa.int64())])),
    ).map_batches(
        lambda df: pd.DataFrame(
            {"c_count": df["c_count"].fillna(0).astype(np.int64)}),
        batch_format="pandas")

    dist = partial_agg(joined, ["c_count"], count_col="custdist",
                       combine="driver")
    return dist.map_batches(
        lambda df: df.assign(custdist=df["custdist"].astype(np.int64))[
            ["c_count", "custdist"]],
        batch_format="pandas")


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    250, enriched with the customer name, top-100 by price. Plan:
    distributed per-order quantity sums (quantities are integer-valued,
    so double partials are exact in any order) -> HAVING filter ->
    large x large inner hash join with orders -> distributed
    sort+limit(100) -> the <=100 survivors fetch their customer rows
    via a pushed-down point-filter read (top-k BEFORE the dimension
    join: the customer table never shuffles)."""
    import pyarrow.parquet as pq

    from ..stages.joins import hash_join, partial_agg

    qty = partial_agg(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_quantity"]),
        ["l_orderkey"], sums=["l_quantity"], combine="distributed",
        num_buckets=_w(sf_dir, "lineitem"),
    ).map_batches(
        lambda df: df.loc[df["sum_l_quantity"] > 250.0,
                          ["l_orderkey", "sum_l_quantity"]]
        .rename(columns={"l_orderkey": "orderkey"}),
        batch_format="pandas")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b: pa.table({"orderkey": b["o_orderkey"],
                            "o_custkey": b["o_custkey"],
                            "o_totalprice": b["o_totalprice"]}),
        batch_format="pyarrow")

    top = hash_join(
        orders, qty, on="orderkey", how="inner",
        num_buckets=_w(sf_dir, "orders", "lineitem"),
        schemas=(pa.schema([("orderkey", pa.int64()),
                            ("o_custkey", pa.int64()),
                            ("o_totalprice", pa.float64())]),
                 pa.schema([("orderkey", pa.int64()),
                            ("sum_l_quantity", pa.float64())])),
    ).map_batches(
        lambda df: df.assign(_negp=-df["o_totalprice"].to_numpy()),
        batch_format="pandas",
    ).sort(["_negp", "orderkey"]).limit(100).to_pandas()

    keys = sorted(top["o_custkey"].unique().tolist())
    names = pq.read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name"],
                          filters=[("c_custkey", "in", keys)]).to_pandas()
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey")
    out["sum_qty"] = np.round(out["sum_l_quantity"]).astype(np.int64)
    out = out.sort_values(["_negp", "orderkey"],
                          kind="mergesort").reset_index(drop=True)
    return out[["orderkey", "o_custkey", "c_name", "o_totalprice",
                "sum_qty"]]


def q_rolling_median_value(sf_dir: str):
    """Per-user rolling 5-row MEDIAN of value (order-statistics moving
    window — a different kernel class from the algebraic rolling sum).
    Cent-scaled ints keep the two-middle-values average bit-stable vs
    SQL median() OVER."""
    from ..stages.events import rolling_agg

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts_us": batch["ts_us"],
                         "value_c": pa.array(
                             np.round(v * 100.0).astype(np.int64))})

    out = rolling_agg(ds.map_batches(_scale, batch_format="pyarrow"),
                      "user_id", "ts_us", "value_c", window_rows=5,
                      num_buckets=_w(sf_dir, "events"),
                      tie_cols=["event_id"], agg="median")

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        df["roll5_median"] = df["value_c_rollmedian5"] / 100.0
        return df[["event_id", "user_id", "ts_us", "roll5_median"]]

    return out.map_batches(_finish, batch_format="pandas")


def q_event_transitions(sf_dir: str):
    """Markov transition matrix of event types over each user's ordered
    stream: exact (from, to) adjacency counts + conditional probability.
    ONE user-bucketed shuffle; O(types^2) partials to the driver."""
    from ..stages.events import event_transitions

    ds = _events_us(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    out = event_transitions(ds, "user_id", "event_type",
                            ["ts_us", "event_id"],
                            num_buckets=_w(sf_dir, "events"))
    return out[["from_type", "to_type", "n", "p"]]


def q_corpus_diff(sf_dir: str):
    """Snapshot diff between two deterministic corpus versions (old
    drops doc_id%10==7, new drops %10==4 and rewrites %6==0 docs):
    added/removed/changed/unchanged per id via skinny md5 rows + ONE
    FULL OUTER hash join — text never shuffles."""
    import pyarrow.compute as pc

    from ..stages.curation import corpus_diff

    def _read():
        return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                     columns=["doc_id", "text"])

    def _old(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 10 != 7))

    def _new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(ids % 10 != 4))
        ids2 = b["doc_id"].to_numpy(zero_copy_only=False)
        changed = pa.array(ids2 % 6 == 0)
        txt = pc.if_else(changed,
                         pc.binary_join_element_wise(b["text"], " v2", ""),
                         b["text"])
        return pa.table({"doc_id": b["doc_id"], "text": txt})

    old = _read().map_batches(_old, batch_format="pyarrow",
                              zero_copy_batch=True)
    new = _read().map_batches(_new, batch_format="pyarrow",
                              zero_copy_batch=True)
    return corpus_diff(old, new, num_buckets=_w(sf_dir, "documents"))


def q_link_pagerank(sf_dir: str):
    """PageRank over a deterministic synthetic citation graph (doc i ->
    (7i+3) mod N and (3i+1) mod N): join-based iterations, rank table
    never broadcast or collected.  Oracled: ranks are emitted on the
    1e-9 grid (half-away-from-zero, the engine's standard SQL-round
    mirror) and the DuckDB side unrolls the same 3 synchronous
    iterations in CTEs — float summation order differs by ~1e-17,
    ~8 decimal orders under the grid, so the scaled ints are stable."""
    from ..stages.graph import pagerank

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def _edges(batch: pa.Table) -> pa.Table:
        s = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([s, s])
        dst = np.concatenate([(s * 7 + 3) % n, (s * 3 + 1) % n])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = ds.map_batches(_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    # width from the KNOWN edge count (2 per doc), not the document
    # table bytes: a 10k-edge graph shuffled 64-wide spends the whole
    # run on per-bucket task overhead x 3 iterations x 4 stages
    ranks = pagerank(edges, iters=3,
                     num_buckets=shuffle_width(2 * n * 16, floor=8,
                                               cluster_cap=8))

    def _scale(df: pd.DataFrame) -> pd.DataFrame:
        s = df["rank"].to_numpy(np.float64) * 1e9
        r = np.where(s >= 0, np.floor(s + 0.5), -np.floor(-s + 0.5))
        return pd.DataFrame({"node": df["node"].astype(np.int64),
                             "rank_e9": r.astype(np.int64)})

    return ranks.map_batches(_scale, batch_format="pandas")


def q_mad_value_per_type(sf_dir: str):
    """Median absolute deviation per group — the robust dispersion
    stat (two chained quantile fits: grouped median -> broadcast ->
    grouped median of |x - med|). Exactness: deviations are computed
    on the DOUBLED cent grid (2*median is always integral), so the
    second CDF walk stays integer and the final *0.5/100 rescale is
    exact — bit-stable vs quantile_cont(abs(...)) in SQL."""
    import pyarrow.compute as pc

    from ..stages.joins import grouped_quantile_cont

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "value_c": pa.array(
                             np.round(v * 100.0).astype(np.int64))})

    scaled = ds.map_batches(_scale, batch_format="pyarrow",
                            zero_copy_batch=True)
    med = grouped_quantile_cont(scaled, "event_type", "value_c", 0.5,
                                num_buckets=_w(sf_dir, "events"))
    qcol = [c for c in med.columns if c.startswith("q")][0]
    med2 = {t: np.int64(round(2.0 * m))
            for t, m in zip(med["event_type"], med[qcol])}
    types = sorted(med2)
    m2_arr = np.array([med2[t] for t in types], dtype=np.int64)

    def _dev(batch: pa.Table) -> pa.Table:
        codes = pc.index_in(batch["event_type"],
                            pa.array(types)).to_numpy(zero_copy_only=False)
        v = batch["value_c"].to_numpy(zero_copy_only=False)
        d2 = np.abs(2 * v - m2_arr[codes.astype(np.int64)])
        return pa.table({"event_type": batch["event_type"],
                         "d2": pa.array(d2.astype(np.int64))})

    dev = scaled.map_batches(_dev, batch_format="pyarrow",
                             zero_copy_batch=True)
    mad = grouped_quantile_cont(dev, "event_type", "d2", 0.5,
                                num_buckets=_w(sf_dir, "events"))
    qcol2 = [c for c in mad.columns if c.startswith("q")][0]
    out = (med.rename(columns={qcol: "_med_c"})
           .merge(mad.rename(columns={qcol2: "_mad_c2"}), on="event_type"))
    out["median_value"] = out["_med_c"] / 100.0
    out["mad_value"] = (out["_mad_c2"] * 0.5) / 100.0
    return out[["event_type", "median_value", "mad_value"]]


def q_ab_test_value(sf_dir: str):
    """Welch two-sample t-test per event_type between two user cohorts
    (leakage-safe DuckDB-hash split, the train_test_split sibling) —
    the experimentation-analytics op. One pass of exact int64 moment
    partials (n, Σx, Σx²) per (type, cohort); the driver evaluates the
    t statistic with an expression tree mirrored token-for-token in
    the oracle SQL, so the float result is bit-stable."""
    from ..functions.sketches import duckdb_hash_int64
    from ..stages.joins import partial_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        cohort = (duckdb_hash_int64(u) % np.uint64(2)).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "cohort": pa.array(cohort),
                         "v": pa.array(v), "vv": pa.array(v * v)})

    moments = partial_agg(ds.map_batches(_prep, batch_format="pyarrow",
                                         zero_copy_batch=True),
                          ["event_type", "cohort"], sums=["v", "vv"],
                          count_col="n", combine="driver").to_pandas()

    # driver-side: O(types) rows; expression tree mirrored in the SQL
    a = moments[moments["cohort"] == 0].set_index("event_type")
    b = moments[moments["cohort"] == 1].set_index("event_type")
    types = sorted(set(a.index) & set(b.index))
    rows = []
    for t in types:
        n1, s1, ss1 = (float(a.loc[t, "n"]), float(a.loc[t, "sum_v"]),
                       float(a.loc[t, "sum_vv"]))
        n2, s2, ss2 = (float(b.loc[t, "n"]), float(b.loc[t, "sum_v"]),
                       float(b.loc[t, "sum_vv"]))
        m1, m2 = s1 / n1, s2 / n2
        var1 = (ss1 - s1 * s1 / n1) / (n1 - 1.0)
        var2 = (ss2 - s2 * s2 / n2) / (n2 - 1.0)
        se = np.sqrt(var1 / n1 + var2 / n2)
        rows.append({"event_type": t,
                     "n_a": np.int64(n1), "n_b": np.int64(n2),
                     "mean_a": m1 / 100.0, "mean_b": m2 / 100.0,
                     "t_stat": (m1 - m2) / se})
    return pd.DataFrame(rows)


def q_lang_source_independence(sf_dir: str):
    """Chi-square independence cells for lang x source: observed count,
    expected count and the chi2 contribution per cell INCLUDING
    zero-observed cells (the full cross product). One (lang, source)
    count pass; marginals and the float expression evaluate on the
    driver over O(langs x sources) rows, mirrored token-for-token in
    the SQL — per-cell outputs avoid the order-dependent global sum."""
    from ..stages.joins import partial_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"])
    c = partial_agg(ds, ["lang", "source"], count_col="n",
                    combine="driver").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    langs = sorted(c["lang"].unique())
    sources = sorted(c["source"].unique())
    full = pd.MultiIndex.from_product(
        [langs, sources], names=["lang", "source"]).to_frame(index=False)
    full = full.merge(c, on=["lang", "source"], how="left")
    full["n"] = full["n"].fillna(0).astype(np.int64)
    rn = full.groupby("lang")["n"].transform("sum").to_numpy(np.float64)
    sn = full.groupby("source")["n"].transform("sum").to_numpy(np.float64)
    tn = float(full["n"].sum())
    e = rn * sn / tn
    n = full["n"].to_numpy(np.float64)
    full["expected"] = e
    full["contrib"] = (n - e) * (n - e) / e
    return full[["lang", "source", "n", "expected", "contrib"]]


def q_longest_streak(sf_dir: str):
    """Longest consecutive-active-day run per user (gaps-and-islands):
    per-batch distinct (user, day) pre-combine, one user-bucketed
    shuffle, vectorized island keys."""
    from ..stages.events import longest_streak

    ds = _events_us(sf_dir, ["user_id", "ts"])
    return longest_streak(ds, "user_id", "ts_us",
                          num_buckets=_w(sf_dir, "events"))


def q_rfm_segments(sf_dir: str):
    """RFM (recency / frequency / monetary) customer segmentation:
    per-user last-active day, event count and cent-exact spend from ONE
    distributed moment pass, plus the monetary quintile code from
    exact quantile_disc boundaries (rank ceil(n*q) over the per-user
    spend distribution — O(distinct spends) driver CDF walk, the same
    exact-fit contract as winsorize/quantile-bin; broadcast apply)."""
    import math

    from ..stages.joins import partial_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        day = (batch["ts"].cast(pa.int64()).to_numpy()
               // 86_400_000_000).astype(np.int64)
        return pa.table({"user_id": batch["user_id"],
                         "v": pa.array(v), "day": pa.array(day)})

    users = partial_agg(ds.map_batches(_prep, batch_format="pyarrow",
                                       zero_copy_batch=True),
                        ["user_id"], sums=["v"], maxs=["day"],
                        count_col="frequency", combine="distributed",
                        num_buckets=_w(sf_dir, "events"))

    # boundaries + global max day from skinny per-batch partials
    def _bparts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("sum_v", sort=False).size().rename("n").reset_index()
        g["gday"] = df["max_day"].max()
        return g

    parts = users.map_batches(_bparts, batch_format="pandas").to_pandas()
    gday = int(parts["gday"].max())
    cdf = (parts.groupby("sum_v", sort=True)["n"].sum()
           .reset_index().sort_values("sum_v"))
    vals = cdf["sum_v"].to_numpy(np.int64)
    cum = cdf["n"].to_numpy(np.int64).cumsum()
    n_users = int(cum[-1])
    # quantile_disc: 1-based rank ceil(n*q)
    bounds = [int(vals[np.searchsorted(cum, math.ceil(n_users * q))])
              for q in (0.2, 0.4, 0.6, 0.8)]

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        m = df["sum_v"].to_numpy(np.int64)
        code = np.ones(len(df), dtype=np.int64)
        for b in bounds:
            code += (m > b).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "recency_days": (gday - df["max_day"].to_numpy(np.int64)
                             ).astype(np.int64),
            "frequency": df["frequency"].astype(np.int64),
            "monetary": m / 100.0,
            "m_code": code})

    return users.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H join-shape batch 2 (Q4/Q7/Q10/Q14/Q19 fitted to available columns)
# ---------------------------------------------------------------------------

def _rev_items(sf_dir: str, extra_cols=(), date_lo=None, date_hi=None):
    """lineitem → (orderkey, rev_s [, extras]) with the scaled-integer
    revenue round(price*(1-disc)*10000) and an optional shipdate
    row-filter applied AT the read-projection stage (only the needed
    columns ever leave the parquet reader)."""
    import pyarrow.compute as pc

    cols = ["l_orderkey", "l_extendedprice", "l_discount", *extra_cols]
    if date_lo is not None:
        cols.append("l_shipdate")

    def _proj(b: pa.Table) -> pa.Table:
        if date_lo is not None:
            d = b["l_shipdate"]
            m = pc.and_(pc.greater_equal(d, pa.scalar(pd.Timestamp(date_lo))),
                        pc.less(d, pa.scalar(pd.Timestamp(date_hi))))
            b = b.filter(m)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.round(price * (1.0 - disc) * 10000.0).astype(np.int64)
        out = {"orderkey": b["l_orderkey"], "rev_s": pa.array(rev)}
        for c in extra_cols:
            out[c] = b[c]
        if date_lo is not None:
            out["l_shipdate"] = b["l_shipdate"]
        return pa.table(out)

    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=cols
    ).map_batches(_proj, batch_format="pyarrow")


def q_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape — cross-nation shipping volume by year (supplier
    nation ≠ customer nation): supplier nation via broadcast dim,
    customer nation via the orders×customer hash join (fact×fact
    shuffle), the cross-nation filter applied vectorized after the
    lineitem×orders join, final agg driver-combined (≤ nations² × years
    groups at any SF)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    items = _rev_items(sf_dir, extra_cols=["l_suppkey"],
                       date_lo="1996-01-01", date_hi="1998-01-01")

    def _year(b: pa.Table) -> pa.Table:
        y = pc.year(b["l_shipdate"]).cast(pa.int64())
        return pa.table({"orderkey": b["orderkey"], "rev_s": b["rev_s"],
                         "suppkey": b["l_suppkey"], "l_year": y})

    items = items.map_batches(_year, batch_format="pyarrow")

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = pd.DataFrame({"suppkey": supp["s_suppkey"].astype(np.int64),
                         "s_nat": supp["s_nationkey"].astype(np.int64)})
    items = broadcast_join(items, supp, on="suppkey")

    def _cust(b: pa.Table) -> pa.Table:
        return pa.table({"custkey": b["c_custkey"],
                         "c_nat": b["c_nationkey"].cast(pa.int64())})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_cust, batch_format="pyarrow")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(lambda b: pa.table({"custkey": b["o_custkey"],
                                      "orderkey": b["o_orderkey"]}),
                  batch_format="pyarrow")
    o_cust = hash_join(
        orders, cust, on="custkey",
        num_buckets=_w(sf_dir, "orders", "customer"), coalesce_blocks=16,
        schemas=(pa.schema([("custkey", pa.int64()), ("orderkey", pa.int64())]),
                 pa.schema([("custkey", pa.int64()), ("c_nat", pa.int64())])),
    ).map_batches(lambda df: df[["orderkey", "c_nat"]], batch_format="pandas")

    j = hash_join(
        items.map_batches(lambda df: df[["orderkey", "rev_s", "l_year", "s_nat"]],
                          batch_format="pandas"),
        o_cust, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("rev_s", pa.int64()),
                            ("l_year", pa.int64()), ("s_nat", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()), ("c_nat", pa.int64())])))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["s_nat"].to_numpy() != df["c_nat"].to_numpy()
        return df.loc[keep, ["s_nat", "c_nat", "l_year", "rev_s"]]

    agg = partial_agg(j.map_batches(_pairs, batch_format="pandas"),
                      ["s_nat", "c_nat", "l_year"], sums=["rev_s"],
                      combine="driver").to_pandas()
    agg["supp_nation"] = agg["s_nat"].astype(int).map(name_of)
    agg["cust_nation"] = agg["c_nat"].astype(int).map(name_of)
    agg["revenue"] = agg["sum_rev_s"].astype(np.int64) / 10000.0
    agg["l_year"] = agg["l_year"].astype(np.int64)
    return agg[["supp_nation", "cust_nation", "l_year", "revenue"]]


def q_returned_top20(sf_dir: str):
    """TPC-H Q10 shape — top-20 customers by revenue from RETURNED
    items in a 3-month order window: two projected fact streams, one
    hash join, distributed per-customer agg, native sort().limit(20)
    (a top-k, never a global materialize), then the 20 winners pick up
    customer attributes via broadcast semi-lookup against the customer
    table (the big side streams; the 20-row side ships)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    def _ret(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))

    items = _rev_items(sf_dir, extra_cols=["l_returnflag"])
    items = items.map_batches(_ret, batch_format="pyarrow").map_batches(
        lambda df: df[["orderkey", "rev_s"]], batch_format="pandas")

    def _orders(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"]
        m = pc.and_(pc.greater_equal(d, pa.scalar(pd.Timestamp("1996-01-01"))),
                    pc.less(d, pa.scalar(pd.Timestamp("1996-04-01"))))
        f = b.filter(m)
        return pa.table({"orderkey": f["o_orderkey"], "custkey": f["o_custkey"]})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_orders, batch_format="pyarrow")

    j = hash_join(
        items, orders, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("rev_s", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()), ("custkey", pa.int64())])))

    agg = partial_agg(j, ["custkey"], sums=["rev_s"],
                      num_buckets=_w(sf_dir, "orders"))
    top = (agg.map_batches(lambda df: df[["custkey", "sum_rev_s"]],
                           batch_format="pandas")
           .sort(["sum_rev_s", "custkey"], descending=[True, False])
           .limit(20).to_pandas())

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table({"custkey": b["c_custkey"], "c_name": b["c_name"],
                         "c_acctbal": b["c_acctbal"],
                         "c_nat": b["c_nationkey"].cast(pa.int64())})

    hit = broadcast_join(cust.map_batches(_proj, batch_format="pyarrow"),
                         top, on="custkey").to_pandas()
    hit["revenue"] = hit["sum_rev_s"].astype(np.int64) / 10000.0
    hit["n_name"] = hit["c_nat"].astype(int).map(name_of)
    hit = hit.rename(columns={"custkey": "c_custkey"})
    return hit[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — promo revenue share per shipmonth of 1996:
    the part dim ships ONCE via broadcast (partkey → is-promo flag),
    then a single scaled-int two-sum pass; the share is a pure float
    expression over exact int sums (summation-order immune)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"]).to_pandas()
    part = pd.DataFrame({
        "partkey": part["p_partkey"].astype(np.int64),
        "promo": (part["p_type"] == "PROMO").astype(np.int64)})

    items = _rev_items(sf_dir, extra_cols=["l_partkey"],
                       date_lo="1996-01-01", date_hi="1997-01-01")

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({"partkey": b["l_partkey"].cast(pa.int64()),
                         "rev_s": b["rev_s"],
                         "l_month": pc.month(b["l_shipdate"]).cast(pa.int64())})

    items = items.map_batches(_prep, batch_format="pyarrow")
    j = broadcast_join(items, part, on="partkey")

    def _two_sums(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["l_month", "rev_s"]].copy()
        out["promo_rev_s"] = df["rev_s"].to_numpy(np.int64) * df["promo"].to_numpy(np.int64)
        return out

    agg = partial_agg(j.map_batches(_two_sums, batch_format="pandas"),
                      ["l_month"], sums=["rev_s", "promo_rev_s"],
                      combine="driver").to_pandas()
    agg = agg.sort_values("l_month")
    tot = agg["sum_rev_s"].astype(np.int64)
    pro = agg["sum_promo_rev_s"].astype(np.int64)
    return pd.DataFrame({
        "l_month": agg["l_month"].astype(np.int64),
        "promo_revenue": pro / 10000.0,
        "total_revenue": tot / 10000.0,
        "promo_share": 100.0 * pro.to_numpy(np.float64) / tot.to_numpy(np.float64)})


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue under three OR'd (brand, size,
    quantity-range) predicate arms: part attrs broadcast once, the
    disjunction evaluated as one vectorized mask, exact int partial
    sums reduced by Dataset.sum (single scalar leaves the cluster)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    part = pd.DataFrame({"partkey": part["p_partkey"].astype(np.int64),
                         "brand": part["p_brand"],
                         "size": part["p_size"].astype(np.int64)})

    items = _rev_items(sf_dir, extra_cols=["l_partkey", "l_quantity"])

    def _prep(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"partkey": b["l_partkey"].cast(pa.int64()),
                         "rev_s": b["rev_s"], "qty": pa.array(q)})

    j = broadcast_join(items.map_batches(_prep, batch_format="pyarrow"),
                       part, on="partkey")

    def _mask(df: pd.DataFrame) -> pd.DataFrame:
        br, sz, q = df["brand"].to_numpy(), df["size"].to_numpy(np.int64), df["qty"].to_numpy(np.int64)
        keep = (((br == "Brand#1") & (sz <= 5) & (q >= 1) & (q <= 11))
                | ((br == "Brand#2") & (sz <= 10) & (q >= 10) & (q <= 20))
                | ((br == "Brand#3") & (sz <= 15) & (q >= 20) & (q <= 30)))
        return df.loc[keep, ["rev_s"]]

    total = j.map_batches(_mask, batch_format="pandas").sum("rev_s")
    return pd.DataFrame({"revenue": [int(total) / 10000.0]})


def q_late_order_priority(sf_dir: str):
    """TPC-H Q4 shape (EXISTS fitted to available columns) — count of
    orders per priority where ANY lineitem shipped >90 days after the
    order date: one fact×fact hash join, vectorized lateness filter,
    bucketed DISTINCT on (orderkey, priority) so the exists-dedup never
    builds a driver set, tiny driver-combined priority count."""
    from ..stages.joins import hash_join

    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda b: pa.table({"orderkey": b["l_orderkey"],
                            "ship_us": b["l_shipdate"].cast(pa.int64())}),
        batch_format="pyarrow")

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: pa.table({"orderkey": b["o_orderkey"],
                            "odate_us": b["o_orderdate"].cast(pa.int64()),
                            "o_orderpriority": b["o_orderpriority"]}),
        batch_format="pyarrow")

    j = hash_join(
        items, orders, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("ship_us", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()), ("odate_us", pa.int64()),
                            ("o_orderpriority", pa.string())])))

    LATE_US = 90 * 86_400_000_000

    def _late(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["ship_us"].to_numpy(np.int64) > df["odate_us"].to_numpy(np.int64) + LATE_US
        return df.loc[keep, ["orderkey", "o_orderpriority"]]

    distinct = partial_agg(j.map_batches(_late, batch_format="pandas"),
                           ["orderkey", "o_orderpriority"],
                           num_buckets=_w(sf_dir, "orders"))
    counts = partial_agg(
        distinct.map_batches(lambda df: df[["o_orderpriority"]],
                             batch_format="pandas"),
        ["o_orderpriority"], count_col="n_late", combine="driver").to_pandas()
    counts["n_late"] = counts["n_late"].astype(np.int64)
    return counts[["o_orderpriority", "n_late"]]


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape — target-nation market share of ECONOMY-part
    revenue among region-0 customers, by order year: the part filter
    and supplier-nation flag ship once as broadcast dims, customer
    region resolves through the orders×customer hash join, and the
    share is a float expression over exact int sums."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    TARGET_NAT, REGION = 3, 0
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region_nats = nat.loc[nat["n_regionkey"] == REGION,
                          "n_nationkey"].astype(np.int64).tolist()

    def _orders(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"]
        m = pc.and_(pc.greater_equal(d, pa.scalar(pd.Timestamp("1996-01-01"))),
                    pc.less(d, pa.scalar(pd.Timestamp("1998-01-01"))))
        f = b.filter(m)
        return pa.table({"orderkey": f["o_orderkey"], "custkey": f["o_custkey"],
                         "o_year": pc.year(f["o_orderdate"]).cast(pa.int64())})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_orders, batch_format="pyarrow")

    def _cust(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["c_nationkey"].cast(pa.int64()),
                     pa.array(region_nats, pa.int64()))
        f = b.filter(m)
        return pa.table({"custkey": f["c_custkey"]})

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_cust, batch_format="pyarrow")

    o_cust = hash_join(
        orders, cust, on="custkey", how="semi",
        num_buckets=_w(sf_dir, "orders", "customer"), coalesce_blocks=16,
        schemas=(pa.schema([("custkey", pa.int64()), ("orderkey", pa.int64()),
                            ("o_year", pa.int64())]),
                 pa.schema([("custkey", pa.int64())])),
    ).map_batches(lambda df: df[["orderkey", "o_year"]], batch_format="pandas")

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"]).to_pandas()
    econ = pd.DataFrame({"partkey": part.loc[part["p_type"] == "ECONOMY",
                                             "p_partkey"].astype(np.int64)})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = pd.DataFrame({"suppkey": supp["s_suppkey"].astype(np.int64),
                         "tgt": (supp["s_nationkey"] == TARGET_NAT
                                 ).astype(np.int64)})

    items = _rev_items(sf_dir, extra_cols=["l_partkey", "l_suppkey"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({"orderkey": b["orderkey"], "rev_s": b["rev_s"],
                         "partkey": b["l_partkey"].cast(pa.int64()),
                         "suppkey": b["l_suppkey"].cast(pa.int64())})

    items = items.map_batches(_prep, batch_format="pyarrow")
    items = broadcast_join(items, econ, on="partkey")   # semi: ECONOMY parts
    items = broadcast_join(items, supp, on="suppkey")

    j = hash_join(
        items.map_batches(lambda df: df[["orderkey", "rev_s", "tgt"]],
                          batch_format="pandas"),
        o_cust, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("rev_s", pa.int64()),
                            ("tgt", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()), ("o_year", pa.int64())])))

    def _sums(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["o_year", "rev_s"]].copy()
        out["tgt_rev_s"] = df["rev_s"].to_numpy(np.int64) * df["tgt"].to_numpy(np.int64)
        return out

    agg = partial_agg(j.map_batches(_sums, batch_format="pandas"),
                      ["o_year"], sums=["rev_s", "tgt_rev_s"],
                      combine="driver").to_pandas()
    tot = agg["sum_rev_s"].astype(np.int64)
    tgt = agg["sum_tgt_rev_s"].astype(np.int64)
    return pd.DataFrame({
        "o_year": agg["o_year"].astype(np.int64),
        "nation_revenue": tgt / 10000.0,
        "total_revenue": tot / 10000.0,
        "mkt_share": tgt.to_numpy(np.float64) / tot.to_numpy(np.float64)})


def q_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 shape (no partsupp in this corpus, so revenue stands in
    for profit) — PROMO-part revenue by supplier nation × ship year:
    both part filter and supplier nation are broadcast dims over ONE
    streaming pass of lineitem; the agg is driver-combined (≤ nations ×
    years groups)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"]).to_pandas()
    promo = pd.DataFrame({"partkey": part.loc[part["p_type"] == "PROMO",
                                              "p_partkey"].astype(np.int64)})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp = pd.DataFrame({"suppkey": supp["s_suppkey"].astype(np.int64),
                         "s_nat": supp["s_nationkey"].astype(np.int64)})

    items = _rev_items(sf_dir, extra_cols=["l_partkey", "l_suppkey"],
                       date_lo="1995-01-01", date_hi="2002-01-01")

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table({"rev_s": b["rev_s"],
                         "partkey": b["l_partkey"].cast(pa.int64()),
                         "suppkey": b["l_suppkey"].cast(pa.int64()),
                         "l_year": pc.year(b["l_shipdate"]).cast(pa.int64())})

    items = items.map_batches(_prep, batch_format="pyarrow")
    items = broadcast_join(items, promo, on="partkey")
    items = broadcast_join(items, supp, on="suppkey")

    agg = partial_agg(items.map_batches(
        lambda df: df[["s_nat", "l_year", "rev_s"]], batch_format="pandas"),
        ["s_nat", "l_year"], sums=["rev_s"], combine="driver").to_pandas()
    agg["n_name"] = agg["s_nat"].astype(int).map(name_of)
    agg["revenue"] = agg["sum_rev_s"].astype(np.int64) / 10000.0
    agg["l_year"] = agg["l_year"].astype(np.int64)
    return agg[["n_name", "l_year", "revenue"]]


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — the supplier(s) with maximum revenue in
    1996Q1: distributed per-supplier agg, the global max reduced by
    Dataset.max (one scalar leaves the cluster), winners filtered
    vectorized and dressed with supplier attributes via the broadcast
    lookup (supplier table streams, the winner set ships)."""
    from ..stages.joins import broadcast_join

    items = _rev_items(sf_dir, extra_cols=["l_suppkey"],
                       date_lo="1996-01-01", date_hi="1996-04-01")
    items = items.map_batches(
        lambda b: pa.table({"suppkey": b["l_suppkey"].cast(pa.int64()),
                            "rev_s": b["rev_s"]}), batch_format="pyarrow")

    agg = partial_agg(items, ["suppkey"], sums=["rev_s"],
                      num_buckets=_w(sf_dir, "lineitem"))
    best = int(agg.max("sum_rev_s"))

    winners = agg.map_batches(
        lambda df: df.loc[df["sum_rev_s"].to_numpy(np.int64) == best,
                          ["suppkey", "sum_rev_s"]],
        batch_format="pandas").to_pandas()

    supp = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_name"])
    hit = broadcast_join(
        supp.map_batches(lambda b: pa.table({"suppkey": b["s_suppkey"],
                                             "s_name": b["s_name"]}),
                         batch_format="pyarrow"),
        winners, on="suppkey").to_pandas()
    hit["total_revenue"] = hit["sum_rev_s"].astype(np.int64) / 10000.0
    hit = hit.rename(columns={"suppkey": "s_suppkey"})
    return hit[["s_suppkey", "s_name", "total_revenue"]]


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — average yearly revenue from small-quantity
    orders (qty < 0.2 × the part's mean qty) for two brands: the brand
    filter broadcasts, the per-part mean comes from ONE distributed
    partial_agg, the fit joins back by partkey (skinny stats side),
    and the 0.2·avg comparison cross-multiplies to stay in exact ints:
    5·qty·n < sum_qty."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    part = part[part["p_brand"].isin(["Brand#1", "Brand#2"])]
    brands = pd.DataFrame({"partkey": part["p_partkey"].astype(np.int64),
                           "p_brand": part["p_brand"]})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        pc_ = np.round(b["l_extendedprice"].to_numpy(zero_copy_only=False)
                       * 100.0).astype(np.int64)
        return pa.table({"partkey": b["l_partkey"].cast(pa.int64()),
                         "qty": pa.array(qty), "price_c": pa.array(pc_)})

    li = broadcast_join(li.map_batches(_prep, batch_format="pyarrow"),
                        brands, on="partkey")

    stats = partial_agg(
        li.map_batches(lambda df: df[["partkey", "qty"]],
                       batch_format="pandas"),
        ["partkey"], sums=["qty"], count_col="n_li",
        num_buckets=_w(sf_dir, "lineitem"))

    j = hash_join(
        li.map_batches(lambda df: df[["partkey", "qty", "price_c", "p_brand"]],
                       batch_format="pandas"),
        stats, on="partkey",
        num_buckets=_w(sf_dir, "lineitem"), coalesce_blocks=16,
        schemas=(pa.schema([("partkey", pa.int64()), ("qty", pa.int64()),
                            ("price_c", pa.int64()), ("p_brand", pa.string())]),
                 pa.schema([("partkey", pa.int64()), ("sum_qty", pa.int64()),
                            ("n_li", pa.int64())])))

    def _small(df: pd.DataFrame) -> pd.DataFrame:
        keep = (5 * df["qty"].to_numpy(np.int64) * df["n_li"].to_numpy(np.int64)
                < df["sum_qty"].to_numpy(np.int64))
        return df.loc[keep, ["p_brand", "price_c"]]

    agg = partial_agg(j.map_batches(_small, batch_format="pandas"),
                      ["p_brand"], sums=["price_c"],
                      combine="driver").to_pandas()
    agg["avg_yearly"] = agg["sum_price_c"].astype(np.int64) / 700.0
    return agg[["p_brand", "avg_yearly"]]


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape — per-nation count and balance of customers
    with above-average positive balance and NO orders: the global
    average reduces from per-batch int partials (two scalars on the
    driver), the above-average test cross-multiplies (bal·n > sum) to
    stay exact, and the no-orders condition is the bucketed ANTI hash
    join against the orders fact."""
    import pyarrow.parquet as pq

    from ..stages.joins import hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_acctbal", "c_nationkey"])

    def _prep(b: pa.Table) -> pa.Table:
        bal = np.round(b["c_acctbal"].to_numpy(zero_copy_only=False)
                       * 100.0).astype(np.int64)
        return pa.table({"custkey": b["c_custkey"], "bal_c": pa.array(bal),
                         "c_nat": b["c_nationkey"].cast(pa.int64())})

    cust = cust.map_batches(_prep, batch_format="pyarrow")

    def _pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        pos = df["bal_c"].to_numpy(np.int64)
        pos = pos[pos > 0]
        return pd.DataFrame({"s": [int(pos.sum())], "n": [len(pos)]})

    parts = cust.map_batches(_pos_partial, batch_format="pandas").to_pandas()
    s_pos, n_pos = int(parts["s"].sum()), int(parts["n"].sum())

    rich = cust.map_batches(
        lambda df: df.loc[df["bal_c"].to_numpy(np.int64) * n_pos > s_pos],
        batch_format="pandas")

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"]).map_batches(
        lambda b: pa.table({"custkey": b["o_custkey"]}),
        batch_format="pyarrow")

    idle = hash_join(
        rich, orders, on="custkey", how="anti",
        num_buckets=_w(sf_dir, "customer", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("custkey", pa.int64()), ("bal_c", pa.int64()),
                            ("c_nat", pa.int64())]),
                 pa.schema([("custkey", pa.int64())])))

    agg = partial_agg(idle.map_batches(lambda df: df[["c_nat", "bal_c"]],
                                       batch_format="pandas"),
                      ["c_nat"], sums=["bal_c"], count_col="n_cust",
                      combine="driver").to_pandas()
    if agg.empty:  # 0-row to_pandas loses the schema entirely
        agg = pd.DataFrame(columns=["c_nat", "sum_bal_c", "n_cust"])
    agg["n_name"] = agg["c_nat"].astype(int).map(name_of)
    agg["n_cust"] = agg["n_cust"].astype(np.int64)
    agg["total_acctbal"] = agg["sum_bal_c"].astype(np.int64) / 100.0
    return agg[["n_name", "n_cust", "total_acctbal"]]


# ---------------------------------------------------------------------------
# distribution / dependence analytics batch
# ---------------------------------------------------------------------------

def q_benford_totalprice(sf_dir: str):
    """Benford first-digit distribution of order totals: the leading
    digit extracted by pure-int repeated division (≤ 19 vectorized
    halving passes, no float log), counts driver-combined (9 groups),
    share as a float expression over exact counts."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_totalprice"])

    def _digit(b: pa.Table) -> pd.DataFrame:
        n = np.round(b["o_totalprice"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        v = np.abs(n)
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        return pd.DataFrame({"digit": v})

    agg = partial_agg(ds.map_batches(_digit, batch_format="pyarrow"),
                      ["digit"], combine="driver").to_pandas()
    total = int(agg["n"].sum())
    return pd.DataFrame({"digit": agg["digit"].astype(np.int64),
                         "n": agg["n"].astype(np.int64),
                         "share": agg["n"].to_numpy(np.float64) / total})


def q_gini_user_spend(sf_dir: str):
    """Gini coefficient of per-user total spend: distributed per-user
    cent sums, then the exact distribution-sketch Gini (driver holds
    O(distinct spend values), Σi·x in arbitrary-precision ints)."""
    from ..stages.features import gini_exact
    from ..stages.joins import partial_agg as _pagg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        v = np.round(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({"user_id": b["user_id"], "v": pa.array(v)})

    users = _pagg(ds.map_batches(_cents, batch_format="pyarrow",
                                 zero_copy_batch=True),
                  ["user_id"], sums=["v"],
                  num_buckets=_w(sf_dir, "events"))
    n, gini = gini_exact(
        users.map_batches(lambda df: df[["sum_v"]], batch_format="pandas"),
        "sum_v")
    return pd.DataFrame({"n_users": [np.int64(n)], "gini": [gini]})


def q_source_lang_entropy(sf_dir: str):
    """Shannon-entropy cells of the lang distribution inside each
    source: per-(source, lang) counts (one pre-combined pass), p and
    the −p·ln p contribution emitted PER CELL so no order-dependent
    float sum exists on either side (same trick as the chi-square
    query). The contribution is rounded to 12 decimals on BOTH sides:
    numpy's and DuckDB's ln disagree in the last ulp, and the hash
    compare is bit-exact — p itself stays exact (one division)."""
    from ..stages.joins import partial_agg as _pagg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])
    c = _pagg(ds, ["source", "lang"], combine="driver").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    sn = c.groupby("source")["n"].transform("sum").to_numpy(np.float64)
    p = c["n"].to_numpy(np.float64) / sn
    return pd.DataFrame({"source": c["source"], "lang": c["lang"],
                         "n": c["n"], "p": p,
                         "contrib": np.round(-(p * np.log(p)), 12)})


def q_autocorr_value_lag1(sf_dir: str):
    """Lag-1 autocorrelation of event value per type: six exact int64
    pair moments per type from ONE bucketed shuffle (series ordered by
    ts with event_id tiebreak), Pearson r as a float expression over
    them — bit-identical to the SQL lag() formulation."""
    from ..stages.events import grouped_lag1_moments

    ds = _events_us(sf_dir, ["event_id", "event_type", "ts", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        v = np.round(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({"event_type": b["event_type"],
                         "event_id": b["event_id"], "ts_us": b["ts_us"],
                         "v": pa.array(v)})

    m = grouped_lag1_moments(
        ds.map_batches(_cents, batch_format="pyarrow", zero_copy_batch=True),
        "event_type", "ts_us", "v", tie_col="event_id",
        num_buckets=_w(sf_dir, "events")).to_pandas()
    n = m["n_pairs"].to_numpy(np.float64)
    sx, sy = m["sx"].to_numpy(np.float64), m["sy"].to_numpy(np.float64)
    sxx = m["sxx"].to_numpy(np.float64)
    syy = m["syy"].to_numpy(np.float64)
    sxy = m["sxy"].to_numpy(np.float64)
    r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                               * np.sqrt(n * syy - sy * sy))
    return pd.DataFrame({"event_type": m["event_type"],
                         "n_pairs": m["n_pairs"].astype(np.int64),
                         "corr_lag1": r})


def q_heavy_hitters(sf_dir: str):
    """Heavy hitters (users with ≥ 70 events) by CMS-pruned two-pass:
    pass 1 builds a mergeable count-min sketch (driver holds depth×width
    ints, never keys); pass 2 broadcasts it and keeps only rows whose
    key CMS-estimate clears the threshold — no false negatives by CMS
    over-count — so the exact shuffle that follows touches a fraction
    of the stream; a final exact filter removes the false positives.
    Result is EXACT (hash-matches plain GROUP BY/HAVING) but the wide
    exchange is pruned by the sketch."""
    from ..functions.sketches import CountMinSketch, _hash_values, cms_counts

    TAU = 70
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    cms = cms_counts(ds, "user_id")
    ref = ray.put(cms.counts)
    width, depth = cms.counts.shape[1], cms.counts.shape[0]

    class _Prune:
        def __init__(self):
            c = ray.get(ref)
            self.cms = CountMinSketch(width, depth)
            self.cms.counts = c

        def __call__(self, b: pa.Table) -> pa.Table:
            h, valid = _hash_values(b["user_id"], with_valid=True)
            est = self.cms.estimate_hashes(h)
            return b.filter(pa.array(valid & (est >= TAU)))

    survivors = ds.map_batches(_Prune, batch_format="pyarrow",
                               concurrency=(1, 8))
    agg = partial_agg(survivors, ["user_id"], count_col="n",
                      num_buckets=_w(sf_dir, "events"))
    return agg.map_batches(
        lambda df: df.loc[df["n"].to_numpy(np.int64) >= TAU]
        .astype({"user_id": np.int64, "n": np.int64}),
        batch_format="pandas")


def q_interarrival_stats(sf_dir: str):
    """Per-user inter-arrival statistics: exact int64 gap moments from
    ONE bucketed shuffle, mean as a float expression — bit-identical to
    the SQL lag() formulation."""
    from ..stages.events import grouped_gap_stats

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    m = grouped_gap_stats(ds, "user_id", "ts_us", tie_col="event_id",
                          num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_gaps"].to_numpy(np.int64)
        s = df["sum_gap_s"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "n_gaps": n, "sum_gap_s": s,
            "sum_gap2_s": df["sum_gap2_s"].astype(np.int64),
            "mean_gap_s": s.astype(np.float64) / n.astype(np.float64)})

    return m.map_batches(_finish, batch_format="pandas")


def q_time_weighted_value(sf_dir: str):
    """Time-weighted average event value per user (each value holds
    until the user's next event — the left-constant step integral):
    exact int64 numerator Σ value_cents·gap_s and denominator Σ gap_s
    from one bucketed shuffle; the average is one float division."""
    from ..stages.events import grouped_gap_stats

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "value"])

    def _cents(b: pa.Table) -> pa.Table:
        v = np.round(b["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({"event_id": b["event_id"], "user_id": b["user_id"],
                         "ts_us": b["ts_us"], "v": pa.array(v)})

    m = grouped_gap_stats(
        ds.map_batches(_cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", "ts_us", tie_col="event_id", value_col="v",
        num_buckets=_w(sf_dir, "events"))

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        t = df["sum_gap_s"].to_numpy(np.int64)
        w = df["w_sum"].to_numpy(np.int64)
        keep = t > 0
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64)[keep],
            "t_sum": t[keep], "w_sum": w[keep],
            "twa": (w[keep].astype(np.float64)
                    / t[keep].astype(np.float64)) / 100.0})

    return m.map_batches(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# TPC-H shapes batch 3: Q2/Q6/Q11/Q12/Q16/Q20/Q21 adapted to this corpus
# (no partsupp table; no shipmode/commitdate columns — each query keeps
# the REFERENCE query's distributed shape on the columns that exist)
# ---------------------------------------------------------------------------


def q_discount_revenue(sf_dir: str):
    """TPC-H Q6 shape — revenue gain from discount removal: pure
    streaming filter+sum over ONE projected lineitem pass, per-batch
    int partials, two scalars on the driver. The discount window
    compares scaled ints (round(disc·100) ∈ [5,7]) so float literal
    representation cannot perturb the row set."""
    import pyarrow.compute as pc

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])

    def _partial(b: pa.Table) -> pd.DataFrame:
        d = b["l_shipdate"]
        m = pc.and_(pc.greater_equal(d, pa.scalar(pd.Timestamp("1996-01-01"))),
                    pc.less(d, pa.scalar(pd.Timestamp("1997-01-01"))))
        f = b.filter(m)
        disc = f["l_discount"].to_numpy(zero_copy_only=False)
        disc_i = np.round(disc * 100.0).astype(np.int64)
        qty = f["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (disc_i >= 5) & (disc_i <= 7) & (qty < 24)
        price = f["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        rev = np.round(price * disc[keep] * 10000.0).astype(np.int64)
        return pd.DataFrame({"s": [int(rev.sum())]})

    parts = li.map_batches(_partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"revenue": [int(parts["s"].sum()) / 10000.0]})


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape (lineitem stands in for partsupp) — for each
    size-25 part, the region-0 supplier that sold it cheapest: part
    and supplier filters broadcast as skinny dims, the per-part MIN is
    one distributed partial_agg, the argmin joins back by partkey
    (skinny stats side), ties break to the smallest suppkey via a
    second O(parts) partial_agg."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region_nats = set(nat.loc[nat["n_regionkey"] == 0, "n_nationkey"]
                      .astype(int).tolist())
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey", "s_name"]
                         ).to_pandas()
    name_of = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))
    r0 = pd.DataFrame({"suppkey": supp.loc[
        supp["s_nationkey"].astype(int).isin(region_nats),
        "s_suppkey"].astype(np.int64)})

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_size"]).to_pandas()
    sz = pd.DataFrame({"partkey": part.loc[part["p_size"] == 25,
                                           "p_partkey"].astype(np.int64)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        price_c = np.round(b["l_extendedprice"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64)
        return pa.table({"partkey": b["l_partkey"].cast(pa.int64()),
                         "suppkey": b["l_suppkey"].cast(pa.int64()),
                         "price_c": pa.array(price_c)})

    li = li.map_batches(_prep, batch_format="pyarrow")
    li = broadcast_join(li, sz, on="partkey")
    li = broadcast_join(li, r0, on="suppkey")

    m = partial_agg(li, ["partkey"], mins=["price_c"],
                    num_buckets=_w(sf_dir, "lineitem"))
    j = hash_join(
        li, m, on="partkey",
        num_buckets=_w(sf_dir, "lineitem"), coalesce_blocks=16,
        schemas=(pa.schema([("partkey", pa.int64()), ("suppkey", pa.int64()),
                            ("price_c", pa.int64())]),
                 pa.schema([("partkey", pa.int64()),
                            ("min_price_c", pa.int64())])))

    def _hits(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["price_c"].to_numpy(np.int64)
                == df["min_price_c"].to_numpy(np.int64))
        return df.loc[keep, ["partkey", "suppkey", "min_price_c"]]

    w = partial_agg(j.map_batches(_hits, batch_format="pandas"),
                    ["partkey"], mins=["suppkey", "min_price_c"],
                    combine="distributed",
                    num_buckets=_w(sf_dir, "part")).to_pandas()
    if w.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=str),
                             "min_price": pd.Series([], dtype=np.float64)})
    sk = w["min_suppkey"].astype(np.int64)
    return pd.DataFrame({"p_partkey": w["partkey"].astype(np.int64),
                         "s_suppkey": sk,
                         "s_name": sk.map(name_of),
                         "min_price": w["min_min_price_c"].astype(np.int64)
                         / 100.0})


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape — parts whose revenue exceeds 1.5× the mean
    part revenue (TPC-H's fixed 0.01%/SF fraction is scale-bound; a
    mean-relative cut keeps the result non-trivial at every sf): one
    distributed per-part partial_agg materialized once (O(parts)
    rows), total+count reduced to TWO driver scalars, the share test
    cross-multiplied (2·part_rev·n_parts > 3·total) so it stays
    exact-int."""
    items = _rev_items(sf_dir, extra_cols=["l_partkey"])
    items = items.map_batches(
        lambda b: pa.table({"partkey": b["l_partkey"].cast(pa.int64()),
                            "rev_s": b["rev_s"]}), batch_format="pyarrow")
    agg = partial_agg(items, ["partkey"], sums=["rev_s"],
                      num_buckets=_w(sf_dir, "lineitem")).materialize()
    total = int(agg.sum("sum_rev_s") or 0)
    n_parts = int(agg.count())

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        s = df["sum_rev_s"].to_numpy(np.int64)
        out = df.loc[2 * s * n_parts > 3 * total, ["partkey", "sum_rev_s"]]
        return pd.DataFrame({"p_partkey": out["partkey"].to_numpy(np.int64),
                             "value": out["sum_rev_s"].to_numpy(np.int64)
                             / 10000.0})

    return agg.map_batches(_keep, batch_format="pandas")


def q_late_ship_priority(sf_dir: str):
    """TPC-H Q12 shape (linestatus stands in for shipmode) — for lines
    shipped >60 days after the order date, urgent-vs-other order
    counts per linestatus: ONE fact×fact hash shuffle
    (lineitem×orders on orderkey), the lateness test vectorized on µs
    ints inside the bucket, final agg driver-combined (2 groups)."""
    from ..stages.joins import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_linestatus"]).map_batches(
        lambda b: pa.table({"orderkey": b["l_orderkey"],
                            "ship_us": b["l_shipdate"].cast(pa.int64()),
                            "l_linestatus": b["l_linestatus"]}),
        batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda b: pa.table({"orderkey": b["o_orderkey"],
                            "odate_us": b["o_orderdate"].cast(pa.int64()),
                            "prio": b["o_orderpriority"]}),
        batch_format="pyarrow")

    j = hash_join(
        li, orders, on="orderkey",
        num_buckets=_w(sf_dir, "lineitem", "orders"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("ship_us", pa.int64()),
                            ("l_linestatus", pa.string())]),
                 pa.schema([("orderkey", pa.int64()), ("odate_us", pa.int64()),
                            ("prio", pa.string())])))

    LATE_US = 60 * 86400 * 1_000_000

    def _flags(df: pd.DataFrame) -> pd.DataFrame:
        late = (df["ship_us"].to_numpy(np.int64)
                > df["odate_us"].to_numpy(np.int64) + LATE_US)
        d = df.loc[late, ["l_linestatus", "prio"]]
        hi = d["prio"].isin(["1-URGENT", "2-HIGH"]).to_numpy()
        return pd.DataFrame({"l_linestatus": d["l_linestatus"],
                             "hi": hi.astype(np.int64),
                             "lo": (~hi).astype(np.int64)})

    agg = partial_agg(j.map_batches(_flags, batch_format="pandas"),
                      ["l_linestatus"], sums=["hi", "lo"],
                      combine="driver").to_pandas()
    return pd.DataFrame({"l_linestatus": agg["l_linestatus"],
                         "high_n": agg["sum_hi"].astype(np.int64),
                         "low_n": agg["sum_lo"].astype(np.int64)})


def q_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 shape — distinct suppliers per (brand, size),
    excluding one brand and low-balance suppliers: both part attrs and
    the supplier exclusion broadcast as skinny dims over ONE lineitem
    pass; COUNT(DISTINCT) is the two-level exact plan — dedupe the
    (brand, size, suppkey) triple with a distributed partial_agg, then
    count per (brand, size) driver-side (≤ brands × sizes groups)."""
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"]
                         ).to_pandas()
    part = part[part["p_brand"] != "Brand#1"]
    dims = pd.DataFrame({"partkey": part["p_partkey"].astype(np.int64),
                         "p_brand": part["p_brand"],
                         "p_size": part["p_size"].astype(np.int64)})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"]).to_pandas()
    ok = pd.DataFrame({"suppkey": supp.loc[supp["s_acctbal"] >= 1000.0,
                                           "s_suppkey"].astype(np.int64)})

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"]).map_batches(
        lambda b: pa.table({"partkey": b["l_partkey"].cast(pa.int64()),
                            "suppkey": b["l_suppkey"].cast(pa.int64())}),
        batch_format="pyarrow")
    li = broadcast_join(li, ok, on="suppkey")
    li = broadcast_join(li, dims, on="partkey")

    triples = partial_agg(
        li.map_batches(lambda df: df[["p_brand", "p_size", "suppkey"]],
                       batch_format="pandas"),
        ["p_brand", "p_size", "suppkey"],
        num_buckets=_w(sf_dir, "lineitem"))

    agg = partial_agg(
        triples.map_batches(lambda df: df[["p_brand", "p_size"]],
                            batch_format="pandas"),
        ["p_brand", "p_size"], count_col="supplier_cnt",
        combine="driver").to_pandas()
    agg["p_size"] = agg["p_size"].astype(np.int64)
    agg["supplier_cnt"] = agg["supplier_cnt"].astype(np.int64)
    return agg[["p_brand", "p_size", "supplier_cnt"]]


def q_dominant_suppliers(sf_dir: str):
    """TPC-H Q20 shape (lineitem qty share stands in for availqty) —
    suppliers providing >50% of a 'large…' part's 1997 volume: the
    part-name filter broadcasts, per-(part, supplier) and per-part
    volumes come from two partial_aggs over the SAME filtered pass,
    the share test cross-multiplies (2·pair > part), and the distinct
    winner set reduces to O(suppliers)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.joins import broadcast_join, hash_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"]).to_pandas()
    pt = pd.DataFrame({"partkey": part.loc[
        part["p_name"].str.startswith("large"),
        "p_partkey"].astype(np.int64)})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    name_of = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def _prep(b: pa.Table) -> pa.Table:
        d = b["l_shipdate"]
        m = pc.and_(pc.greater_equal(d, pa.scalar(pd.Timestamp("1997-01-01"))),
                    pc.less(d, pa.scalar(pd.Timestamp("1998-01-01"))))
        f = b.filter(m)
        qty = f["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"partkey": f["l_partkey"].cast(pa.int64()),
                         "suppkey": f["l_suppkey"].cast(pa.int64()),
                         "qty": pa.array(qty)})

    li = broadcast_join(li.map_batches(_prep, batch_format="pyarrow"),
                        pt, on="partkey")

    pair = partial_agg(li, ["partkey", "suppkey"], sums=["qty"],
                       num_buckets=_w(sf_dir, "lineitem"))
    tot = partial_agg(
        li.map_batches(lambda df: df[["partkey", "qty"]],
                       batch_format="pandas"),
        ["partkey"], sums=["qty"], num_buckets=_w(sf_dir, "lineitem"))

    j = hash_join(
        pair, tot, on="partkey", suffix="_t",
        num_buckets=_w(sf_dir, "lineitem"), coalesce_blocks=16,
        schemas=(pa.schema([("partkey", pa.int64()), ("suppkey", pa.int64()),
                            ("sum_qty", pa.int64()), ("n", pa.int64())]),
                 pa.schema([("partkey", pa.int64()), ("sum_qty", pa.int64()),
                            ("n", pa.int64())])))

    def _dom(df: pd.DataFrame) -> pd.DataFrame:
        keep = (2 * df["sum_qty"].to_numpy(np.int64)
                > df["sum_qty_t"].to_numpy(np.int64))
        return df.loc[keep, ["suppkey"]]

    winners = partial_agg(j.map_batches(_dom, batch_format="pandas"),
                          ["suppkey"], combine="driver").to_pandas()
    if winners.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=str)})
    sk = winners["suppkey"].astype(np.int64)
    return pd.DataFrame({"s_suppkey": sk, "s_name": sk.map(name_of)})


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (latest shipper stands in for late receipt) —
    per supplier, the number of multi-supplier orders where it was the
    SOLE latest shipper: per-(order, supplier) max shipdate dedupes in
    one distributed partial_agg, the per-order max + distinct-supplier
    count in a second (over the already-skinny pairs), the sole-latest
    test is one hash join back + O(orders) partial_agg — no window
    function, no per-order Python loop."""
    from ..stages.joins import hash_join

    import pyarrow.parquet as pq

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]).to_pandas()
    name_of = dict(zip(supp["s_suppkey"].astype(int), supp["s_name"]))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        lambda b: pa.table({"orderkey": b["l_orderkey"],
                            "suppkey": b["l_suppkey"].cast(pa.int64()),
                            "ship_us": b["l_shipdate"].cast(pa.int64())}),
        batch_format="pyarrow")

    pairs = partial_agg(li, ["orderkey", "suppkey"], maxs=["ship_us"],
                        num_buckets=_w(sf_dir, "lineitem"))
    omax = partial_agg(
        pairs.map_batches(lambda df: df[["orderkey", "max_ship_us"]],
                          batch_format="pandas"),
        ["orderkey"], maxs=["max_ship_us"], count_col="ns",
        num_buckets=_w(sf_dir, "lineitem"))

    j = hash_join(
        pairs, omax, on="orderkey", suffix="_o",
        num_buckets=_w(sf_dir, "lineitem"), coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()), ("suppkey", pa.int64()),
                            ("max_ship_us", pa.int64()), ("n", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()),
                            ("max_max_ship_us", pa.int64()),
                            ("ns", pa.int64())])))

    def _achievers(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["max_ship_us"].to_numpy(np.int64)
                == df["max_max_ship_us"].to_numpy(np.int64))
        return df.loc[keep, ["orderkey", "suppkey", "ns"]]

    per_order = partial_agg(
        j.map_batches(_achievers, batch_format="pandas"),
        ["orderkey"], mins=["suppkey", "ns"], count_col="natmax",
        num_buckets=_w(sf_dir, "orders"))

    def _sole(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df["natmax"].to_numpy(np.int64) == 1)
                & (df["min_ns"].to_numpy(np.int64) >= 2))
        return pd.DataFrame(
            {"suppkey": df.loc[keep, "min_suppkey"].to_numpy(np.int64)})

    counts = partial_agg(per_order.map_batches(_sole, batch_format="pandas"),
                         ["suppkey"], count_col="numwait",
                         combine="driver").to_pandas()
    if counts.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=str),
                             "numwait": pd.Series([], dtype=np.int64)})
    sk = counts["suppkey"].astype(np.int64)
    return pd.DataFrame({"s_suppkey": sk, "s_name": sk.map(name_of),
                         "numwait": counts["numwait"].astype(np.int64)})


# ---------------------------------------------------------------------------
# round-4 batch: filtered ANN + incremental aggregate refresh
# ---------------------------------------------------------------------------


def q_filtered_topk(sf_dir: str):
    """Metadata-filtered ANN — top-10 cosine neighbours of vec 0 AMONG
    label-1 vectors only (the hybrid attribute-filter + vector search
    every retrieval pipeline runs): the label predicate pushes down to
    the parquet scan (rows are pruned BEFORE any distance math or
    object-store transfer; the filter column itself is not even
    projected), then the same per-batch partial top-k merge as
    similarity_topk."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    qtab = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "=", 0)])
    qvec = np.asarray(qtab["embedding"][0].as_py(), dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"],
                               filter=pads.field("label") == 1)
    top = cosine_topk(ds, qvec, k=10)
    top["vec_id"] = top["vec_id"].astype(np.int64)
    return top[["vec_id", "rank"]]


def q_incremental_agg(sf_dir: str):
    """Incremental aggregate refresh — the nightly-batch pattern: an
    O(groups) aggregate-state parquet stands in for yesterday's
    materialized rollup; today's refresh scans ONLY the new slice
    (read-time ts pushdown) and merges partials. sum/count/min/max are
    algebraic (merge = the SAME op over partials), so the merge is one
    more distributed partial_agg over state ∪ new-partials — the old
    raw rows are never re-read, and nothing row-scale ever reaches the
    driver. The oracle is the full recompute over ALL rows, proving
    the refresh bit-exact."""
    import os

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    CUT = pd.Timestamp("2024-01-16")

    def _slice(flt):
        ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["event_type", "value"],
                                   filter=flt)

        def _prep(b: pa.Table) -> pa.Table:
            v = np.round(b["value"].to_numpy(zero_copy_only=False)
                         * 10000.0).astype(np.int64)
            return pa.table({"event_type": b["event_type"],
                             "value_s": pa.array(v)})

        return ds.map_batches(_prep, batch_format="pyarrow",
                              zero_copy_batch=True)

    # --- bootstrap: yesterday's state (built once, then persisted) ---
    old = partial_agg(_slice(pads.field("ts") < CUT), ["event_type"],
                      sums=["value_s"], maxs=["value_s"],
                      combine="driver").to_pandas()
    state_path = os.path.join(
        "/tmp", f"vfr_incr_state_{os.path.basename(os.path.normpath(sf_dir))}"
        ".parquet")
    pq.write_table(pa.Table.from_pandas(old, preserve_index=False),
                   state_path)

    # --- refresh: new slice only + distributed algebraic merge ---
    state = ray.data.read_parquet(state_path)
    new = partial_agg(_slice(pads.field("ts") >= CUT), ["event_type"],
                      sums=["value_s"], maxs=["value_s"],
                      combine="driver")

    def _as_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": df["event_type"],
            "value_s": df["sum_value_s"].astype(np.int64),
            "mx": df["max_value_s"].astype(np.int64),
            "rows": df["n"].astype(np.int64)})

    merged = partial_agg(
        state.union(new).map_batches(_as_partial, batch_format="pandas"),
        ["event_type"], sums=["value_s", "rows"], maxs=["mx"],
        combine="driver").to_pandas()
    return pd.DataFrame({
        "event_type": merged["event_type"],
        "total": merged["sum_value_s"].astype(np.int64) / 10000.0,
        "n": merged["sum_rows"].astype(np.int64),
        "max_value": merged["max_mx"].astype(np.int64) / 10000.0,
    })


# ---------------------------------------------------------------------------
# round-4 batch: corpus profiling + per-entity sequence features
# ---------------------------------------------------------------------------


def q_ntile_value(sf_dir: str):
    """Per-user NTILE(4) of events by value (the within-entity quartile
    bucket feature) — tie-broken by event_id for a total order; one
    bucketed shuffle via the shared transform_buckets plan."""
    from ..stages.events import ntile

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "value"])
    out = ntile(ds, "user_id", ["value", "event_id"], n=4,
                num_buckets=_w(sf_dir, "events"))
    return out.map_batches(lambda df: df[["event_id", "user_id", "tile"]],
                           batch_format="pandas")


def q_user_event_paths(sf_dir: str):
    """Per-user ordered event-type path (comma-joined, by ts then
    event_id) — the clickstream-sequence feature string.  ONE bucketed
    shuffle; the join happens inside each bucket's vectorized pandas
    groupby, so no row-scale state ever reaches the driver."""
    from ..stages.events import transform_buckets

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def _paths(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("user_id", sort=False)["event_type"]
             .agg(",".join).rename("path").reset_index())
        g["user_id"] = g["user_id"].astype(np.int64)
        return g

    return transform_buckets(ds, "user_id", ["ts_us", "event_id"], _paths,
                             num_buckets=_w(sf_dir, "events"))


def q_type_cooccurrence(sf_dir: str):
    """Event-type co-occurrence matrix — for every unordered type pair,
    how many users emitted BOTH (market-basket support counts).  Plan:
    per-batch distinct (user, type) rows → ONE user-bucketed shuffle
    (cross-batch dupes land together) → per-bucket dedupe + vectorized
    self-merge into pair partials (≤ types² per user, types is small)
    → driver sums O(types²) rows.  The events table itself never
    re-shuffles and the driver never sees row-scale data."""
    from ..stages.events import stable_bucket

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    nb = _w(sf_dir, "events")

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "event_type"]).copy()
        d["_bucket"] = stable_bucket(d["user_id"].to_numpy(np.int64), nb)
        return d

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "event_type"])[
            ["user_id", "event_type"]]
        p = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        p = p[p["event_type_a"] < p["event_type_b"]]
        out = (p.groupby(["event_type_a", "event_type_b"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    parts = (ds.map_batches(_distinct, batch_format="pandas")
             .groupby("_bucket").map_groups(_pairs, batch_format="pandas")
             .to_pandas())
    out = (parts.groupby(["event_type_a", "event_type_b"], sort=False)
           ["n_users"].sum().astype(np.int64).reset_index()
           .rename(columns={"event_type_a": "type_a",
                            "event_type_b": "type_b"}))
    return out.sort_values(["type_a", "type_b"],
                           kind="mergesort").reset_index(drop=True)


def q_source_jaccard(sf_dir: str):
    """Pairwise distinct-term Jaccard between sources (the corpus
    overlap matrix) — see stages.text.source_jaccard for the plan."""
    from ..stages.text import source_jaccard

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    return source_jaccard(ds, num_buckets=_w(sf_dir, "documents"))


def q_source_top_terms(sf_dir: str):
    """Per-source top-3 terms by document frequency (corpus profiling)
    — see stages.text.source_top_terms for the plan."""
    from ..stages.text import source_top_terms

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    return source_top_terms(ds, k=3, num_buckets=_w(sf_dir, "documents"))


def q_cumulative_new_users(sf_dir: str):
    """Cumulative distinct users by day — the audience-growth curve,
    computed without any COUNT(DISTINCT) shuffle: first-seen day per
    user is one distributed min partial_agg (O(users) skinny rows),
    new-users-per-day one O(days) driver combine, and the running sum
    an O(days) driver cumsum."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def _day(batch: pa.Table) -> pa.Table:
        d = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch["user_id"],
                         "day": pa.array(d // DAY_US)})

    first = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                        ["user_id"], mins=["day"],
                        num_buckets=_w(sf_dir, "events"))
    per_day = partial_agg(
        first.map_batches(
            lambda df: pd.DataFrame({"day": df["min_day"].astype(np.int64)}),
            batch_format="pandas"),
        ["day"], count_col="new_users", combine="driver").to_pandas()
    per_day = per_day.sort_values("day", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "day": per_day["day"].astype(np.int64),
        "new_users": per_day["new_users"].astype(np.int64),
        "cum_users": per_day["new_users"].astype(np.int64).cumsum(),
    })


def q_bigram_topk(sf_dir: str):
    """Global top-20 word bigrams across the corpus (the n-gram LM
    profiling pass).  Per-batch the text splits ONCE into a flat term
    array; bigrams are one vectorized string concat of the array with
    its own shift, masked at doc boundaries — no per-row Python.  Only
    (bigram, count) partials shuffle; the global top-k runs through the
    bucketed trim plan (each bigram in exactly one bucket, so the
    per-block head-k provably keeps every global top-k member)."""
    from ..stages.joins import grouped_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        lists = df["text"].fillna("").str.split(" ")
        lens = lists.str.len().to_numpy(np.int64)
        flat = np.concatenate([np.asarray(l, dtype=object)
                               for l in lists]) if len(lists) else \
            np.array([], dtype=object)
        if len(flat) == 0:
            return pd.DataFrame({"bigram": pd.Series([], dtype=str),
                                 "cnt": pd.Series([], dtype=np.int64)})
        # last term of each doc cannot start a bigram
        ends = np.cumsum(lens) - 1
        valid = np.ones(len(flat), dtype=bool)
        valid[ends] = False
        left = flat[:-1][valid[:-1]]
        right = flat[1:][valid[:-1]]
        bg = pd.Series(left).str.cat(pd.Series(right), sep=" ")
        c = bg.value_counts()
        return pd.DataFrame({"bigram": c.index,
                             "cnt": c.to_numpy(np.int64)})

    parts = ds.map_batches(_partial, batch_format="pandas")
    top = grouped_topk(parts, ["bigram"], sums=["cnt"],
                       sort_col="sum_cnt", k=20,
                       num_buckets=_w(sf_dir, "documents"))
    return pd.DataFrame({"bigram": top["bigram"],
                         "n": top["sum_cnt"].astype(np.int64)})


def q_copurchase_pairs(sf_dir: str):
    """Top-20 part pairs most often ordered together (market-basket
    co-purchase).  The lineitem fact self-joins WITHIN each order:
    one orderkey-bucketed shuffle, a vectorized per-bucket self-merge
    (orders hold a handful of parts, so pairs/order is tiny), then
    only (part_a, part_b, count) partials feed the bucketed top-k
    trim — the driver sees O(k x buckets) rows, never a pair table."""
    from ..stages.events import stable_bucket
    from ..stages.joins import grouped_topk

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])
    nb = _w(sf_dir, "lineitem")

    def _distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"]).copy()
        d["_bucket"] = stable_bucket(d["l_orderkey"].to_numpy(np.int64), nb)
        return d

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])[
            ["l_orderkey", "l_partkey"]]
        p = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        p = p[p["l_partkey_a"] < p["l_partkey_b"]]
        out = (p.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
               .size().rename("cnt").reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        return out.rename(columns={"l_partkey_a": "part_a",
                                   "l_partkey_b": "part_b"})

    parts = (ds.map_batches(_distinct, batch_format="pandas")
             .groupby("_bucket").map_groups(_pairs, batch_format="pandas"))
    top = grouped_topk(parts, ["part_a", "part_b"], sums=["cnt"],
                       sort_col="sum_cnt", k=20, num_buckets=nb)
    return pd.DataFrame({"part_a": top["part_a"].astype(np.int64),
                         "part_b": top["part_b"].astype(np.int64),
                         "n_orders": top["sum_cnt"].astype(np.int64)})


def q_events_per_user_hist(sf_dir: str):
    """Histogram of events-per-user (the power-law engagement curve):
    one distributed per-user count, then an O(distinct counts) driver
    combine over the count-of-counts — COUNT(DISTINCT)-free and the
    driver never holds O(users) rows."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    per_user = partial_agg(ds, ["user_id"], count_col="n",
                           num_buckets=_w(sf_dir, "events"))
    hist = partial_agg(
        per_user.map_batches(
            lambda df: pd.DataFrame(
                {"events_per_user": df["n"].astype(np.int64)}),
            batch_format="pandas"),
        ["events_per_user"], count_col="n_users",
        combine="driver").to_pandas()
    hist = hist.sort_values("events_per_user",
                            kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "events_per_user": hist["events_per_user"].astype(np.int64),
        "n_users": hist["n_users"].astype(np.int64)})


def q_hapax_ratio(sf_dir: str):
    """Per-source hapax-legomena ratio — the share of the source's
    distinct vocabulary that appears in exactly ONE of its documents
    (a lexical-diversity / boilerplate signal).  Document frequency is
    the same skinny (source, term)-bucketed combine as the other term
    queries; each bucket then emits only per-source (n_terms, n_hapax)
    partials, and the ratio is ONE IEEE division of exact int64 sums."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    nb = _w(sf_dir, "documents")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.DataFrame({
            "source": df["source"].fillna(""),
            "doc": np.arange(len(df), dtype=np.int64),
            "term": df["text"].fillna("").str.split(" "),
        })
        e = s.explode("term").drop_duplicates(["source", "doc", "term"])
        out = (e.groupby(["source", "term"], sort=False).size()
               .rename("df").reset_index())
        out["df"] = out["df"].astype(np.int64)
        h = (pd.util.hash_pandas_object(out["source"], index=False).to_numpy()
             ^ pd.util.hash_pandas_object(out["term"], index=False).to_numpy())
        out["_bucket"] = (h % np.uint64(nb)).astype(np.int32)
        return out

    def _per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["source", "term"], sort=False)["df"].sum()
             .reset_index())
        agg = g.groupby("source", sort=False).agg(
            n_terms=("df", "size"),
            n_hapax=("df", lambda s: int((s == 1).sum())))
        return agg.reset_index()

    parts = (ds.map_batches(_partial, batch_format="pandas")
             .groupby("_bucket").map_groups(_per_bucket,
                                            batch_format="pandas")
             .to_pandas())
    tot = (parts.groupby("source", sort=False)[["n_terms", "n_hapax"]]
           .sum().reset_index())
    return pd.DataFrame({
        "source": tot["source"],
        "n_terms": tot["n_terms"].astype(np.int64),
        "n_hapax": tot["n_hapax"].astype(np.int64),
        "hapax_ratio": tot["n_hapax"].to_numpy(np.int64)
        / tot["n_terms"].to_numpy(np.int64).astype(np.float64),
    }).sort_values("source", kind="mergesort").reset_index(drop=True)


def q_hourly_profile(sf_dir: str):
    """Seasonal profile: average value per (event_type, hour-of-day) —
    the 20x24 diurnal heat-map behind time features.  Pure map + one
    O(groups) driver combine; sums stay scaled int64 so the average is
    a single division, bit-equal to SQL."""
    HOUR_US = 3_600_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 10000.0).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "hour": pa.array((t // HOUR_US) % 24),
                         "v": pa.array(v)})

    agg = partial_agg(ds.map_batches(_prep, batch_format="pyarrow"),
                      ["event_type", "hour"], sums=["v"],
                      combine="driver").to_pandas()
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "hour": agg["hour"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "avg_value": agg["sum_v"].astype(np.int64)
        / (agg["n"].astype(np.int64).to_numpy() * 10000.0),
    })


def q_ship_delay_median(sf_dir: str):
    """Exact median order→ship delay in days per order priority — a
    fact x fact join (orders ⋈ lineitem on orderkey) followed by the
    CDF-walk quantile: only (priority, delay_days) frequency partials
    leave the join, so the quantile state is O(priorities x distinct
    days), never row-scale."""
    from ..stages.joins import grouped_quantile_disc, hash_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])

    def _o(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["o_orderkey"],
            "odate": batch["o_orderdate"].cast(pa.int64()),
            "priority": batch["o_orderpriority"]})

    def _l(batch: pa.Table) -> pa.Table:
        return pa.table({
            "orderkey": batch["l_orderkey"],
            "sdate": batch["l_shipdate"].cast(pa.int64())})

    j = hash_join(
        li.map_batches(_l, batch_format="pyarrow"),
        orders.map_batches(_o, batch_format="pyarrow"),
        on="orderkey", num_buckets=_w(sf_dir, "lineitem"),
        coalesce_blocks=16,
        schemas=(pa.schema([("orderkey", pa.int64()),
                            ("sdate", pa.int64())]),
                 pa.schema([("orderkey", pa.int64()),
                            ("odate", pa.int64()),
                            ("priority", pa.string())])))

    def _delay(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "priority": df["priority"],
            "delay_days": ((df["sdate"].to_numpy(np.int64)
                            - df["odate"].to_numpy(np.int64))
                           // DAY_US).astype(np.int64)})

    out = grouped_quantile_disc(
        j.map_batches(_delay, batch_format="pandas"),
        "priority", "delay_days", q=0.5,
        num_buckets=_w(sf_dir, "orders"))
    return pd.DataFrame({"priority": out["priority"],
                         "median_delay_days": out["q0.5"].astype(np.int64)})


def q_spend_decile(sf_dir: str):
    """Corpus-GLOBAL spend deciles: every user's total event value →
    NTILE(10) over ALL users ordered by (total, user_id) — the global
    order statistic (no partition key), computed by the distributed
    counting-sort scan in stages.rank: range-bucket by value, driver
    exclusive-scans O(buckets) counts, ONE shuffle, closed-form tile
    from the global rank.  Totals stay scaled int64 so the order (and
    the tile) is exact."""
    from ..stages.rank import global_ntile

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 10000.0).astype(np.int64)
        return pa.table({"user_id": batch["user_id"], "v": pa.array(v)})

    totals = partial_agg(ds.map_batches(_prep, batch_format="pyarrow"),
                         ["user_id"], sums=["v"],
                         num_buckets=_w(sf_dir, "events"))
    skinny = totals.map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "total_s": df["sum_v"].astype(np.int64)}),
        batch_format="pandas")
    out = global_ntile(skinny, "total_s", "user_id", n=10,
                       num_buckets=shuffle_width())

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "total": df["total_s"].astype(np.int64) / 10000.0,
            "decile": df["tile"].astype(np.int64)})

    return out.map_batches(_finish, batch_format="pandas")


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample — 10 docs per source, picked by
    a multiplicative-hash pseudo-random order the ORACLE can replay
    ((doc_id * 2654435761) % 2^32, Knuth's constant): per-block trim to
    10/source (a doc lives in one block, so the trim keeps every global
    candidate), one tiny per-source combine.  The text column is never
    read, let alone moved."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    K = 10

    def _trim(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "source": df["source"].fillna(""),
            "doc_id": df["doc_id"].astype(np.int64)})
        d["sk"] = (d["doc_id"].to_numpy(np.int64)
                   * 2654435761) % 4294967296
        d = d.sort_values(["source", "sk", "doc_id"], kind="mergesort")
        return d.groupby("source", sort=False).head(K)

    trimmed = ds.map_batches(_trim, batch_format="pandas").to_pandas()
    trimmed = trimmed.sort_values(["source", "sk", "doc_id"],
                                  kind="mergesort")
    out = trimmed.groupby("source", sort=False).head(K)
    return (out[["source", "doc_id"]]
            .sort_values(["source", "doc_id"], kind="mergesort")
            .reset_index(drop=True))


def q_distinct_users_6h(sf_dir: str):
    """Distinct active users per 6-hour tumbling window WITHOUT a
    COUNT(DISTINCT) shuffle: dedupe (window, user) pairs in one
    distributed partial_agg (exact — the pair is the key), then an
    O(windows) driver count."""
    WIN_US = 6 * 3_600_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def _win(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"win": pa.array(t // WIN_US),
                         "user_id": batch["user_id"]})

    pairs = partial_agg(ds.map_batches(_win, batch_format="pyarrow"),
                        ["win", "user_id"],
                        num_buckets=_w(sf_dir, "events"))
    counts = partial_agg(
        pairs.map_batches(
            lambda df: pd.DataFrame({"win": df["win"].astype(np.int64)}),
            batch_format="pandas"),
        ["win"], count_col="n_users", combine="driver").to_pandas()
    counts = counts.sort_values("win", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({"win": counts["win"].astype(np.int64),
                         "n_users": counts["n_users"].astype(np.int64)})


def q_prefix_dup_groups(sf_dir: str):
    """Boilerplate detector: groups of documents sharing the same
    64-char text prefix (the cheap exact-prefix cut of near-dup).  Maps
    each doc to its prefix, one distributed count, keeps groups with
    more than one member — only (prefix, count) rows ever shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def _prefix(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"prefix": df["text"].fillna("").str.slice(0, 64)})

    counts = partial_agg(ds.map_batches(_prefix, batch_format="pandas"),
                         ["prefix"], count_col="n_docs",
                         num_buckets=_w(sf_dir, "documents"))
    dups = counts.map_batches(
        lambda df: df[df["n_docs"] > 1][["prefix", "n_docs"]],
        batch_format="pandas").to_pandas()
    dups["n_docs"] = dups["n_docs"].astype(np.int64)
    return dups.sort_values("prefix", kind="mergesort").reset_index(drop=True)


def q_per_user_top_type(sf_dir: str):
    """Per-user modal event type (the grouped argmax at USER
    cardinality — ``mode_event_type`` is the global version): counts
    per (user, type) come from one distributed partial_agg; a second
    user-bucketed pass takes each user's (count desc, type asc) head —
    both shuffles move only skinny count rows."""
    from ..stages.events import transform_buckets

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    counts = partial_agg(ds, ["user_id", "event_type"], count_col="cnt",
                         num_buckets=_w(sf_dir, "events"))

    def _head1(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).head(1)
        return pd.DataFrame({
            "user_id": g["user_id"].astype(np.int64),
            "top_type": g["event_type"],
            "n": g["cnt"].astype(np.int64)})

    return transform_buckets(counts, "user_id", ["cnt", "event_type"],
                             _head1, num_buckets=_w(sf_dir, "events"),
                             ascending=[False, True])


def q_session_duration_decile(sf_dir: str):
    """Pipeline composition showcase: gap-sessionize the event stream
    (30-min gap), aggregate each session's span, then rank EVERY
    session into corpus-global duration deciles with the counting-sort
    NTILE — three operators, three skinny shuffles, no row-scale driver
    state anywhere."""
    from ..stages.events import sessionize
    from ..stages.rank import global_ntile

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts"])
    sess = sessionize(ds, "user_id", "ts_us", gap=1_800_000_000.0,
                      num_buckets=_w(sf_dir, "events"),
                      tie_cols=["event_id"])
    spans = partial_agg(sess, ["user_id", "session_id"],
                        mins=["ts_us"], maxs=["ts_us"],
                        num_buckets=_w(sf_dir, "events"))

    def _dur(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].astype(np.int64)
        sid = df["session_id"].astype(np.int64)
        return pd.DataFrame({
            "sess_key": uid * 1_000_000 + sid,
            "duration_us": (df["max_ts_us"].astype(np.int64)
                            - df["min_ts_us"].astype(np.int64))})

    skinny = spans.map_batches(_dur, batch_format="pandas")
    out = global_ntile(skinny, "duration_us", "sess_key", n=10,
                       num_buckets=shuffle_width())

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        k = df["sess_key"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": k // 1_000_000,
            "session_id": k % 1_000_000,
            "duration_us": df["duration_us"].astype(np.int64),
            "decile": df["tile"].astype(np.int64)})

    return out.map_batches(_finish, batch_format="pandas")


def q_props_k_stats(sf_dir: str):
    """Semi-structured ETL: pull the integer ``k`` out of the JSON
    ``props`` string with ONE vectorized regex per batch (compiled
    once, RE2-compatible so the oracle replays it), then a per-type
    O(groups) aggregate — n, sum, max, and a single-division mean."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def _extract(df: pd.DataFrame) -> pd.DataFrame:
        k = pd.to_numeric(
            df["props"].fillna("").str.extract(r'"k": (\d+)', expand=False),
            errors="coerce").fillna(-1).astype(np.int64)
        return pd.DataFrame({"event_type": df["event_type"], "k": k})

    agg = partial_agg(ds.map_batches(_extract, batch_format="pandas"),
                      ["event_type"], sums=["k"], maxs=["k"],
                      combine="driver").to_pandas()
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "sum_k": agg["sum_k"].astype(np.int64),
        "max_k": agg["max_k"].astype(np.int64),
        "avg_k": agg["sum_k"].astype(np.int64)
        / agg["n"].astype(np.int64).astype(np.float64),
    })


def q_cum_distinct_types(sf_dir: str):
    """Running count of DISTINCT event types each user has touched as
    of each event — the exploration-breadth feature.  One bucketed
    shuffle; inside each sorted bucket the first occurrence of a
    (user, type) pair is a vectorized ``duplicated()`` flag and the
    running count is a per-user cumsum."""
    from ..stages.events import transform_buckets

    ds = _events_us(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def _cum(df: pd.DataFrame) -> pd.DataFrame:
        first = (~df.duplicated(["user_id", "event_type"])).astype(np.int64)
        cum = first.groupby(df["user_id"], sort=False).cumsum()
        return pd.DataFrame({
            "event_id": df["event_id"].astype(np.int64),
            "user_id": df["user_id"].astype(np.int64),
            "n_types_seen": cum.astype(np.int64)})

    return transform_buckets(ds, "user_id", ["ts_us", "event_id"], _cum,
                             num_buckets=_w(sf_dir, "events"))


def q_monthly_revenue_growth(sf_dir: str):
    """Month-over-month revenue report: cent-exact monthly sums from
    one O(months) partial_agg, the lag/delta computed on the driver's
    tiny month vector — the classic time-series rollup without a
    window shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = t // DAY_US
        # calendar month id: days since epoch → (year, month) ordinal.
        # 1970-01-01 is day 0; use pandas vectorized conversion.
        m = pd.to_datetime(days, unit="D")
        month_id = (m.year.to_numpy(np.int64) * 12
                    + (m.month.to_numpy(np.int64) - 1))
        cents = np.round(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                         * 100.0).astype(np.int64)
        return pa.table({"month_id": pa.array(month_id),
                         "cents": pa.array(cents)})

    agg = partial_agg(ds.map_batches(_prep, batch_format="pyarrow"),
                      ["month_id"], sums=["cents"],
                      combine="driver").to_pandas()
    agg = agg.sort_values("month_id", kind="mergesort").reset_index(drop=True)
    rev = agg["sum_cents"].astype(np.int64)
    prev = rev.shift(1).fillna(-1).astype(np.int64)
    return pd.DataFrame({
        "month_id": agg["month_id"].astype(np.int64),
        "revenue": rev / 100.0,
        "prev_revenue": prev.to_numpy(np.int64) / 100.0,
        "delta": (rev - prev.where(prev >= 0, rev)).astype(np.int64) / 100.0,
    })


def q_dup_rate_by_source(sf_dir: str):
    """Per-source exact-duplicate pressure: total docs vs distinct
    texts, and the dup share as one IEEE division.  The distinct pass
    is a (source, text)-keyed partial_agg — the text moves exactly
    once (what SQL's COUNT(DISTINCT text) also must do), then only
    O(sources) count rows remain."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    totals = partial_agg(
        ds.map_batches(lambda df: df[["source"]], batch_format="pandas"),
        ["source"], count_col="n_docs", combine="driver").to_pandas()
    uniq = partial_agg(ds, ["source", "text"],
                       num_buckets=_w(sf_dir, "documents"))
    nuniq = partial_agg(
        uniq.map_batches(lambda df: df[["source"]], batch_format="pandas"),
        ["source"], count_col="n_unique", combine="driver").to_pandas()
    out = totals.merge(nuniq, on="source")
    nd = out["n_docs"].astype(np.int64)
    nu = out["n_unique"].astype(np.int64)
    return pd.DataFrame({
        "source": out["source"],
        "n_docs": nd,
        "n_unique": nu,
        "dup_rate": (nd - nu).to_numpy(np.int64)
        / nd.to_numpy(np.int64).astype(np.float64),
    }).sort_values("source", kind="mergesort").reset_index(drop=True)


def q_zonemap_prune(sf_dir: str):
    """Data-skipping end-to-end: write the event stream as zone-mapped
    sorted parquet runs (one file per day of ``ts``), answer a 3-day
    range question through the PRUNED read path (non-overlapping files
    are never opened — asserted, not assumed), and aggregate per day.
    The oracle recomputes from the raw table, proving the
    partition+manifest round-trip byte-exact."""
    import os

    from ..sources.zonemap import read_zonemapped, write_zonemapped

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.int64())
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 10000.0).astype(np.int64)
        return pa.table({"event_id": batch["event_id"], "ts_us": t,
                         "v_s": pa.array(v)})

    out_dir = os.path.join(
        "/tmp", "vfr_zonemap_"
        + os.path.basename(os.path.normpath(sf_dir)))
    write_zonemapped(ds.map_batches(_prep, batch_format="pyarrow"),
                     out_dir, "ts_us", DAY_US)

    # days 5..7 of Jan 2024 (epoch days 19727..19729)
    lo, hi = 19727 * DAY_US, 19730 * DAY_US
    pruned, files_read, files_total = read_zonemapped(
        out_dir, "ts_us", lo, hi)
    assert files_read < files_total, "zone map failed to skip files"

    agg = partial_agg(
        pruned.map_batches(
            lambda df: pd.DataFrame({
                "day": df["ts_us"].to_numpy(np.int64) // DAY_US,
                "v_s": df["v_s"].astype(np.int64)}),
            batch_format="pandas"),
        ["day"], sums=["v_s"], combine="driver").to_pandas()
    agg = agg.sort_values("day", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "day": agg["day"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "total": agg["sum_v_s"].astype(np.int64) / 10000.0,
    })


def q_dup_span_stats(sf_dir: str):
    """Substring-level duplicate detection (Lee et al. ExactSubstr, the
    k-char variant): fraction of each source's 40-char window positions
    whose window occurs in >= 2 distinct documents.  ONE gram-bucketed
    shuffle of 128-bit hashed postings resolves dup membership AND the
    per-source sums inside the bucket tasks — no dup-gram set is ever
    collected or broadcast (stages/spans.py)."""
    from ..stages.spans import dup_span_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    return dup_span_stats(ds, k=40,
                          num_buckets=_w(sf_dir, "documents"))


def q_dup_span_winnowed(sf_dir: str):
    """The 100 TB knob of q_dup_span_stats: winnowing selection
    (Schleimer et al.) shuffles only ~2/(w+1) of positions while
    guaranteeing any shared span of length >= k + w - 1 is detected.
    Counts are over SELECTED positions (fingerprint-level dup
    pressure), so this is a rows-only check; the selection guarantee
    and the exact-mode equality are pinned in
    tests/test_spans_graph_shards.py."""
    from ..stages.spans import dup_span_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    return dup_span_stats(ds, k=40, winnow_w=8,
                          num_buckets=_w(sf_dir, "documents"))


def q_cosine_pairs(sf_dir: str):
    """Exact all-pairs bag-of-words cosine top-20 — the brute-force
    verification complement of the LSH/ANN near-dup family.  Vocab fit
    is one distinct-combine; the corpus count-matrix broadcasts once;
    each batch does one int64 matmul block and keeps a local top-20."""
    from ..stages.spans import cosine_pairs_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return cosine_pairs_topk(ds, topk=20)


def _edge_width(edges) -> int:
    """Bucket count for stages downstream of a MATERIALIZED edge table:
    sized by the edges actually present (count x ~32 B), not by the
    raw fact-table bytes — at sf0.1 the support-filtered co-purchase
    graph is ~3.5k edges and a lineitem-sized 64-way shuffle spends
    more on per-bucket task overhead than on data."""
    try:
        n = int(edges.count())
    except Exception:
        n = 0
    # small floor/cap: these stages run AFTER the support filter, so
    # parallelism beyond the data term only buys per-bucket task
    # overhead; the data term still grows the width at real scale
    return shuffle_width(n * 32, floor=8, cluster_cap=8)


def _group_runs(df: pd.DataFrame, key: str, val: str):
    """Sorted-distinct (key, val) rows -> (vals array, run starts, run
    counts) — the shared vectorized front end for per-group
    combination generation (NO per-group Python loop)."""
    d = (df[[key, val]].sort_values([key, val], kind="mergesort")
         .drop_duplicates())
    k = d[key].to_numpy(np.int64)
    v = d[val].to_numpy(np.int64)
    change = np.concatenate(([True], k[1:] != k[:-1]))
    starts = np.flatnonzero(change)
    counts = np.diff(np.concatenate([starts, [len(k)]]))
    return v, starts, counts


def _order_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """All within-order part pairs ``src < dst`` — groups of equal size
    c stack into an (m, c) index matrix and fan out through ONE
    triu_indices per distinct size (the same size-class trick as the
    FastSS candidate stage; a 150k-order bucket previously cost a 150k-
    iteration pandas groupby loop)."""
    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "dst": pd.Series([], dtype=np.int64)})
    if df.empty or "l_orderkey" not in df.columns:
        return empty
    v, starts, counts = _group_runs(df, "l_orderkey", "l_partkey")
    srcs, dsts = [], []
    for c in np.unique(counts):
        if c < 2:
            continue
        s_c = starts[counts == c]
        members = s_c[:, None] + np.arange(c)[None, :]
        ii, jj = np.triu_indices(int(c), k=1)
        srcs.append(v[members[:, ii].ravel()])
        dsts.append(v[members[:, jj].ravel()])
    if not srcs:
        return empty
    return pd.DataFrame({"src": np.concatenate(srcs),
                         "dst": np.concatenate(dsts)})


def _copurchase_edges(sf_dir: str, w: int):
    """Part co-purchase graph: DISTINCT (order, part) -> per-order part
    pairs (order-bucketed) -> pairs supported by >= 2 distinct orders,
    oriented ``src < dst``."""
    return (_copurchase_edges_support(sf_dir, w)
            .select_columns(["src", "dst"]))


def _copurchase_edges_support(sf_dir: str, w: int):
    """Co-purchase edges WITH the distinct-order support column
    ``n_ord``: DISTINCT (order, part) -> per-order sorted part pairs
    (order-bucketed) -> support count -> ``n_ord >= 2`` filter."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    def _tag(batch: pa.Table) -> pd.DataFrame:
        d = batch.to_pandas().drop_duplicates()
        h = pd.util.hash_array(
            d["l_orderkey"].to_numpy(np.int64)).astype(np.uint64)
        d["_bucket"] = (h % np.uint64(w)).astype(np.int32)
        return d

    pairs = (ds.map_batches(_tag, batch_format="pyarrow")
             .groupby("_bucket").map_groups(_order_pairs,
                                            batch_format="pandas"))
    return partial_agg(pairs, ["src", "dst"], count_col="n_ord",
                       num_buckets=w).filter(expr="n_ord >= 2")


def q_triangle_count(sf_dir: str):
    """Exact triangle count of the part co-purchase graph (edge = two
    parts sharing >= 2 distinct orders): per-order pair emission
    (order-bucketed), pair-support filter, then the oriented
    wedge-join plan in stages/graph.py."""
    from ..stages.graph import triangle_count

    w = _w(sf_dir, "lineitem")
    edges = _copurchase_edges(sf_dir, w).materialize()
    return triangle_count(edges, num_buckets=_edge_width(edges))


def q_kcore_copurchase(sf_dir: str):
    """3-core of the co-purchase graph by distributed iterative peeling
    (stages/graph.py k_core): degrees via partial_agg, peeled nodes
    dropped with anti joins, driver holds only counters.  Not
    SQL-expressible (a non-monotone fixpoint), so this entry is
    rows-only at the driver; the in-repo suite pins planted-clique /
    tree / cycle fixpoints."""
    from ..stages.graph import k_core

    w = _w(sf_dir, "lineitem")
    edges = _copurchase_edges(sf_dir, w).materialize()
    # local_finish low enough that the distributed peel actually runs
    # its table rounds on the bench graph (~3.5k edges at sf0.1) before
    # the single-task finish takes the fixpoint tail.  max_iter=8 keeps
    # the trickle-frontier case bounded (a sparse graph just over
    # local_finish peels a handful of nodes per ~4-Ray-op round — at
    # sf0.01 that was 100 rounds ≈ 8 min of pure scheduling overhead);
    # exhaustion forces the single-task finish, so the fixpoint is
    # exact either way and wall time is bounded at every SF
    core, rounds, n_nodes = k_core(edges, k=3,
                                   num_buckets=_edge_width(edges),
                                   local_finish=512, max_iter=8)
    return pd.DataFrame({"k": [np.int64(3)],
                         "n_core_nodes": [np.int64(n_nodes)],
                         "n_core_edges": [np.int64(core.count())],
                         "n_rounds": [np.int64(rounds)]})


def q_shuffle_shards(sf_dir: str):
    """Deterministic training-shard export: pseudo-shuffle the document
    table into 16 parquet shards (Knuth-hash assignment + intra-shard
    order), then PROVE the written layout by reading every shard back
    and recomputing the per-shard stats from the files themselves."""
    import os

    import pyarrow.parquet as pq_mod

    from ..sources.sinks import write_shuffled_shards

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    out_dir = os.path.join(
        "/tmp", "vfr_shards_"
        + os.path.basename(os.path.normpath(sf_dir)))
    written = write_shuffled_shards(ds, out_dir, n_shards=16).to_pandas()

    # verify from disk: recompute counts/sums off the shard files
    rows = []
    for shard in sorted(written["shard"].astype(int)):
        t = pq_mod.read_table(
            os.path.join(out_dir, f"shard-{shard:05d}.parquet"))
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (k * np.int64(2654435761)) % np.int64(4294967296)
        assert (h % 16 == shard).all(), "shard file holds foreign rows"
        o = h // np.int64(16)
        assert (np.diff(o) >= 0).all(), "intra-shard order violated"
        rows.append((np.int64(shard), np.int64(len(k)),
                     np.int64(k.sum()),
                     np.int64(t["n_chars"].to_numpy(
                         zero_copy_only=False).sum())))
    return pd.DataFrame(rows, columns=["shard", "n_docs", "sum_doc_id",
                                       "sum_chars"])


def q_daily_spine_orders(sf_dir: str):
    """Calendar-spine densification: every day between the global first
    and last order date — including ZERO-order days — with exact order
    counts and cent-exact revenue.  Per-day partials are O(days) so the
    driver-side spine merge is O(domain), never O(rows)."""
    ds = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderdate", "o_totalprice"])

    def _prep(batch: pa.Table) -> pd.DataFrame:
        day = (batch["o_orderdate"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US)
        cents = np.round(batch["o_totalprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pd.DataFrame({"day": day, "cents": cents})

    agg = partial_agg(ds.map_batches(_prep, batch_format="pyarrow"),
                      ["day"], sums=["cents"],
                      combine="driver").to_pandas()
    agg = agg.sort_values("day", kind="mergesort")
    days = agg["day"].to_numpy(np.int64)
    spine = np.arange(days.min(), days.max() + 1, dtype=np.int64)
    n = np.zeros(len(spine), dtype=np.int64)
    c = np.zeros(len(spine), dtype=np.int64)
    pos = days - days.min()
    n[pos] = agg["n"].to_numpy(np.int64)
    c[pos] = agg["sum_cents"].to_numpy(np.int64)
    return pd.DataFrame({"day": spine, "n_orders": n,
                         "revenue": c / 100.0})


def q_edit1_name_hist(sf_dir: str):
    """Entity-resolution primitive: for every customer, how many OTHER
    customers have a name within edit distance 1 (typo radius), as a
    degree histogram.  The Ray side is the FastSS deletion-neighborhood
    join (linear postings, verified candidates — stages/dedup.py
    edit1_pairs) in TWO shuffles total: variant-bucketed candidate
    generation, then node-bucketed distinct-neighbor degree counting
    (pair dedup folds into the degree pass).  The oracle is DuckDB's
    quadratic nested-loop ``levenshtein`` join, so this also
    cross-checks that the pruning is lossless."""
    from ..stages.dedup import edit1_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_name"])
    n_total = table_rows(sf_dir, "customer")
    w = _w(sf_dir, "customer")
    cand = edit1_pairs(
        ds.map_batches(
            lambda t: t.rename_columns(["id", "name"]),
            batch_format="pyarrow"),
        key_col="id", text_col="name", num_buckets=w, distinct=False)

    def _both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "ka" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "nb": pd.Series([], dtype=np.int64),
                                 "_b2": pd.Series([], dtype=np.int32)})
        ka = df["ka"].to_numpy(np.int64)
        kb = df["kb"].to_numpy(np.int64)
        d = pd.DataFrame({"node": np.concatenate([ka, kb]),
                          "nb": np.concatenate([kb, ka])})
        d = d.drop_duplicates()
        h = pd.util.hash_array(d["node"].to_numpy(np.int64))
        d["_b2"] = (h % np.uint64(w)).astype(np.int32)
        return d

    def _deg_hist(df: pd.DataFrame) -> pd.DataFrame:
        # node-confined bucket: global distinct-neighbor degree is
        # local; emit the bucket's degree HISTOGRAM (O(degrees) rows)
        if df.empty or "node" not in df.columns:
            return pd.DataFrame({"deg": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        deg = (df[["node", "nb"]].drop_duplicates()
               .groupby("node", sort=False).size())
        h = deg.value_counts()
        return pd.DataFrame({"deg": h.index.to_numpy(np.int64),
                             "n": h.to_numpy(np.int64)})

    parts = (cand.map_batches(_both_dirs, batch_format="pandas")
             .groupby("_b2").map_groups(_deg_hist, batch_format="pandas")
             .to_pandas())
    hist = (parts.groupby("deg", sort=False)["n"].sum().reset_index()
            .rename(columns={"deg": "n_neighbors", "n": "n_customers"}))
    n_with = int(hist["n_customers"].sum())
    if n_total != n_with:
        hist = pd.concat([pd.DataFrame({
            "n_neighbors": [np.int64(0)],
            "n_customers": [np.int64(n_total - n_with)]}), hist],
            ignore_index=True)
    return (hist.astype({"n_neighbors": np.int64,
                         "n_customers": np.int64})
            .sort_values("n_neighbors", kind="mergesort")
            .reset_index(drop=True))


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids — the array-column aggregation a
    class-prototype / SemDeDup-style pipeline needs.  Per batch: one
    scaled-int64 matrix reduction per label (labels x dims partial
    rows, O(classes), never O(rows)); one driver combine; mean is ONE
    division of exact ints so the oracle (DuckDB list indexing +
    generate_series unnest) reproduces it bit-for-bit."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["label", "embedding"])

    def _partial(batch: pa.Table) -> pd.DataFrame:
        # module-scope import: a function-level relative import would
        # re-resolve the package ON THE WORKER, where only the by-value
        # pickled modules exist (hostile-driver sys.path)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lab) == 0:
            return pd.DataFrame({"label": pd.Series([], dtype=np.int64),
                                 "dim": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64)})
        dim = len(batch["embedding"][0])
        m = _fixed_list_matrix(batch["embedding"], dim, np.float64)
        # half-away-from-zero via an explicit floor expression that the
        # oracle SQL mirrors VERBATIM — np.round (half-to-even) vs
        # DuckDB round (half-away) disagree on the many exact .5 ties
        # float32 inputs produce at 1e6 scaling
        s = m * 1_000_000.0
        xs = np.where(s >= 0, np.floor(s + 0.5),
                      -np.floor(-s + 0.5)).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), dim), dtype=np.int64)
        np.add.at(sums, inv, xs)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        L = len(ulab)
        return pd.DataFrame({
            "label": np.repeat(ulab, dim),
            "dim": np.tile(np.arange(1, dim + 1, dtype=np.int64), L),
            "n": np.repeat(cnt, dim),
            "s": sums.ravel()})

    parts = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    agg = (parts.groupby(["label", "dim"], sort=False)[["n", "s"]]
           .sum().reset_index())
    return (pd.DataFrame({
        "label": agg["label"].astype(np.int64),
        "dim": agg["dim"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "mean": agg["s"].astype(np.int64).to_numpy()
        / (agg["n"].astype(np.int64).to_numpy() * 1_000_000.0)})
        .sort_values(["label", "dim"], kind="mergesort")
        .reset_index(drop=True))


def q_frequent_triples(sf_dir: str):
    """Market-basket A-priori, level 3: part triples co-purchased in
    >= 2 distinct orders.  The Ray side prunes candidate triples by the
    A-PRIORI PROPERTY (every sub-pair of a frequent triple is frequent,
    so only triples whose three packed pairs are in the broadcast
    frequent-pair set are ever emitted or shuffled); the oracle counts
    all triples unpruned — equality proves the pruning lossless."""
    w = _w(sf_dir, "lineitem")
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    def _tag(batch: pa.Table) -> pd.DataFrame:
        d = batch.to_pandas().drop_duplicates()
        h = pd.util.hash_array(
            d["l_orderkey"].to_numpy(np.int64)).astype(np.uint64)
        d["_bucket"] = (h % np.uint64(w)).astype(np.int32)
        return d

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = _order_pairs(df)
        s = d["src"].to_numpy(np.int64)
        t = d["dst"].to_numpy(np.int64)
        # packed-pair key is exact only for ids < 2^31 (src*2^31+dst
        # in int64, src < dst) — same guard as triangle_count
        if len(t) and (s.min() < 0 or t.max() >= 1 << 31):
            raise ValueError("frequent-triples pair packing requires "
                             "part ids in [0, 2^31)")
        return pd.DataFrame({"pp": s * np.int64(1 << 31) + t})

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    support = partial_agg(
        tagged.groupby("_bucket").map_groups(_pairs,
                                             batch_format="pandas"),
        ["pp"], count_col="n_ord", num_buckets=w)
    freq = support.filter(expr="n_ord >= 2").select_columns(["pp"])
    freq_arr = np.sort(freq.to_pandas()["pp"].to_numpy(np.int64))
    freq_ref = ray.put(freq_arr)

    def _triples(df: pd.DataFrame) -> pd.DataFrame:
        # size-class vectorized ordered triples x<y<z per order, then
        # one batched A-priori membership test — no per-order loop
        freq = ray.get(freq_ref)    # zero-copy, worker-cached
        empty = pd.DataFrame({
            "part_a": pd.Series([], dtype=np.int64),
            "part_b": pd.Series([], dtype=np.int64),
            "part_c": pd.Series([], dtype=np.int64)})
        if df.empty or "l_orderkey" not in df.columns:
            return empty
        v, starts, counts = _group_runs(df, "l_orderkey", "l_partkey")
        xs, ys, zs = [], [], []
        for c in np.unique(counts):
            if c < 3:
                continue
            s_c = starts[counts == c]
            members = s_c[:, None] + np.arange(c)[None, :]
            i, j, k = np.meshgrid(np.arange(c), np.arange(c),
                                  np.arange(c), indexing="ij")
            m = (i < j) & (j < k)
            ii, jj, kk = i[m], j[m], k[m]
            xs.append(v[members[:, ii].ravel()])
            ys.append(v[members[:, jj].ravel()])
            zs.append(v[members[:, kk].ravel()])
        if not xs:
            return empty
        B = np.int64(1 << 31)
        x = np.concatenate(xs); y = np.concatenate(ys)
        z = np.concatenate(zs)
        keep = (np.isin(x * B + y, freq) & np.isin(x * B + z, freq)
                & np.isin(y * B + z, freq))
        return pd.DataFrame({"part_a": x[keep], "part_b": y[keep],
                             "part_c": z[keep]})

    cand = tagged.groupby("_bucket").map_groups(
        _triples, batch_format="pandas")
    tri = (partial_agg(cand, ["part_a", "part_b", "part_c"],
                       count_col="support", num_buckets=w)
           .filter(expr="support >= 2").to_pandas())
    if "part_a" not in tri.columns:     # no frequent triple anywhere
        tri = pd.DataFrame({"part_a": [], "part_b": [], "part_c": [],
                            "support": []})
    return (tri.astype({"part_a": np.int64, "part_b": np.int64,
                        "part_c": np.int64, "support": np.int64})
            .sort_values(["part_a", "part_b", "part_c"],
                         kind="mergesort").reset_index(drop=True))


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the co-purchase graph (Newman 2002): the
    Pearson correlation of endpoint degrees over every directed edge
    occurrence.  Degrees are exact int64 counts, all five correlation
    sums are exact int64 partials (one driver combine of O(batches)
    rows), and the coefficient is ONE closed-form double expression the
    oracle mirrors verbatim — so a float answer is still bit-exact."""
    from ..stages.joins import hash_join

    w = _w(sf_dir, "lineitem")
    edges = _copurchase_edges(sf_dir, w).materialize()
    w2 = _edge_width(edges)

    def _both(batch: pa.Table) -> pd.DataFrame:
        s = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({"s": np.concatenate([s, d]),
                             "d": np.concatenate([d, s])})

    b = edges.map_batches(_both, batch_format="pyarrow").materialize()
    deg = partial_agg(
        b.map_batches(lambda df: df.rename(columns={"s": "node"})
                      [["node"]], batch_format="pandas"),
        ["node"], count_col="deg", num_buckets=w2)

    b_sch = pa.schema([("s", pa.int64()), ("d", pa.int64())])
    deg_s = deg.map_batches(lambda df: df.rename(
        columns={"node": "s", "deg": "dx"}), batch_format="pandas")
    j1 = hash_join(b, deg_s, on="s", num_buckets=w2,
                   coalesce_blocks=w2,
                   schemas=(b_sch, pa.schema([("s", pa.int64()),
                                              ("dx", pa.int64())])))
    deg_d = deg.map_batches(lambda df: df.rename(
        columns={"node": "d", "deg": "dy"}), batch_format="pandas")
    j2 = hash_join(j1, deg_d, on="d", num_buckets=w2,
                   coalesce_blocks=w2,
                   schemas=(pa.schema([("s", pa.int64()),
                                       ("d", pa.int64()),
                                       ("dx", pa.int64())]),
                            pa.schema([("d", pa.int64()),
                                       ("dy", pa.int64())])))

    def _sums(df: pd.DataFrame) -> pd.DataFrame:
        dx = df["dx"].to_numpy(np.int64)
        dy = df["dy"].to_numpy(np.int64)
        return pd.DataFrame({"one": np.ones(len(df), dtype=np.int64),
                             "x": dx, "y": dy, "xy": dx * dy,
                             "xx": dx * dx, "yy": dy * dy})

    agg = partial_agg(j2.map_batches(_sums, batch_format="pandas"),
                      ["one"], sums=["x", "y", "xy", "xx", "yy"],
                      combine="driver").to_pandas()
    n = np.int64(agg["n"].iloc[0])
    sx, sy = np.int64(agg["sum_x"].iloc[0]), np.int64(agg["sum_y"].iloc[0])
    sxy = np.int64(agg["sum_xy"].iloc[0])
    sxx = np.int64(agg["sum_xx"].iloc[0])
    syy = np.int64(agg["sum_yy"].iloc[0])
    r = (np.float64(n * sxy - sx * sy)
         / (np.sqrt(np.float64(n * sxx - sx * sx))
            * np.sqrt(np.float64(n * syy - sy * sy))))
    return pd.DataFrame({"n": [np.int64(n)],
                         "assortativity": [np.float64(r)]})


def q_markov_accuracy(sf_dir: str):
    """In-corpus model fit + scoring: the majority-class next-event
    predictor (argmax row of the Markov transition matrix, ties to the
    lexicographically smallest successor) scored on the SAME stream.
    The matrix is O(types^2) — fit and score both derive from the one
    user-bucketed transition pass; accuracy is one exact-int
    division."""
    from ..stages.events import event_transitions

    ds = _events_us(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    m = event_transitions(ds, "user_id", "event_type",
                          ["ts_us", "event_id"],
                          num_buckets=_w(sf_dir, "events"))
    m = m.sort_values(["from_type", "n", "to_type"],
                      ascending=[True, False, True], kind="mergesort")
    pred = m.groupby("from_type", sort=False).head(1)[
        ["from_type", "to_type", "n"]].rename(
        columns={"to_type": "pred", "n": "n_correct"})
    tot = (m.groupby("from_type", sort=False)["n"].sum()
           .rename("n_transitions").reset_index())
    out = tot.merge(pred, on="from_type")
    return (pd.DataFrame({
        "from_type": out["from_type"],
        "pred": out["pred"],
        "n_transitions": out["n_transitions"].astype(np.int64),
        "n_correct": out["n_correct"].astype(np.int64),
        "accuracy": out["n_correct"].astype(np.int64).to_numpy()
        / out["n_transitions"].astype(np.int64).to_numpy()
        .astype(np.float64)})
        .sort_values("from_type", kind="mergesort")
        .reset_index(drop=True))


def q_mutual_top_partner(sf_dir: str):
    """Reciprocal best match: part pairs that are EACH OTHER's top
    co-purchase partner (max shared-order support, ties to the smaller
    partner id).  Per-src argmax is bucket-local (src-confined); the
    O(parts) top-partner table is value-domain bounded, so the mutual
    check is one driver merge — same O(domain) discipline as the
    calendar spine."""
    w = _w(sf_dir, "lineitem")
    edges = _copurchase_edges_support(sf_dir, w).materialize()
    w2 = _edge_width(edges)

    def _both(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "src" not in df.columns:
            return pd.DataFrame({"s": pd.Series([], dtype=np.int64),
                                 "d": pd.Series([], dtype=np.int64),
                                 "n_ord": pd.Series([], dtype=np.int64),
                                 "_b2": pd.Series([], dtype=np.int32)})
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        n = df["n_ord"].to_numpy(np.int64)
        out = pd.DataFrame({"s": np.concatenate([s, d]),
                            "d": np.concatenate([d, s]),
                            "n_ord": np.concatenate([n, n])})
        h = pd.util.hash_array(out["s"].to_numpy(np.int64))
        out["_b2"] = (h % np.uint64(w2)).astype(np.int32)
        return out

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "s" not in df.columns:
            return pd.DataFrame({"s": pd.Series([], dtype=np.int64),
                                 "top": pd.Series([], dtype=np.int64),
                                 "n_ord": pd.Series([], dtype=np.int64)})
        d = df.sort_values(["s", "n_ord", "d"],
                           ascending=[True, False, True],
                           kind="mergesort")
        d = d.groupby("s", sort=False).head(1)
        return pd.DataFrame({"s": d["s"].to_numpy(np.int64),
                             "top": d["d"].to_numpy(np.int64),
                             "n_ord": d["n_ord"].to_numpy(np.int64)})

    tops = (edges.map_batches(_both, batch_format="pandas")
            .groupby("_b2").map_groups(_top, batch_format="pandas")
            .to_pandas())
    if "s" not in tops.columns:         # graph empty at this scale
        tops = pd.DataFrame({"s": pd.Series([], dtype=np.int64),
                             "top": pd.Series([], dtype=np.int64),
                             "n_ord": pd.Series([], dtype=np.int64)})
    rev = tops.rename(columns={"s": "top", "top": "s"})[
        ["s", "top"]].assign(_mutual=True)
    j = tops.merge(rev, on=["s", "top"], how="inner")
    j = j[j["s"] < j["top"]]
    return (pd.DataFrame({"part_a": j["s"].astype(np.int64),
                          "part_b": j["top"].astype(np.int64),
                          "support": j["n_ord"].astype(np.int64)})
            .sort_values(["part_a", "part_b"], kind="mergesort")
            .reset_index(drop=True))


def q_search_docs(sf_dir: str):
    """Multi-term AND search with tf ranking: docs containing every
    query term (space-split, exact match), ranked by summed term
    frequency then doc_id, top 10 — the inverted-index probe the
    `term_df_topk` index family serves.  Per-batch tf of the two probe
    terms is a map; the global top-10 is a driver merge of per-batch
    top-10s (same local-top-k-then-merge plan as cosine_pairs)."""
    TERMS = ("data", "query")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def _score(batch: pa.Table) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rows = []
        for i, t in enumerate(batch["text"].to_pylist()):
            if t is None:
                continue
            ws = t.split(" ")
            tfs = [sum(1 for x in ws if x == q) for q in TERMS]
            if all(tfs):
                rows.append((int(ids[i]), sum(tfs)))
        if not rows:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "tf_total": pd.Series([], dtype=np.int64)})
        d = pd.DataFrame(rows, columns=["doc_id", "tf_total"])
        return (d.sort_values(["tf_total", "doc_id"],
                              ascending=[False, True], kind="mergesort")
                .head(10))

    cand = ds.map_batches(_score, batch_format="pyarrow").to_pandas()
    return (cand.sort_values(["tf_total", "doc_id"],
                             ascending=[False, True], kind="mergesort")
            .head(10).astype({"doc_id": np.int64, "tf_total": np.int64})
            .reset_index(drop=True))


def q_random_walks(sf_dir: str):
    """Deterministic 3-step random walks from every co-purchase-graph
    node — the walk-corpus generator a node2vec/DeepWalk embedding
    pipeline feeds to its skip-gram stage, made REPLAYABLE: the step-t
    choice from node v is its neighbor ranked (support DESC, id) at
    position ``((v*31+t) * 2654435761 mod 2^32) mod deg(v)``, so a
    resumed run — or the SQL oracle — regenerates identical walks.
    Plan: one bucket-local rank/degree pass over the directed neighbor
    table, then one packed-key hash join per step (frontier is O(nodes)
    rows; nothing is ever collected)."""
    from ..stages.joins import hash_join

    w = _w(sf_dir, "lineitem")
    edges = _copurchase_edges_support(sf_dir, w).materialize()
    w2 = _edge_width(edges)

    def _both(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "src" not in df.columns:
            return pd.DataFrame({"s": pd.Series([], dtype=np.int64),
                                 "d": pd.Series([], dtype=np.int64),
                                 "n_ord": pd.Series([], dtype=np.int64),
                                 "_b2": pd.Series([], dtype=np.int32)})
        s = df["src"].to_numpy(np.int64)
        d = df["dst"].to_numpy(np.int64)
        n = df["n_ord"].to_numpy(np.int64)
        out = pd.DataFrame({"s": np.concatenate([s, d]),
                            "d": np.concatenate([d, s]),
                            "n_ord": np.concatenate([n, n])})
        h = pd.util.hash_array(out["s"].to_numpy(np.int64))
        out["_b2"] = (h % np.uint64(w2)).astype(np.int32)
        return out

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "s" not in df.columns:
            return pd.DataFrame({"key": pd.Series([], dtype=np.int64),
                                 "d": pd.Series([], dtype=np.int64),
                                 "deg": pd.Series([], dtype=np.int64),
                                 "s": pd.Series([], dtype=np.int64)})
        d = df.sort_values(["s", "n_ord", "d"],
                           ascending=[True, False, True],
                           kind="mergesort").reset_index(drop=True)
        grp = d.groupby("s", sort=False)
        rn = grp.cumcount().to_numpy(np.int64)
        deg = grp["d"].transform("size").to_numpy(np.int64)
        s = d["s"].to_numpy(np.int64)
        return pd.DataFrame({"key": s * np.int64(1 << 31) + rn,
                             "d": d["d"].to_numpy(np.int64),
                             "deg": deg, "s": s})

    ranked = (edges.map_batches(_both, batch_format="pandas")
              .groupby("_b2").map_groups(_rank, batch_format="pandas")
              .materialize())
    # per-node degree table (rank rows with rn == 0 carry it)
    def _deg_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = (df["key"].to_numpy(np.int64) % np.int64(1 << 31)) == 0
        d = df[m]
        return pd.DataFrame({"node": d["s"].astype(np.int64),
                             "deg": d["deg"].astype(np.int64)})

    deg_tbl = ranked.map_batches(_deg_rows, batch_format="pandas")

    # attach the DESTINATION's degree to each ranked row — the next
    # step's pick needs deg(new node), not deg(current)
    deg_d = deg_tbl.map_batches(
        lambda df: df.rename(columns={"node": "d", "deg": "deg_d"}),
        batch_format="pandas")
    ranked = hash_join(
        ranked.select_columns(["key", "d"]), deg_d, on="d",
        num_buckets=w2, coalesce_blocks=w2,
        schemas=(pa.schema([("key", pa.int64()), ("d", pa.int64())]),
                 pa.schema([("d", pa.int64()), ("deg_d", pa.int64())]))
    ).materialize()

    KN = np.int64(2654435761)
    M32 = np.int64(4294967296)

    # frontier: (start, cur, deg(cur))
    frontier = deg_tbl.map_batches(
        lambda df: pd.DataFrame({"start": df["node"].astype(np.int64),
                                 "cur": df["node"].astype(np.int64),
                                 "deg": df["deg"].astype(np.int64)}),
        batch_format="pandas").materialize()
    hops = []
    for step in (1, 2, 3):
        def _pick(df: pd.DataFrame, _t=step) -> pd.DataFrame:
            cur = df["cur"].to_numpy(np.int64)
            deg = df["deg"].to_numpy(np.int64)
            # (cur*31+t)*KN must not wrap int64 (the SQL side is exact
            # BIGINT): cur*31*KN < 2^63 requires cur < ~1.1e8
            if len(cur) and (cur.min() < 0 or cur.max() >= 10 ** 8):
                raise ValueError("random-walk step hash requires node "
                                 "ids in [0, 1e8)")
            rn = ((cur * 31 + _t) * KN % M32) % deg
            out = df[["start"]].copy()
            out["key"] = cur * np.int64(1 << 31) + rn
            return out

        f_sch = pa.schema([("start", pa.int64()), ("key", pa.int64())])
        nxt = hash_join(
            frontier.map_batches(_pick, batch_format="pandas"),
            ranked.select_columns(["key", "d", "deg_d"]),
            on="key", num_buckets=w2, coalesce_blocks=w2,
            schemas=(f_sch, pa.schema([("key", pa.int64()),
                                       ("d", pa.int64()),
                                       ("deg_d", pa.int64())])))
        frontier = nxt.map_batches(
            lambda df: pd.DataFrame({"start": df["start"].astype(np.int64),
                                     "cur": df["d"].astype(np.int64),
                                     "deg": df["deg_d"].astype(np.int64)}),
            batch_format="pandas").materialize()
        hops.append(frontier.map_batches(
            lambda df, _t=step: pd.DataFrame(
                {"start": df["start"].astype(np.int64),
                 "step": np.full(len(df), _t, dtype=np.int64),
                 "node": df["cur"].astype(np.int64)}),
            batch_format="pandas").to_pandas())

    out = pd.concat(hops, ignore_index=True)
    walk = out.pivot(index="start", columns="step", values="node")
    walk.columns = [f"hop{int(c)}" for c in walk.columns]
    return (walk.reset_index().astype(np.int64)
            .sort_values("start", kind="mergesort")
            .reset_index(drop=True))


def q_psi_value_drift(sf_dir: str):
    """Population-Stability-Index drift monitor: the event ``value``
    distribution of the chronologically FIRST half of the stream vs the
    second (split at the midpoint day, computed from footer-cheap
    min/max partials), over unit-width floor bins.  Counts are exact
    ints, shares are single divisions, and the per-bin PSI contribution
    ``(p_a - p_b) * ln(p_a / p_b)`` is emitted PER BIN rounded to 12
    decimals on both sides (numpy and DuckDB ln differ in the last
    ulp) — the same no-order-dependent-sum discipline as the entropy
    and chi-square queries.  Bins empty in either half are excluded
    (the standard epsilon-free PSI variant)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        return pd.DataFrame({"one": np.ones(len(d), dtype=np.int64),
                             "day": d})

    days = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                       ["one"], mins=["day"], maxs=["day"],
                       combine="driver").to_pandas()
    d0 = np.int64(days["min_day"].iloc[0])
    d1 = np.int64(days["max_day"].iloc[0])
    split = (d0 + d1 + 1) // 2

    def _bins(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "half": (d >= split).astype(np.int64),
            "bin": np.floor(v).astype(np.int64)})

    c = partial_agg(ds.map_batches(_bins, batch_format="pyarrow"),
                    ["half", "bin"], combine="driver").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    a = c[c["half"] == 0][["bin", "n"]].rename(columns={"n": "n_a"})
    b = c[c["half"] == 1][["bin", "n"]].rename(columns={"n": "n_b"})
    ta = np.int64(a["n_a"].sum())
    tb = np.int64(b["n_b"].sum())
    m = a.merge(b, on="bin", how="inner")
    p_a = m["n_a"].to_numpy(np.int64) / np.float64(ta)
    p_b = m["n_b"].to_numpy(np.int64) / np.float64(tb)
    return (pd.DataFrame({
        "bin": m["bin"].astype(np.int64),
        "n_a": m["n_a"].astype(np.int64),
        "n_b": m["n_b"].astype(np.int64),
        "p_a": p_a, "p_b": p_b,
        "psi": np.round((p_a - p_b) * np.log(p_a / p_b), 12)})
        .sort_values("bin", kind="mergesort").reset_index(drop=True))


def q_dup_span_ranges(sf_dir: str):
    """ExactSubstr's actual deliverable (Lee et al.): the MERGED char
    intervals of each document covered by 40-char windows that occur in
    >= 2 distinct documents.  Two bucketed shuffles (gram-hash postings
    -> in-bucket dup membership -> doc-hash interval merge), nothing
    broadcast, nothing collected; the oracle is the classic
    gaps-and-islands window-function formulation."""
    from ..stages.spans import dup_span_ranges

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    w = _w(sf_dir, "documents")
    return dup_span_ranges(ds, k=40, num_buckets=w, doc_buckets=w)


def q_kanon_docs(sf_dir: str):
    """k-anonymity suppression over the quasi-identifier
    (source, n_chars // 100): documents whose quasi-identifier group
    has fewer than 5 members are suppressed — the privacy-release
    primitive curation pipelines run before publishing corpus slices.
    ONE composite-key bucketed shuffle; a group never splits across
    buckets, so the size filter is exact locally."""
    from ..stages.events import stable_bucket_multi

    k_anon = 5
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    w = _w(sf_dir, "documents")

    def _tag(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_numpy(zero_copy_only=False)
        sb = batch["n_chars"].to_numpy(
            zero_copy_only=False).astype(np.int64) // 100
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "source": batch["source"],
            "size_bin": pa.array(sb, type=pa.int64()),
            "_bucket": pa.array(stable_bucket_multi([src, sb], w))})

    def _suppress(tbl: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "source": pa.array([], type=pa.string()),
                          "size_bin": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0 or "source" not in tbl.column_names:
            return empty
        src = np.asarray(tbl["source"].to_numpy(zero_copy_only=False),
                         dtype=object)
        sb = tbl["size_bin"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sb, src))
        s2, b2 = src[order], sb[order]
        new = np.ones(len(s2), dtype=bool)
        new[1:] = (s2[1:] != s2[:-1]) | (b2[1:] != b2[:-1])
        gid = np.cumsum(new) - 1
        size = np.bincount(gid)
        keep_sorted = size[gid] >= k_anon
        keep = np.zeros(len(s2), dtype=bool)
        keep[order] = keep_sorted
        out = tbl.filter(pa.array(keep))
        return out.select(["doc_id", "source", "size_bin"])

    return (ds.map_batches(_tag, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("_bucket")
            .map_groups(_suppress, batch_format="pyarrow"))


def q_late_event_rate(sf_dir: str):
    """Streaming watermark / allowed-lateness accounting: per
    event_type, how many events arrived (by event_id order) more than
    1 hour behind the maximum timestamp already seen.  Distributed
    two-phase prefix-max scan — per-partition exclusive running max,
    O(partitions) driver carries, map-only late test
    (stages/events.py:watermark_late_stats)."""
    from ..stages.events import watermark_late_stats

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "event_type"])
    return watermark_late_stats(ds, order_col="event_id", ts_col="ts",
                                group_col="event_type",
                                lateness_us=3_600_000_000,
                                num_partitions=_w(sf_dir, "events"))


def q_user_status_intervals(sf_dir: str):
    """SCD2-style validity intervals: consecutive runs of the same
    event_type per user collapse to (user_id, event_type,
    valid_from_us, valid_to_us, n_events) where valid_to is the NEXT
    run's start (NULL for the user's current run) — the
    slowly-changing-dimension snapshot a feature store materializes
    from an event stream.  One Arrow-bucket shuffle; runs and the
    exclusive upper bounds are pure run-length kernels."""
    from ..stages.events import transform_buckets

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])

    def _to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "event_type": batch["event_type"],
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64())})

    def _runs(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "valid_from_us": pa.array([], type=pa.int64()),
            "valid_to_us": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0 or "user_id" not in tbl.column_names:
            return empty
        u = tbl["user_id"].to_numpy(zero_copy_only=False)
        e = np.asarray(tbl["event_type"].to_numpy(zero_copy_only=False),
                       dtype=object)
        t = tbl["ts_us"].to_numpy(zero_copy_only=False)
        n = len(u)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (e[1:] != e[:-1])
        starts = np.flatnonzero(brk)
        counts = np.diff(np.concatenate([starts, [n]])).astype(np.int64)
        ru, re_, rt = u[starts], e[starts], t[starts]
        # valid_to = next run's start ts for the SAME user, else NULL
        nxt = np.concatenate([rt[1:], [0]])
        same_user = np.concatenate([ru[1:] == ru[:-1], [False]])
        valid_to = np.where(same_user, nxt, 0)
        return pa.table({
            "user_id": pa.array(ru, type=pa.int64()),
            "event_type": pa.array(re_.tolist(), type=pa.string()),
            "valid_from_us": pa.array(rt, type=pa.int64()),
            "valid_to_us": pa.array(
                np.ma.masked_array(valid_to, mask=~same_user),
                type=pa.int64()),
            "n_events": pa.array(counts)})

    return transform_buckets(
        ds.map_batches(_to_us, batch_format="pyarrow",
                       zero_copy_batch=True),
        "user_id", ["ts_us", "event_id"], _runs,
        num_buckets=_w(sf_dir, "events"), batch_format="pyarrow")


def q_event_expectations(sf_dir: str):
    """Data-quality expectations sweep (the Great-Expectations-style
    guardrail a production pipeline runs before training): per DAY,
    exact counts of rows violating each declared rule — value outlier
    (> 100), error-type events, and night-time events (hour < 6 UTC).
    Map-only rule evaluation (vectorized masks per batch), one
    O(days x rules) driver combine; no shuffle of event rows at all."""
    from ..stages.joins import partial_agg

    DAY_US = 86_400_000_000
    HOUR_US = 3_600_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def _rules(batch: pa.Table) -> pd.DataFrame:
        t = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch["value"].to_numpy(zero_copy_only=False)
        et = np.asarray(batch["event_type"].to_numpy(
            zero_copy_only=False), dtype=object)
        return pd.DataFrame({
            "day": t // DAY_US,
            "v_outlier": (v > 100.0).astype(np.int64),
            "v_error": (et == "error").astype(np.int64),
            "v_night": ((t % DAY_US) // HOUR_US < 6).astype(np.int64)})

    agg = partial_agg(
        ds.map_batches(_rules, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["day"], sums=["v_outlier", "v_error", "v_night"],
        combine="driver").to_pandas()
    return (pd.DataFrame({
        "day": agg["day"].astype(np.int64),
        "n_rows": agg["n"].astype(np.int64),
        "n_value_outlier": agg["sum_v_outlier"].astype(np.int64),
        "n_error_events": agg["sum_v_error"].astype(np.int64),
        "n_night_events": agg["sum_v_night"].astype(np.int64)})
        .sort_values("day", kind="mergesort").reset_index(drop=True))


def q_weighted_pagerank(sf_dir: str):
    """Edge-WEIGHTED PageRank over the synthetic citation graph (each
    doc's two out-links carry deterministic integer weights; rank
    splits proportionally to weight instead of uniformly).  Same fused
    two-shuffle iteration plan as link_pagerank; oracled exactly with
    the weighted unrolled-CTE SQL on the 1e-9 grid."""
    from ..stages.graph import pagerank

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()

    def _edges(batch: pa.Table) -> pa.Table:
        s = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([s, s])
        dst = np.concatenate([(s * 7 + 3) % n, (s * 3 + 1) % n])
        w = np.concatenate([s % 3 + 1, s % 5 + 1])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                         "w": pa.array(w)})

    edges = ds.map_batches(_edges, batch_format="pyarrow",
                           zero_copy_batch=True)
    ranks = pagerank(edges, iters=3, weight_col="w",
                     num_buckets=shuffle_width(2 * n * 24, floor=8,
                                               cluster_cap=8))

    def _scale(df: pd.DataFrame) -> pd.DataFrame:
        s = df["rank"].to_numpy(np.float64) * 1e9
        r = np.where(s >= 0, np.floor(s + 0.5), -np.floor(-s + 0.5))
        return pd.DataFrame({"node": df["node"].astype(np.int64),
                             "rank_e9": r.astype(np.int64)})

    return ranks.map_batches(_scale, batch_format="pandas")


def q_user_active_coverage(sf_dir: str):
    """Interval-union coverage: each event opens a fixed 5-minute
    activity window; per user, the total length of the UNION of those
    windows (overlaps merged), the number of disjoint activity islands
    and the event count — the activity-coverage statistic session
    replays and billing meters compute.  One Arrow-bucket shuffle;
    islands via the shared session-gap kernel (fixed window length
    makes running-max-end equal to prev-event + window)."""
    from ..stages.events import _session_id_array, transform_buckets

    WIN = 300_000_000  # 5 min in us

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])

    def _to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "ts_us": batch["ts"].cast(pa.int64()),
            "event_id": batch["event_id"].cast(pa.int64())})

    def _cov(tbl: pa.Table) -> pa.Table:
        empty = pa.table({
            "user_id": pa.array([], type=pa.int64()),
            "covered_us": pa.array([], type=pa.int64()),
            "n_islands": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64())})
        if tbl.num_rows == 0 or "user_id" not in tbl.column_names:
            return empty
        u = tbl["user_id"].to_numpy(zero_copy_only=False)
        t = tbl["ts_us"].to_numpy(zero_copy_only=False)
        sess = _session_id_array(u, t, float(WIN))
        n = len(u)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (sess[1:] != sess[:-1])
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [n]]) - 1
        cov = t[ends] - t[starts] + WIN
        iu = u[starts]
        # per-user reduce over contiguous island runs
        ustart = np.flatnonzero(np.concatenate(
            ([True], iu[1:] != iu[:-1])))
        uend = np.concatenate([ustart[1:], [len(iu)]])
        c_cum = np.concatenate(([0], np.cumsum(cov)))
        e_cum = np.concatenate(([0], np.cumsum(
            np.diff(np.concatenate([starts, [n]])))))
        return pa.table({
            "user_id": pa.array(iu[ustart], type=pa.int64()),
            "covered_us": pa.array(c_cum[uend] - c_cum[ustart],
                                   type=pa.int64()),
            "n_islands": pa.array(uend - ustart, type=pa.int64()),
            "n_events": pa.array(e_cum[uend] - e_cum[ustart],
                                 type=pa.int64())})

    return transform_buckets(
        ds.map_batches(_to_us, batch_format="pyarrow",
                       zero_copy_batch=True),
        "user_id", ["ts_us", "event_id"], _cov,
        num_buckets=_w(sf_dir, "events"), batch_format="pyarrow")


def q_weighted_median_price(sf_dir: str):
    """Per-supplier WEIGHTED median unit price (weight = quantity) —
    the weighted-percentile operator every mixture/budget pipeline
    needs (reference parity: the engine's exact quantiles are
    unweighted; this is the weighted companion).

    Distributed: one skinny (suppkey, cent-price, int-weight) hash
    shuffle; each bucket task computes all resident suppliers' medians
    in one vectorized lexsort + segmented-cumsum pass
    (``grouped_weighted_median``). No frequency table, no driver CDF
    walk — exact even when prices are near-unique."""
    from ..stages.joins import grouped_weighted_median

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_quantity"])

    def _scale(b: pa.Table) -> pa.Table:
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        qn = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "suppkey": b["l_suppkey"],
            "price_c": pa.array(np.round(p * 100.0).astype(np.int64)),
            "w": pa.array(qn.astype(np.int64))})

    out = grouped_weighted_median(
        ds.map_batches(_scale, batch_format="pyarrow"),
        "suppkey", "price_c", "w",
        num_buckets=_skinny_w(sf_dir, "lineitem", 24))

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "suppkey": df["suppkey"].astype(np.int64),
            "wmedian_price": df["wmedian"].astype(np.int64) / 100.0})

    return out.map_batches(_fin, batch_format="pandas")


def q_alloc_docs_budget(sf_dir: str):
    """Largest-remainder (Hamilton) apportionment of a fixed
    10,000-item sampling budget across sources, proportional to doc
    counts — the integer-exact companion to mixture/temperature
    sampling: per-source quotas that sum EXACTLY to the budget, floor
    shares first, then +1 to the largest remainders (ties broken by
    source ascending).

    Distributed: per-source counts via the bucketed partial-agg
    combine (the shuffle moves O(sources x blocks) skinny partial
    rows); the quota math runs on the O(sources) count table — the
    only thing the driver ever holds."""
    pdf = _source_counts(sf_dir)
    cnt = pdf["n_docs"].to_numpy().astype(np.int64)
    return pd.DataFrame({"source": pdf["source"], "n_docs": cnt,
                         "alloc": _hamilton(cnt, 10_000)})


def _source_counts(sf_dir: str) -> pd.DataFrame:
    """Per-source doc counts via the bucketed partial-agg combine —
    the only table the allocation/sampling drivers ever hold
    (O(sources) rows), source-sorted so row index is the tie-break."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source"])
    counts = partial_agg(ds, ["source"], sums=(), count_col="n_docs",
                         num_buckets=_w(sf_dir, "documents"))
    return (counts.to_pandas()
            .sort_values("source", kind="mergesort")
            .reset_index(drop=True))


def _hamilton(cnt: np.ndarray, budget: int) -> np.ndarray:
    """Largest-remainder quotas: floor shares, then +1 to the largest
    remainders (ties -> lower index, i.e. source ascending)."""
    tot = int(cnt.sum())
    fl = budget * cnt // tot
    rem = budget * cnt % tot
    k = budget - int(fl.sum())
    order = np.lexsort((np.arange(len(rem)), -rem))
    alloc = fl.copy()
    alloc[order[:k]] += 1
    return alloc


def q_proportional_sample(sf_dir: str):
    """Budget-EXACT proportional stratified sample: Hamilton quotas of
    a 200-doc budget across sources (so every source contributes its
    floor/ceil proportional share and the total is exactly 200),
    then the deterministic Knuth-hash per-source order the oracle
    replays picks each source's quota. ``budget <= total docs``
    guarantees every quota is fillable (``ceil(B*cnt/tot) <= cnt``).

    Distributed: the quota table is O(sources) (closure-captured into
    the trim, broadcast once per task by Ray); per-block trim keeps at
    most quota rows per source per block, so the driver combine sees
    O(quota x blocks) skinny rows — text never moves."""
    B = 200
    pdf = _source_counts(sf_dir)
    cnt = pdf["n_docs"].to_numpy().astype(np.int64)
    quota = dict(zip(pdf["source"], _hamilton(cnt, B).tolist()))

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])

    def _trim(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "source": df["source"],
            "doc_id": df["doc_id"].astype(np.int64)})
        ids = d["doc_id"].to_numpy(np.int64)
        assert ids.max(initial=0) < (1 << 31), "Knuth pack needs id < 2^31"
        d["sk"] = (ids * 2654435761) % 4294967296
        d = d.sort_values(["source", "sk", "doc_id"], kind="mergesort")
        rn = d.groupby("source", sort=False).cumcount()
        return d[rn < d["source"].map(quota).to_numpy(np.int64)]

    trimmed = ds.map_batches(_trim, batch_format="pandas").to_pandas()
    trimmed = trimmed.sort_values(["source", "sk", "doc_id"],
                                  kind="mergesort")
    rn = trimmed.groupby("source", sort=False).cumcount()
    out = trimmed[rn < trimmed["source"].map(quota).to_numpy(np.int64)]
    return (out[["source", "doc_id"]]
            .sort_values(["source", "doc_id"], kind="mergesort")
            .reset_index(drop=True))


def q_weighted_p90_price(sf_dir: str):
    """Per-supplier weighted 90th-percentile unit price (weight =
    quantity): the same one-shuffle segmented-cumweight pass as the
    weighted median, generalized to any percentile via a pure-int64
    ``100*cumw >= pct*totw`` crossing."""
    from ..stages.joins import grouped_weighted_median

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_quantity"])

    def _scale(b: pa.Table) -> pa.Table:
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        qn = b["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "suppkey": b["l_suppkey"],
            "price_c": pa.array(np.round(p * 100.0).astype(np.int64)),
            "w": pa.array(qn.astype(np.int64))})

    out = grouped_weighted_median(
        ds.map_batches(_scale, batch_format="pyarrow"),
        "suppkey", "price_c", "w", pct=90,
        num_buckets=_skinny_w(sf_dir, "lineitem", 24))

    def _fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "suppkey": df["suppkey"].astype(np.int64),
            "wp90_price": df["wmedian"].astype(np.int64) / 100.0})

    return out.map_batches(_fin, batch_format="pandas")


#: FK->PK relations of the star schema audited by :func:`q_fk_audit`
_FK_RELATIONS = [
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
]

#: NULL-FK sentinel — int64 min never occurs as a real key in the
#: star schema (all keys are small non-negative ints; asserted below)
_FK_NULL_SENTINEL = np.int64(np.iinfo(np.int64).min)


def q_fk_audit(sf_dir: str):
    """Referential-integrity audit: for every FK->PK relation of the
    star schema report child rows, NULL-FK rows, distinct FK values,
    orphan keys and orphan rows (child keys with no matching parent).
    Table-level counterpart of the reference's per-output sanity_check
    (models/_base/base_extractor.py:105-137) — constraints validated
    over data instead of one extraction's shapes.

    Scale plan, per relation: (1) ONE column-pruned scan of the child
    FK column; NULLs fold to an int64 sentinel so a single
    ``partial_agg`` yields the full (key, row-count) table — the only
    shuffle, O(distinct keys) skinny int64 pairs, never child bytes;
    (2) the key table (already ~1e3x smaller than the child) is
    materialized once and reused for the totals fold and the orphan
    anti hash-join against the column-pruned parent PK; (3) every fold
    is a per-batch partial reduce, so the driver holds O(blocks)
    partials and the result is O(relations) scalars."""
    from ..stages.joins import hash_join

    rows = []
    for name, child, fk, parent, pk in _FK_RELATIONS:
        w = _skinny_w(sf_dir, child, 16)

        def _fill(b: pa.Table, fk=fk) -> pa.Table:
            import pyarrow.compute as pc
            col = pc.cast(b[fk], pa.int64())
            v = col.to_numpy(zero_copy_only=False)
            assert not (v == _FK_NULL_SENTINEL).any(), \
                f"{fk}: int64 min is a live key; sentinel invalid"
            return pa.table({"k": pc.fill_null(col, _FK_NULL_SENTINEL)})

        keys = partial_agg(
            ray.data.read_parquet(f"{sf_dir}/{child}.parquet", columns=[fk])
            .map_batches(_fill, batch_format="pyarrow"),
            ["k"], count_col="n", num_buckets=w,
        ).materialize()  # O(distinct keys) << child; reused twice below

        def _totals(b: pa.Table) -> pa.Table:
            k = b["k"].to_numpy(zero_copy_only=False)
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            null_mask = k == _FK_NULL_SENTINEL
            return pa.table({
                "child_rows": pa.array([int(n.sum())], pa.int64()),
                "null_fk_rows": pa.array([int(n[null_mask].sum())],
                                         pa.int64()),
                "distinct_keys": pa.array([int((~null_mask).sum())],
                                          pa.int64())})

        tot = keys.map_batches(_totals, batch_format="pyarrow") \
                  .to_pandas().sum()

        parent_ds = ray.data.read_parquet(
            f"{sf_dir}/{parent}.parquet", columns=[pk],
        ).map_batches(
            lambda b, pk=pk: pa.table({"k": b[pk].cast(pa.int64())}),
            batch_format="pyarrow")

        def _drop_sentinel(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return b.filter(pc.not_equal(b["k"],
                                         pa.scalar(int(_FK_NULL_SENTINEL))))

        orphans = hash_join(
            keys.map_batches(_drop_sentinel, batch_format="pyarrow"),
            parent_ds, on="k", how="anti", num_buckets=w,
            schemas=(pa.schema([("k", pa.int64()), ("n", pa.int64())]),
                     pa.schema([("k", pa.int64())])),
        ).map_batches(
            lambda b: pa.table({
                "orphan_keys": pa.array([len(b)], pa.int64()),
                "orphan_rows": pa.array(
                    [int(b["n"].to_numpy(zero_copy_only=False).sum())]
                    if len(b) else [0], pa.int64())}),
            batch_format="pyarrow").to_pandas().sum()

        rows.append({
            "relation": name,
            "child_rows": np.int64(tot["child_rows"]),
            "null_fk_rows": np.int64(tot["null_fk_rows"]),
            "distinct_keys": np.int64(tot["distinct_keys"]),
            "orphan_keys": np.int64(orphans.get("orphan_keys", 0)),
            "orphan_rows": np.int64(orphans.get("orphan_rows", 0)),
        })
    out = pd.DataFrame(rows).sort_values("relation").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


def q_weekly_retention(sf_dir: str):
    """Classic cohort-retention matrix: users grouped by the calendar
    week of their FIRST event (epoch-anchored week index), one output
    cell per (cohort_week, week_offset) counting how many of the
    cohort's users were active that many weeks later.

    Scale plan: one column-pruned events scan folds to distinct
    (user, week) pairs via ``partial_agg`` (the only data-sized
    shuffle, skinny int64 pairs); the pair table is materialized once
    and reused for the per-user min-week fit and the activity join;
    cohort cells combine driver-side because the cell count is
    O(weeks^2), independent of users or events."""
    from ..stages.joins import hash_join, partial_agg

    w = _skinny_w(sf_dir, "events", 16)
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def _wk(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy(zero_copy_only=False)
        # truncate to whole seconds first: week boundaries are integer
        # seconds and timestamps are post-1970, so trunc == floor
        secs = t.astype("datetime64[s]").astype(np.int64)
        return pa.table({
            "user_id": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64)),
            "wk": pa.array(secs // 604800, pa.int64())})

    uw = partial_agg(
        ds.map_batches(_wk, batch_format="pyarrow"),
        ["user_id", "wk"], count_col="n", num_buckets=w,
    ).map_batches(lambda df: df[["user_id", "wk"]],
                  batch_format="pandas") \
     .materialize()  # O(users x active weeks) skinny; reused twice

    first = partial_agg(uw, ["user_id"], mins=["wk"], count_col="n",
                        num_buckets=w).map_batches(
        lambda df: df[["user_id", "min_wk"]]
        .rename(columns={"min_wk": "cohort_week"}),
        batch_format="pandas")

    joined = hash_join(
        uw, first, on="user_id", how="inner", num_buckets=w,
        schemas=(pa.schema([("user_id", pa.int64()), ("wk", pa.int64())]),
                 pa.schema([("user_id", pa.int64()),
                            ("cohort_week", pa.int64())])))

    cells = partial_agg(
        joined.map_batches(
            lambda df: pd.DataFrame({
                "cohort_week": df["cohort_week"].astype(np.int64),
                "week_offset": (df["wk"] - df["cohort_week"])
                .astype(np.int64)}),
            batch_format="pandas"),
        ["cohort_week", "week_offset"], count_col="n_users",
        combine="driver")

    out = cells.to_pandas()[["cohort_week", "week_offset", "n_users"]]
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["cohort_week", "week_offset"]) \
              .reset_index(drop=True)


def q_pair_lift(sf_dir: str):
    """Association-rule statistics for co-purchased part pairs: for
    every pair ordered together >= 3 times report the pair support
    ``n_ab``, the per-item supports ``n_a``/``n_b`` (distinct orders
    containing the part) and the lift
    ``n_ab * n_orders / (n_a * n_b)`` — the market-basket complement
    of ``q_copurchase_pairs``'s raw top-k counts.

    Scale plan: distinct (order, part) rows come from ONE
    ``partial_agg`` over the pruned lineitem scan and are materialized
    (reused three times); pairs form inside order-hash buckets (an
    order never splits, so per-bucket pair counts are exact partials);
    item supports and the order total are further skinny folds; the
    two lift joins run over the support-filtered pair table. Lift is
    ONE int64-product division on both sides, so float bits match the
    oracle exactly."""
    from ..stages.events import stable_bucket
    from ..stages.joins import hash_join, partial_agg

    nb = _w(sf_dir, "lineitem")
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    d = partial_agg(ds, ["l_orderkey", "l_partkey"], count_col="n",
                    num_buckets=nb).map_batches(
        lambda df: df[["l_orderkey", "l_partkey"]],
        batch_format="pandas").materialize()

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bucket"] = stable_bucket(
            df["l_orderkey"].to_numpy(np.int64), nb)
        return df

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        p = df.merge(df, on="l_orderkey", suffixes=("_a", "_b"))
        p = p[p["l_partkey_a"] < p["l_partkey_b"]]
        out = (p.groupby(["l_partkey_a", "l_partkey_b"], sort=False)
               .size().rename("cnt").reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        return out.rename(columns={"l_partkey_a": "part_a",
                                   "l_partkey_b": "part_b"})

    pair_counts = partial_agg(
        d.map_batches(_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(lambda g: _pairs(g[["l_orderkey", "l_partkey"]]),
                    batch_format="pandas"),
        ["part_a", "part_b"], sums=["cnt"], count_col="np_",
        num_buckets=nb,
    ).map_batches(
        lambda df: df.loc[df["sum_cnt"] >= 3,
                          ["part_a", "part_b", "sum_cnt"]]
        .rename(columns={"sum_cnt": "n_ab"}),
        batch_format="pandas")

    item_counts = partial_agg(d, ["l_partkey"], count_col="n_item",
                              num_buckets=nb)

    # scalar: distinct orders, via per-batch fold over distinct keys
    n_orders = int(sum(
        r["c"] for r in
        partial_agg(d, ["l_orderkey"], count_col="n", num_buckets=nb)
        .map_batches(lambda df: pd.DataFrame({"c": [len(df)]}),
                     batch_format="pandas").take_all()))

    ja = hash_join(
        pair_counts,
        item_counts.map_batches(
            lambda df: df.rename(columns={"l_partkey": "part_a",
                                          "n_item": "n_a"}),
            batch_format="pandas"),
        on="part_a", how="inner", num_buckets=nb,
        schemas=(pa.schema([("part_a", pa.int64()),
                            ("part_b", pa.int64()),
                            ("n_ab", pa.int64())]),
                 pa.schema([("part_a", pa.int64()),
                            ("n_a", pa.int64())])))
    jb = hash_join(
        ja,
        item_counts.map_batches(
            lambda df: df.rename(columns={"l_partkey": "part_b",
                                          "n_item": "n_b"}),
            batch_format="pandas"),
        on="part_b", how="inner", num_buckets=nb,
        schemas=(pa.schema([("part_a", pa.int64()),
                            ("part_b", pa.int64()),
                            ("n_ab", pa.int64()),
                            ("n_a", pa.int64())]),
                 pa.schema([("part_b", pa.int64()),
                            ("n_b", pa.int64())])))

    def _lift(df: pd.DataFrame) -> pd.DataFrame:
        # int64 products must not wrap (ADVICE r4: silent Knuth-hash
        # wrap); supports are bounded by n_orders, so guard on it
        if len(df):
            lim = np.iinfo(np.int64).max
            assert int(df["n_ab"].max()) <= lim // max(n_orders, 1), \
                "pair_lift: n_ab * n_orders would overflow int64"
            assert int(df["n_a"].max()) <= lim // max(
                int(df["n_b"].max()), 1), \
                "pair_lift: n_a * n_b would overflow int64"
        num = (df["n_ab"].astype(np.int64)
               * np.int64(n_orders)).astype(np.float64)
        den = (df["n_a"].astype(np.int64)
               * df["n_b"].astype(np.int64)).astype(np.float64)
        return pd.DataFrame({
            "part_a": df["part_a"].astype(np.int64),
            "part_b": df["part_b"].astype(np.int64),
            "n_ab": df["n_ab"].astype(np.int64),
            "n_a": df["n_a"].astype(np.int64),
            "n_b": df["n_b"].astype(np.int64),
            "lift": num / den})

    out = jb.map_batches(_lift, batch_format="pandas").to_pandas()
    return out.sort_values(["part_a", "part_b"]).reset_index(drop=True)


def q_bfs_hops(sf_dir: str):
    """Shortest hop distances (<= 3) from the smallest part id over
    the UNDIRECTED co-purchase graph — the frontier-expansion BFS in
    ``stages/graph.py:bfs_hops`` (semi-join frontier edges, anti-join
    visited), driven from the same supported-edge table as the
    triangle/k-core entries.  The DuckDB oracle enumerates paths with
    a bounded recursive CTE and takes MIN(depth)."""
    from ..stages.graph import bfs_hops

    w = _w(sf_dir, "lineitem")
    e0 = _copurchase_edges(sf_dir, w).materialize()
    edges = e0.union(
        e0.map_batches(
            lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
            batch_format="pyarrow")).materialize()
    nb = _edge_width(edges)
    root = int(edges.min("src"))  # smallest node id (symmetrized)
    sources = ray.data.from_arrow(
        pa.table({"node": pa.array([root], pa.int64())}))
    out = bfs_hops(edges, sources, max_depth=3, num_buckets=nb)
    df = out.to_pandas()
    df["node"] = df["node"].astype(np.int64)
    df["depth"] = df["depth"].astype(np.int64)
    return df.sort_values("node").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Model-evaluation family (round 5b): exact AUC, calibration bins,
# correlation matrix, Pareto frontier
# ---------------------------------------------------------------------------

def _score_label_events(sf_dir: str):
    """events → (sc = cent score, lab = purchase indicator) — the
    shared scored-corpus shape for the eval ops."""
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        lab = pc.cast(pc.equal(batch["event_type"], "purchase"),
                      pa.int64())
        return pa.table({"sc": pa.array(v), "lab": lab})

    return ds.map_batches(_prep, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_auc_purchase_value(sf_dir: str):
    """Exact tie-corrected ROC AUC of the value score against the
    purchase label (Mann-Whitney over the distinct-score CDF — rows
    never rank individually; `stages/mleval.py:auc_exact`)."""
    from ..stages.mleval import auc_exact

    return auc_exact(_score_label_events(sf_dir), "sc", "lab",
                     num_buckets=_skinny_w(sf_dir, "events", 24))


def q_calibration_value(sf_dir: str):
    """Reliability-diagram deciles of the value score vs the purchase
    label: exact quantile_disc bin bounds, per-bin n / mean score /
    positive rate / lift (`stages/mleval.py:calibration_bins`)."""
    from ..stages.mleval import calibration_bins

    return calibration_bins(_score_label_events(sf_dir), "sc", "lab",
                            n_bins=10,
                            num_buckets=_skinny_w(sf_dir, "events", 24))


def q_corr_matrix_lineitem(sf_dir: str):
    """All-pairs Pearson correlation matrix over lineitem's four
    numeric measures in ONE moment pass (`stages/joins.py:corr_matrix`
    — grouped_corr generalized to C(4,2) pairs; each cell bit-stable
    vs the SQL spelling of the same integer-sum formula)."""
    from ..stages.joins import corr_matrix

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"])

    def _prep(batch: pa.Table) -> pa.Table:
        def r(c, s):
            return pa.array(np.round(
                batch[c].to_numpy(zero_copy_only=False) * s
            ).astype(np.int64))
        # price floors to whole dollars: round() would hit .50 half
        # cases where numpy (half-even) and DuckDB (half-away) differ;
        # floor is identical on both sides and keeps the int64 moment
        # envelope (cent-scaled squares would overflow at sf>=0.1)
        price = np.floor(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"qty": r("l_quantity", 1.0),
                         "price": pa.array(price),
                         "disc": r("l_discount", 100.0),
                         "tax": r("l_tax", 100.0)})

    return corr_matrix(ds.map_batches(_prep, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["qty", "price", "disc", "tax"])


def q_pareto_parts(sf_dir: str):
    """Pareto frontier of the part catalog — minimize cent price,
    maximize size; no other part both cheaper-or-equal AND
    bigger-or-equal with one strict (`stages/skyline.py` — local
    frontiers then one merge; raw rows never shuffle)."""
    from ..stages.skyline import pareto_frontier

    ds = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_retailprice",
                                        "p_size"])

    def _prep(batch: pa.Table) -> pa.Table:
        pc_ = np.round(batch["p_retailprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "p_partkey": batch["p_partkey"].cast(pa.int64()),
            "pc": pa.array(pc_),
            "p_size": batch["p_size"].cast(pa.int64())})

    out = pareto_frontier(
        ds.map_batches(_prep, batch_format="pyarrow",
                       zero_copy_batch=True), "pc", "p_size")
    return (pd.DataFrame({
        "p_partkey": out["p_partkey"].astype(np.int64),
        "price": out["pc"].astype(np.int64) / 100.0,
        "p_size": out["p_size"].astype(np.int64)})
        .sort_values("p_partkey").reset_index(drop=True))


def q_clustering_coeff(sf_dir: str):
    """Per-node local clustering coefficient of the part co-purchase
    graph (`stages/graph.py:node_clustering` — the apex-carrying
    oriented wedge join; each closed wedge credits its three corners,
    degrees from one endpoint-count pass, LEFT join + closed form)."""
    from ..stages.graph import node_clustering

    w = _w(sf_dir, "lineitem")
    edges = _copurchase_edges(sf_dir, w).materialize()
    out = node_clustering(edges, num_buckets=_edge_width(edges))
    df = out.to_pandas()
    return df.sort_values("node").reset_index(drop=True)


def q_zorder_prune_2d(sf_dir: str):
    """Multi-dimensional data skipping end-to-end: write the event
    stream Z-ORDER-clustered on (day, user) — each file one quadtree
    cell, min/max of BOTH columns in the manifest — then answer a
    (3-day x 50-user) box question through the 2-D pruned read path
    (files missing the box on EITHER dimension are never opened —
    asserted) and aggregate per event type.  A single-column sort
    prunes one dimension only; the Z-curve gives both.  The oracle
    recomputes from the raw table, proving the round-trip byte-exact
    (`sources/zonemap.py:write_zordered/read_zordered`)."""
    import os

    from ..sources.zonemap import read_zordered, write_zordered

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "user_id",
                                        "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy()
               // DAY_US).astype(np.int64)
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 10000.0).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "day": pa.array(day),
                         "user_id": batch["user_id"].cast(pa.int64()),
                         "v_s": pa.array(v)})

    out_dir = os.path.join(
        "/tmp", "vfr_zorder_"
        + os.path.basename(os.path.normpath(sf_dir)))
    write_zordered(ds.map_batches(_prep, batch_format="pyarrow"),
                   out_dir, "day", "user_id", num_files_hint=64)

    pruned, files_read, files_total = read_zordered(
        out_dir, "day", "user_id", 19727, 19730, 0, 50)
    assert files_read < files_total, "z-order failed to skip files"

    agg = partial_agg(pruned.select_columns(["event_type", "v_s"]),
                      ["event_type"], sums=["v_s"],
                      combine="driver").to_pandas()
    agg = agg.sort_values("event_type").reset_index(drop=True)
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "total": agg["sum_v_s"].astype(np.int64) / 10000.0,
    })


def q_spend_concentration(sf_dir: str):
    """Spend concentration by global decile (the Lorenz-curve table
    behind `gini_user_spend`): NTILE(10) over per-user totals via the
    distributed counting-sort scan, then O(10) driver shares — spend
    sums stay int64 through the cumulative sum, so both divisions are
    single mirrored float ops."""
    from ..stages.rank import global_ntile

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 10000.0).astype(np.int64)
        return pa.table({"user_id": batch["user_id"], "v": pa.array(v)})

    totals = partial_agg(ds.map_batches(_prep, batch_format="pyarrow"),
                         ["user_id"], sums=["v"],
                         num_buckets=_w(sf_dir, "events"))
    skinny = totals.map_batches(
        lambda df: pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "total_s": df["sum_v"].astype(np.int64)}),
        batch_format="pandas")
    tiled = global_ntile(skinny, "total_s", "user_id", n=10,
                         num_buckets=shuffle_width())
    agg = partial_agg(tiled.select_columns(["tile", "total_s"]),
                      ["tile"], sums=["total_s"], count_col="n_users",
                      combine="driver").to_pandas()
    agg = agg.sort_values("tile").reset_index(drop=True)
    s = agg["sum_total_s"].astype(np.int64).to_numpy()
    cum = np.cumsum(s)
    tot = np.float64(np.int64(s.sum()))
    return pd.DataFrame({
        "decile": agg["tile"].astype(np.int64),
        "n_users": agg["n_users"].astype(np.int64),
        "spend": s / 10000.0,
        "share": s.astype(np.float64) / tot,
        "cum_share": cum.astype(np.float64) / tot})


def q_mi_lang_source(sf_dir: str):
    """Mutual-information cells for lang x source — the
    feature-selection metric beside the chi-square independence test
    (`lang_source_independence`), same one count pass and O(cells)
    driver math: contrib = p_ij·log2(p_ij/(p_i·p_j)) per OBSERVED
    cell, zero-observed cells emitted with 0.0 (their MI limit), each
    contribution rounded 12 dp on both sides (the PSI convention) so
    no order-dependent float sum exists."""
    from ..stages.joins import partial_agg

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "source"])
    c = partial_agg(ds, ["lang", "source"], count_col="n",
                    combine="driver").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    langs = sorted(c["lang"].unique())
    sources = sorted(c["source"].unique())
    full = pd.MultiIndex.from_product(
        [langs, sources], names=["lang", "source"]).to_frame(index=False)
    full = full.merge(c, on=["lang", "source"], how="left")
    full["n"] = full["n"].fillna(0).astype(np.int64)
    rn = full.groupby("lang")["n"].transform("sum").to_numpy(np.float64)
    sn = full.groupby("source")["n"].transform("sum").to_numpy(np.float64)
    tn = np.float64(np.int64(full["n"].sum()))
    n = full["n"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = (n / tn) * np.log2((n / tn) / ((rn / tn) * (sn / tn)))
    full["mi_contrib"] = np.round(np.where(n > 0, contrib, 0.0), 12)
    full["n"] = full["n"].astype(np.int64)
    return full[["lang", "source", "n", "mi_contrib"]]


def q_cms_type_counts(sf_dir: str):
    """Per-type frequency estimates from a distributed COUNT-MIN
    sketch (`functions/sketches.py:CountMinSketch` — 4x1024 int64
    counters, one 32 KB partial per batch, driver sum): the
    heavy-hitter counting sketch whose estimates never undercount.
    With 5 distinct keys in a 1024-wide row the probe is
    collision-free, so the driver-checked output EQUALS the exact
    GROUP BY oracle; collision behavior (overestimate-only, merge ==
    single-pass) is pinned in tests/test_cms.py with a deliberately
    tiny width."""
    from ..functions.sketches import cms_counts, cms_estimate
    from ..stages.joins import partial_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type"])
    cms = cms_counts(ds, "event_type", width=1024, depth=4)
    # distinct probe keys via an O(types) combine (the sketch answers
    # point queries; enumeration comes from the exact-distinct pass)
    types = sorted(partial_agg(ds, ["event_type"], count_col="_n",
                               combine="driver")
                   .to_pandas()["event_type"])
    est = cms_estimate(cms, types)
    return pd.DataFrame({"event_type": types,
                         "est_n": est.astype(np.int64)})


def q_readability_docs(sf_dir: str):
    """Per-doc readability / lexical-diversity features (Flesch-style
    score on the vowel-group syllable proxy + exact type-token ratio;
    `stages/text.py:readability_stats` — stateless Arrow map, exact
    dictionary-code distinct words, zero shuffle)."""
    from ..stages.text import readability_stats

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(readability_stats, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_mad_outliers_value(sf_dir: str):
    """Robust outlier flags — the MAD-rule row filter the curation
    pipeline runs before training-stat fits: keep events whose value
    sits more than 3 MADs from their type's median.  Both fits reuse
    the exact chained-quantile machinery of `mad_value_per_type`, and
    the comparison happens entirely on integer grids (d2 = |2v−med2|
    on the doubled cent grid, mad4 = round(2·quantile(d2)) on the
    quadrupled one; flag iff 2·d2 > 3·mad4), so no float threshold
    can disagree with the SQL."""
    import pyarrow.compute as pc

    from ..stages.joins import grouped_quantile_cont

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value": batch["value"],
                         "value_c": pa.array(
                             np.round(v * 100.0).astype(np.int64))})

    scaled = ds.map_batches(_scale, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    w = _w(sf_dir, "events")
    med = grouped_quantile_cont(scaled, "event_type", "value_c", 0.5,
                                num_buckets=w)
    qcol = [c for c in med.columns if c.startswith("q")][0]
    med2 = {t: np.int64(round(2.0 * m))
            for t, m in zip(med["event_type"], med[qcol])}
    types = sorted(med2)
    m2_arr = np.array([med2[t] for t in types], dtype=np.int64)

    def _dev(batch: pa.Table) -> pa.Table:
        codes = pc.index_in(batch["event_type"], pa.array(types)
                            ).to_numpy(zero_copy_only=False)
        v = batch["value_c"].to_numpy(zero_copy_only=False)
        d2 = np.abs(2 * v - m2_arr[codes.astype(np.int64)])
        return pa.table({"event_type": batch["event_type"],
                         "d2": pa.array(d2.astype(np.int64))})

    dev = scaled.map_batches(_dev, batch_format="pyarrow",
                             zero_copy_batch=True)
    mad = grouped_quantile_cont(dev, "event_type", "d2", 0.5,
                                num_buckets=w)
    qcol2 = [c for c in mad.columns if c.startswith("q")][0]
    mad4 = {t: np.int64(round(2.0 * m))
            for t, m in zip(mad["event_type"], mad[qcol2])}
    m4_arr = np.array([mad4[t] for t in types], dtype=np.int64)

    def _flag(batch: pa.Table) -> pa.Table:
        codes = pc.index_in(batch["event_type"], pa.array(types)
                            ).to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value_c"].to_numpy(zero_copy_only=False)
        d2 = np.abs(2 * v - m2_arr[codes])
        keep = 2 * d2 > 3 * m4_arr[codes]
        return pa.table({"event_id": batch["event_id"],
                         "event_type": batch["event_type"],
                         "value": batch["value"]}).filter(pa.array(keep))

    return scaled.map_batches(_flag, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_knn_label_accuracy(sf_dir: str):
    """Leave-one-out 1-NN label accuracy over the embeddings table —
    the embedding-quality eval (`stages/similarity.py:
    knn_label_accuracy`: block-packed corpus refs, actor-held matrix,
    one matmul per block; driver holds O(labels) rows)."""
    from ..stages.similarity import knn_label_accuracy

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding", "label"])
    return knn_label_accuracy(ds, dim=64)


def q_user_daily_grid(sf_dir: str):
    """Align each user's irregular event stream to a dense DAILY grid
    with forward-fill — the feature-store time-grid op (training rows
    need one value per (entity, period), not one per event): per-user
    span densification + last-known-value carry, ONE user-bucketed
    shuffle, fully vectorized across a bucket's users (segment-offset
    searchsorted, no per-user Python).  Day-internal ties resolve to
    the latest (ts, event_id) — mirrored by the oracle's ASOF join
    over per-day last values."""
    from ..stages.events import with_bucket

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy()
               // DAY_US).astype(np.int64)
        return pa.table({"user_id": batch["user_id"],
                         "day": pa.array(day),
                         "ts_us": batch["ts"].cast(pa.int64()),
                         "event_id": batch["event_id"],
                         "value": batch["value"]})

    tagged = with_bucket(ds.map_batches(_prep, batch_format="pyarrow",
                                        zero_copy_batch=True),
                         "user_id", _w(sf_dir, "events"))

    def _grid(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                              "day": pd.Series([], dtype=np.int64),
                              "value": pd.Series([], dtype=np.float64)})
        if df.empty or "user_id" not in df.columns:
            return empty
        # per (user, day) LAST value by (ts, event_id)
        df = df.sort_values(["user_id", "day", "ts_us", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        last = np.concatenate([(u[1:] != u[:-1]) | (d[1:] != d[:-1]),
                               [True]])
        lu, ld, lv = u[last], d[last], v[last]
        # per-user day span -> dense grid (vectorized across users)
        ustarts = np.flatnonzero(np.concatenate(([True],
                                                 lu[1:] != lu[:-1])))
        uends = np.concatenate([ustarts[1:], [len(lu)]])
        d0 = ld[ustarts]
        d1 = ld[uends - 1]
        span = d1 - d0 + 1
        grid_user = np.repeat(lu[ustarts], span)
        grid_rank = np.repeat(np.arange(len(ustarts)), span)
        grid_day = (np.arange(int(span.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(span) - span, span)
                    + np.repeat(d0, span))
        # ffill: searchsorted over (rank<<32 | day) keys on both sides
        BIG = np.int64(1) << np.int64(32)
        rank_of_row = np.repeat(np.arange(len(ustarts)), uends - ustarts)
        src_key = rank_of_row * BIG + ld
        grid_key = grid_rank * BIG + grid_day
        idx = np.searchsorted(src_key, grid_key, side="right") - 1
        return pd.DataFrame({"user_id": grid_user,
                             "day": grid_day,
                             "value": lv[idx]})

    out = tagged.groupby("_bucket").map_groups(_grid,
                                               batch_format="pandas")
    return out


def q_ks_value_drift(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    chronological halves of the event stream (PSI's sibling on the
    CENT-exact value CDF): D = max over distinct values of
    |F_a(v) - F_b(v)|.  The argmax runs entirely in integers —
    |c_a(v)·n_b - c_b(v)·n_a| with Python-int cumulatives so nothing
    wraps — and the single final division mirrors the SQL, so the
    float D is bit-stable.  One (half, value) count shuffle; the
    driver walks the O(distinct values) CDF."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        return pd.DataFrame({"one": np.ones(len(d), dtype=np.int64),
                             "day": d})

    days = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                       ["one"], mins=["day"], maxs=["day"],
                       combine="driver").to_pandas()
    split = (np.int64(days["min_day"].iloc[0])
             + np.int64(days["max_day"].iloc[0]) + 1) // 2

    def _vals(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pd.DataFrame({"half": (d >= split).astype(np.int64),
                             "vc": v})

    c = partial_agg(ds.map_batches(_vals, batch_format="pyarrow"),
                    ["half", "vc"],
                    num_buckets=_skinny_w(sf_dir, "events", 24),
                    combine="distributed").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    piv = (c.pivot_table(index="vc", columns="half", values="n",
                         aggfunc="sum", fill_value=0)
           .reindex(columns=[0, 1], fill_value=0).sort_index())
    ca = piv[0].to_numpy(np.int64).cumsum()
    cb = piv[1].to_numpy(np.int64).cumsum()
    na, nb = int(ca[-1]), int(cb[-1])
    # integer argmax of |ca*nb - cb*na| (Python ints via object walk
    # are unnecessary: ca<=n_rows, products bounded by n^2 — guard it)
    lim = np.iinfo(np.int64).max
    assert na == 0 or nb == 0 or (max(na, nb) <= lim // max(na, nb, 1)), \
        "ks_value_drift: count product would overflow int64"
    diff = np.abs(ca * np.int64(nb) - cb * np.int64(na))
    k = int(np.argmax(diff))  # first max = smallest value (tie rule)
    d_stat = (float(np.int64(diff[k]))
              / (float(np.int64(na)) * float(np.int64(nb))))
    return pd.DataFrame({
        "n_a": [np.int64(na)], "n_b": [np.int64(nb)],
        "at_value": [np.int64(piv.index.to_numpy(np.int64)[k]) / 100.0],
        "ks_stat": [np.float64(d_stat)]})


def q_cusum_daily_events(sf_dir: str):
    """Change-point detection on the daily event-count series — the
    pipeline-health monitor: the day where the cumulative deviation
    from a uniform rate peaks.  With D days and N total events, the
    statistic max_k |D·C_k - N·k| (C_k = events in the first k days,
    zero-count days included) is INTEGER-exact end-to-end — argmax
    ties resolve to the earliest day — and only the final
    normalisation |·|/(D·N) is a float, mirrored by the SQL.  One
    O(days) count combine; the driver walks the day spine."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        return pd.DataFrame({"day": d})

    c = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                    ["day"], combine="driver").to_pandas()
    c = c.sort_values("day").reset_index(drop=True)
    days = c["day"].to_numpy(np.int64)
    n = c["n"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    spine = np.arange(d0, d1 + 1, dtype=np.int64)
    dense = np.zeros(len(spine), np.int64)
    dense[days - d0] = n
    D = np.int64(len(spine))
    N = np.int64(dense.sum())
    ck = dense.cumsum()
    k = np.arange(1, len(spine) + 1, dtype=np.int64)
    stat = np.abs(D * ck - N * k)          # exact ints (D,N ~ 1e5 max)
    j = int(np.argmax(stat))               # first max = earliest day
    return pd.DataFrame({
        "n_days": [D], "total": [N],
        "at_day": [np.int64(spine[j])],
        "cusum": [np.float64(float(np.int64(stat[j]))
                             / (float(D) * float(N)))]})


def q_user_daily_interp(sf_dir: str):
    """`user_daily_grid`'s linear-interpolation sibling: missing days
    take the straight line between the surrounding observed days
    (time-series resampling for model features, vs the grid's
    last-known-value carry).  Same ONE user-bucketed shuffle and
    segment-offset searchsorted — the forward neighbor is a second
    side="left" probe of the same key array; the single float
    expression pv + (nv-pv)·((day-pd)/(nd-pd)) is mirrored by the
    oracle's backward+forward ASOF join pair."""
    from ..stages.events import with_bucket

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id",
                                        "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        day = (batch["ts"].cast(pa.int64()).to_numpy()
               // DAY_US).astype(np.int64)
        return pa.table({"user_id": batch["user_id"],
                         "day": pa.array(day),
                         "ts_us": batch["ts"].cast(pa.int64()),
                         "event_id": batch["event_id"],
                         "value": batch["value"]})

    tagged = with_bucket(ds.map_batches(_prep, batch_format="pyarrow",
                                        zero_copy_batch=True),
                         "user_id", _w(sf_dir, "events"))

    def _grid(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                              "day": pd.Series([], dtype=np.int64),
                              "value": pd.Series([], dtype=np.float64)})
        if df.empty or "user_id" not in df.columns:
            return empty
        df = df.sort_values(["user_id", "day", "ts_us", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        v = df["value"].to_numpy(np.float64)
        last = np.concatenate([(u[1:] != u[:-1]) | (d[1:] != d[:-1]),
                               [True]])
        lu, ld, lv = u[last], d[last], v[last]
        ustarts = np.flatnonzero(np.concatenate(([True],
                                                 lu[1:] != lu[:-1])))
        uends = np.concatenate([ustarts[1:], [len(lu)]])
        d0, d1 = ld[ustarts], ld[uends - 1]
        span = d1 - d0 + 1
        grid_user = np.repeat(lu[ustarts], span)
        grid_rank = np.repeat(np.arange(len(ustarts)), span)
        grid_day = (np.arange(int(span.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(span) - span, span)
                    + np.repeat(d0, span))
        BIG = np.int64(1) << np.int64(32)
        rank_of_row = np.repeat(np.arange(len(ustarts)), uends - ustarts)
        src_key = rank_of_row * BIG + ld
        grid_key = grid_rank * BIG + grid_day
        prev = np.searchsorted(src_key, grid_key, side="right") - 1
        nxt = np.searchsorted(src_key, grid_key, side="left")
        pd_, pv = ld[prev], lv[prev]
        nd_, nv = ld[nxt], lv[nxt]
        same = nd_ == pd_
        with np.errstate(divide="ignore", invalid="ignore"):
            interp = pv + (nv - pv) * ((grid_day - pd_).astype(np.float64)
                                       / (nd_ - pd_).astype(np.float64))
        return pd.DataFrame({"user_id": grid_user,
                             "day": grid_day,
                             "value": np.where(same, pv, interp)})

    return tagged.groupby("_bucket").map_groups(_grid,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# round-5c: rank statistics, seasonality, concentration, trend, sequence
# mining — drift/eval siblings of ks_value_drift / cusum_daily_events
# ---------------------------------------------------------------------------


def q_mannwhitney_value(sf_dir: str):
    """Mann-Whitney U (equivalently the two-sample AUC) between the
    chronological halves of the event value stream — the rank-based
    drift test beside KS and PSI: U_a counts (a, b) pairs with
    value_a < value_b, ties counting half.  Doubled average ranks keep
    every intermediate an integer — 2·R_a = Σ_v a(v)·(2·c_less(v) +
    t(v) + 1), combined with Python ints so nothing wraps — and the
    two final divisions (/2 for U, /(n_a·n_b) for the AUC) mirror the
    SQL bit-for-bit.  Same ONE (half, cent-value) count shuffle as
    ks_value_drift; the driver walks the O(distinct values) histogram.
    Reference anchor: the drift gate corresponds to the reference's
    `sanity_check`-style input validation (`utils/utils.py:178-192`),
    generalised to distribution shift."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        return pd.DataFrame({"one": np.ones(len(d), dtype=np.int64),
                             "day": d})

    days = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                       ["one"], mins=["day"], maxs=["day"],
                       combine="driver").to_pandas()
    split = (np.int64(days["min_day"].iloc[0])
             + np.int64(days["max_day"].iloc[0]) + 1) // 2

    def _vals(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pd.DataFrame({"half": (d >= split).astype(np.int64),
                             "vc": v})

    c = partial_agg(ds.map_batches(_vals, batch_format="pyarrow"),
                    ["half", "vc"],
                    num_buckets=_skinny_w(sf_dir, "events", 24),
                    combine="distributed").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    piv = (c.pivot_table(index="vc", columns="half", values="n",
                         aggfunc="sum", fill_value=0)
           .reindex(columns=[0, 1], fill_value=0).sort_index())
    av = piv[0].to_numpy(np.int64).astype(object)
    bv = piv[1].to_numpy(np.int64).astype(object)
    t = av + bv
    cless = np.concatenate(([0], np.cumsum(t)[:-1].astype(object)))
    r2a = int(np.sum(av * (2 * cless + t + 1)))   # 2·(rank sum of A)
    na, nb = int(np.sum(av)), int(np.sum(bv))
    u2 = r2a - na * (na + 1)                      # 2·U_a, exact int
    u_a = float(u2) / 2.0
    return pd.DataFrame({
        "n_a": [np.int64(na)], "n_b": [np.int64(nb)],
        "u_a": [np.float64(u_a)],
        "auc_a": [np.float64(u_a / (float(na) * float(nb)))]})


def q_spearman_qty_price(sf_dir: str):
    """Spearman rank correlation between l_quantity and
    l_extendedprice — the robust (monotone) sibling of the Pearson
    `corr_qty_price`.  Average ranks are doubled so every rank is an
    integer (2·r(v) = 2·c_less(v) + t(v) + 1); the per-value rank maps
    come from two count combines (quantity: 50 distinct, driver;
    price: cent-distinct, distributed — the broadcast rank map is
    O(distinct cent prices), bounded by the PRICE DOMAIN, not row
    count), then ONE moment pass over the fact table accumulates the
    five integer sums per batch and the driver folds them with Python
    ints.  The single float expression (n·Σxy − ΣxΣy) /
    √((n·Σxx − Σx²)(n·Σyy − Σy²)) mirrors the SQL's HUGEINT→DOUBLE
    casts exactly."""
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_quantity",
                                        "l_extendedprice"])

    def _cents(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "qc": np.round(batch["l_quantity"].to_numpy(
                zero_copy_only=False)).astype(np.int64),
            "pc": np.round(batch["l_extendedprice"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64)})

    cents = ds.map_batches(_cents, batch_format="pyarrow")

    def _rank_map(counts: pd.DataFrame, col: str):
        counts = counts.sort_values(col).reset_index(drop=True)
        vals = counts[col].to_numpy(np.int64)
        tt = counts["n"].to_numpy(np.int64)
        cless = np.concatenate(([0], np.cumsum(tt)[:-1]))
        return vals, (2 * cless + tt + 1).astype(np.int64)

    qcnt = partial_agg(cents, ["qc"], combine="driver").to_pandas()
    pcnt = partial_agg(cents, ["pc"],
                       num_buckets=_skinny_w(sf_dir, "lineitem", 16),
                       combine="distributed").to_pandas()
    qv, qr = _rank_map(qcnt, "qc")
    pv, pr = _rank_map(pcnt, "pc")
    maps_ref = ray.put((qv, qr, pv, pr))

    def _moments(batch: pa.Table) -> pd.DataFrame:
        qv_, qr_, pv_, pr_ = ray.get(maps_ref)
        q = np.round(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        p = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        x = qr_[np.searchsorted(qv_, q)]
        y = pr_[np.searchsorted(pv_, p)]
        return pd.DataFrame({
            "one": [np.int64(1)], "cnt": [np.int64(len(x))],
            "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
            "sxy": [(x * y).sum()]})

    m = partial_agg(ds.map_batches(_moments, batch_format="pyarrow"),
                    ["one"], sums=["cnt", "sx", "sy", "sxx", "syy",
                                   "sxy"],
                    combine="driver").to_pandas()
    n = int(m["sum_cnt"].iloc[0])
    sx, sy = int(m["sum_sx"].iloc[0]), int(m["sum_sy"].iloc[0])
    sxx, syy = int(m["sum_sxx"].iloc[0]), int(m["sum_syy"].iloc[0])
    sxy = int(m["sum_sxy"].iloc[0])
    num = n * sxy - sx * sy                      # exact Python ints
    d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
    rho = float(num) / math.sqrt(float(d1) * float(d2))
    return pd.DataFrame({"n_rows": [np.int64(n)],
                         "spearman": [np.float64(rho)]})


def q_dow_seasonality(sf_dir: str):
    """Day-of-week seasonality profile of the event stream — the
    weekly-periodicity feature the daily CUSUM/spine family feeds on:
    per epoch-anchored weekday index (epoch-day mod 7), the event
    count, its share of all events, and the mean value.  ONE O(7)
    driver combine (counts + cent-value sums); both divisions mirror
    the SQL."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def _dow(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        return pd.DataFrame({
            "dow": d % 7,
            "vc": np.round(batch["value"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64)})

    c = (partial_agg(ds.map_batches(_dow, batch_format="pyarrow"),
                     ["dow"], sums=["vc"], combine="driver")
         .to_pandas().sort_values("dow").reset_index(drop=True))
    n = c["n"].to_numpy(np.int64)
    sv = c["sum_vc"].to_numpy(np.int64)
    total = int(n.sum())
    return pd.DataFrame({
        "dow": c["dow"].astype(np.int64),
        "n_events": n,
        "share": n.astype(np.float64) / np.float64(total),
        "avg_value": (sv.astype(np.float64) / n.astype(np.float64))
        / 100.0})


def q_hhi_supplier_nation(sf_dir: str):
    """Herfindahl–Hirschman revenue-concentration index per supplier
    nation: Σ_s (rev_s / rev_nation)² over that nation's suppliers —
    the market-structure metric beside Gini/Lorenz.  Revenue stays the
    exact integer pc·(100−dc); the per-(nation, supplier) combine is
    the only shuffle (suppliers are a DIMENSION table, so the driver
    fold is O(suppliers)); squares are Python ints (rev² overflows
    int64 by design → object dtype), matching the SQL's HUGEINT
    arithmetic, with ONE mirrored float division."""
    sup = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_nationkey"]
                                ).to_pandas()
    nat = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                columns=["n_nationkey", "n_name"]
                                ).to_pandas()
    s2n = dict(zip(sup["s_suppkey"].astype(np.int64),
                   sup["s_nationkey"].astype(np.int64)))
    s2n_ref = ray.put(s2n)
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_suppkey", "l_extendedprice",
                                        "l_discount"])

    def _rev(batch: pa.Table) -> pd.DataFrame:
        lut = ray.get(s2n_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pc = np.round(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        dc = np.round(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100.0).astype(np.int64)
        nk = pd.Series(sk).map(lut).to_numpy(np.int64)
        return pd.DataFrame({"nation": nk, "supp": sk,
                             "rev": pc * (100 - dc)})

    per_supp = partial_agg(ds.map_batches(_rev, batch_format="pyarrow"),
                           ["nation", "supp"], sums=["rev"],
                           num_buckets=_skinny_w(sf_dir, "lineitem", 24),
                           combine="distributed").to_pandas()
    rows = []
    for nk, g in per_supp.groupby("nation"):
        revs = [int(r) for r in g["sum_rev"]]
        tot = sum(revs)
        sq = sum(r * r for r in revs)
        rows.append((int(nk), len(revs),
                     float(sq) / (float(tot) * float(tot))))
    out = pd.DataFrame(rows, columns=["nation", "n_suppliers", "hhi"])
    out = out.merge(nat.rename(columns={"n_nationkey": "nation"}),
                    on="nation")
    return (out[["n_name", "n_suppliers", "hhi"]]
            .astype({"n_suppliers": np.int64})
            .sort_values("n_name", kind="mergesort")
            .reset_index(drop=True))


def q_mann_kendall_daily(sf_dir: str):
    """Mann-Kendall monotone-trend test on the daily event-count
    series (zero-filled day spine, like `cusum_daily_events`):
    S = Σ_{i<j} sign(x_j − x_i), with the tie-corrected Kendall
    tau_b = S / √((n0 − n1)·n0), n0 = D(D−1)/2, n1 = Σ t(t−1)/2 over
    tied count groups.  The day spine is O(days) on the driver —
    bounded by the calendar, not row count — and S is integer-exact;
    the single √ expression mirrors the SQL."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        d = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // DAY_US
        return pd.DataFrame({"day": d})

    c = (partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                     ["day"], combine="driver").to_pandas()
         .sort_values("day").reset_index(drop=True))
    days = c["day"].to_numpy(np.int64)
    n = c["n"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    dense = np.zeros(d1 - d0 + 1, np.int64)
    dense[days - d0] = n
    diffs = np.sign(dense[None, :] - dense[:, None])
    s = int(np.triu(diffs, k=1).sum())
    d = len(dense)
    n0 = d * (d - 1) // 2
    _, tcnt = np.unique(dense, return_counts=True)
    n1 = int(sum(int(t) * (int(t) - 1) // 2 for t in tcnt))
    tau = float(s) / math.sqrt(float(n0 - n1) * float(n0))
    return pd.DataFrame({"n_days": [np.int64(d)],
                         "s_stat": [np.int64(s)],
                         "tau_b": [np.float64(tau)]})


def q_followed_within_1h(sf_dir: str):
    """Sequential-rule mining: for every ordered event-type pair
    (a → b), how often does a user's `a` get followed by a `b` within
    one hour (strictly later timestamp, NOT necessarily adjacent) —
    the temporal co-occurrence support behind "users who view then
    purchase".  One user-bucketed shuffle of skinny rows; inside a
    bucket the window [first key > k_i, last key ≤ k_i + 1h] comes
    from two searchsorted probes on a (user-rank · span + ts) packed
    key, and the pair expansion is the arange-minus-offsets trick —
    the expansion is bounded by events-per-user-per-hour (the skew
    knob a 100 TB run would cap per entity).  The driver folds O(49)
    pair partials."""
    from ..stages.events import with_bucket

    ds = _events_us(sf_dir, ["user_id", "ts", "event_type",
                             "event_id"])
    tagged = with_bucket(ds, "user_id", _w(sf_dir, "events"))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ta": pd.Series([], dtype=object),
                              "tb": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if df.empty or "user_id" not in df.columns:
            return empty
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        urank = np.cumsum(np.concatenate(([0], (u[1:] != u[:-1])
                                          .astype(np.int64))))
        t0 = int(ts.min())
        span = np.int64(int(ts.max()) - t0 + HOUR_US + 2)
        key = urank * span + (ts - t0)
        lo = np.searchsorted(key, key, side="right")
        hi = np.searchsorted(key, key + HOUR_US, side="right")
        cnt = hi - lo
        tot = int(cnt.sum())
        if tot == 0:
            return empty
        ia = np.repeat(np.arange(len(key)), cnt)
        ib = (np.arange(tot, dtype=np.int64)
              - np.repeat(np.cumsum(cnt) - cnt, cnt)
              + np.repeat(lo, cnt))
        out = (pd.DataFrame({"ta": et[ia], "tb": et[ib]})
               .groupby(["ta", "tb"], sort=False).size()
               .to_frame("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (tagged.groupby("_bucket")
             .map_groups(_pairs, batch_format="pandas").to_pandas())
    out = (parts.groupby(["ta", "tb"], sort=True)["n"].sum()
           .astype(np.int64).reset_index())
    return out.rename(columns={"ta": "type_a", "tb": "type_b"})


def q_containment_neardup(sf_dir: str):
    """Asymmetric n-gram CONTAINMENT near-dup pairs (inter / min(|A|,
    |B|) >= 0.5) — the doc-in-doc detector: a short document quoted
    verbatim inside a long one scores 1.0 here while its symmetric
    Jaccard stays below any dedup threshold (the boilerplate /
    quotation case).  Same inverted-index posting join and skinny
    shuffles as `ngram_jaccard`, one changed final expression."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, n=3, threshold=0.5,
                               num_buckets=_w(sf_dir, "documents"),
                               metric="containment")


def q_quantile_normalize_value(sf_dir: str):
    """Quantile normalization of event `value` ACROSS event types: each
    row maps to the smallest global value whose global CDF reaches the
    row's within-type average-rank quantile — the classic cross-batch
    distribution alignment (microarray-style), all-integer: the
    condition 2·n_type·cumglobal(g) >= N·r2_type(v) cross-multiplies
    the two CDFs so the probe is an exact-int ceiling-division
    searchsorted, and the ONLY float op is the final cents division.
    One (type, cent-value) count shuffle; the driver builds the
    O(types × distinct values) mapping and broadcasts it."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])

    def _cnt(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "vc": np.round(batch["value"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64)})

    c = partial_agg(ds.map_batches(_cnt, batch_format="pyarrow"),
                    ["et", "vc"],
                    num_buckets=_skinny_w(sf_dir, "events", 24),
                    combine="distributed").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    g = (c.groupby("vc")["n"].sum().sort_index())
    gv = g.index.to_numpy(np.int64)
    gcum = g.to_numpy(np.int64).cumsum()
    n_total = int(gcum[-1])
    c = c.sort_values(["et", "vc"], kind="mergesort")
    maps = {}
    for et, grp in c.groupby("et", sort=False):
        t = grp["n"].to_numpy(np.int64)
        cum = t.cumsum()
        r2 = 2 * cum - t + 1                      # doubled avg rank
        n_s = int(cum[-1])
        # smallest g with cumglobal(g) >= ceil(N·r2 / (2·n_s))
        k = (n_total * r2 + 2 * n_s - 1) // (2 * n_s)
        idx = np.searchsorted(gcum, k, side="left")
        maps[et] = (grp["vc"].to_numpy(np.int64), gv[idx])
    maps_ref = ray.put(maps)

    def _apply(batch: pa.Table) -> pd.DataFrame:
        lut = ray.get(maps_ref)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        out = np.empty(len(vc), np.int64)
        for e in pd.unique(et):
            m = et == e
            src, dst = lut[e]
            out[m] = dst[np.searchsorted(src, vc[m])]
        return pd.DataFrame({
            "event_id": batch["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "event_type": et,
            "value": batch["value"].to_numpy(zero_copy_only=False),
            "qn_value": out / 100.0})

    return ds.map_batches(_apply, batch_format="pyarrow")


def q_oof_target_encode(sf_dir: str):
    """K-fold OUT-OF-FOLD target encoding of event_type against the
    cent value (K = 5, fold = event_id mod 5): each row's encoding is
    the mean target of the OTHER folds — the standard leakage-free CV
    encoder beside the ordered (prefix) encoder `ordered_te_value`.
    ONE O(types × K) driver combine, broadcast back through a
    stateless map; the division is the single mirrored float op."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type",
                                        "value"])

    def _cnt(batch: pa.Table) -> pd.DataFrame:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "fold": eid % 5,
            "vc": np.round(batch["value"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64)})

    c = partial_agg(
        ds.map_batches(_cnt, batch_format="pyarrow"), ["et", "fold"],
        sums=["vc"], combine="driver").to_pandas()
    tot = c.groupby("et").agg(sv=("sum_vc", "sum"),
                              cnt=("n", "sum")).reset_index()
    c = c.merge(tot, on="et")
    lut = pd.DataFrame({
        "et": c["et"], "fold": c["fold"].astype(np.int64),
        "num": (c["sv"].astype(np.int64)
                - c["sum_vc"].astype(np.int64)),
        "den": c["cnt"].astype(np.int64) - c["n"].astype(np.int64)})
    lut_ref = ray.put(lut)

    def _apply(batch: pa.Table) -> pd.DataFrame:
        m = ray.get(lut_ref)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        df = pd.DataFrame({
            "event_id": eid,
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "fold": eid % 5})
        j = df.merge(m, on=["et", "fold"], how="left", sort=False)
        num = j["num"].to_numpy(np.int64)
        den = j["den"].to_numpy(np.int64)
        te = np.where(den > 0,
                      (num.astype(np.float64)
                       / np.where(den > 0, den, 1).astype(np.float64))
                      / 100.0, np.nan)
        return pd.DataFrame({"event_id": j["event_id"],
                             "event_type": j["et"], "oof_te": te})

    return ds.map_batches(_apply, batch_format="pyarrow")


def q_day_user_overlap(sf_dir: str):
    """Day-over-day active-user overlap: for every calendar day pair
    (d, d+1) both present in the stream, |active(d) ∩ active(d+1)|,
    the two day actives, and their Jaccard — the retention/churn
    signal at daily grain.  Plan: exact DISTINCT (day, user) partials,
    then a user-bucketed shuffle where each user's sorted day list
    emits its consecutive-day pairs locally (the intersection count is
    Σ over users, so per-user locality makes the join embarrassingly
    parallel); the driver folds O(days) rows and mirrors the one
    division."""
    from ..stages.dedup import distinct_values
    from ..stages.events import with_bucket

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def _du(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            "day": batch["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US})

    du = distinct_values(ds.map_batches(_du, batch_format="pyarrow"),
                         ["user_id", "day"],
                         num_buckets=_skinny_w(sf_dir, "events", 16))
    tagged = with_bucket(du, "user_id", _w(sf_dir, "events"))

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"day": pd.Series([], dtype=np.int64),
                              "n_day": pd.Series([], dtype=np.int64),
                              "inter": pd.Series([], dtype=np.int64)})
        if df.empty or "user_id" not in df.columns:
            return empty
        df = df.sort_values(["user_id", "day"], kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        d = df["day"].to_numpy(np.int64)
        nxt = (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)
        inter = (pd.Series(d[:-1][nxt]).value_counts().sort_index())
        nday = pd.Series(d).value_counts().sort_index()
        out = pd.DataFrame({"day": nday.index.to_numpy(np.int64),
                            "n_day": nday.to_numpy(np.int64)})
        out["inter"] = out["day"].map(inter).fillna(0).astype(np.int64)
        return out

    parts = (tagged.groupby("_bucket")
             .map_groups(_pairs, batch_format="pandas").to_pandas())
    agg = (parts.groupby("day").agg(n_day=("n_day", "sum"),
                                    inter=("inter", "sum"))
           .sort_index().reset_index())
    nd = agg.set_index("day")["n_day"]
    nxt = agg["day"].to_numpy(np.int64) + 1
    n_next = nd.reindex(nxt).to_numpy()
    has_next = ~np.isnan(n_next)
    out = agg[has_next].reset_index(drop=True)
    out["n_next"] = n_next[has_next].astype(np.int64)
    uni = out["n_day"] + out["n_next"] - out["inter"]
    out["jaccard"] = (out["inter"].to_numpy(np.float64)
                      / uni.to_numpy(np.float64))
    return out[["day", "n_day", "n_next", "inter", "jaccard"]].astype(
        {"day": np.int64, "n_day": np.int64, "n_next": np.int64,
         "inter": np.int64})


def q_fano_factor_daily(sf_dir: str):
    """Burstiness (Fano factor = variance / mean) of each event type's
    DAILY count series over the global zero-filled day spine — the
    dispersion diagnostic beside the CUSUM change point: Fano 1 ≈
    Poisson arrivals, >1 bursty.  Population variance over D spine
    days keeps it integer-exact — fano = (D·Σc² − N²) / (D·N) — with
    ONE mirrored division; one (type, day) count combine, driver holds
    O(types × days-present)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "day": batch["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US})

    c = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                    ["et", "day"], combine="driver").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    d_spine = int(c["day"].max()) - int(c["day"].min()) + 1
    rows = []
    for et, x in c.groupby("et", sort=True):
        cnts = [int(v) for v in x["n"]]           # Python ints: n² and
        nn = sum(cnts)                            # D·Σc² never wrap
        sq = sum(v * v for v in cnts)
        fano = float(d_spine * sq - nn * nn) / float(d_spine * nn)
        rows.append((et, d_spine, nn, fano))
    return pd.DataFrame(rows, columns=["event_type", "n_days",
                                       "n_events", "fano"]).astype(
        {"n_days": np.int64, "n_events": np.int64,
         "fano": np.float64})


def q_link_pred_jaccard(sf_dir: str):
    """Link prediction by neighborhood Jaccard over the synthetic
    citation graph (`link_pagerank`'s edge set, undirected): for every
    NON-adjacent pair sharing ≥1 neighbor, score = |Γa∩Γb| /
    |Γa∪Γb|, global top-50 (score desc, then ids).  Plan: distinct
    undirected edges → node-bucketed adjacency where each center emits
    its neighbor pairs locally (wedge join, the triangle-count
    pattern) → pair-bucketed combine that filters existing edges
    against a broadcast packed-key set and scores with broadcast
    degrees → per-bucket top-50 partials, driver merges O(50·buckets).
    The broadcasts are O(edges)/O(nodes) — fine for a dimension-sized
    graph; a 100 TB edge list swaps them for hash anti/equi joins.
    Jaccard is ONE mirrored division so the float order is exact."""
    from ..stages.dedup import distinct_values
    from ..stages.events import with_bucket

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    n = ds.count()
    nb = shuffle_width(2 * n * 16, floor=8, cluster_cap=8)

    def _und(batch: pa.Table) -> pd.DataFrame:
        s = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        src = np.concatenate([s, s])
        dst = np.concatenate([(s * 7 + 3) % n, (s * 3 + 1) % n])
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        keep = lo != hi
        return pd.DataFrame({"a": lo[keep], "b": hi[keep]})

    und = distinct_values(ds.map_batches(_und, batch_format="pyarrow"),
                          ["a", "b"], num_buckets=nb).materialize()
    und_pd = und.to_pandas()
    BIG = np.int64(1) << np.int64(32)
    assert int(und_pd[["a", "b"]].to_numpy().max()) < int(BIG), \
        "link_pred_jaccard: packed edge keys need ids < 2^32"
    edge_keys = np.sort(und_pd["a"].to_numpy(np.int64) * BIG
                        + und_pd["b"].to_numpy(np.int64))
    adj_pd = pd.concat([
        und_pd.rename(columns={"a": "c", "b": "x"}),
        und_pd.rename(columns={"b": "c", "a": "x"})[["c", "x"]]])
    deg = adj_pd.groupby("c").size()
    deg_nodes = deg.index.to_numpy(np.int64)
    deg_vals = deg.to_numpy(np.int64)
    bc = ray.put((edge_keys, deg_nodes, deg_vals))

    adj = ray.data.from_pandas(adj_pd).map_batches(
        lambda df: df.astype({"c": np.int64, "x": np.int64}),
        batch_format="pandas")
    tagged = with_bucket(adj, "c", nb)

    _empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                           "cn": pd.Series([], dtype=np.int64),
                           "_pb": pd.Series([], dtype=np.int32)})

    def _wedges(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "c" not in df.columns:
            return _empty
        df = df.sort_values(["c", "x"], kind="mergesort")
        c = df["c"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        first = np.empty(len(c), bool)
        first[0] = True
        first[1:] = c[1:] != c[:-1]
        loc = np.arange(len(c)) - np.maximum.accumulate(
            np.where(first, np.arange(len(c)), 0))
        total = int(loc.sum())
        if total == 0:
            return _empty
        bi = np.repeat(np.arange(len(c)), loc)
        off = np.concatenate(([0], np.cumsum(loc)))
        ai = bi - loc[bi] + (np.arange(total) - np.repeat(off[:-1], loc))
        k = x[ai] * BIG + x[bi]          # sorted neighbors → a < b
        out = (pd.DataFrame({"k": k}).groupby("k", sort=False).size()
               .rename("cn").reset_index())
        out["cn"] = out["cn"].astype(np.int64)
        out["_pb"] = (out["k"].to_numpy(np.uint64)
                      % np.uint64(nb)).astype(np.int32)
        return out

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "node_a": pd.Series([], dtype=np.int64),
            "node_b": pd.Series([], dtype=np.int64),
            "cn": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64)})
        if df.empty or "k" not in df.columns:
            return empty
        g = df.groupby("k", sort=False)["cn"].sum().reset_index()
        keys = g["k"].to_numpy(np.int64)
        ek, dn, dv = ray.get(bc)
        pos = np.searchsorted(ek, keys)
        pos = np.minimum(pos, len(ek) - 1)
        is_edge = ek[pos] == keys
        g = g[~is_edge]
        if g.empty:
            return empty
        a = (g["k"].to_numpy(np.int64) // BIG).astype(np.int64)
        b = (g["k"].to_numpy(np.int64) % BIG).astype(np.int64)
        cn = g["cn"].to_numpy(np.int64)
        da = dv[np.searchsorted(dn, a)]
        db = dv[np.searchsorted(dn, b)]
        j = cn.astype(np.float64) / (da + db - cn).astype(np.float64)
        out = pd.DataFrame({"node_a": a, "node_b": b, "cn": cn,
                            "jaccard": j})
        return (out.sort_values(["jaccard", "node_a", "node_b"],
                                ascending=[False, True, True],
                                kind="mergesort").head(50))

    parts = (tagged.groupby("_bucket")
             .map_groups(_wedges, batch_format="pandas")
             .groupby("_pb").map_groups(_score, batch_format="pandas")
             .to_pandas())
    return (parts.sort_values(["jaccard", "node_a", "node_b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(50)
            .reset_index(drop=True))


def q_anova_value_by_type(sf_dir: str):
    """One-way ANOVA F statistic of event `value` across event types —
    the k-group generalization of `ab_test_value`'s Welch t.  One pass
    of exact int64 cent-moment partials (n, Σv, Σv²) per type; the
    driver evaluates the per-type terms with the SAME cast-then-divide
    expression tree as the SQL and emits F on the 1e-6 grid
    (half-away-from-zero) — the k-term float sum's order difference is
    ~5 decimal orders under the grid, the `link_pagerank` convention."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.round(batch["value"].to_numpy(zero_copy_only=False)
                     * 100.0).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "v": pa.array(v), "vv": pa.array(v * v)})

    m = partial_agg(ds.map_batches(_prep, batch_format="pyarrow",
                                   zero_copy_batch=True),
                    ["event_type"], sums=["v", "vv"],
                    combine="driver").to_pandas()
    m = m.sort_values("event_type", kind="mergesort")
    k = len(m)
    nn = int(m["n"].sum())
    s_tot = float(int(m["sum_v"].sum()))
    q_tot = float(int(m["sum_vv"].sum()))
    term = 0.0
    for r in m.itertuples():              # Σ_j S_j²/n_j, sorted order
        term += float(int(r.sum_v)) * float(int(r.sum_v)) / float(r.n)
    ssb = term - s_tot * s_tot / float(nn)
    ssw = q_tot - term
    f = (ssb / float(k - 1)) / (ssw / float(nn - k))
    sx = f * 1e6
    f_e6 = int(np.floor(sx + 0.5) if sx >= 0 else -np.floor(-sx + 0.5))
    return pd.DataFrame({"n_rows": [np.int64(nn)],
                         "n_groups": [np.int64(k)],
                         "f_e6": [np.int64(f_e6)]})


def q_kruskal_value_by_type(sf_dir: str):
    """Kruskal-Wallis H (tie-corrected) of event `value` across event
    types — the rank-based (nonparametric) sibling of the ANOVA F,
    sharing `mannwhitney_value`'s doubled-average-rank machinery so
    every rank sum R2_j = Σ 2·avgrank stays integer: one (type,
    cent-value) count shuffle, the driver walks the O(distinct values
    × types) histogram and emits H on the 1e-6 grid."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _cnt(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "vc": np.round(batch["value"].to_numpy(zero_copy_only=False)
                           * 100.0).astype(np.int64)})

    c = partial_agg(ds.map_batches(_cnt, batch_format="pyarrow"),
                    ["et", "vc"],
                    num_buckets=_skinny_w(sf_dir, "events", 24),
                    combine="distributed").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    g = c.groupby("vc")["n"].sum().sort_index()
    gv = g.index.to_numpy(np.int64)
    t = g.to_numpy(np.int64)
    cless = np.concatenate(([0], np.cumsum(t)[:-1]))
    r2_of = dict(zip(gv.tolist(),
                     (2 * cless + t + 1).tolist()))  # doubled avg rank
    nn = int(t.sum())
    ties = sum(int(x) ** 3 - int(x) for x in t)       # Σ t³−t, exact
    num = 0.0
    for et, grp in sorted(c.groupby("et"), key=lambda kv: kv[0]):
        r2j = sum(int(x) * r2_of[int(v)]
                  for v, x in zip(grp["vc"], grp["n"]))  # exact int
        num += (float(r2j) * float(r2j)) / (4.0 * float(int(
            grp["n"].sum())))
    h = (12.0 / (float(nn) * float(nn + 1))) * num - 3.0 * float(
        nn + 1)
    h = h / (1.0 - float(ties) / float(nn ** 3 - nn))
    sx = h * 1e6
    h_e6 = int(np.floor(sx + 0.5) if sx >= 0 else -np.floor(-sx + 0.5))
    return pd.DataFrame({"n_rows": [np.int64(nn)],
                         "n_groups": [np.int64(c["et"].nunique())],
                         "h_e6": [np.int64(h_e6)]})


def q_isotonic_calibration(sf_dir: str):
    """Isotonic (PAV) calibration of P(purchase | value) — the exact
    monotone calibration curve beside the binned `calibration_value`:
    the same (score, label) stream, fitted to the least-squares
    nondecreasing step function.  One (cent-score, label) count
    shuffle; the driver's PAV walks the O(distinct cents) histogram
    with cross-multiplied integer pool comparisons (see
    `stages/isotonic.py`).  No SQL equivalent (the pooling is
    iterative) — rows-only driver check; `tests/test_isotonic.py`
    pins monotonicity, mass preservation, the max-min closed form and
    brute-force parity."""
    from ..stages.isotonic import isotonic_calibration

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _prep(batch: pa.Table) -> pd.DataFrame:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "score": np.round(batch["value"].to_numpy(
                zero_copy_only=False) * 100.0).astype(np.int64),
            "label": (et == "purchase").astype(np.int64)})

    return isotonic_calibration(
        ds.map_batches(_prep, batch_format="pyarrow"),
        "score", "label",
        num_buckets=_skinny_w(sf_dir, "events", 24))


def _source_nchars_cdf(sf_dir: str):
    """Shared front end for the corpus drift matrix ops: per-source
    CDF of the document-length (n_chars) distribution on the UNION
    value grid.  One (source, n_chars) count shuffle; returns
    (sources, n per source, sorted values, cum counts [S×V]) — driver
    memory O(sources × distinct lengths), bounded by the length
    DOMAIN, not row count."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"])
    c = partial_agg(ds, ["source", "n_chars"],
                    num_buckets=_skinny_w(sf_dir, "documents", 24),
                    combine="distributed").to_pandas()
    c["n"] = c["n"].astype(np.int64)
    piv = (c.pivot_table(index="n_chars", columns="source", values="n",
                         aggfunc="sum", fill_value=0).sort_index())
    sources = sorted(piv.columns)
    piv = piv[sources]
    vals = piv.index.to_numpy(np.int64)
    cum = piv.to_numpy(np.int64).cumsum(axis=0)     # V × S
    n_of = {s: int(cum[-1, j]) for j, s in enumerate(sources)}
    return sources, n_of, vals, cum


def q_ks_source_matrix(sf_dir: str):
    """Pairwise two-sample KS drift matrix between every pair of
    document sources on the doc-length distribution — the corpus-
    monitoring generalization of `ks_value_drift`: per (source_a,
    source_b), the integer argmax of |ca·nb − cb·na| over the union
    CDF grid (ties to the smallest length) and ONE mirrored division.
    Driver walks O(pairs × distinct lengths)."""
    sources, n_of, vals, cum = _source_nchars_cdf(sf_dir)
    rows = []
    for i, sa in enumerate(sources):
        for j in range(i + 1, len(sources)):
            sb = sources[j]
            na, nb = n_of[sa], n_of[sb]
            diff = np.abs(cum[:, i] * np.int64(nb)
                          - cum[:, j] * np.int64(na))
            k = int(np.argmax(diff))       # first max = smallest v
            rows.append((sa, sb, na, nb, int(vals[k]),
                         float(np.int64(diff[k]))
                         / (float(na) * float(nb))))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_a",
                                       "n_b", "at_value", "ks"]).astype(
        {"n_a": np.int64, "n_b": np.int64, "at_value": np.int64})


def q_wasserstein_source_pairs(sf_dir: str):
    """Pairwise 1-Wasserstein (earth mover) distance between source
    doc-length distributions — the drift metric that, unlike KS, sees
    HOW FAR mass moved: W1 = ∫|F_a − F_b|.  INTEGER-exact end-to-end:
    W1·na·nb = Σ_i |ca_i·nb − cb_i·na|·(v_{i+1} − v_i) over the union
    grid, folded with Python ints (the HUGEINT sum in SQL), then ONE
    mirrored division.  Same single count shuffle as the KS matrix."""
    sources, n_of, vals, cum = _source_nchars_cdf(sf_dir)
    gaps = (vals[1:] - vals[:-1]).astype(object)
    rows = []
    for i, sa in enumerate(sources):
        for j in range(i + 1, len(sources)):
            sb = sources[j]
            na, nb = n_of[sa], n_of[sb]
            diff = np.abs(cum[:-1, i].astype(object) * nb
                          - cum[:-1, j].astype(object) * na)
            tv = int(np.sum(diff * gaps))
            rows.append((sa, sb, na, nb,
                         float(tv) / (float(na) * float(nb))))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_a",
                                       "n_b", "w1"]).astype(
        {"n_a": np.int64, "n_b": np.int64})


def q_tv_source_pairs(sf_dir: str):
    """Pairwise TOTAL-VARIATION distance between source doc-length
    distributions — the pointwise-pmf member of the drift family
    (KS = sup of the CDF gap, W1 = its integral, TV = half the L1 pmf
    gap): TV·2·na·nb = Σ_v |fa_v·nb − fb_v·na| stays integer on the
    union value grid; ONE mirrored division.  Shares the single
    (source, n_chars) count shuffle with the KS/W1 matrix."""
    sources, n_of, vals, cum = _source_nchars_cdf(sf_dir)
    # pmf back from the cumulative: f_0 = cum_0, f_i = cum_i - cum_{i-1}
    pmf = np.vstack([cum[:1], np.diff(cum, axis=0)]).astype(object)
    rows = []
    for i, sa in enumerate(sources):
        for j in range(i + 1, len(sources)):
            sb = sources[j]
            na, nb = n_of[sa], n_of[sb]
            tv2 = int(np.sum(np.abs(pmf[:, i] * nb - pmf[:, j] * na)))
            rows.append((sa, sb, na, nb,
                         float(tv2) / (2.0 * float(na) * float(nb))))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_a",
                                       "n_b", "tv"]).astype(
        {"n_a": np.int64, "n_b": np.int64})


def q_unigram_cosine_sources(sf_dir: str):
    """Pairwise cosine similarity between source UNIGRAM count
    vectors — term-level corpus similarity (which sources share a
    vocabulary distribution), the drift family's content-aware member.
    EXACT: dot products and squared norms are integer sums — one
    (source, term) count shuffle, then each term-hash bucket pivots
    its slice to a dense S×T block and matmuls S×S partial dots
    (int64) — the driver folds O(buckets · S²) partials with Python
    ints and evaluates dot/√(‖a‖²·‖b‖²) as the single mirrored float
    expression.  Tokenization is text.split(' ') == DuckDB
    string_split, empties kept."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    nb = _w(sf_dir, "documents")

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.DataFrame({"source": df["source"],
                          "term": df["text"].fillna("").str.split(" ")})
        e = s.explode("term", ignore_index=True)
        out = (e.groupby(["source", "term"], sort=False).size()
               .rename("n").reset_index())
        h = pd.util.hash_pandas_object(out["term"],
                                       index=False).to_numpy()
        out["_bucket"] = (h % np.uint64(nb)).astype(np.int32)
        out["n"] = out["n"].astype(np.int64)
        return out

    _empty = pd.DataFrame({"sa": pd.Series([], dtype=object),
                           "sb": pd.Series([], dtype=object),
                           "dot": pd.Series([], dtype=np.int64)})

    def _dots(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "source" not in df.columns:
            return _empty
        g = (df.groupby(["source", "term"], sort=False)["n"].sum()
             .reset_index())
        piv = g.pivot_table(index="term", columns="source", values="n",
                            aggfunc="sum", fill_value=0)
        srcs = sorted(piv.columns)
        m = piv[srcs].to_numpy(np.int64)
        dots = m.T @ m                       # S×S int64 partial
        ii, jj = np.triu_indices(len(srcs))  # includes diag = norms²
        return pd.DataFrame({
            "sa": np.array(srcs, dtype=object)[ii],
            "sb": np.array(srcs, dtype=object)[jj],
            "dot": dots[ii, jj].astype(np.int64)})

    parts = (ds.map_batches(_counts, batch_format="pandas")
             .groupby("_bucket").map_groups(_dots,
                                            batch_format="pandas")
             .to_pandas())
    agg = {}
    for r in parts.itertuples():             # Python ints: Σ over
        k = (r.sa, r.sb)                     # buckets never wraps
        agg[k] = agg.get(k, 0) + int(r.dot)
    norms = {a: v for (a, b), v in agg.items() if a == b}
    rows = []
    for (a, b), dot in sorted(agg.items()):
        if a == b or dot == 0:   # SQL's inner term join omits
            continue             # disjoint-vocabulary pairs
        rows.append((a, b, float(dot)
                     / math.sqrt(float(norms[a]) * float(norms[b]))))
    return pd.DataFrame(rows, columns=["source_a", "source_b",
                                       "cosine"])


def q_textrank_keywords(sf_dir: str):
    """TextRank keyword extraction — PageRank over the corpus's
    directed word-adjacency graph (distinct `w_i → w_{i+1}` pairs,
    Mihalcea & Tarau '04), global top-20 words.  Pure composition of
    existing machinery: the bigram shift-concat front end feeds
    `distinct_values`, the edge table (bounded by VOCAB², not corpus
    size) gets dense int ids from the sorted endpoint vocabulary, and
    `stages/graph.pagerank` runs unchanged; ranks land on the 1e-9
    half-away grid like `link_pagerank` and map back to words on the
    driver (O(vocab))."""
    from ..stages.dedup import distinct_values
    from ..stages.graph import pagerank

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"sw": pd.Series([], dtype=object),
                              "dw": pd.Series([], dtype=object)})
        if df.empty:
            return empty
        s = pd.DataFrame({
            "doc": df["doc_id"].astype(np.int64),
            "term": df["text"].fillna("").str.split(" ")})
        e = s.explode("term", ignore_index=True)
        doc = e["doc"].to_numpy()
        term = e["term"].astype(str)
        m = len(term) - 1
        if m <= 0:
            return empty
        valid = doc[:m] == doc[1:]
        out = pd.DataFrame({
            "sw": term.iloc[:m].reset_index(drop=True)[valid],
            "dw": term.iloc[1:].reset_index(drop=True)[valid]})
        return out.drop_duplicates()

    pairs = distinct_values(ds.map_batches(_pairs,
                                           batch_format="pandas"),
                            ["sw", "dw"],
                            num_buckets=_w(sf_dir, "documents")
                            ).to_pandas()
    vocab = np.array(sorted(set(pairs["sw"]) | set(pairs["dw"])),
                     dtype=object)
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": np.searchsorted(vocab, pairs["sw"].to_numpy()),
        "dst": np.searchsorted(vocab, pairs["dw"].to_numpy())}))
    edges = edges.map_batches(
        lambda df: df.astype({"src": np.int64, "dst": np.int64}),
        batch_format="pandas")
    ranks = pagerank(edges, iters=3, num_buckets=8).to_pandas()
    s = ranks["rank"].to_numpy(np.float64) * 1e9
    r9 = np.where(s >= 0, np.floor(s + 0.5),
                  -np.floor(-s + 0.5)).astype(np.int64)
    out = pd.DataFrame({"word": vocab[ranks["node"].to_numpy(np.int64)],
                        "rank_e9": r9})
    return (out.sort_values(["rank_e9", "word"],
                            ascending=[False, True], kind="mergesort")
            .head(20).reset_index(drop=True))


def q_stl_daily_decomp(sf_dir: str):
    """Additive seasonal-trend decomposition (STL-lite, period 7) of
    the daily event-count series: trend = centered 7-day moving sum
    (full windows only, kept ×7 so it stays integer), seasonal = mean
    detrended value per weekday, residual = detrended − seasonal.
    Everything after the ONE daily count combine is an O(days) driver
    walk on the zero-filled spine (the CUSUM/Mann-Kendall pattern);
    the only floats are the two mirrored divisions by 7 and the
    seasonal mean."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].cast(pa.int64())
                             .to_numpy(zero_copy_only=False) // DAY_US})

    c = (partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                     ["day"], combine="driver").to_pandas()
         .sort_values("day").reset_index(drop=True))
    days = c["day"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    spine = np.arange(d0, d1 + 1, dtype=np.int64)
    dense = np.zeros(len(spine), np.int64)
    dense[days - d0] = c["n"].to_numpy(np.int64)
    D = len(spine)
    t7 = np.full(D, np.iinfo(np.int64).min, np.int64)
    valid = np.zeros(D, bool)
    if D >= 7:
        csum = np.concatenate(([0], np.cumsum(dense)))
        t7[3:D - 3] = csum[7:] - csum[:-7]
        valid[3:D - 3] = True
    detr = 7 * dense - t7                      # int, only where valid
    dow = spine % 7
    seasonal_of = {}
    for w in range(7):
        m = valid & (dow == w)
        if m.any():
            seasonal_of[w] = (float(int(detr[m].sum()))
                              / float(int(m.sum()))) / 7.0
    seas = np.array([seasonal_of.get(int(w), np.nan) for w in dow])
    resid = np.where(valid & ~np.isnan(seas),
                     detr.astype(np.float64) / 7.0 - seas, np.nan)
    return pd.DataFrame({
        "day": spine, "dow": dow.astype(np.int64),
        "n_events": dense,
        # float64 with NaN at the 3-day edges (small ints — exact in
        # double; keeps both sides' schema trivially identical)
        "trend7_sum": np.where(valid, t7.astype(np.float64), np.nan),
        "seasonal": seas,
        "residual": resid})


def q_theilsen_daily_slope(sf_dir: str):
    """Theil-Sen robust trend of the daily event-count series: the
    median over all C(D,2) pairwise slopes (c_j − c_i)/(day_j − day_i)
    on the zero-filled spine — the outlier-resistant sibling of the
    Mann-Kendall S (which only signs these pairs).  Day counts come
    from the ONE O(days) combine; slopes are each a single mirrored
    division (bit-identical both sides) so the discrete median —
    DuckDB's quantile_disc convention, element ceil(n·q)−1 of the
    sorted list — picks the same element."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].cast(pa.int64())
                             .to_numpy(zero_copy_only=False) // DAY_US})

    c = (partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                     ["day"], combine="driver").to_pandas()
         .sort_values("day").reset_index(drop=True))
    days = c["day"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    spine = np.arange(d0, d1 + 1, dtype=np.int64)
    dense = np.zeros(len(spine), np.int64)
    dense[days - d0] = c["n"].to_numpy(np.int64)
    i, j = np.triu_indices(len(spine), k=1)
    slopes = ((dense[j] - dense[i]).astype(np.float64)
              / (spine[j] - spine[i]).astype(np.float64))
    slopes = np.sort(slopes)
    n = len(slopes)
    med = slopes[int(np.ceil(n * 0.5)) - 1]
    return pd.DataFrame({"n_days": [np.int64(len(spine))],
                         "n_pairs": [np.int64(n)],
                         "slope": [np.float64(med)]})


def q_linear_attribution(sf_dir: str):
    """Linear (equal-credit) marketing attribution: every purchase
    splits its value equally across the user's click events in the
    preceding hour — per-purchase rows (purchase id, day, clicks
    credited, credit each) so each row is ONE mirrored division and
    no float accumulates across rows.  Same user-bucketed packed-key
    searchsorted window as `followed_within_1h`, pointed backward;
    purchases with no preceding click drop (inner semantics)."""
    from ..stages.events import with_bucket

    ds = _events_us(sf_dir, ["user_id", "ts", "event_type",
                             "event_id", "value"])
    tagged = with_bucket(ds, "user_id", _w(sf_dir, "events"))

    def _credit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "day": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64),
            "n_clicks": pd.Series([], dtype=np.int64),
            "credit_each": pd.Series([], dtype=np.float64)})
        if df.empty or "user_id" not in df.columns:
            return empty
        df = df.sort_values(["user_id", "ts_us", "event_id"],
                            kind="mergesort")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_us"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        urank = np.cumsum(np.concatenate(([0], (u[1:] != u[:-1])
                                          .astype(np.int64))))
        t0 = int(ts.min())
        span = np.int64(int(ts.max()) - t0 + HOUR_US + 2)
        key = urank * span + (ts - t0)
        is_click = et == "click"
        ckey = key[is_click]               # sorted subsequence
        lo = np.searchsorted(ckey, key - HOUR_US, side="left")
        hi = np.searchsorted(ckey, key, side="left")  # strictly before
        n_clicks = (hi - lo).astype(np.int64)
        is_p = (et == "purchase") & (n_clicks > 0)
        vc = np.round(df["value"].to_numpy(np.float64)[is_p]
                      * 100.0).astype(np.int64)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[is_p],
            "day": (ts[is_p] // DAY_US).astype(np.int64),
            "value": vc / 100.0,
            "n_clicks": n_clicks[is_p],
            "credit_each": (vc / 100.0)
            / n_clicks[is_p].astype(np.float64)})

    return (tagged.groupby("_bucket")
            .map_groups(_credit, batch_format="pandas"))


def q_span_corruption(sf_dir: str):
    """T5-style span-corruption examples over the tokenized corpus —
    the denoising-objective data transform: deterministic
    Knuth-hashed span masks, one sentinel per span in the encoder
    input, (sentinel, span) pairs in the decoder target.  Stateless
    vectorized map over the Arrow list column (one flat int32 buffer
    per batch, zero shuffle); the per-row LOSSLESS-reconstruction
    invariant is pinned in `tests/test_corruption.py` (no SQL — array
    splicing; rows-only driver check).  Returns per-doc stats + both
    token streams."""
    from ..stages.corruption import corrupt_spans

    seqs = sequences_from_documents(sf_dir)
    return seqs.map_batches(corrupt_spans, batch_format="pyarrow")


def q_pad_waste_by_bucket(sf_dir: str):
    """Sequence-length power-of-two bucketing for batch padding — the
    batching-efficiency planner: docs land in the smallest 2^e ≥
    n_chars bucket; per bucket, the doc count, real tokens, padded
    slots (bucket · docs) and the mirrored waste ratio.  One O(41)
    driver combine (bucket exponents are bounded by the length
    domain); the SQL pins the same exact bucket via a forward ASOF
    against a generated powers table — no float log2 edge cases on
    exact powers."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["n_chars"])

    def _bucket(batch: pa.Table) -> pd.DataFrame:
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        n = np.maximum(n, 1)
        e = np.zeros(len(n), np.int64)
        m = n - 1
        while (m > 0).any():                   # integer bit-length:
            e += (m > 0).astype(np.int64)      # e = ceil(log2(n)),
            m >>= 1                            # exact on powers
        return pd.DataFrame({"bucket": (np.int64(1) << e),
                             "nc": batch["n_chars"].to_numpy(
                                 zero_copy_only=False).astype(np.int64)})

    c = partial_agg(ds.map_batches(_bucket, batch_format="pyarrow"),
                    ["bucket"], sums=["nc"],
                    combine="driver").to_pandas()
    c = c.sort_values("bucket").reset_index(drop=True)
    docs = c["n"].to_numpy(np.int64)
    real = c["sum_nc"].to_numpy(np.int64)
    padded = c["bucket"].to_numpy(np.int64) * docs
    return pd.DataFrame({
        "bucket": c["bucket"].astype(np.int64),
        "n_docs": docs,
        "real_tokens": real,
        "padded_tokens": padded,
        "waste_ratio": (padded - real).astype(np.float64)
        / padded.astype(np.float64)})


def q_ppjoin_neardup(sf_dir: str):
    """Prefix-filtered (PPJoin-style) exact word-3-gram Jaccard join
    at τ=0.5 — the SUBQUADRATIC exact path beside `ngram_jaccard`'s
    full posting join and MinHash-LSH's approximate one: candidates
    come only from each doc's rarest-gram PREFIX (|d| − ⌈τ|d|⌉ + 1
    grams in (df, hash) order), then a fully-distributed text join
    re-verifies exactly.  The oracle is the SAME quadratic SQL as
    `ngram_jaccard` at 0.5 — equality proves the prefix pruning
    lossless on the data (the FastSS edit-1 entry's pattern)."""
    from ..stages.dedup import ppjoin_gram_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ppjoin_gram_pairs(ds, n=3, threshold=0.5,
                             num_buckets=_w(sf_dir, "documents"))


def q_breakpoint_daily_trend(sf_dir: str):
    """Structural-change detection by segmented regression: the split
    day k (first segment = days ≤ k) minimizing the total SSE of two
    independent OLS fits on the zero-filled daily count series — the
    regression sibling of the CUSUM change point.  Day counts come
    from the ONE O(days) combine; every candidate's SSE evaluates the
    same exact-integer-moment expression tree on both sides (x
    centered to day−d0 so moments stay small), so the float SSEs are
    bit-identical and the argmin (ties → earliest day) agrees.
    Segments need ≥2 days each."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].cast(pa.int64())
                             .to_numpy(zero_copy_only=False) // DAY_US})

    c = (partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                     ["day"], combine="driver").to_pandas()
         .sort_values("day").reset_index(drop=True))
    days = c["day"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    spine = np.arange(d0, d1 + 1, dtype=np.int64)
    y = np.zeros(len(spine), np.int64)
    y[days - d0] = c["n"].to_numpy(np.int64)
    x = spine - d0
    D = len(spine)

    def _sse(n, sx, sy, sxx, sxy, syy):
        nf = float(n)
        vx = float(sxx) - float(sx) * float(sx) / nf
        cxy = float(sxy) - float(sx) * float(sy) / nf
        vy = float(syy) - float(sy) * float(sy) / nf
        return vy - (cxy * cxy) / vx

    px = np.cumsum(x)
    py = np.cumsum(y)
    pxx = np.cumsum(x * x)
    pxy = np.cumsum(x * y)
    pyy = np.cumsum(y * y)
    best = None
    for i in range(1, D - 2):            # split AFTER index i (>=2/2)
        nl = i + 1
        nr = D - nl
        sse = (_sse(nl, int(px[i]), int(py[i]), int(pxx[i]),
                    int(pxy[i]), int(pyy[i]))
               + _sse(nr, int(px[-1] - px[i]), int(py[-1] - py[i]),
                      int(pxx[-1] - pxx[i]), int(pxy[-1] - pxy[i]),
                      int(pyy[-1] - pyy[i])))
        if best is None or sse < best[1]:
            best = (int(spine[i]), sse, nl, nr)
    return pd.DataFrame({"split_day": [np.int64(best[0])],
                         "n_left": [np.int64(best[2])],
                         "n_right": [np.int64(best[3])],
                         "sse": [np.float64(best[1])]})


def q_ccf_daily_lags(sf_dir: str):
    """Lead-lag analysis: Pearson cross-correlation between the daily
    'click' and 'purchase' count series at lags 0..7 (corr of clicks_t
    with purchases_{t+l} over the overlapping zero-filled spine) —
    does click volume LEAD purchase volume?  One (type, day) combine;
    each lag's correlation evaluates the exact-integer-moment tree
    (the `ab_test_value` convention) with one mirrored sqrt."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "et": batch["event_type"].to_numpy(zero_copy_only=False),
            "day": batch["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False) // DAY_US})

    c = partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                    ["et", "day"], combine="driver").to_pandas()
    d0 = int(c["day"].min())
    d1 = int(c["day"].max())
    D = d1 - d0 + 1

    def series(et):
        g = c[c["et"] == et]
        v = np.zeros(D, np.int64)
        v[g["day"].to_numpy(np.int64) - d0] = g["n"].to_numpy(np.int64)
        return v

    a, b = series("click"), series("purchase")
    rows = []
    for lag in range(8):
        aa = a[:D - lag]
        bb = b[lag:]
        n = len(aa)
        sa, sb = int(aa.sum()), int(bb.sum())
        saa = int((aa * aa).sum())
        sbb = int((bb * bb).sum())
        sab = int((aa * bb).sum())
        num = float(n * sab - sa * sb)
        den = math.sqrt(float(n * saa - sa * sa)
                        * float(n * sbb - sb * sb))
        rows.append((lag, n, num / den))
    return pd.DataFrame(rows, columns=["lag", "n_days", "ccf"]).astype(
        {"lag": np.int64, "n_days": np.int64})


def q_runs_test_daily(sf_dir: str):
    """Wald-Wolfowitz runs test on the daily event-count series: are
    up-days and down-days randomly interleaved?  Signs come from
    day-over-day diffs on the zero-filled spine (zero diffs dropped,
    the standard treatment); the run count R, n_up and n_down are
    integers, and the z-score evaluates ONE mirrored expression tree
    (E[R] = 1 + 2ab/(a+b), Var = 2ab(2ab−a−b)/((a+b)²(a+b−1)))."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].cast(pa.int64())
                             .to_numpy(zero_copy_only=False) // DAY_US})

    c = (partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                     ["day"], combine="driver").to_pandas()
         .sort_values("day").reset_index(drop=True))
    days = c["day"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    dense = np.zeros(d1 - d0 + 1, np.int64)
    dense[days - d0] = c["n"].to_numpy(np.int64)
    s = np.sign(np.diff(dense))
    s = s[s != 0]
    a = int((s > 0).sum())
    b = int((s < 0).sum())
    runs = int(1 + (s[1:] != s[:-1]).sum()) if len(s) else 0
    af, bf = float(a), float(b)
    er = 1.0 + 2.0 * af * bf / (af + bf)
    var = (2.0 * af * bf * (2.0 * af * bf - af - bf)
           / ((af + bf) * (af + bf) * (af + bf - 1.0)))
    z = (float(runs) - er) / math.sqrt(var)
    return pd.DataFrame({"n_up": [np.int64(a)], "n_down": [np.int64(b)],
                         "n_runs": [np.int64(runs)],
                         "z": [np.float64(z)]})


def q_durbin_watson_daily(sf_dir: str):
    """Durbin-Watson autocorrelation statistic of the OLS residuals of
    the daily count series — INTEGER-exact end-to-end: the residual
    e_t = y_t − a − b·x_t has denominator n·(n·Sxx − Sx²), which
    CANCELS in DW = Σ(Δe)²/Σe², so the scaled residuals
    E_t = n·b_den·y_t − (Sy·b_den − b_num·Sx) − n·b_num·x_t are plain
    (big) integers — Python ints here, HUGEINT in the SQL — and the
    statistic is ONE mirrored division.  O(days) driver walk after
    the one count combine."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def _day(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({"day": batch["ts"].cast(pa.int64())
                             .to_numpy(zero_copy_only=False) // DAY_US})

    c = (partial_agg(ds.map_batches(_day, batch_format="pyarrow"),
                     ["day"], combine="driver").to_pandas()
         .sort_values("day").reset_index(drop=True))
    days = c["day"].to_numpy(np.int64)
    d0, d1 = int(days[0]), int(days[-1])
    y = np.zeros(d1 - d0 + 1, np.int64)
    y[days - d0] = c["n"].to_numpy(np.int64)
    n = len(y)
    x = np.arange(n, dtype=object)
    yo = y.astype(object)
    sx, sy = int(np.sum(x)), int(np.sum(yo))
    sxx, sxy = int(np.sum(x * x)), int(np.sum(x * yo))
    b_num = n * sxy - sx * sy
    b_den = n * sxx - sx * sx
    const = sy * b_den - b_num * sx
    e = n * b_den * yo - const - n * b_num * x     # exact big ints
    de = e[1:] - e[:-1]
    dw = float(int(np.sum(de * de))) / float(int(np.sum(e * e)))
    return pd.DataFrame({"n_days": [np.int64(n)],
                         "dw": [np.float64(dw)]})


def q_levene_value_by_type(sf_dir: str):
    """Brown-Forsythe (median-centered Levene) test for equal
    variances of `value` across event types — the robust
    heteroscedasticity gate that composes two existing exact pieces:
    the grouped interpolated median on the DOUBLED cent grid (2·med
    is always integral, the `mad_value_per_type` trick) and the
    one-way ANOVA F tree over the integer deviations |2·v − 2·med|,
    emitted on the 1e-6 grid.  Two passes: one grouped-median
    quantile fit, one integer moment combine."""
    from ..stages.joins import grouped_quantile_cont

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _scale(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch["event_type"],
                         "value_c": pa.array(
                             np.round(v * 100.0).astype(np.int64))})

    scaled = ds.map_batches(_scale, batch_format="pyarrow",
                            zero_copy_batch=True)
    med = grouped_quantile_cont(scaled, "event_type", "value_c", 0.5,
                                num_buckets=_w(sf_dir, "events"))
    qcol = [c for c in med.columns if c.startswith("q")][0]
    m2 = {r["event_type"]: int(round(2.0 * r[qcol]))
          for _, r in med.iterrows()}
    m2_ref = ray.put(m2)

    def _dev(batch: pa.Table) -> pd.DataFrame:
        lut = ray.get(m2_ref)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        vc = np.round(batch["value"].to_numpy(zero_copy_only=False)
                      * 100.0).astype(np.int64)
        m2v = pd.Series(et).map(lut).to_numpy(np.int64)
        dv = np.abs(2 * vc - m2v)
        return pd.DataFrame({"event_type": et, "dv": dv,
                             "dvv": dv * dv})

    m = partial_agg(ds.map_batches(_dev, batch_format="pyarrow"),
                    ["event_type"], sums=["dv", "dvv"],
                    combine="driver").to_pandas()
    m = m.sort_values("event_type", kind="mergesort")
    k = len(m)
    nn = int(m["n"].sum())
    s_tot = float(int(m["sum_dv"].sum()))
    q_tot = float(int(m["sum_dvv"].sum()))
    term = 0.0
    for r in m.itertuples():
        term += float(int(r.sum_dv)) * float(int(r.sum_dv)) / float(r.n)
    ssb = term - s_tot * s_tot / float(nn)
    ssw = q_tot - term
    f = (ssb / float(k - 1)) / (ssw / float(nn - k))
    sx = f * 1e6
    f_e6 = int(np.floor(sx + 0.5) if sx >= 0 else -np.floor(-sx + 0.5))
    return pd.DataFrame({"n_rows": [np.int64(nn)],
                         "n_groups": [np.int64(k)],
                         "f_e6": [np.int64(f_e6)]})
