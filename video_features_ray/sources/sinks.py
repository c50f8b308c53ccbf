"""Compatibility sinks mirroring the reference's per-entity file outputs.

The reference writes one ``{stem}_{key}.npy`` / ``.pkl`` per
entity×feature-key (``base_extractor.py:84-91``, ``make_path``
``utils/utils.py:56-60``); output dirs are namespaced
``output/{feature_type}/{model_name}`` (``utils/utils.py:119-132``,
'/'→'_'). The engine's primary sink is partitioned parquet
(resumable, columnar); these helpers exist so reference users can keep
their downstream .npy/.pkl loaders — each Ray task writes the files for
its own blocks (distributed, no driver materialization).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def namespaced_dir(root: str, feature_type: str, model_name: str | None = None) -> str:
    parts = [root, feature_type.replace("/", "_")]
    if model_name:
        parts.append(model_name.replace("/", "_"))
    return os.path.join(*parts)


def _safe_stem(doc_id: str) -> str:
    """Collision-free filename stem: escape '%' then path separators —
    a doc_id like 'web/2024/doc1' must neither create subdirs nor
    collide with a literal 'web_2024_doc1'."""
    return doc_id.replace("%", "%25").replace("/", "%2F").replace("\\", "%5C")


def write_entity_files(
    ds: "ray.data.Dataset",
    out_dir: str,
    fmt: str = "npy",
    key_col: str = "doc_id",
    feature_col: str = "feature",
    ts_col: str = "ts_ms",
) -> int:
    """Group window rows per entity and write ``{doc}_{key}.npy|.pkl``
    files (feature matrix + timestamps_ms + fps — the reference's output
    dict keys, ``base_framewise_extractor.py:75-79``). Returns #entities.

    Writes happen inside the groupby tasks; only counts reach the driver.
    """
    assert fmt in ("npy", "pickle")
    os.makedirs(out_dir, exist_ok=True)

    def _write_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("window_id", kind="mergesort")
        doc = _safe_stem(str(g[key_col].iloc[0]))
        feats = np.stack([np.asarray(v, dtype=np.float32) for v in g[feature_col]])
        ts = g[ts_col].to_numpy(dtype=np.float64)
        fps = float(g["fps"].iloc[0]) if "fps" in g.columns else 0.0
        if fmt == "npy":
            np.save(os.path.join(out_dir, f"{doc}_{feature_col}.npy"), feats)
            np.save(os.path.join(out_dir, f"{doc}_timestamps_ms.npy"), ts)
            np.save(os.path.join(out_dir, f"{doc}_fps.npy"), np.array(fps))
        else:
            with open(os.path.join(out_dir, f"{doc}_{feature_col}.pkl"), "wb") as fh:
                pickle.dump({feature_col: feats, "timestamps_ms": ts, "fps": np.array(fps)}, fh)
        return pd.DataFrame({key_col: [doc]})

    written = ds.groupby(key_col).map_groups(_write_group, batch_format="pandas")
    return written.count()


def skip_existing(
    ds: "ray.data.Dataset",
    out_dir: str,
    fmt: str = "npy",
    key_col: str = "doc_id",
    feature_col: str = "feature",
) -> "ray.data.Dataset":
    """M21/J4 anti-join: drop entities whose output files already exist
    (reference ``base_extractor.py:95-127``) — here as a broadcast of the
    existing-stem set instead of per-entity stat calls."""
    import ray

    ext = ".npy" if fmt == "npy" else ".pkl"
    suffix = f"_{feature_col}{ext}"
    if os.path.isdir(out_dir):
        files = set(os.listdir(out_dir))
        # an entity is DONE only when every file of its npy triple
        # exists — a crash between the three np.save calls must not
        # skip the entity forever with half its outputs missing
        def _complete(stem: str) -> bool:
            if fmt != "npy":
                return True  # pickle writes one file
            return (f"{stem}_timestamps_ms.npy" in files
                    and f"{stem}_fps.npy" in files)

        existing = frozenset(
            f[: -len(suffix)] for f in files
            if f.endswith(suffix) and _complete(f[: -len(suffix)]))
    else:
        existing = frozenset()
    ref = ray.put(existing)

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        done = ray.get(ref)
        stems = batch[key_col].astype(str).map(_safe_stem)
        return batch[~stems.isin(done)]

    return ds.map_batches(_filter, batch_format="pandas")


def plan_compaction(in_dir: str, target_bytes: int) -> list[list[str]]:
    """Deterministic compaction plan from file SIZES only (no data or
    footer reads on the driver): files sorted by name, greedily packed
    into groups of ~``target_bytes``. Every file lands in exactly one
    group; a group holds at least one file even when a single file
    exceeds the target."""
    files = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(os.path.join(in_dir, f))
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(os.path.join(in_dir, f))
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def compact_parquet(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    row_group_size: int = 65536,
) -> int:
    """Small-file compaction — the maintenance op every incremental
    parquet sink eventually needs (thousands of per-partition commit
    files → read-efficient ~``target_bytes`` files).

    Scale shape: the driver plans groups from file sizes alone; one
    raw Ray task per group streams its input shards row-group-by-
    row-group into ONE output file (bounded memory — never the whole
    group at once; this is the legitimate drop-to-raw-tasks case: the
    Dataset writer controls neither file count nor file boundaries).
    Output is atomic (tmp + rename) and resumable: finished groups
    (deterministic names) are skipped on re-run. Returns the number of
    groups written or found complete.
    """
    import ray

    groups = plan_compaction(in_dir, target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _compact_one(paths: list[str], out_path: str) -> int:
        import pyarrow.parquet as pq

        if os.path.exists(out_path):  # resume: group already committed
            return 0
        tmp = f"{out_path}.tmp-{os.getpid()}"
        writer = None
        try:
            for p in paths:
                pf = pq.ParquetFile(p)
                for rg in range(pf.metadata.num_row_groups):
                    t = pf.read_row_group(rg)
                    if writer is None:
                        writer = pq.ParquetWriter(tmp, t.schema)
                    writer.write_table(t, row_group_size=row_group_size)
            if writer is not None:
                writer.close()
                writer = None
                os.replace(tmp, out_path)
        finally:
            if writer is not None:
                writer.close()
            if os.path.exists(tmp):
                os.remove(tmp)
        return 1

    futs = [_compact_one.remote(g, os.path.join(out_dir,
                                                f"compact-{i:05d}.parquet"))
            for i, g in enumerate(groups)]
    ray.get(futs)
    return len(groups)


def write_shuffled_shards(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_shards: int = 16,
    key_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Deterministic global pseudo-shuffle into ``n_shards`` parquet
    shard files — the training-export step (examples must reach the
    trainer in a decorrelated, REPRODUCIBLE order, and a resumable job
    must re-emit byte-identical shards).

    Shard assignment and intra-shard order both come from the Knuth
    multiplicative hash ``(key * 2654435761) mod 2^32`` (same constant
    the stratified sampler replays in SQL): shard = ``h % n_shards``,
    order = ``(h // n_shards, key)``.  No random state anywhere, so a
    re-run (or the SQL oracle) reproduces the exact layout.

    Physical plan: one map adds ``(shard, sort_key)``, one bucketed
    ``groupby(shard).map_groups`` writes each shard inside its own task
    (atomic tmp+rename, so a re-run over a partial output directory is
    safe), and only O(shards) count rows reach the driver.  At 100 TB
    ``n_shards`` scales with bytes (like ``shuffle_width``) and each
    shard streams through one writer task.

    Returns a Dataset of ``(shard, n_rows)``.
    """
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def _assign(batch: pa.Table) -> pd.DataFrame:
        d = batch.to_pandas()
        k = d[key_col].to_numpy(np.int64)
        # k * 2654435761 wraps int64 silently for k >= ~3.47e9 (and
        # negatives misbehave through %); the SQL oracle's BIGINT would
        # compute the exact product — guard the domain instead of
        # diverging silently (same contract as triangle_count's packer)
        if len(k) and (k.min() < 0 or k.max() >= 1 << 31):
            raise ValueError("write_shuffled_shards keys must be in "
                             "[0, 2^31) for the int64 Knuth hash")
        h = (k * np.int64(2654435761)) % np.int64(4294967296)
        d["_shard"] = (h % np.int64(n_shards)).astype(np.int64)
        d["_ord"] = h // np.int64(n_shards)
        return d

    def _write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["_shard"].iloc[0])
        g = g.sort_values(["_ord", key_col], kind="mergesort")
        out = g.drop(columns=["_shard", "_ord"]).reset_index(drop=True)
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [np.int64(shard)],
                             "n_rows": [np.int64(len(g))]})

    return (ds.map_batches(_assign, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(_write_shard, batch_format="pandas"))
