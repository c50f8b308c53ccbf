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
