"""Per-partition checkpoint manifest + resume.

The reference's resume story is file-existence probing per entity
(``base_extractor.py:95-127``: skip a video when every output key file
exists AND loads) plus a double-check before overwrite (``:72-76``).
That degrades to O(entities) stat calls and races between workers. Here
it becomes a transactional commit protocol (SURVEY §2.8 / §4):

- The input is cut into PARTITIONS with explicit lineage: partition id =
  ``<file-stem>:<row_start>-<row_end>`` derived from parquet row groups
  (stable across reruns; independent of Ray block boundaries).
- Each partition's output goes to ``out_dir/part=<pid>/`` written to a
  temp dir first, then atomically renamed; a manifest row (lineage +
  metrics) is appended only after the rename. A kill at any point leaves
  either a fully-committed partition or an ignorable temp dir.
- Resume = anti-join of the partition list against the manifest (the
  J4/M21 anti-join made transactional): committed partitions are never
  reread, never rewritten — their bytes are untouched.

Scale notes: partition granularity is row-group ranges (~target_rows),
so a 100 TB input yields O(input-files × few) partitions; each wave of
``wave_size`` partitions runs as ONE streaming Dataset job, keeping the
cluster saturated while bounding re-done work on failure.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict, dataclass

import pyarrow.parquet as pq
import ray
import ray.data


@dataclass(frozen=True)
class Partition:
    partition_id: str
    input_file: str
    row_start: int
    row_end: int
    row_groups: tuple


def plan_partitions(input_files: list[str], target_rows: int = 250_000) -> list[Partition]:
    """Cut each parquet file into contiguous row-group ranges of ~target_rows."""
    parts = []
    # two inputs sharing a basename (a/part-0.parquet, b/part-0.parquet)
    # would collide in both the manifest and the output dirs — the
    # second run would rmtree the first's committed output and resume
    # would skip one file's data as "done"; disambiguate with a short
    # full-path hash, only when needed (ids stay stable otherwise)
    import hashlib

    base_counts: dict[str, int] = {}
    for path in input_files:
        b = os.path.splitext(os.path.basename(path))[0]
        base_counts[b] = base_counts.get(b, 0) + 1
    for path in input_files:
        md = pq.ParquetFile(path).metadata
        stem = os.path.splitext(os.path.basename(path))[0]
        if base_counts[stem] > 1:
            stem = f"{stem}-{hashlib.md5(path.encode()).hexdigest()[:6]}"
        rgs, start_row, rows = [], 0, 0
        row_cursor = 0
        for g in range(md.num_row_groups):
            nrows = md.row_group(g).num_rows
            rgs.append(g)
            rows += nrows
            if rows >= target_rows or g == md.num_row_groups - 1:
                end_row = row_cursor + rows
                parts.append(
                    Partition(
                        partition_id=f"{stem}:{row_cursor}-{end_row}",
                        input_file=path,
                        row_start=row_cursor,
                        row_end=end_row,
                        row_groups=tuple(rgs),
                    )
                )
                row_cursor = end_row
                rgs, rows = [], 0
    return parts


class Manifest:
    """Append-only manifest of committed partitions + a plan header.

    The plan header pins the partitioning parameters and an input
    fingerprint (per-file size + mtime): resuming with a different
    ``target_rows`` or mutated inputs would silently mix two
    partitionings in one output directory — the header makes that an
    explicit error instead (SURVEY §7.4 "exact resume": lineage must be
    keyed by input content, never by block layout).
    """

    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)
        self.plan_path = os.path.join(self.dir, "_plan.json")

    @staticmethod
    def plan_fingerprint(input_files: list[str], target_rows: int) -> dict:
        files = {}
        for p in sorted(input_files):
            st = os.stat(p)
            files[p] = {"size": st.st_size, "mtime_ns": st.st_mtime_ns}
        return {"target_rows": target_rows, "inputs": files}

    def check_or_write_plan(self, plan: dict) -> None:
        if os.path.exists(self.plan_path):
            with open(self.plan_path) as fh:
                existing = json.load(fh)
            if existing != plan:
                raise ValueError(
                    "checkpoint plan mismatch: this output dir was committed with "
                    f"{existing}, resume requested {plan}. Changing target_rows or "
                    "mutating inputs mid-run would mix partitionings — use a fresh "
                    "output dir."
                )
            return
        tmp = self.plan_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(plan, fh)
        os.replace(tmp, self.plan_path)

    def committed(self) -> dict[str, dict]:
        rows = {}
        for f in sorted(os.listdir(self.dir)):
            if f.endswith(".json") and not f.startswith("_"):
                with open(os.path.join(self.dir, f)) as fh:
                    r = json.load(fh)
                    rows[r["partition_id"]] = r
        return rows

    def commit(self, partition: Partition, metrics: dict, output_dir: str):
        row = {**asdict(partition), "metrics": metrics, "output_dir": output_dir,
               "committed_at": time.time()}
        safe = partition.partition_id.replace("/", "_").replace(":", "_")
        tmp = os.path.join(self.dir, f".tmp-{safe}-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(row, fh)
        os.replace(tmp, os.path.join(self.dir, f"{safe}.json"))  # atomic


@ray.remote
def _read_row_group(path: str, row_group: int):
    return pq.ParquetFile(path).read_row_groups([row_group])


def partition_dataset(part: Partition) -> "ray.data.Dataset":
    """The partition's rows as a Dataset — ONE Arrow ref per row group,
    so the partition's pipeline starts at row-group parallelism (the
    round-2 single-ref version ran each partition's first stage as one
    task; intra-partition parallelism then came only from dynamic block
    splitting). Reads happen in parallel Ray tasks; lineage stays the
    committed row-group range."""
    return ray.data.from_arrow_refs(
        [_read_row_group.remote(part.input_file, g) for g in part.row_groups])


def _harden_concurrent_writes() -> None:
    """Ray's path resolver re-attempts ``from fsspec.implementations.http
    import HTTPFileSystem`` on EVERY write (a failed import is never
    cached). Without aiohttp that import raises, and two wave threads
    doing their first ``write_parquet`` together can race the module
    cleanup and observe a poisoned ``sys.modules`` entry — surfacing as
    ``ImportError: cannot import name 'HTTPFileSystem'`` which Ray does
    not catch. When the import can never succeed, the predicate can only
    ever be False, so pin it once and remove the racy import from the
    write path entirely. No-op when fsspec+aiohttp are healthy."""
    import sys as _sys

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return  # import works → Ray's own code path is race-free enough
    except Exception:
        _sys.modules.pop("fsspec.implementations.http", None)
    try:
        from ray.data.datasource import path_util

        if not getattr(path_util, "_vfr_http_pinned", False):
            path_util._is_http_filesystem = lambda fs: False
            path_util._vfr_http_pinned = True
    except Exception:
        pass


def _run_partition(part: Partition, pipeline_fn, out_dir: str):
    """Execute one partition's pipeline to a temp dir and atomically
    publish it. Returns (part, metrics, final_dir); the caller commits."""
    t0 = time.perf_counter()
    ds = pipeline_fn(partition_dataset(part))
    safe = part.partition_id.replace("/", "_").replace(":", "_")
    final_dir = os.path.join(out_dir, f"part={safe}")
    tmp_dir = os.path.join(out_dir, f".tmp-{safe}-{uuid.uuid4().hex}")
    ds.write_parquet(tmp_dir)
    rows_out = sum(
        pq.ParquetFile(os.path.join(tmp_dir, f)).metadata.num_rows
        for f in os.listdir(tmp_dir) if f.endswith(".parquet")
    )
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.replace(tmp_dir, final_dir)  # atomic publish
    metrics = {
        "rows_in": part.row_end - part.row_start,
        "rows_out": rows_out,
        "wall_sec": time.perf_counter() - t0,
    }
    return part, metrics, final_dir


def run_checkpointed(
    input_files: list[str],
    pipeline_fn,
    out_dir: str,
    target_rows: int = 250_000,
    fail_after: int | None = None,
    wave_size: int = 1,
) -> dict:
    """Run ``pipeline_fn(dataset) -> dataset`` per pending partition with
    atomic commits. ``wave_size`` partitions execute CONCURRENTLY (each
    is its own streaming Dataset job driven from a thread — Ray Data
    jobs share the cluster, so a wave keeps it saturated while resume
    granularity stays per-partition). ``fail_after`` stops the run after
    N commits (tests); with waves, at most ``fail_after`` partitions are
    ever launched beyond what's committed.

    Returns {"committed": n, "skipped": n, "partitions": [...]}.
    """
    from concurrent.futures import ThreadPoolExecutor

    _harden_concurrent_writes()
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    manifest.check_or_write_plan(Manifest.plan_fingerprint(input_files, target_rows))
    done = manifest.committed()
    parts = plan_partitions(input_files, target_rows)
    skipped = sum(1 for p in parts if p.partition_id in done)
    pending = [p for p in parts if p.partition_id not in done]
    committed = 0
    i = 0
    while i < len(pending):
        if fail_after is not None and committed >= fail_after:
            break
        wave = pending[i : i + max(wave_size, 1)]
        if fail_after is not None:
            wave = wave[: max(fail_after - committed, 1)]
        if len(wave) == 1:
            results = [_run_partition(wave[0], pipeline_fn, out_dir)]
        else:
            with ThreadPoolExecutor(max_workers=len(wave)) as ex:
                results = list(ex.map(
                    lambda p: _run_partition(p, pipeline_fn, out_dir), wave
                ))
        # commit serially, in plan order, from the driver thread
        for part, metrics, final_dir in results:
            manifest.commit(part, metrics, final_dir)
            committed += 1
        i += len(wave)
    return {"committed": committed, "skipped": skipped,
            "partitions": [p.partition_id for p in parts]}
