"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Plain run: one fresh ray session at $RAY_GRAFT_CPUS (default 32), runs
the headline pipelines at the given scale factor, prints ONE JSON line:
  {"metric": "...", "value": <headline_sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "sequences_per_sec": ..., "tokens_per_sec": ...}

--scaling: runs the headline pipeline twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (the sandbox evidence for the
north-rule's N→4N cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _headline(sf_dir: str, scale_repeat: int):
    """Flagship extraction: sequences → W1 windows → encoder features →
    consume. ``scale_repeat`` unions the input N× to give the cluster
    enough work to measure scaling (documents at sf0.1 is small)."""
    import ray.data

    from video_features_ray.pipelines.extract import extract
    from video_features_ray.sources.sequences import tokenize_documents
    from video_features_ray.specs import EncoderSpec

    spec = EncoderSpec("bench_w1_32_16_d256", "w1", 32, 16, 256)
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    if scale_repeat > 1:
        ds = ds.union(*[
            ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text", "source"])
            for _ in range(scale_repeat - 1)
        ])
    seq = ds.map_batches(tokenize_documents, batch_format="pyarrow", zero_copy_batch=True)
    out = extract(seq, spec)
    n_rows = 0
    n_tok = 0
    for batch in out.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n_rows += len(batch)
        n_tok += int(batch["n_in_window"].to_numpy().astype("int64").sum())
    return n_rows, n_tok


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import __ray_entry__ as em

    # warm page cache (untimed)
    _ = em.queries()["docs_per_source"](sf_dir)
    r = _
    if hasattr(r, "materialize"):
        r.materialize()

    import pyarrow.parquet as pq

    n_docs_base = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    scale_repeat = max(1, 40_000 // max(n_docs_base, 1))

    timings = {}

    t0 = time.perf_counter()
    n_windows, n_tok = _headline(sf_dir, scale_repeat)
    headline = time.perf_counter() - t0
    timings["flagship_extract"] = headline
    n_seq = n_docs_base * scale_repeat

    bench_queries = [
        "w1_windows", "w2_windows", "flow_pairs", "asof_features",
        "lag_lead_events", "sessionize_events", "ffill_events",
        "tumbling_hourly", "q1_pricing", "revenue_per_nation",
        "exact_dedup", "minhash_neardup", "similarity_topk", "quality_score",
    ]
    qs = em.queries()
    for name in bench_queries:
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        if hasattr(res, "materialize"):
            res.materialize()
        timings[name] = time.perf_counter() - t0

    result = {
        "metric": "flagship_extract_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_sequences": n_seq,
        "n_windows": n_windows,
        "n_window_tokens": n_tok,
        "sequences_per_sec": round(n_seq / headline, 1),
        "tokens_per_sec": round(n_tok / headline, 1),
    }
    ray.shutdown()
    return result


def _headline_only(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    n_docs_base = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    scale_repeat = max(1, 40_000 // max(n_docs_base, 1))
    _headline(sf_dir, 1)  # warm-up (page cache + worker start)
    t0 = time.perf_counter()
    n_windows, n_tok = _headline(sf_dir, scale_repeat)
    sec = time.perf_counter() - t0
    ray.shutdown()
    n_seq = n_docs_base * scale_repeat
    return {"sec": sec, "num_cpus": num_cpus, "n_sequences": n_seq,
            "sequences_per_sec": n_seq / sec, "tokens_per_sec": n_tok / sec}


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--headline-only" in sys.argv:
        print(json.dumps(_headline_only(sf_dir, num_cpus)))
        return

    if "--scaling" in sys.argv:
        out = {}
        for n in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            r = subprocess.run([sys.executable, __file__, "--headline-only"], env=env,
                               capture_output=True, text=True, check=True)
            out[n] = json.loads(r.stdout.strip().splitlines()[-1])
        eff = (out[32]["sequences_per_sec"] / out[8]["sequences_per_sec"]) / (32 / 8)
        print(json.dumps({
            "sec_8": round(out[8]["sec"], 3), "sec_32": round(out[32]["sec"], 3),
            "seq_per_sec_8": round(out[8]["sequences_per_sec"], 1),
            "seq_per_sec_32": round(out[32]["sequences_per_sec"], 1),
            "tok_per_sec_8": round(out[8]["tokens_per_sec"], 1),
            "tok_per_sec_32": round(out[32]["tokens_per_sec"], 1),
            "scaling_efficiency": round(eff, 3),
        }))
        return

    print(json.dumps(run_bench(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
