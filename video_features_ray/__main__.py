"""CLI entry — the engine's analogue of the reference's
``python main.py feature_type=... video_paths=...`` launcher
(``main.py:14-48``) and its ``ray job submit`` deployment story.

    python -m video_features_ray extract \
        --input /data/sequences/*.parquet --out /data/features \
        --spec r21d_like_16_16 [--checkpoint] [--target-rows 250000]
    python -m video_features_ray specs

Equivalence contract (mirrors reference ``tests/utils.py:107-135``'s
CLI-vs-API check): the CLI writes exactly what the library call
``extract(read_sequences(input), spec)`` produces — pinned by
``tests/test_cli_entry.py``. Owns its Ray session (guarded init) —
the library itself never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _yaml_defaults(argv):
    """Reference-style YAML + CLI merge (``main.py:9-10`` builds its
    config as ``OmegaConf.merge(load(yml), from_cli())``): a ``--config
    file.yml`` provides DEFAULTS; explicit CLI flags override them. Two
    argparse passes — the first finds --config, its values become
    ``set_defaults`` for the second, so precedence falls out of
    argparse itself (explicit flag > YAML > built-in default)."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    ns, rest = pre.parse_known_args(argv)
    if ns.config is None:
        return {}, argv
    import yaml

    with open(ns.config) as f:
        cfg = yaml.safe_load(f) or {}
    if not isinstance(cfg, dict):
        raise SystemExit(f"--config {ns.config}: top level must be a mapping")
    # YAML keys use the flag spelling (num-cpus) or the dest (num_cpus)
    cfg = {k.replace("-", "_"): v for k, v in cfg.items()}
    # required= args satisfied via YAML must not trip argparse's check
    return cfg, rest


def _parse(argv):
    yaml_cfg, argv = _yaml_defaults(argv)
    p = argparse.ArgumentParser(prog="video_features_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("extract", help="sequences parquet -> windowed features parquet")
    ex.add_argument("--input", required="input" not in yaml_cfg, nargs="+",
                    help="input parquet file(s)/glob(s) with (doc_id, tokens, n_tok, source)")
    ex.add_argument("--out", required="out" not in yaml_cfg,
                    help="output directory")
    ex.add_argument("--spec", required="spec" not in yaml_cfg,
                    help="spec name (see `specs`)")
    ex.add_argument("--checkpoint", action="store_true",
                    help="per-partition lineage checkpointing + resume")
    ex.add_argument("--target-rows", type=int, default=250_000)
    ex.add_argument("--wave-size", type=int, default=2)
    ex.add_argument("--num-cpus", type=int, default=None)
    ex.add_argument("--num-gpus", type=float, default=None,
                    help="GPUs reserved PER encoder actor (1 = whole "
                         "device, 0.5 = two actors share one); omit for "
                         "the CPU-only pool")
    ex.add_argument("--encoder-num-cpus", type=float, default=None,
                    help="CPUs reserved per encoder actor (scheduler "
                         "default: 1)")
    sub.add_parser("specs", help="list registered encoder specs")
    fe = sub.add_parser("features",
                        help="events parquet -> per-event training feature "
                             "table (lags/lead/rolling/extrema/z-score/split), "
                             "partitioned by split")
    fe.add_argument("--input", required="input" not in yaml_cfg, nargs="+",
                    help="event parquet file(s)/glob(s) with "
                         "(event_id, user_id, ts, event_type, value)")
    fe.add_argument("--out", required="out" not in yaml_cfg,
                    help="output directory")
    fe.add_argument("--span-us", type=int, default=3_600_000_000,
                    help="rolling-window span in microseconds (default 1h)")
    fe.add_argument("--num-buckets", type=int, default=64)
    fe.add_argument("--num-cpus", type=int, default=None)
    if yaml_cfg:
        if isinstance(yaml_cfg.get("input"), str):
            yaml_cfg["input"] = [yaml_cfg["input"]]
        ex.set_defaults(**yaml_cfg)
        fe.set_defaults(**yaml_cfg)
    return p.parse_args(argv)


def _count_parquet_rows(out_dir: str) -> int:
    """Row count from parquet FOOTERS under a dir (recursive) — counting
    the lazy dataset would re-execute the whole pipeline."""
    import os

    import pyarrow.parquet as pq

    rows = 0
    for root, _dirs, fnames in os.walk(out_dir):
        rows += sum(pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                    for f in fnames if f.endswith(".parquet"))
    return rows


def main(argv=None) -> int:
    args = _parse(argv if argv is not None else sys.argv[1:])

    from .specs import SPECS, get_spec

    if args.cmd == "specs":
        for name, s in SPECS.items():
            print(f"{name}\tkind={s.kind}\tstack={s.stack}\tstep={s.step}\tdim={s.dim}")
        return 0

    import os

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the runtime provides RAY_ADDRESS — connect
        # to THAT cluster (a hardcoded "local" would silently start a
        # private single-node instance on the driver box). Local options
        # (num_cpus, dashboard) only apply when starting a local instance;
        # Ray rejects them when connecting to an existing cluster.
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr == "local":
            kw = dict(address="local", include_dashboard=False,
                      logging_level="ERROR")
            if args.num_cpus:
                kw["num_cpus"] = args.num_cpus
            ray.init(**kw)
        else:
            if args.num_cpus:
                print("--num-cpus ignored: connecting to existing cluster "
                      f"at RAY_ADDRESS={addr}", file=sys.stderr)
            ray.init(address=addr)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        files = sorted(f for pat in args.input for f in glob.glob(pat))
        if not files:
            print(f"no input files match {args.input}", file=sys.stderr)
            return 2
        if args.cmd == "features":
            import os

            from .pipelines.feature_store import events_feature_table

            # same reused-dir refusal as extract: write_parquet appends
            # UUID-named files, so a second run would MIX two feature
            # tables and inflate the row count
            if os.path.isdir(args.out) and _count_parquet_rows(args.out) > 0:
                print(f"output dir {args.out} already contains parquet "
                      "files; use a fresh dir", file=sys.stderr)
                return 2
            out = events_feature_table(files, num_buckets=args.num_buckets,
                                       span_us=args.span_us)
            out.write_parquet(args.out, partition_cols=["split"])
            print(json.dumps({"out": args.out,
                              "rows": _count_parquet_rows(args.out)}))
            return 0
        spec = get_spec(args.spec)
        if args.checkpoint:
            from .pipelines.extract import extract
            from .state.checkpoint import run_checkpointed

            summary = run_checkpointed(
                files,
                lambda ds: extract(ds, spec, num_gpus=args.num_gpus,
                                   num_cpus=args.encoder_num_cpus),
                args.out,
                target_rows=args.target_rows, wave_size=args.wave_size,
            )
            print(json.dumps(summary))
        else:
            import os

            import ray.data

            from .pipelines.extract import extract

            # write_parquet appends UUID-named files; a reused dir would mix
            # two extractions and inflate the row count — refuse it
            if os.path.isdir(args.out) and any(
                f.endswith(".parquet") for f in os.listdir(args.out)
            ):
                print(f"output dir {args.out} already contains parquet files; "
                      "use a fresh dir (or --checkpoint for resumable runs)",
                      file=sys.stderr)
                return 2
            from .sources.sequences import read_sequences

            out = extract(read_sequences(files), spec,
                          num_gpus=args.num_gpus,
                          num_cpus=args.encoder_num_cpus)
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out,
                              "rows": _count_parquet_rows(args.out)}))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
