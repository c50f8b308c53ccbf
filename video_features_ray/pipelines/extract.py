"""Flagship extraction pipeline.

The Ray-Data-native replacement for the reference's per-clip loop
(``main.py:47-48`` → skip-if-exists → windowed GPU forward → sink,
``base_extractor.py:29-53``):

    sequences (read_parquet, pruned)
      → slide_windows (stateless map_batches, vectorized, zero-copy Arrow)
      → Encoder (actor pool: matrix built once per actor)
      [→ write_parquet partitioned, or returned lazy]

No stage materializes the dataset; the streaming executor pipelines
blocks with backpressure. Batch sizes are derived from the spec so a
batch of exploded windows stays ~tens of MB even for stack=64.
"""

from __future__ import annotations

from typing import Optional

import ray.data

from ..specs import EncoderSpec, get_spec
from ..stages.encode import Encoder
from ..stages.windows import make_window_stage


def _window_batch_rows(spec: EncoderSpec) -> int:
    # windows are win_len int32 + D float32 ≈ 4*(win_len + D) bytes/row.
    # Target ~4 MB encoder batches: large enough to amortize dispatch,
    # small enough that a stage emits many work units per actor (a 64 MB
    # batch target leaves an 8-actor pool with single-digit batches and
    # straggler-bound wall time).
    bytes_per_row = 4 * (spec.window_len + spec.dim * (2 if spec.kind == "w2" else 1))
    return max(512, min(16384, (4 << 20) // max(bytes_per_row, 1)))


def encoder_remote_args(
    num_gpus: Optional[float] = None,
    num_cpus: Optional[float] = None,
    resources: Optional[dict] = None,
) -> dict:
    """Per-actor resource kwargs for the encoder ``map_batches`` call.

    Mirrors the reference's device placement (one extraction process
    per GPU, model moved to its device — ``models/i3d/extract_i3d.py``
    171-209, ``README.md`` 70-84) in Ray Data terms: ``num_gpus=1``
    reserves a whole device per encoder actor, fractions share one.
    Only explicitly-set keys are emitted so the CPU default stays the
    scheduler's (1 CPU per actor) and a resource-free pool is the
    no-GPU fallback."""
    kw: dict = {}
    if num_gpus is not None:
        kw["num_gpus"] = num_gpus
    if num_cpus is not None:
        kw["num_cpus"] = num_cpus
    if resources:
        kw["resources"] = dict(resources)
    return kw


def extract(
    sequences: "ray.data.Dataset",
    spec: EncoderSpec | str,
    encoder_concurrency: Optional[int] = None,
    with_features: bool = True,
    num_gpus: Optional[float] = None,
    num_cpus: Optional[float] = None,
    resources: Optional[dict] = None,
) -> "ray.data.Dataset":
    """sequences → window rows (+ deterministic features). Lazy.

    ``num_gpus`` / ``num_cpus`` / ``resources`` size EACH encoder
    actor (see :func:`encoder_remote_args`); when ``num_gpus`` is set
    and no concurrency is given, the pool is sized from the cluster's
    GPU count instead of its CPUs."""
    if isinstance(spec, str):
        spec = get_spec(spec)
    windows = sequences.map_batches(
        make_window_stage(spec), batch_format="pyarrow", zero_copy_batch=True
    )
    if not with_features:
        return windows
    if encoder_concurrency is None and num_gpus:
        # GPU pool: one actor per reserved device share; elastic floor
        # of 1 so a partially-busy cluster still makes progress
        import ray

        if ray.is_initialized():
            n_gpu = int(ray.cluster_resources().get("GPU", 0))
            encoder_concurrency = (1, max(1, int(n_gpu / num_gpus))) \
                if n_gpu else (1, 1)
        else:
            encoder_concurrency = (1, 1)
    if encoder_concurrency is None:
        # leave headroom for the read + window stages so the pool doesn't
        # starve the rest of the pipeline (actor pools reserve their CPUs)
        import ray

        if ray.is_initialized():
            total = int(ray.cluster_resources().get("CPU", 4))
            # cap at total-1: a pool reserving every CPU starves the
            # upstream read/window tasks and the stream deadlocks; on a
            # 1-2 CPU cluster an ELASTIC (1, n) pool keeps min one
            # actor while leaving room for the task stages
            if total <= 2:
                encoder_concurrency = (1, max(1, total - 1))
            else:
                # ELASTIC (1, cap), not a fixed pool: a fixed size-3
                # pool on a 4-CPU cluster reserves 3.0 CPUs up front,
                # and any stray fraction held elsewhere (another
                # dataset's pool mid-teardown) leaves <1 CPU for the
                # ReadParquet task — observed wedging the whole stream.
                # With min=1 the pool holds one actor and scales up
                # only when the scheduler can actually place more.
                encoder_concurrency = (
                    1, max(1, min(total - 1, (total * 3) // 4)))
        else:
            # cluster size unknown at plan-build time (auto-init later):
            # a fixed guess could reserve every CPU of a smaller real
            # cluster — an elastic pool scales to what exists
            encoder_concurrency = (1, 4)
    return windows.map_batches(
        Encoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=_window_batch_rows(spec),
        fn_constructor_args=(spec,),
        concurrency=encoder_concurrency,
        **encoder_remote_args(num_gpus, num_cpus, resources),
    )
