"""Device/resource plumbing for the encoder stage (SURVEY §2.4 A1/A2).

The reference runs one extraction process per GPU and moves the model
to its device (``models/i3d/extract_i3d.py:171-209``, ``README.md:70-84``);
the Ray-native equivalent is per-actor resource reservation on the
encoder ``map_batches`` call. No GPU exists in this container, so the
tests pin (a) the kwargs helper, (b) that the LAZY plan carries
``num_gpus`` when requested (plan building never schedules actors), and
(c) that the resource-free CPU fallback still matches the numpy oracle.
"""

import numpy as np
import pytest
import ray
import ray.data

from video_features_ray.pipelines.extract import encoder_remote_args, extract
from video_features_ray.specs import get_spec


def test_encoder_remote_args_only_emits_set_keys():
    assert encoder_remote_args() == {}
    assert encoder_remote_args(num_gpus=1) == {"num_gpus": 1}
    assert encoder_remote_args(num_gpus=0.5, num_cpus=2) == {
        "num_gpus": 0.5, "num_cpus": 2}
    assert encoder_remote_args(resources={"TPU": 1}) == {
        "resources": {"TPU": 1}}
    # num_gpus=0 is an explicit "no GPU" pin, not an omission
    assert encoder_remote_args(num_gpus=0) == {"num_gpus": 0}


def _tiny_sequences():
    rng = np.random.default_rng(7)
    return ray.data.from_items([
        {"doc_id": i, "tokens": rng.integers(0, 1000, 200).tolist(),
         "n_tok": 200, "source": "s0"}
        for i in range(6)
    ])


def test_extract_plan_carries_num_gpus():
    spec = get_spec("i3d_like_default")
    ds = extract(_tiny_sequences(), spec, num_gpus=0.25,
                 encoder_concurrency=2)
    # plan building is lazy — never executes, so no GPU is required here
    op = ds._logical_plan.dag
    assert type(op).__name__ == "MapBatches"
    assert getattr(op, "_ray_remote_args", {}).get("num_gpus") == 0.25


def test_extract_plan_carries_custom_resources_and_cpus():
    spec = get_spec("i3d_like_default")
    ds = extract(_tiny_sequences(), spec, num_cpus=2,
                 resources={"accel": 1}, encoder_concurrency=1)
    args = getattr(ds._logical_plan.dag, "_ray_remote_args", {})
    assert args.get("num_cpus") == 2
    assert args.get("resources") == {"accel": 1}


def test_cpu_fallback_matches_gpu_free_plan():
    """The resource-free pool (the only one runnable here) executes and
    matches a plan that explicitly pins num_gpus=None — same rows."""
    spec = get_spec("i3d_like_default")
    plain = extract(_tiny_sequences(), spec,
                    encoder_concurrency=2).to_pandas()
    pinned = extract(_tiny_sequences(), spec, num_gpus=None, num_cpus=1,
                     encoder_concurrency=2).to_pandas()
    assert len(plain) == len(pinned) > 0
    scalar = [c for c in sorted(plain.columns)
              if plain[c].dtype != object][:3]
    a = plain.sort_values(scalar).reset_index(drop=True)
    b = pinned.sort_values(scalar).reset_index(drop=True)
    for c in plain.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype == object and len(av) and \
                isinstance(av[0], (np.ndarray, list)):
            np.testing.assert_allclose(np.stack(av), np.stack(bv))
        else:
            np.testing.assert_array_equal(av, bv)


def test_gpu_pool_sized_from_cluster_gpus():
    """With num_gpus set, no concurrency given, and a GPU-less cluster,
    the pool must degrade to an elastic (1, 1) — not the CPU formula
    (which would strand actors waiting on GPUs that don't exist)."""
    spec = get_spec("i3d_like_default")
    ds = extract(_tiny_sequences(), spec, num_gpus=1)
    from ray.data._internal.compute import ActorPoolStrategy

    compute = ds._logical_plan.dag._compute
    assert isinstance(compute, ActorPoolStrategy)
    assert (compute.min_size, compute.max_size) == (1, 1)
