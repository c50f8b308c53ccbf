import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(autouse=True)
def _release_dataset_actors():
    """Collect finished Datasets' executors after every test.

    A Dataset whose actor pool hasn't been GC'd yet keeps its actors'
    CPU reservations alive; on the 4-CPU test cluster a stray 0.25-CPU
    actor from the previous test can leave the next pipeline's read
    task unschedulable (observed: a leaked MapBatches(_Apply) actor
    wedging the flagship stream for 18 min). One gc.collect per test
    releases them deterministically."""
    yield
    import gc

    gc.collect()
