import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests exercise the DISTRIBUTED paths by default: the partition_map
# driver fast path (on by default in production for sub-128MiB inputs)
# would otherwise silently satisfy every partition-invariance /
# distributed-parity test at test scale.  test_pmap_fast_path.py
# re-enables it explicitly and pins fast == distributed per op family.
os.environ.setdefault("NETML_RAY_PMAP_DRIVER_BYTES", "0")


@pytest.fixture(scope="session")
def ray_session():
    """Initialise Ray ONCE per pytest session (required by the driver)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
