import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def f1_dir(tmp_path_factory):
    """Small F1 image+caption fixture table (parquet dir + _labels.parquet)."""
    from data_quality_ray.sources.fixtures import write_f1

    d = tmp_path_factory.mktemp("f1")
    write_f1(str(d), n_rows=600, seed=42, rows_per_file=128)
    return str(d)
