"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
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
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    """Deterministic 4-shard page table (t1 smoke scale, FIXTURES.md F1)."""
    from fever_ray.gen.pages import ensure_pages

    d = str(tmp_path_factory.mktemp("pages") / "t1")
    ensure_pages(
        d,
        n_rows=2000,
        n_files=4,
        seed=42,
        ioc_hosts=("evil0.example.com", "evil1.example.net"),
        ioc_paths=("/oddlyspecific/implant.html",),
        ioc_frac=0.01,
    )
    return d
