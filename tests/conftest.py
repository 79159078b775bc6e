import os

import pytest


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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(ray_session, tmp_path_factory):
    """200-doc deterministic corpus (t1 smoke tier, FIXTURES.md)."""
    from docling_serve_ray.pipelines.gen import generate_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    generate_corpus(out, 200, num_files=8)
    return os.path.join(out, "input")
