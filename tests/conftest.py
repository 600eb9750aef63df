"""Session-scoped Ray fixture — one ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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


@pytest.fixture(scope="session")
def pages_corpus():
    """Small deterministic corpus shared by blocking/scoring/clustering tests."""
    from ertransfer_ray.sources.pages import generate_pages

    return generate_pages(num_entities=120, max_dups=4, seed=42)


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    from ertransfer_ray.sources.pages import write_pages_corpus

    d = tmp_path_factory.mktemp("pages")
    write_pages_corpus(str(d), num_entities=120, max_dups=4, seed=42)
    return str(d)
