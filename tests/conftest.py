"""Session-scoped Ray runtime for all tests (one init per pytest session)."""

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus(tmp_path_factory):
    """t1 smoke corpus (5 hosts × 20 pages) written to parquet once."""
    import pyarrow.parquet as pq

    from crawler_ray import fixtures

    tbl = fixtures.gen_corpus(5, 20)
    path = tmp_path_factory.mktemp("corpus") / "t1.parquet"
    pq.write_table(tbl, path)
    return str(path), tbl
