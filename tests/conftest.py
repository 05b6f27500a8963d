"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def smoke_corpus(tmp_path_factory):
    from engine.synth import write_transcripts

    d = str(tmp_path_factory.mktemp("corpus"))
    n = write_transcripts(d, n_convs=120, seed=42, n_files=3)
    return d, n


@pytest.fixture(scope="session")
def smoke_index(ray_session, smoke_corpus, tmp_path_factory):
    from engine.build import IndexConfig, build_index

    corpus, n = smoke_corpus
    idx = str(tmp_path_factory.mktemp("index"))
    cfg = IndexConfig(n_buckets=4, hot_df_threshold=200, n_salts=3,
                      batch_size=256)
    man = build_index(corpus, idx, cfg)
    return idx, man, n


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
    yield
    ray.shutdown()
