import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never per-test)."""
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
def tiny_corpus():
    """FIXTURES.md F1-tiny: ~200 turns / 20 conversations, seed 42."""
    from searchengine_ray.corpus import generate_transcripts

    return generate_transcripts(n_convs=20, avg_turns=10.0, seed=42)


@pytest.fixture(scope="session")
def small_corpus():
    """FIXTURES.md F1-small: a few thousand turns for oracle-vs-engine runs."""
    from searchengine_ray.corpus import generate_transcripts

    return generate_transcripts(n_convs=300, avg_turns=12.0, seed=7)
