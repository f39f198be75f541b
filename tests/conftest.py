"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = REPO / "tests" / "goldens"


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def goldens_default():
    import json

    return json.loads((GOLDEN_DIR / "fixtures_default.json").read_text())


@pytest.fixture(scope="session")
def goldens_variants():
    import json

    return json.loads((GOLDEN_DIR / "fixtures_variants.json").read_text())


@pytest.fixture(scope="session")
def goldens_micro():
    import json

    return json.loads((GOLDEN_DIR / "micro_quirks.json").read_text())
