from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from datapipeline_spike_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
