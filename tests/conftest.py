"""Shared fixtures: one session per test run, small-parallelism local mode."""

from __future__ import annotations

import pytest

from bigdatapipeline_steamreviews_spark import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
