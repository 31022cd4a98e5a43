"""Shared Spark fixture: one session per pytest run (sessions cost ~10 s)."""

from __future__ import annotations

import pytest

from entity_deduplication_hack_main_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(parallelism=8, shuffle_partitions=8, app_name="spark-dedup-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf001() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01() -> str:
    return "/root/testdata/sf0.01"
