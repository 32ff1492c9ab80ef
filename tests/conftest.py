"""Shared Spark fixture: one tuned local session for the whole run."""

from __future__ import annotations

import os

import pytest

from event_streaming_toy_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    # per-run warehouse: the persistent table catalog
    # (operators/warehouse.py) survives sessions BY DESIGN, so a
    # durable location would leak CREATE TABLE names across pytest runs
    import tempfile

    s.conf.set(
        "spark_graft.warehouse.dir", tempfile.mkdtemp(prefix="txwh_")
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
