"""Shared local SparkSession for tests.

Mirrors the reference's shared-suite session (``app/src/test/.../util/
SparkSuite.scala:7-32`` — ``local[*]``, shuffle.partitions=2): one session
per pytest run, small shuffle fan-out for speed.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_caterer_spark.config import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="dc-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
