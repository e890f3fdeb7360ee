"""Shared test fixtures: one SparkSession per test run, DuckDB oracle conn."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from real_time_rides_data_pipeline_spark.session import get_spark  # noqa: E402
from real_time_rides_data_pipeline_spark.schemas import FIXTURE_TABLES  # noqa: E402

SMOKE_SF = "/root/testdata/sf0.001"
ORACLE_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with fixture views pre-registered (driver parity)."""

    def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for name in FIXTURE_TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
        return con

    return connect
