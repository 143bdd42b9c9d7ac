"""Shared fixtures: one session-scoped SparkSession + DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mapwarper_spark.session import get_spark  # noqa: E402
from etl_mapwarper_spark.sources.tables import TABLE_NAMES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    def make(sf_dir: str) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con

    cache: dict[str, duckdb.DuckDBPyConnection] = {}

    def get(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
        if sf_dir not in cache:
            cache[sf_dir] = make(sf_dir)
        return cache[sf_dir]

    yield get
    for c in cache.values():
        c.close()
