"""Every queries() entry with an oracle must match DuckDB — this is a
local replica of the driver's correctness gate (CORRECTNESS_r{N}.json).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to replicate the gate exactly.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402
from tests.oracle_utils import assert_frames_match  # noqa: E402

ALL_QUERIES = entrymod.queries()
ALL_ORACLE = entrymod.oracle_sql()
CHECKED = sorted(k for k in ALL_QUERIES if k in ALL_ORACLE)
ROWS_ONLY = sorted(k for k in ALL_QUERIES if k not in ALL_ORACLE)


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    oracle_pdf = oracle_con(SF_DIR).execute(ALL_ORACLE[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
