"""Python DataSource V2 writer: the two-phase commit protocol.

The property that matters at cluster scale: task attempts write only
STAGING files; final ``part-*.ndjson`` names and ``_SUCCESS`` appear
only after every task succeeded — so readers can never observe a
partial or duplicated write, even under task retries/speculation.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mapwarper_spark.sources.ndjson_datasource import (  # noqa: E402
    register_ndjson_sink,
)


def test_commit_publishes_all_rows_once(spark):
    register_ndjson_sink(spark)
    path = tempfile.mkdtemp(prefix="pyds_unit_") + "/out"
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS dbl").repartition(4)
    df.write.format("ndjson_sink").mode("append").save(path)
    files = sorted(os.listdir(path))
    assert "_SUCCESS" in files
    parts = [f for f in files if f.startswith("part-") and f.endswith(".ndjson")]
    assert len(parts) == 4
    assert not [f for f in files if f.startswith(".staging-")], (
        "staging files must not survive commit"
    )
    rows = []
    for p in parts:
        with open(os.path.join(path, p)) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["id"] for r in rows) == list(range(1000))
    assert all(r["dbl"] == r["id"] * 2 for r in rows)
    # field order in each line = schema order (the handoff contract)
    with open(os.path.join(path, parts[0])) as fh:
        first = fh.readline().strip()
    assert first.index('"id"') < first.index('"dbl"')


def test_failed_write_publishes_nothing(spark):
    register_ndjson_sink(spark)
    path = tempfile.mkdtemp(prefix="pyds_unit_") + "/fail"
    df = spark.range(0, 100).selectExpr(
        "id", "CASE WHEN id = 50 THEN raise_error('boom') ELSE 'ok' END AS v"
    )
    try:
        df.write.format("ndjson_sink").mode("append").save(path)
        raised = False
    except Exception:
        raised = True
    assert raised
    if os.path.isdir(path):
        files = os.listdir(path)
        assert "_SUCCESS" not in files
        assert not [
            f for f in files if f.startswith("part-") and f.endswith(".ndjson")
        ], "failed job must not publish part files"
