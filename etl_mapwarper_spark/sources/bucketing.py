"""Bucketed-table layout for shuffle-free fact⋈fact joins.

At 100 TB the dominant cost of orders⋈lineitem-shaped joins is the
shuffle of both fact tables. Bucketing pre-partitions (and pre-sorts)
each table by the join key at WRITE time, so every subsequent join or
aggregation on that key reads co-located buckets and plans a
SortMergeJoin with NO Exchange on either side — the shuffle is paid
once at ingest instead of per query. The bucket count is a layout
contract: both sides must agree (Spark joins bucket i with bucket i),
and it should be sized so one bucket of the LARGER table fits a task
(~128-256 MB compressed) at the target scale.

``tests/test_plans.py::test_bucketed_join_has_no_exchange`` pins the
no-Exchange plan shape.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed+sorted by ``key``.

    Sorting within buckets lets the join skip its sort when files are
    few, and gives parquet run-length/delta encoding on the key column.
    Write tasks are aligned to buckets (repartition by the bucket key
    with the same Murmur3 hash family Spark buckets with), so each
    bucket lands as ONE file — no small-files tail.

    ``path``: when given, the table is EXTERNAL with its bytes at
    ``path`` — required under sessions whose warehouse dir is not
    controlled (e.g. the driver's vanilla session, where a managed
    write would land a spark-warehouse/ in the process CWD).

    Idempotent: drops the catalog entry AND any orphaned warehouse
    directory (an aborted prior write leaves the location behind with
    no catalog entry, and Spark refuses to create a managed table over
    an existing location).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.repartition(buckets, df[key])
        .write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        writer.option("path", path).saveAsTable(table)
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the catalog carries the bucket spec, so
    joins/aggs on the bucket key skip their Exchange automatically."""
    return spark.table(table)
