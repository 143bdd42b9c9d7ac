"""Hive-style partitioned parquet layout.

Partitioning by a low-cardinality scan predicate column (date, type,
language) turns those predicates into directory pruning: a filtered
read lists only the matching partition directories, so the scan cost
is proportional to the data *selected*, not the data *stored* — the
difference between touching 100 TB and touching one day of it.

Guidance encoded here:
- Partition columns must be low-cardinality (dates, enums). High-
  cardinality partitioning (user_id) creates millions of tiny files —
  the small-files problem — and kills listing performance.
- Within a partition, files should land near the parquet row-group
  sweet spot (~128 MB); upstream ``repartition(n, key)`` controls
  files-per-partition.

``tests/test_plans.py::test_partitioned_sink_prunes_partitions`` pins
the PartitionFilters plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Read a partitioned layout; partition columns come back as
    regular columns, and filters on them prune directories at planning
    time (visible as PartitionFilters in the physical plan).

    ``schema``: pass the writer's schema to keep an EMPTY layout
    readable — a zero-row partitioned write leaves no files to infer
    from, and a first production run against a not-yet-landed dataset
    must degrade to empty results, not UNABLE_TO_INFER_SCHEMA."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
