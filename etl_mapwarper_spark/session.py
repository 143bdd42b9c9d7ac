"""SparkSession factory.

One place to configure the session so every entry point (tests, bench,
__spark_entry__, pipelines) gets identical, scale-appropriate settings:

- AQE on (runtime coalescing + skew-join handling — at 100 TB the static
  plan is always wrong somewhere; AQE fixes partition counts and skew at
  runtime from actual map-output statistics).
- Arrow on (every pandas_udf / applyInPandas crosses the JVM<->Python
  boundary in columnar Arrow batches instead of pickled rows).
- UTC session timezone (parity with the DuckDB oracle, whose timestamps
  are UTC-naive).
- shuffle partitions sized to the local core count; on a real cluster
  AQE's coalescing makes the initial number mostly a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "etl_mapwarper_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (or all local cores). In
    cluster deployments the master/resource settings come from
    spark-submit and these local[..] settings are ignored.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.default.parallelism", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: keep per-task input ~128MB so tasks fit executor
        # memory at any SF; matches the cluster default.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # ANSI off: oracle (DuckDB) and classic TPC-H semantics tolerate
        # overflow-to-null-free double arithmetic; keep Spark legacy mode.
        .config("spark.sql.ansi.enabled", "false")
        # Managed-table warehouse (bucketed tables) lives outside the
        # repo; the in-memory catalog needs no metastore service.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
