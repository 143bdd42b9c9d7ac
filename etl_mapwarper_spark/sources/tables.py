"""Canonical test-table catalog (see TESTDATA.md / FIXTURES.md §6).

Explicit StructType per table — at 100 TB we never rely on schema
inference (a full-file pass) and we want scan-time column pruning to be
driven by a stable declared schema. Parquet already stores the schema,
so the declared StructTypes here serve as a *contract check*: reads fail
fast if the data drifts from what the engine was built against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Tables small enough to usually broadcast in joins (dimension side).
# region/nation are bounded by the world; customer/supplier/part grow
# slower than fact tables — at 100 TB the facts are orders/lineitem/
# events/documents, and these remain broadcast-able or at worst
# shuffle-hash candidates.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}

# Per-relation broadcast budget, measured on the backing parquet. A
# forced broadcast() hint overrides every size check Spark has; past
# this size the hint is an executor OOM waiting for a 100x scale-up,
# so the helper below demotes to no-hint and lets AQE's runtime stats
# decide (it still broadcasts when the *filtered* side turns out
# small). On-disk parquet expands ~2-4x as in-memory rows; 256 MiB on
# disk ~= a 0.5-1 GiB broadcast table, the sane ceiling for executors
# with a few GiB of memory overhead.
_BROADCAST_MAX_BYTES = 256 << 20


def dim_broadcast(df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Broadcast hint for a catalog-dimension join side, size-gated.

    Returns ``broadcast(df)`` iff ``name`` is a known dimension whose
    backing parquet is under ``_BROADCAST_MAX_BYTES``; otherwise the
    input unchanged, deferring the join strategy to AQE. Use for join
    sides *derived from catalog tables*; tiny computed aggregates
    (O(groups) rows) can keep unconditional ``broadcast()`` hints.
    """
    from pyspark.sql.functions import broadcast

    if (
        name in BROADCAST_TABLES
        and _input_bytes(f"{sf_dir}/{name}.parquet") <= _BROADCAST_MAX_BYTES
    ):
        return broadcast(df)
    return df


# Below this input size a fact-table scan is almost certainly a single
# parquet row group → a single Spark partition → every narrow op
# (tokenize, shingle, vector math) runs on ONE core. A round-robin
# repartition of ≤1 GiB costs a sub-second shuffle and unlocks full
# parallelism. At real scale inputs have many row groups/files and
# split naturally, so this never fires (and must not: repartitioning
# 100 TB would be a catastrophic extra shuffle).
_SMALL_INPUT_BYTES = 1 << 30


def _input_bytes(path: str) -> int:
    import os

    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(path)
            for f in files
        )
    try:
        return os.path.getsize(path)
    except OSError:
        return _SMALL_INPUT_BYTES  # unknown (remote FS): leave as-is


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Read one catalog table; parquet scan with declared-schema contract.

    ``parallelize``: spread small single-row-group fact tables across
    the cluster. Opt-in per call site: worth one extra (sub-second)
    shuffle ONLY when the downstream pipeline does heavy per-row work
    (tokenize/shingle, vector math, nested-loop similarity joins).
    Scan-then-aggregate relational queries keep the pristine scan —
    an unconditional repartition costs a stage on every query while
    benefiting only the CPU-bound ones.
    """
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.schema(SCHEMAS[name]).parquet(path)
    if (
        parallelize
        and name not in BROADCAST_TABLES
        and _input_bytes(path) < _SMALL_INPUT_BYTES
    ):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
