"""Small-file compaction: contents preserved, file counts reduced,
no shuffle in the default (coalesce) path."""

from __future__ import annotations

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_mapwarper_spark.sources.compaction import (  # noqa: E402
    compact,
    compact_partitioned,
    plan_file_count,
)
from tests.conftest import SF_DIR  # noqa: E402


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    ]


def test_plan_file_count_rounds_up():
    assert plan_file_count(0) == 1
    assert plan_file_count(1) == 1
    assert plan_file_count(128 * 1024 * 1024) == 1
    assert plan_file_count(128 * 1024 * 1024 + 1) == 2
    assert plan_file_count(1000, target_bytes=100) == 10


def test_compact_flat_layout(spark):
    src = tempfile.mkdtemp(prefix="compact_src_")
    dst = tempfile.mkdtemp(prefix="compact_dst_") + "/out"
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    # simulate micro-batch accretion: 64 tiny files
    orders.repartition(64).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 64

    n = compact(spark, src, dst)
    assert n == 1  # sf test data is far below one target file
    assert len(_parquet_files(dst)) == 1

    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert after.count() == before.count()
    assert sorted(after.columns) == sorted(before.columns)
    assert before.exceptAll(after).count() == 0


def test_compact_coalesce_path_has_no_shuffle(spark):
    src = tempfile.mkdtemp(prefix="compact_ns_")
    spark.read.parquet(f"{SF_DIR}/nation.parquet").repartition(8).write.mode(
        "overwrite"
    ).parquet(src)
    df = spark.read.parquet(src).coalesce(1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "default compaction path must not shuffle"


def test_compact_partitioned_per_partition_counts(spark):
    src = tempfile.mkdtemp(prefix="compact_part_src_")
    dst = tempfile.mkdtemp(prefix="compact_part_dst_") + "/out"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(16).write.mode("overwrite").partitionBy("lang").parquet(src)
    # every lang partition now holds up to 16 tiny files
    langs = [
        d for d in os.listdir(src) if d.startswith("lang=")
    ]
    assert len(langs) >= 2

    plans = compact_partitioned(spark, src, dst, ["lang"])
    assert sorted(plans) == sorted(langs)
    assert all(n == 1 for n in plans.values())
    for lang_dir in langs:
        assert len(_parquet_files(os.path.join(dst, lang_dir))) == 1

    before = docs
    after = spark.read.parquet(dst)
    assert after.count() == before.count()
    assert before.select("doc_id").exceptAll(
        after.select("doc_id")
    ).count() == 0


def test_dynamic_partition_overwrite_backfills_one_partition(spark):
    """Idempotent partition-level backfill: with dynamic overwrite
    mode, rewriting ONE partition's data must replace only that
    directory and leave every other partition byte-untouched — the
    op a 100 TB pipeline runs nightly to correct a late-arriving day
    without rewriting the table."""
    import tempfile

    from pyspark.sql import functions as F

    from etl_mapwarper_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    path = tempfile.mkdtemp(prefix="dpo_") + "/events"
    ev = load_table(spark, SF_DIR, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(path)
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # backfill: the 'click' partition is corrected to a halved set
        fixed = ev.filter(
            (F.col("event_type") == "click") & (F.col("event_id") % 2 == 0)
        )
        fixed.write.partitionBy("event_type").mode("overwrite").parquet(path)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", old_mode
        )
    after = {
        r.event_type: r.n
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert after["click"] == fixed.count()
    for k, v in before.items():
        if k != "click":
            assert after[k] == v, f"partition {k} must be untouched"
