"""Pins for the r13 plan rewrites: each optimization replaced a
multi-pass shape with a single-pass one, and these tests hold the
replaced shape and the shipped shape to exact equality on real data —
the property the oracle parity rests on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_admission_single_join_equals_anti_semi(spark):
    """dd_incremental_dedup (r13) computes admitted/rejected per source
    in ONE left join against the distinct landed set instead of
    separate anti and semi probes stitched with a full-outer join.
    Because the landed side is distinct, the left join preserves the
    batch row count exactly and the match flag partitions it into the
    anti rows (no match) and the semi rows (match), so every
    (source, n_admitted, n_rejected) must be identical."""
    from etl_mapwarper_spark.operators.dedup import (
        _INCR_SPLIT,
        _admission_report,
        doc_fingerprint,
    )
    from etl_mapwarper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", doc_fingerprint(F.col("text")).alias("fp")
    )
    landed = (
        docs.filter(F.col("doc_id") < _INCR_SPLIT).select("fp").distinct()
    )
    batch = docs.filter(F.col("doc_id") >= _INCR_SPLIT)

    admitted = batch.join(landed, "fp", "left_anti")
    rejected = batch.join(landed, "fp", "left_semi")
    old = (
        admitted.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_admitted"))
        .join(
            rejected.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_rejected")
            ),
            "source",
            "full_outer",
        )
        .select(
            "source",
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
            F.coalesce("n_rejected", F.lit(0)).alias("n_rejected"),
        )
    )
    new = _admission_report(landed, batch)

    a = {r.source: (r.n_admitted, r.n_rejected) for r in old.collect()}
    b = {r.source: (r.n_admitted, r.n_rejected) for r in new.collect()}
    assert a == b, "single-join admission must match anti+semi report"
    # row-count preservation: the left join may not multiply batch rows
    n_batch = batch.count()
    n_flagged = batch.join(
        landed.select("fp", F.lit(True).alias("_seen")), "fp", "left"
    ).count()
    assert n_batch == n_flagged, "distinct landed side must not fan out"
