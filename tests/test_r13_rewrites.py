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


def test_bloom_confirm_inner_equals_semi(spark):
    """dd_bloom_incremental (r13) confirms maybes with an inner join
    against the DISTINCT landed set instead of a left_semi against the
    raw one (Catalyst pushes semi joins below the Bloom probe — see
    _bloom_route). On a distinct build side the two are row-identical,
    and the union-aggregated report must match the join-stitched one."""
    from etl_mapwarper_spark.operators.dedup import (
        _INCR_SPLIT,
        _bloom_route,
        doc_fingerprint,
    )
    from etl_mapwarper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", doc_fingerprint(F.col("text")).alias("fp")
    )
    landed = docs.filter(F.col("doc_id") < _INCR_SPLIT).select("fp")
    batch = docs.filter(F.col("doc_id") >= _INCR_SPLIT)

    new = _bloom_route(landed, batch, landed.distinct())

    # the replaced r6-r12 report: semi-join confirm + two groupBys
    # stitched with a left join
    rejected = (
        batch.join(landed, "fp", "left_semi")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_rejected"))
    )
    totals = batch.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch")
    )
    old = totals.join(rejected, "source", "left").select(
        "source",
        (F.col("n_batch") - F.coalesce("n_rejected", F.lit(0))).alias(
            "n_admitted"
        ),
        F.coalesce("n_rejected", F.lit(0)).alias("n_rejected"),
        "n_batch",
    )
    a = sorted(map(tuple, old.collect()))
    b = sorted(map(tuple, new.collect()))
    assert a == b, "union-aggregated Bloom report must match join form"


def test_bloom_confirm_sits_above_probe(spark):
    """The exact confirm join must consume the Bloom probe's output
    (prune first, confirm the survivors) — the property Catalyst's
    PushDownLeftSemiAntiJoin silently destroyed in the r6-r12 semi
    shape by running the confirm on every batch row."""
    import re

    from tests.test_plans import plan_of

    for name in ("dd_bloom_incremental", "dd_bloom_incremental_fp"):
        plan = plan_of(spark, name)
        tree = plan.split("\n\n")[0]
        m_confirm = re.search(r"BroadcastHashJoin Inner", tree)
        m_probe = re.search(r"BroadcastNestedLoopJoin Cross", tree)
        assert m_confirm and m_probe, f"{name}: expected joins missing"
        assert m_confirm.start() < m_probe.start(), (
            f"{name}: confirm join was pushed below the Bloom probe"
        )


def _norm_plan(df) -> str:
    """Formatted plan with expression ids, plan ids, lambda-variable
    counters and cache-relation dumps normalized away."""
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"x_\d+", "x_N", plan)
    plan = re.sub(r"_common_expr_\d+", "_common_expr_N", plan)
    plan = re.sub(r"InMemoryRelation.*", "IMR", plan)
    plan = re.sub(r"InMemoryTableScan.*", "IMTS", plan)
    return plan


def test_sql_batched_constructions_plan_identical(spark):
    """dd_ngram_jaccard / dd_minhash_lsh (r13) build their expression
    trees from parsed SQL strings (the l2_norm_sql pattern) instead of
    py4j Column algebra. The physical plans must stay identical to the
    Column-built forms — this is a pure construction-cost change."""
    from etl_mapwarper_spark.functions.text import (
        hashed_word_shingles,
        tokens,
        word_shingles,
    )
    from etl_mapwarper_spark.operators import dedup as dd
    from etl_mapwarper_spark.operators.dedup import (
        _PP_DEN,
        _PP_NUM,
        JACCARD_THRESHOLD,
        N_BANDS,
        N_SEEDS,
    )
    from etl_mapwarper_spark.sources.tables import load_table

    # --- dd_ngram_jaccard: replaced Column-form, rebuilt verbatim ---
    docs = load_table(spark, SF_DIR, "documents", parallelize=True)
    arrs = docs.select(
        "doc_id",
        F.array_sort(hashed_word_shingles(tokens(F.col("text")), 3)).alias(
            "hs"
        ),
    ).select("doc_id", "hs", F.size("hs").cast("long").alias("n"))
    arrs = arrs.persist()
    pfx = arrs.select(
        "doc_id",
        "n",
        F.posexplode(
            F.slice(
                "hs",
                F.lit(1),
                (
                    F.col("n")
                    - F.expr(f"({_PP_NUM} * n + {_PP_DEN - 1}) div {_PP_DEN}")
                    + F.lit(1)
                ).cast("int"),
            )
        ).alias("p", "h"),
    )
    cand = (
        pfx.alias("a")
        .join(
            pfx.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") * _PP_DEN >= F.col("b.n") * _PP_NUM)
            & (F.col("b.n") * _PP_DEN >= F.col("a.n") * _PP_NUM)
            & (
                (
                    F.lit(1)
                    + F.least(
                        F.col("a.n") - F.col("a.p"),
                        F.col("b.n") - F.col("b.p"),
                    )
                )
                * F.lit(_PP_DEN + _PP_NUM)
                >= (F.col("a.n") + F.col("b.n")) * F.lit(_PP_NUM)
            ),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )
    a1 = arrs.select(
        F.col("doc_id").alias("d1"),
        F.col("hs").alias("hs1"),
        F.col("n").alias("n1"),
    )
    a2 = arrs.select(
        F.col("doc_id").alias("d2"),
        F.col("hs").alias("hs2"),
        F.col("n").alias("n2"),
    )
    old_ng = (
        cand.join(a1, "d1")
        .join(a2, "d2")
        .withColumn("c", F.size(F.array_intersect("hs1", "hs2")))
        .withColumn(
            "jacc",
            F.round(F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")), 4),
        )
        .filter(F.col("jacc") >= JACCARD_THRESHOLD)
        .select("d1", "d2", "jacc")
    )
    new_ng = dd.dd_ngram_jaccard(spark, SF_DIR)
    assert _norm_plan(old_ng) == _norm_plan(new_ng), (
        "ngram SQL-batched construction changed the physical plan"
    )
    arrs.unpersist()

    # --- dd_minhash_lsh: replaced Column-form signature + bands ---
    # (including the replaced Column-form _shingles)
    sh = load_table(spark, SF_DIR, "documents", parallelize=True).select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), 3)).alias("shingle"),
    )
    per_band = N_SEEDS // N_BANDS
    mh_cols = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(
            f"mh{s}"
        )
        for s in range(N_SEEDS)
    ]
    per_doc = (
        sh.groupBy("doc_id")
        .agg(*mh_cols, F.collect_set("shingle").alias("shset"))
        .persist()
    )
    bands = per_doc.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh{s}")
                                    for s in range(
                                        b * per_band, (b + 1) * per_band
                                    )
                                ],
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    ba, bb = bands.alias("ba"), bands.alias("bb")
    candidates = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.band_key") == F.col("bb.band_key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("d1"), F.col("bb.doc_id").alias("d2")
        )
        .distinct()
    )
    ds1 = per_doc.select(
        F.col("doc_id").alias("d1"), F.col("shset").alias("set1")
    )
    ds2 = per_doc.select(
        F.col("doc_id").alias("d2"), F.col("shset").alias("set2")
    )
    c = F.size(F.array_intersect(F.col("set1"), F.col("set2")))
    jacc = F.round(c / (F.size("set1") + F.size("set2") - c), 4)
    old_mh = (
        candidates.join(ds1, "d1")
        .join(ds2, "d2")
        .withColumn("jacc", jacc)
        .filter(F.col("jacc") >= JACCARD_THRESHOLD)
        .select("d1", "d2", "jacc")
    )
    new_mh = dd.dd_minhash_lsh(spark, SF_DIR)
    assert _norm_plan(old_mh) == _norm_plan(new_mh), (
        "minhash SQL-batched construction changed the physical plan"
    )

    # --- dd_lsh_tuning_report: replaced Column-form report glue ---
    exact = old_ng.select("d1", "d2")
    approx = old_mh.select(
        F.col("d1").alias("a1"), F.col("d2").alias("a2")
    )
    hit = exact.join(
        F.broadcast(approx),
        (F.col("d1") == F.col("a1")) & (F.col("d2") == F.col("a2")),
        "left",
    ).agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_if(F.col("a1").isNotNull()).alias("n_hit"),
    )
    n_approx = approx.agg(F.count(F.lit(1)).alias("n_approx"))
    old_rep = hit.crossJoin(F.broadcast(n_approx)).select(
        "n_exact",
        "n_approx",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_exact"), 4).alias("recall"),
        F.round(F.col("n_hit") / F.col("n_approx"), 4).alias("precision"),
    )
    new_rep = dd.dd_lsh_tuning_report(spark, SF_DIR)
    assert _norm_plan(old_rep) == _norm_plan(new_rep), (
        "report SQL-batched construction changed the physical plan"
    )
    per_doc.unpersist()


def test_synthetic_media_substring_payload_byte_identical(spark):
    """synthetic_media (r13) builds the (m + i) % 256 payload as one
    substring of a repeated 0..255 binary literal instead of a per-byte
    hex-string transform. Every payload byte must be identical to the
    replaced form for both media kinds."""
    from etl_mapwarper_spark.operators.multimodal import (
        FRAMES,
        H,
        W,
        synthetic_media,
    )
    from etl_mapwarper_spark.sources.tables import load_table

    for kind in ("image", "video"):
        n_bytes = W * H * (FRAMES if kind == "video" else 1)
        m = F.col("doc_id")
        payload_hex = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bytes - 1)),
                lambda i: F.lpad(F.lower(F.hex((m + i) % 256)), 2, "0"),
            ),
            "",
        )
        old = (
            load_table(spark, SF_DIR, "documents")
            .filter(m < 200)
            .select(
                m.alias("media_id"), F.unhex(payload_hex).alias("payload")
            )
        )
        new = synthetic_media(spark, SF_DIR, kind=kind).select(
            "media_id", "payload"
        )
        a = {r.media_id: bytes(r.payload) for r in old.collect()}
        b = {r.media_id: bytes(r.payload) for r in new.collect()}
        assert a == b, f"{kind}: substring payload differs from hex form"
