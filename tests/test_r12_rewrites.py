"""Pins for the r12 plan rewrites: each optimization replaced an
instance-grain computation with a type-grain (or hash-direct) one, and
these tests hold the replaced shape and the shipped shape to exact
equality on real data — the property the oracle parity rests on.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_cms_sketch_from_types_equals_instance_sketch(spark):
    """tx_heavy_hitters_cms (r12) derives the sketch from the exact
    per-TYPE counts instead of re-exploding the corpus per instance.
    Every (row, bucket) cell must hold the identical integer."""
    from etl_mapwarper_spark.functions.text import tokens
    from etl_mapwarper_spark.operators.textops import _CMS_D, _cms_bucket
    from etl_mapwarper_spark.sources.tables import load_table

    toks = load_table(spark, SF_DIR, "documents").select(
        F.explode(tokens(F.col("text"))).alias("term")
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cms_bucket(F.col("term"), i).alias("b")
            )
            for i in range(_CMS_D)
        ]
    )
    by_instance = (
        toks.select(F.explode(arr).alias("ib"))
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    by_type = (
        exact.select("n", F.explode(arr).alias("ib"))
        .groupBy(F.col("ib.i").alias("i"), F.col("ib.b").alias("b"))
        .agg(F.sum("n").alias("c"))
    )
    a = {(r.i, r.b): r.c for r in by_instance.collect()}
    b = {(r.i, r.b): r.c for r in by_type.collect()}
    assert a == b, "type-derived sketch cells must match instance cells"


def test_bigram_pair_hash_groups_match_string_groups(spark):
    """_bigram_instances (r12) keys bigrams with the multi-column
    xxhash64(w1, w2) instead of hashing the concat_ws string. The
    induced per-doc grouping (instance count per distinct pair key)
    must be identical — tokens contain no separator, so both keyings
    partition pairs the same way."""
    from etl_mapwarper_spark.functions.text import tokens
    from etl_mapwarper_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    t = tokens(F.col("text"))
    length = F.greatest(F.size(t) - 1, F.lit(0))
    pairs = F.arrays_zip(F.slice(t, 1, length), F.slice(t, 2, length))
    inst = docs.select("doc_id", F.explode(pairs).alias("s")).select(
        "doc_id",
        F.xxhash64(F.col("s.0"), F.col("s.1")).alias("ph"),
        F.xxhash64(F.concat_ws(" ", F.col("s.0"), F.col("s.1"))).alias("sh"),
    )
    # distinct-pair counts per doc agree under both keyings, and the
    # pair-hash -> string-hash mapping is 1:1 (no extra collisions
    # introduced on this corpus)
    per_doc = inst.groupBy("doc_id").agg(
        F.countDistinct("ph").alias("np"),
        F.countDistinct("sh").alias("ns"),
    )
    bad = per_doc.filter(F.col("np") != F.col("ns")).count()
    assert bad == 0
    fanout = (
        inst.groupBy("ph")
        .agg(F.countDistinct("sh").alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    assert fanout == 0, "pair-hash key must map 1:1 to string key"


def test_model_pass_unigram_key_is_null_skipped_pair_hash(spark):
    """tx_bigram_logprob's model pass relies on xxhash64 skipping NULL
    columns: xxhash64(w1, NULL) must equal xxhash64(w1) so unigram and
    bigram rows share one key expression."""
    r = spark.range(1).select(
        F.xxhash64(F.lit("tok")).alias("a"),
        F.xxhash64(F.lit("tok"), F.lit(None).cast("string")).alias("b"),
    ).collect()[0]
    assert r.a == r.b
