"""Property tests for deterministic hash sampling.

The whole point of ``hash_bucket`` is reproducibility: the same key
maps to the same bucket on any engine, any partitioning, any run. The
properties pin (1) agreement with a pure-Python model of the
multiplicative hash, (2) range, and (3) invariance to repartitioning.
"""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_mapwarper_spark.operators.sampling import (  # noqa: E402
    _KNUTH,
    _M32,
    hash_bucket,
)


def py_bucket(key: int, n_buckets: int = 100) -> int:
    return ((key * _KNUTH) % _M32) % n_buckets


KEYS = st.lists(
    st.integers(min_value=0, max_value=2**40),
    min_size=1,
    max_size=50,
    unique=True,
)


@settings(max_examples=15, deadline=None)
@given(keys=KEYS)
def test_bucket_matches_python_model(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "key bigint")
    got = {
        r.key: r.b
        for r in df.select(
            "key", hash_bucket(F.col("key")).alias("b")
        ).collect()
    }
    assert got == {k: py_bucket(k) for k in keys}


def test_bucket_range_and_partitioning_invariance(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("key"))
    b1 = df.select("key", hash_bucket(F.col("key")).alias("b"))
    assert b1.filter((F.col("b") < 0) | (F.col("b") >= 100)).count() == 0
    b2 = df.repartition(17, "key").select(
        "key", hash_bucket(F.col("key")).alias("b")
    )
    assert b1.exceptAll(b2).count() == 0

    # buckets are reasonably uniform: each of 100 buckets sees 5000/100
    # = 50 expected; no bucket should be empty or >3x expected
    counts = [
        r.n
        for r in b1.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert len(counts) == 100
    assert min(counts) > 0
    assert max(counts) < 150


# ---------------------------------------------------------------------------
# exact_ntile ≡ F.ntile: the distributed range-bucketed implementation
# must be bit-identical to Spark's single-reducer window ntile on
# arbitrary value distributions (duplicates, negatives, tiny n < k,
# skewed ties) for arbitrary k.
# ---------------------------------------------------------------------------

_NTILE_VALS = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=120
)


@settings(max_examples=12, deadline=None)
@given(vals=_NTILE_VALS, k=st.integers(min_value=1, max_value=12))
def test_exact_ntile_matches_builtin(spark, vals, k):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_mapwarper_spark.operators.relational_ext import exact_ntile

    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(vals)], "val double, id long"
    )
    got = {
        (r.id): r.tile
        for r in exact_ntile(df, "val", "id", k, n_buckets=4).collect()
    }
    w = Window.orderBy("val", "id")
    want = {
        (r.id): r.tile
        for r in df.withColumn("tile", F.ntile(k).over(w)).collect()
    }
    assert got == want


def test_global_row_ids_invariant_to_bucket_count(spark, monkeypatch):
    """ds_global_row_ids' output must be a pure function of the data —
    the approx-quantile cut list only moves the parallelism boundary.
    Run with 1, 4, and 32 range buckets and require identical
    (doc_id → global_id) maps, plus the permutation property (ids are
    exactly 0..n-1, monotone in doc_id)."""
    from etl_mapwarper_spark.operators import sampling as S
    from tests.conftest import SF_DIR

    results = []
    for nb in (1, 4, 32):
        monkeypatch.setattr(S, "_ROWID_BUCKETS", nb)
        rows = sorted(
            (r.doc_id, r.global_id)
            for r in S.ds_global_row_ids(spark, SF_DIR).collect()
        )
        results.append(rows)
    assert results[0] == results[1] == results[2]
    ids = [gid for _, gid in results[0]]
    assert ids == list(range(len(ids)))  # contiguous, monotone in doc_id


def test_split_manifest_partitions_the_corpus(spark, tmp_path):
    """The three manifest rows must exactly partition the corpus (doc
    counts and byte totals sum to the whole table's), and the
    checksum must actually DETECT drift: changing one document's text
    moves exactly its split's content_checksum and no other's."""
    import pyspark.sql.functions as F

    from etl_mapwarper_spark.operators.sampling import ds_split_manifest
    from etl_mapwarper_spark.sources.tables import TABLE_NAMES, load_table
    from tests.conftest import SF_DIR

    man = {r.split: r for r in ds_split_manifest(spark, SF_DIR).collect()}
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
    ).first()
    assert sum(r.n_docs for r in man.values()) == total.n
    assert sum(r.total_chars for r in man.values()) == total.c
    assert set(man) <= {"train", "valid", "test"}

    # Drift detection: corrupt ONE document's text in a copy of the
    # corpus and require exactly that split's checksum to move.
    drift_dir = str(tmp_path / "drift_sf")
    for name in TABLE_NAMES:
        if name == "documents":
            load_table(spark, SF_DIR, name).withColumn(
                "text",
                F.when(
                    F.col("doc_id") == 0, F.concat(F.col("text"), F.lit(" z"))
                ).otherwise(F.col("text")),
            ).write.parquet(f"{drift_dir}/{name}.parquet")
        else:
            load_table(spark, SF_DIR, name).write.parquet(
                f"{drift_dir}/{name}.parquet"
            )
    from etl_mapwarper_spark.operators.sampling import split_label

    hit_split = (
        docs.filter(F.col("doc_id") == 0)
        .select(split_label(F.col("doc_id")).alias("s"))
        .first()
        .s
    )
    man2 = {
        r.split: r for r in ds_split_manifest(spark, drift_dir).collect()
    }
    for split in man:
        if split == hit_split:
            assert man2[split].content_checksum != man[split].content_checksum
        else:
            assert man2[split].content_checksum == man[split].content_checksum


def test_global_row_ids_beyond_reservoir(spark, tmp_path):
    """The bucket-count invariance test above runs below the range
    exchange's reservoir size, where sampling degenerates to a full
    scan and bucket boundaries are trivially identical across
    re-executions. 20k rows in ONE scan partition exceeds the
    reservoir (3 · sampleSizePerPartition(100) · 32 buckets / 1 input
    partition = 9600), so boundaries genuinely come from reservoir
    sampling — and two independently-instantiated range exchanges are
    NOT guaranteed to sample alike (RangePartitioner seeds by rdd.id).
    The shared-InMemoryRelation plan must still produce an exact
    0..n−1 permutation monotone in doc_id.

    This test has TEETH: the unpersisted r6 shape (two range
    exchanges; ReusedExchange can't unify them because the counts
    side prunes `source` and the subtrees never canonicalize equal)
    was measured producing 194,121 wrong ids out of 200,000 on
    exactly this corpus, while two standalone range exchanges over
    the same data disagreed on the count of every one of the 32
    buckets."""
    import pyspark.sql.functions as F

    from etl_mapwarper_spark.operators.sampling import ds_global_row_ids

    n = 200000
    sfdir = str(tmp_path / "sf")
    (
        spark.range(n)
        .select(
            # non-sequential unique doc_ids: id → id·7919 mod 1048573
            # is injective (prime modulus > n)
            (F.col("id") * 7919 % 1048573).alias("doc_id"),
            F.lit("stress").alias("source"),
        )
        .coalesce(1)
        .write.parquet(f"{sfdir}/documents.parquet")
    )
    rows = sorted(
        (r.doc_id, r.global_id)
        for r in ds_global_row_ids(spark, sfdir).collect()
    )
    assert [g for _, g in rows] == list(range(n))
