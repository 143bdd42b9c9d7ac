"""Unrolled (dim=k) vector kernels must be bit-identical to the HOF
fold form — the r12 optimization contract (functions/vectors.py): the
unrolled chain keeps the exact left-to-right addition order, so on any
array of the declared length the double results are equal bit-for-bit,
including NULL propagation from null elements or null arrays.
"""

from __future__ import annotations

import math
import random
import struct

from pyspark.sql import functions as F

from etl_mapwarper_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    sq_dist,
)


def _bits(x):
    if x is None:
        return None
    return struct.pack("d", x)


def test_vector_kernel_unroll_parity(spark):
    rng = random.Random(1234)
    dim = 64
    rows = []
    for _ in range(200):
        a = [rng.uniform(-3, 3) for _ in range(dim)]
        b = [rng.uniform(-3, 3) for _ in range(dim)]
        rows.append((a, b))
    # adversarial magnitudes: mixed scales exercise non-associativity
    rows.append(
        (
            [10.0 ** ((i % 17) - 8) for i in range(dim)],
            [(-10.0) ** ((i % 13) - 6) for i in range(dim)],
        )
    )
    # null element and null array must NULL the result in both forms
    null_elem = [1.0] * dim
    df_rows = [(a, b) for a, b in rows]
    df = spark.createDataFrame(
        df_rows, "a array<double>, b array<double>"
    )
    out = df.select(
        dot(F.col("a"), F.col("b")).alias("dot_f"),
        dot(F.col("a"), F.col("b"), dim).alias("dot_u"),
        l2_norm(F.col("a")).alias("nrm_f"),
        l2_norm(F.col("a"), dim).alias("nrm_u"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos_f"),
        cosine_similarity(F.col("a"), F.col("b"), dim).alias("cos_u"),
        sq_dist(F.col("a"), F.col("b")).alias("sqd_f"),
        sq_dist(F.col("a"), F.col("b"), dim).alias("sqd_u"),
    ).collect()
    for r in out:
        assert _bits(r.dot_f) == _bits(r.dot_u)
        assert _bits(r.nrm_f) == _bits(r.nrm_u)
        assert _bits(r.cos_f) == _bits(r.cos_u)
        assert _bits(r.sqd_f) == _bits(r.sqd_u)
        assert r.dot_f is not None and math.isfinite(r.dot_f)

    nulls = spark.createDataFrame(
        [(null_elem[:-1] + [None], null_elem), (None, null_elem)],
        "a array<double>, b array<double>",
    )
    nout = nulls.select(
        dot(F.col("a"), F.col("b"), dim).alias("dot_u"),
        dot(F.col("a"), F.col("b")).alias("dot_f"),
    ).collect()
    for r in nout:
        assert r.dot_u is None
        assert r.dot_f is None


def test_precomputed_norm_cosine_bit_identity(spark):
    """dd_embedding_neardup's r12 shape — norms computed in a projection
    BEFORE the pair stage, cosine = dot/(nrm_a*nrm_b) — must be
    bit-identical to the inline cosine_similarity form (same ops, same
    order; only the evaluation site of the per-side sqrt moves)."""
    rng = random.Random(4321)
    dim = 64
    rows = [
        (
            [rng.uniform(-3, 3) for _ in range(dim)],
            [rng.uniform(-3, 3) for _ in range(dim)],
        )
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    pre = df.withColumn("na", l2_norm(F.col("a"), dim)).withColumn(
        "nb", l2_norm(F.col("b"), dim)
    )
    out = pre.select(
        (
            dot(F.col("a"), F.col("b"), dim)
            / (F.col("na") * F.col("nb"))
        ).alias("cos_pre"),
        cosine_similarity(F.col("a"), F.col("b"), dim).alias("cos_inl"),
    ).collect()
    for r in out:
        assert _bits(r.cos_pre) == _bits(r.cos_inl)


def test_l2_norm_sql_bit_identity(spark):
    """l2_norm_sql (one parsed SQL string) must build the identical
    unrolled tree as the py4j Column form — bit-identical results."""
    rng = random.Random(99)
    rows = [([rng.uniform(-3, 3) for _ in range(64)],) for _ in range(100)]
    df = spark.createDataFrame(rows, "v array<double>")
    from etl_mapwarper_spark.functions.vectors import l2_norm_sql

    out = df.select(
        l2_norm(F.col("v"), 64).alias("py"),
        l2_norm_sql("v", 64).alias("sq"),
        l2_norm(F.col("v")).alias("fold"),
    ).collect()
    for r in out:
        assert _bits(r.py) == _bits(r.sq)
        assert _bits(r.fold) == _bits(r.sq)
