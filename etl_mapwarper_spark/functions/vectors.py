"""Vector math over ``array<float>`` embedding columns.

All built-in higher-order functions (zip_with / aggregate) — the dot
product runs JVM-side with no Python round-trip. Elements are cast to
double *before* arithmetic so results are bit-comparable with the
DuckDB oracle (which also computes in double); summation is sequential
left-to-right in both engines.

At 100 TB scale the brute-force path is a crossed join; see
operators/similarity.py for the LSH-bucketed variant that bounds the
candidate set per probe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cosine = dot(a,b) / (|a| * |b|); inputs must be array<double>."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
