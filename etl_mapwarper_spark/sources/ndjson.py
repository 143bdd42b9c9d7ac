"""NDJSON source/sink + tagged-union record helpers.

Reference capabilities re-expressed (citations into
/root/reference/mapwarper.js):

- NDJSON source: read files, concat, split lines, drop blanks,
  JSON.parse (:423-428) → ``spark.read.schema(s).json(paths)`` — the
  multi-path read IS the union-of-sources (:423-425).
- NDJSON sink: JSON.stringify + intersperse('\n') + write (:152-153,
  :157-166, :205-211) → ``df.write.json`` for partitioned output, or
  ``to_ndjson_lines`` when the exact one-line-per-record text format
  matters at an export boundary.
- Tagged-union records: every line is ``{type, data}`` (:160-163,
  :205-208) — ``wrap_tagged`` / ``split_by_type`` convert between one
  mixed stream and the per-variant DataFrames Spark prefers.

Scale note: NDJSON is the *boundary* format only. Inter-stage
checkpoints must be Parquet (columnar, splittable, predicate-pushdown);
a 100 TB NDJSON intermediate would forfeit column pruning and pay full
JSON parse per pass.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_ndjson(
    spark: SparkSession, paths: Sequence[str] | str, schema: T.StructType
) -> DataFrame:
    """Schema-first NDJSON read; never inferSchema (a full extra pass)."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.schema(schema).json(list(paths))


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def to_ndjson_lines(df: DataFrame) -> DataFrame:
    """One STRING column ``line`` holding each record as compact JSON.

    Matches the reference's stringify+newline sink byte format
    (:164-165); write with ``.write.text(path)``. Null fields are
    dropped, like JSON.stringify on undefined.
    """
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("line")
    )


def wrap_tagged(df: DataFrame, record_type: str) -> DataFrame:
    """``{cols…}`` → ``{type, data:{cols…}}`` (reference :160-163, :205-208)."""
    return df.select(
        F.lit(record_type).alias("type"),
        F.struct(*[F.col(c) for c in df.columns]).alias("data"),
    )


def split_by_type(
    tagged: DataFrame, record_type: str, schema: Optional[T.StructType] = None
) -> DataFrame:
    """Route one variant out of a mixed tagged stream (dispatch :417-421).

    The idiomatic replacement for per-row dispatch is a filtered branch
    per variant off one (cached) source — each branch is a narrow
    filter+project Catalyst can prune independently.
    """
    out = tagged.filter(F.col("type") == record_type).select("data.*")
    return out


def union_sources(*dfs: DataFrame) -> DataFrame:
    """Union by name with missing-column tolerance (reference :423-425)."""
    first, *rest = dfs
    out = first
    for df in rest:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
