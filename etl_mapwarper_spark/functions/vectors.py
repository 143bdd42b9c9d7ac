"""Vector math over ``array<float>`` embedding columns.

All built-in expressions — the dot product runs JVM-side with no
Python round-trip. Elements are cast to double *before* arithmetic so
results are bit-comparable with the DuckDB oracle (which also computes
in double); summation is sequential left-to-right in both engines.

Two expression shapes per kernel, value-identical:

- ``dim=None`` (default): higher-order ``zip_with``/``aggregate`` fold.
  Handles any array length, but HOF lambdas are *interpreted* — every
  element pays a lambda invocation, and ``zip_with`` materializes the
  elementwise product array per row.
- ``dim=k``: the same left-to-right chain unrolled to ``k`` positional
  terms (``lit(0.0) + a[0]*b[0] + a[1]*b[1] + …``) — plain codegen-able
  arithmetic, no lambda machinery, no intermediate array. The addition
  order is IDENTICAL to the fold (``((0.0 + t0) + t1) + …``), so the
  double result is bit-identical whenever the array length equals
  ``dim`` (pinned by tests/test_vector_kernels.py).

``dim`` contract (caller responsibility):
- the arrays really are ``dim`` long (the engine's embedding contract,
  ``_EMB_DIM``); a shorter array NULLs the result (out-of-range getItem)
  where the fold would return a partial sum — never pass ``dim`` for
  variable-length arrays;
- the column arguments are cheap references (attributes, literals,
  lambda variables) — an inline derived expression (e.g. a
  ``transform(...)``) would be RE-EVALUATED by each of the ``dim``
  getItems, the O(n²) HOF trap documented in functions/text.py;
- keep the unrolled term count per projection well under janino's
  method-size limit — ~1000 terms in one projection silently drops the
  stage to interpreted mode (measured on the PQ ADC expression, see
  operators/similarity.py::_pq_d2, which stays a fold for exactly that
  reason);
- and beware the JIT cliff BELOW the janino limit: an unrolled
  expression whose whole-stage-codegen method compiles but exceeds
  HotSpot's per-method JIT size runs in the bytecode interpreter —
  measured r12 on dd_embedding_neardup's pair stage, where a 64-term
  unrolled dot WSCG-compiled and ran 5.9× SLOWER than the fold (7.4 s
  vs 1.26 s); per-site A/B is mandatory before opting into ``dim=``.
  The current winning split (dd_embedding_neardup): unrolled kernels
  in small per-row projections (the O(n) norm precompute), the fold
  for the dot inside the quadratic pair stage.

At 100 TB scale the brute-force path is a crossed join; see
operators/similarity.py for the LSH-bucketed variant that bounds the
candidate set per probe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Engine-wide embedding dimensionality contract (generator schema:
# embeddings.embedding is a fixed 64-float list at every SF).
EMB_DIM = 64


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    if dim is not None:
        s: Column = F.lit(0.0)
        for i in range(dim):
            s = s + a[i] * b[i]
        return s
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sql(col_name: str, dim: int) -> Column:
    """Unrolled ``l2_norm`` over a NAMED array column, built as one
    parsed SQL string instead of ``dim`` py4j Column ops.

    The Column-algebra unrolled form costs ~192 py4j round-trips
    (~0.3-0.5 s of driver-side DataFrame *construction* per call,
    measured r12 on dd_embedding_neardup, whose tier2 clock times
    construction+action together); ``F.expr`` ships ONE string and
    parses it JVM-side. The parsed tree is the identical left-
    associative ``((0.0 + t0) + t1) + …`` chain of
    ``GetArrayItem``/``Multiply``/``Add`` nodes, so plan and values
    are unchanged (bit-identity vs the fold pinned in
    tests/test_vector_kernels.py). ``col_name`` must be a plain
    column/attribute name — never an expression (the O(n²)
    re-evaluation trap in the module docstring).
    """
    terms = " + ".join(f"{col_name}[{i}] * {col_name}[{i}]" for i in range(dim))
    return F.sqrt(F.expr(f"CAST(0.0 AS DOUBLE) + {terms}"))


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        s: Column = F.lit(0.0)
        for i in range(dim):
            s = s + a[i] * a[i]
        return F.sqrt(s)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    """cosine = dot(a,b) / (|a| * |b|); inputs must be array<double>."""
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def sq_dist(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-order squared L2 distance Σ (a−b)²."""
    if dim is not None:
        s: Column = F.lit(0.0)
        for i in range(dim):
            d = a[i] - b[i]
            s = s + d * d
        return s
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
