"""Geospatial functions for the mapwarper transform.

- ``geodesic_area``: spherical polygon area matching the reference's
  ``turf.area`` v3 (which delegates to the published
  @mapbox/geojson-area algorithm — Chamberlain & Duquette spherical
  excess on an R=6378137 sphere; reference mapwarper.js:5-6,364,
  package-lock.json:7-27). Implemented as a PURE column expression
  (higher-order aggregate over the ring), so it runs JVM-side inside
  codegen with no Python round-trip — at 100 TB this is a narrow map,
  not a UDF stage.
- ``coords_all_valid``: lon/lat bounds check over every coordinate
  (mapwarper.js:260-277) — pure ``forall`` over the flattened rings.
- ``self_intersection_count``: segment-crossing count (the
  reference's ``turf.kinks``, mapwarper.js:250-257). O(n²) per ring —
  a vectorized pandas_udf (Arrow-batched). Counts strict proper
  crossings of non-adjacent segments; the reference counts each
  detected intersection feature, which can differ on degenerate
  (collinear/touching) rings — rule firing (count > 0) is equivalent
  for simple crossing cases.

Geometry column type: STRUCT<type: STRING,
coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>> (GeoJSON Polygon).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

EARTH_RADIUS_M = 6378137.0


def _ring_area(ring: Column) -> Column:
    """Signed spherical area of one ring (array<array<double>>).

    Mirrors geojson-area's ringArea: for each i, with modular indices
    lower=i, middle=i+1, upper=i+2,
    term = (rad(lon_upper) - rad(lon_lower)) * sin(rad(lat_middle));
    area = Σ term * R² / 2. Rings with ≤ 2 points have area 0.
    """
    n = F.size(ring)

    def lon(j: Column) -> Column:
        return F.element_at(F.element_at(ring, (j % n + 1).cast("int")), 1)

    def lat(j: Column) -> Column:
        return F.element_at(F.element_at(ring, (j % n + 1).cast("int")), 2)

    term = lambda i: (  # noqa: E731
        (F.radians(lon(i + 2)) - F.radians(lon(i)))
        * F.sin(F.radians(lat(i + 1)))
    )
    total = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.lit(0.0),
        lambda acc, i: acc + term(i),
    )
    return F.when(n > 2, total * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0).otherwise(
        F.lit(0.0)
    )


def geodesic_area(coordinates: Column) -> Column:
    """Polygon area in m²: |outer ring| − Σ |holes| (geojson-area
    polygonArea semantics). ``coordinates``: array<array<array<double>>>.

    Structured as ONE aggregate over ring indices (sign flips for
    holes) rather than slice()+aggregate over a ring subarray — the
    latter shape trips a Spark whole-stage-codegen bug ("expression
    is not an rvalue") when nested inside further expressions.
    """
    return F.aggregate(
        F.sequence(F.lit(1), F.size(coordinates)),
        F.lit(0.0),
        lambda acc, ri: acc
        + F.when(
            ri == 1, F.abs(_ring_area(F.element_at(coordinates, ri.cast("int"))))
        ).otherwise(
            -F.abs(_ring_area(F.element_at(coordinates, ri.cast("int"))))
        ),
    )


def coords_all_valid(coordinates: Column) -> Column:
    """True iff every [lon, lat] satisfies lon∈[-180,180], lat∈[-90,90]."""
    return F.forall(
        F.flatten(coordinates),
        lambda c: (F.element_at(c, 1) >= -180)
        & (F.element_at(c, 1) <= 180)
        & (F.element_at(c, 2) >= -90)
        & (F.element_at(c, 2) <= 90),
    )


def _proper_cross(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    """Strict proper crossing of segments AB and CD (no collinear/touch)."""

    def ccw(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = ccw(cx, cy, dx, dy, ax, ay)
    d2 = ccw(cx, cy, dx, dy, bx, by)
    d3 = ccw(ax, ay, bx, by, cx, cy)
    d4 = ccw(ax, ay, bx, by, dx, dy)
    return ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    )


def _ring_kinks(ring) -> int:
    pts = [(float(p[0]), float(p[1])) for p in ring]
    nseg = len(pts) - 1  # closed ring: last point repeats the first
    count = 0
    for i in range(nseg):
        for j in range(i + 1, nseg):
            # skip adjacent segments (share an endpoint), incl. wraparound
            if j == i + 1 or (i == 0 and j == nseg - 1):
                continue
            a, b = pts[i], pts[i + 1]
            c, d = pts[j], pts[j + 1]
            if _proper_cross(a[0], a[1], b[0], b[1], c[0], c[1], d[0], d[1]):
                count += 1
    return count


def _kinks_series(coords_json: pd.Series) -> pd.Series:
    import json

    def one(payload) -> int:
        if payload is None:
            return 0
        coords = json.loads(payload)
        if coords is None:
            return 0
        total = 0
        for ring in coords:
            if ring is not None and len(ring) >= 4:
                total += _ring_kinks(ring)
        return total

    return coords_json.apply(one)


def self_intersection_count(coordinates: Column) -> Column:
    """Number of proper self-crossings across all rings of a polygon.

    Arrow-batched pandas_udf, constructed lazily (a module-level
    @pandas_udf("ddl") would require an active session at import).

    The geometry crosses the Python boundary as a JSON STRING
    (``to_json`` JVM-side, ``json.loads`` in the worker), not as a
    nested list column: an Arrow batch whose deep-nested list column
    holds zero leaf values — every row null, or every row an empty
    array, e.g. one all-unmasked partition — segfaults the worker
    during arrow→pandas deserialization (observed on pyspark 4.1.2).
    String batches have no nested buffers and are immune; the
    encode/decode cost is per-masked-row and tiny next to the O(n²)
    crossing check itself.
    """
    from pyspark.sql.types import IntegerType

    return pandas_udf(_kinks_series, IntegerType())(F.to_json(coordinates))
