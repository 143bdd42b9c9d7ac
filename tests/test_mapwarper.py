"""Unit tests for the mapwarper transform (reference parity).

Golden values are computed by an INDEPENDENT pure-Python port of the
published geojson-area algorithm (the same one turf.area v3 uses), so
the Spark column expression is cross-checked against a second
implementation, not against itself.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_mapwarper_spark.functions.geo import _ring_kinks  # noqa: E402
from etl_mapwarper_spark.operators.mapwarper import (  # noqa: E402
    map_logs,
    map_objects,
    map_relations,
    synthetic_maps,
    transform_layers,
    synthetic_layers,
)

SF = "/root/testdata/sf0.001"
RADIUS = 6378137.0


def ref_ring_area(coords):
    n = len(coords)
    if n <= 2:
        return 0.0
    area = 0.0
    for i in range(n):
        lower, middle, upper = i, (i + 1) % n, (i + 2) % n
        p1, p2, p3 = coords[lower], coords[middle], coords[upper]
        area += (math.radians(p3[0]) - math.radians(p1[0])) * math.sin(
            math.radians(p2[1])
        )
    return area * RADIUS * RADIUS / 2


def ref_polygon_area(rings):
    total = abs(ref_ring_area(rings[0]))
    for hole in rings[1:]:
        total -= abs(ref_ring_area(hole))
    return total


def test_geodesic_area_matches_independent_impl(spark):
    from etl_mapwarper_spark.functions.geo import geodesic_area

    maps = synthetic_maps(spark, SF).filter(F.col("maskGeometry").isNotNull())
    got = {
        r["id"]: r["a"]
        for r in maps.select(
            "id", geodesic_area(F.col("maskGeometry.coordinates")).alias("a")
        ).collect()
    }
    rows = maps.select("id", "maskGeometry.coordinates").collect()
    assert len(got) > 100
    for r in rows:
        expected = ref_polygon_area(r["coordinates"])
        assert abs(got[r["id"]] - expected) <= max(1e-6 * abs(expected), 1e-6), r["id"]


def test_kinks_bowtie_and_square():
    square = [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
    bowtie = [[0, 0], [1, 1], [1, 0], [0, 1], [0, 0]]
    assert _ring_kinks(square) == 0
    assert _ring_kinks(bowtie) == 1


def test_logs_xor_objects(spark):
    """A guarded map yields logs XOR an object, never both (ref :358-361)."""
    maps = synthetic_maps(spark, SF)
    log_ids = {r["id"] for r in map_logs(maps).collect()}
    obj_ids = {int(r["id"]) for r in map_objects(maps).collect()}
    assert log_ids and obj_ids
    assert not (log_ids & obj_ids)
    guarded = maps.filter(
        F.col("bbox").isNotNull() & (F.col("map_type") == "is_map")
    ).count()
    assert len(log_ids) + len(obj_ids) == guarded


def test_all_nine_rules_fire(spark):
    maps = synthetic_maps(spark, SF)
    types = {
        r["t"]
        for r in map_logs(maps)
        .select(F.explode("logs").alias("l"))
        .select(F.col("l.type").alias("t"))
        .distinct()
        .collect()
    }
    assert types == {
        "missing_uuid",
        "mask_coordinates_count",
        "self_intersection",
        "invalid_coordinates",
        "multipolygon",
        "mask_to_geojson",
        "warped_but_unmasked",
        "unwarped_but_masked",
        "mask_missing",
    }


def test_relations_shape(spark):
    rels = map_relations(synthetic_maps(spark, SF)).collect()
    assert rels
    for r in rels:
        assert r["rel_type"] == "st:in"
        assert r["dst"].startswith("layer-")


def test_layer_objects_surrogate_key_and_year(spark):
    out = transform_layers(synthetic_layers(spark, SF)).collect()
    assert len(out) == 25
    by_id = {r["id"]: r for r in out}
    # n=3: depicts 1863 → validSince 1863; id surrogate
    assert by_id["layer-3"]["validSince"] == 1863
    # n=5: depicts null (5%5==0) → falls back to issue_year 1915
    assert by_id["layer-5"]["validSince"] == 1915
    # n=6: bbox null → data.bbox null
    assert by_id["layer-6"]["data"]["bbox"] is None
    assert by_id["layer-3"]["data"]["bbox"] == [-74.1, 40.6, -73.8, 40.9]
