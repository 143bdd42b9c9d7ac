"""Mapwarper transform step — Spark-first re-expression of the
reference's ``transform`` entry point (mapwarper.js:417-437).

Capabilities re-expressed (citations into /root/reference/mapwarper.js):
- layer projection  (transformLayer, :399-415): surrogate key :331,
  year coalesce :323-329, bbox split-cast :411, tile URL template :410.
- map projection    (transformMap, :353-397): guard :354-356, inset
  flag :366, masked flag :382, URL templates :383-384, geodesic area
  :363-364 (turf.area → functions/geo.py), gcps/geometry passthrough.
- validation rules  (getLogs, :221-321): 9 rules; a failing map emits
  ONLY its log record, a passing map ONLY its object (:358-361).
- relation derivation (getLayerRelations, :333-346): one ``st:in``
  edge per layerId, ``layer-<id>`` surrogate key.

Dataflow shape: all transforms are narrow column expressions (the
only Python is the kinks pandas_udf, Arrow-batched and applied once
per row) — on a cluster this pipeline is a single scan stage per
input with zero shuffles, exactly the reference's per-record pipe but
partition-parallel.

Deviation from the reference, documented: node ids are STRING in all
outputs (the reference mixes number ids for maps with ``layer-N``
strings for layers).

Synthetic fixtures: ``synthetic_maps`` / ``synthetic_layers`` derive
deterministic mapwarper-shaped records from the driver's ``part`` and
``nation`` parquet tables using pure arithmetic, and the oracle SQL
reproduces the identical records in DuckDB — so the whole transform
(rules, area, edges) is value-level oracle-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geo import coords_all_valid, geodesic_area, self_intersection_count
from ..functions.scalar import bbox_to_array, coalesce_year
from ..sources.tables import load_table

QUERIES = {}
ORACLE = {}


def _register(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


# ---------------------------------------------------------------------------
# Synthetic fixture sources (deterministic from part/nation keys).
# ---------------------------------------------------------------------------

N_MAPS = 150  # p_partkey < 150 exists at every SF
N_LAYERS = 25  # nation keys 0..24


def synthetic_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maps_enriched-shaped fixture rows keyed by p_partkey < 150."""
    k = F.col("p_partkey")
    ks = k.cast("string")
    lon0 = F.lit(-74.0) + (k % 10).cast("double") * 0.01
    lat0 = F.lit(40.7) + ((k * 7) % 10).cast("double") * 0.01
    d = F.lit(0.01) + (k % 5).cast("double") * 0.001

    def pt(x: Column, y: Column) -> Column:
        return F.array(x, y)

    square = F.array(
        F.array(
            pt(lon0, lat0),
            pt(lon0 + d, lat0),
            pt(lon0 + d, lat0 + d),
            pt(lon0, lat0 + d),
            pt(lon0, lat0),
        )
    )
    triangle = F.array(
        F.array(pt(lon0, lat0), pt(lon0 + d, lat0), pt(lon0, lat0))
    )
    bowtie = F.array(
        F.array(
            pt(lon0, lat0),
            pt(lon0 + d, lat0 + d),
            pt(lon0 + d, lat0),
            pt(lon0, lat0 + d),
            pt(lon0, lat0),
        )
    )
    bad_lon = F.lit(200.0) + (k % 5).cast("double")
    invalid = F.array(
        F.array(
            pt(bad_lon, lat0),
            pt(bad_lon + 1.0, lat0),
            pt(bad_lon + 1.0, lat0 + d),
            pt(bad_lon, lat0 + d),
            pt(bad_lon, lat0),
        )
    )
    h = d / 4.0
    with_hole = F.array(
        F.element_at(square, 1),
        F.array(
            pt(lon0 + h, lat0 + h),
            pt(lon0 + 2 * h, lat0 + h),
            pt(lon0 + 2 * h, lat0 + 2 * h),
            pt(lon0 + h, lat0 + 2 * h),
            pt(lon0 + h, lat0 + h),
        ),
    )
    coordinates = (
        F.when(k % 41 == 0, F.lit(None).cast("array<array<array<double>>>"))
        .when(k % 23 == 0, triangle)
        .when(k % 29 == 0, bowtie)
        .when(k % 31 == 0, invalid)
        .when(k % 37 == 0, with_hole)
        .otherwise(square)
    )
    geometry = F.when(
        coordinates.isNotNull(),
        F.struct(F.lit("Polygon").alias("type"), coordinates.alias("coordinates")),
    )
    gcps = F.array(
        F.array(k.cast("double"), k.cast("double") + 0.5, F.lit(40.0) + k.cast("double") * 0.001, F.lit(-74.0) + k.cast("double") * 0.001),
        F.array(k.cast("double") + 10.0, k.cast("double") + 10.5, F.lit(40.01) + k.cast("double") * 0.001, F.lit(-73.99) + k.cast("double") * 0.001),
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter(k < N_MAPS)
        .select(
            k.cast("long").alias("id"),
            F.concat(F.lit("Map "), ks).alias("title"),
            F.when(k % 9 != 0, F.concat(F.lit("Description of map "), ks)).alias("description"),
            F.when(k % 27 != 0, F.concat(F.lit("img-"), ks)).alias("nypl_digital_id"),
            F.when(k % 49 == 0, F.lit(""))
            .when(k % 7 == 0, F.lit(None))
            .otherwise(
                F.when(k % 11 == 0, F.concat(F.lit("inset-"), ks)).otherwise(
                    F.concat(F.lit("uuid-"), ks)
                )
            )
            .alias("uuid"),
            F.when(k % 11 == 0, F.concat(F.lit("uuid-parent-"), ks)).alias("parent_uuid"),
            F.when(k % 17 != 0, F.lit("-74.0,40.7,-73.9,40.8")).alias("bbox"),
            F.when(k % 13 == 0, F.lit("not_map")).otherwise(F.lit("is_map")).alias("map_type"),
            F.when(k % 4 == 0, "warped")
            .when(k % 4 == 1, "published")
            .when(k % 4 == 2, "unwarped")
            .otherwise("warped")
            .alias("status"),
            F.when(k % 3 == 0, "masked")
            .when(k % 3 == 1, "masking")
            .otherwise("unmasked")
            .alias("mask_status"),
            F.lit("affine").alias("transform_options"),
            F.when(k % 4 != 0, (F.lit(1850) + k % 100).cast("string")).alias("depicts_year"),
            F.when(k % 8 < 6, (F.lit(1900) + k % 50).cast("string")).alias("issue_year"),
            F.when(k % 19 == 0, F.lit("mask-to-geojson failed: timeout")).alias("maskError"),
            geometry.alias("maskGeometry"),
            gcps.alias("gcps"),
            F.when(
                k % 43 != 0,
                F.array((k % 25).cast("long"), ((k * 3) % 25).cast("long")),
            ).alias("layerIds"),
        )
    )


def synthetic_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """layers_raw-shaped fixture rows keyed by n_nationkey (0..24)."""
    n = F.col("n_nationkey")
    ns = n.cast("string")
    return load_table(spark, sf_dir, "nation").select(
        n.cast("long").alias("id"),
        F.concat(F.lit("Layer "), ns).alias("name"),
        F.when(n % 5 != 0, (F.lit(1860) + n).cast("string")).alias("depicts_year"),
        F.when(n % 10 < 8, (F.lit(1910) + n).cast("string")).alias("issue_year"),
        (F.col("n_regionkey") * 3 + n % 4).cast("int").alias("maps_count"),
        F.when(n % 6 != 0, F.lit("-74.1,40.6,-73.8,40.9")).alias("bbox"),
    )


# ---------------------------------------------------------------------------
# Layer transform (reference transformLayer, mapwarper.js:399-415).
# ---------------------------------------------------------------------------


def transform_layers(layers: DataFrame) -> DataFrame:
    year = coalesce_year(F.col("depicts_year"), F.col("issue_year"))
    return layers.select(
        F.concat(F.lit("layer-"), F.col("id").cast("string")).alias("id"),
        F.lit("st:Map").alias("type"),
        F.col("name"),
        year.alias("validSince"),
        year.alias("validUntil"),
        F.struct(
            F.col("maps_count").alias("mapCount"),
            F.concat(
                F.lit("http://maps.nypl.org/warper/layers/tile/"),
                F.col("id").cast("string"),
                F.lit("/{z}/{x}/{y}.png"),
            ).alias("tileUrl"),
            bbox_to_array(F.col("bbox")).alias("bbox"),
        ).alias("data"),
    )


# ---------------------------------------------------------------------------
# Map validation + transform (getLogs :221-321, transformMap :353-397).
# ---------------------------------------------------------------------------

_LOG_STRUCT = "struct<type:string,message:string>"


def _log(cond: Column, log_type: str, message: Column) -> Column:
    return F.when(
        cond,
        F.struct(
            F.lit(log_type).alias("type"), message.alias("message")
        ),
    ).cast(_LOG_STRUCT)


def with_validation(maps: DataFrame) -> DataFrame:
    """Adds ``logs`` (array of {type,message}) and ``passes_guard``.

    Rule order matches the reference exactly (:221-321) so log arrays
    compare byte-for-byte.
    """
    geom = F.col("maskGeometry")
    coords = geom["coordinates"]
    ring0_n = F.size(F.element_at(coords, 1))
    kinks = F.when(
        geom.isNotNull(), self_intersection_count(coords)
    ).otherwise(F.lit(0))
    df = maps.withColumn("_kinks", kinks)
    rules = F.array(
        _log(
            F.col("uuid").isNull() | (F.col("uuid") == ""),
            "missing_uuid",
            F.lit("Map has no UUID"),
        ),
        _log(
            geom.isNotNull() & (ring0_n < 4),
            "mask_coordinates_count",
            F.concat(
                F.lit("Mask has "),
                ring0_n.cast("string"),
                F.lit(" coordinates (should have at least 4)"),
            ),
        ),
        _log(
            geom.isNotNull() & (F.col("_kinks") > 0),
            "self_intersection",
            F.concat(
                F.lit("Mask has "),
                F.col("_kinks").cast("string"),
                F.lit(" self-intersections"),
            ),
        ),
        _log(
            geom.isNotNull() & ~coords_all_valid(coords),
            "invalid_coordinates",
            F.lit("Mask has invalid coordinates"),
        ),
        _log(
            geom.isNotNull() & (F.size(coords) != 1),
            "multipolygon",
            F.concat(
                F.lit("Mask is a MultiPolygon with "),
                F.size(coords).cast("string"),
                F.lit(" polygons"),
            ),
        ),
        _log(F.col("maskError").isNotNull(), "mask_to_geojson", F.col("maskError")),
        _log(
            (F.col("status") == "warped") & (F.col("mask_status") == "unmasked"),
            "warped_but_unmasked",
            F.lit("Map is warped, but not masked"),
        ),
        _log(
            (F.col("status") != "warped")
            & (F.col("status") != "published")
            & (F.col("mask_status") != "unmasked"),
            "unwarped_but_masked",
            F.lit("Map is masked, but not warped"),
        ),
    )
    base_logs = F.array_compact(rules)
    mask_missing = F.struct(
        F.lit("mask_missing").alias("type"), F.lit("Map is unmasked").alias("message")
    )
    logs = F.when(
        (F.size(base_logs) == 0) & (geom.isNull() | coords.isNull()),
        F.array(mask_missing),
    ).otherwise(base_logs)
    return (
        df.withColumn("logs", logs)
        .withColumn(
            "passes_guard",
            F.col("bbox").isNotNull() & (F.col("map_type") == "is_map"),
        )
        .drop("_kinks")
    )


def map_logs(maps: DataFrame) -> DataFrame:
    """Quarantine records: {id, imageId, logs[]} (reference :222-226)."""
    v = with_validation(maps)
    return v.filter(F.col("passes_guard") & (F.size("logs") > 0)).select(
        F.col("id"),
        F.col("nypl_digital_id").alias("imageId"),
        F.col("logs"),
    )


def map_objects(maps: DataFrame) -> DataFrame:
    """Space/Time objects for maps that pass guard + validation."""
    v = with_validation(maps)
    clean = v.filter(F.col("passes_guard") & (F.size("logs") == 0))
    year = coalesce_year(F.col("depicts_year"), F.col("issue_year"))
    area_m2 = F.round(geodesic_area(F.col("maskGeometry")["coordinates"]), 0)
    return clean.select(
        F.col("id").cast("string").alias("id"),
        F.lit("st:Map").alias("type"),
        F.col("title").alias("name"),
        year.alias("validSince"),
        year.alias("validUntil"),
        F.struct(
            F.col("description"),
            F.col("nypl_digital_id").alias("imageId"),
            F.col("uuid"),
            F.col("parent_uuid").alias("parentUuid"),
            F.coalesce(F.col("uuid").startswith("inset"), F.lit(False)).alias("inset"),
            F.col("mask_status").isin("masked", "masking").alias("masked"),
            F.concat(
                F.lit("http://digitalcollections.nypl.org/items/"), F.col("uuid")
            ).alias("nyplUrl"),
            F.concat(
                F.lit("http://maps.nypl.org/warper/maps/tile/"),
                F.col("id").cast("string"),
                F.lit("/{z}/{x}/{y}.png"),
            ).alias("tileUrl"),
            F.round(area_m2 * 0.000001, 5).alias("area"),
            F.col("gcps"),
        ).alias("data"),
        F.col("maskGeometry").alias("geometry"),
    )


def map_relations(maps: DataFrame) -> DataFrame:
    """st:in edges from passing maps to their layers (:333-346)."""
    v = with_validation(maps)
    clean = v.filter(
        F.col("passes_guard")
        & (F.size("logs") == 0)
        & F.col("layerIds").isNotNull()
    )
    return clean.select(
        F.col("id"), F.explode(F.col("layerIds")).alias("layer_id")
    ).select(
        F.lit("st:in").alias("rel_type"),
        F.col("id").cast("string").alias("src"),
        F.concat(F.lit("layer-"), F.col("layer_id").cast("string")).alias("dst"),
    )
