"""Mask→GeoJSON enrichment — the reference's one genuinely hard
operator (#20 in SURVEY.md §2): pixel-space mask polygon + ground
control points (GCPs) → georeferenced GeoJSON polygon.

Reference behavior (citations into /root/reference/mapwarper.js):
- ``getMask`` (:79-110) calls mask-to-geojson (GDAL under the hood) for
  maps whose ``mask_status ∈ {masked, masking}`` (:81); success attaches
  ``maskGeometry``/``gcps``/``mask``, failure attaches ``maskError``
  (:90) — error-as-data, the map stays in the stream.
- The transform family is GDAL's GCP polynomial warp, order selected by
  ``transform_options`` (:86).

Spark-first design:
- The polynomial fit/apply is genuinely non-relational → one Arrow-
  batched ``pandas_udf`` (``gcp_transform_udf``) that least-squares
  fits pixel→world per row (numpy) and returns a **result struct**
  ``{ok, coordinates, error}`` — executors never raise on bad data.
- The masked-only gate is an explicit ``filter`` + ``unionByName`` so
  Catalyst cannot reorder the expensive Python stage in front of the
  cheap predicate; unmasked rows never reach Python at all.
- ``attach_map_layers`` replaces the reference's N+1 per-map HTTP
  lookup (:57-77) with a real aggregate+broadcast join: fetch the
  membership table ONCE, ``collect_list`` per map, broadcast (bounded
  by |layers|, tiny next to |maps| at scale).

Polynomial orders: 1 (affine, 6 coefficients — GDAL ``-order 1``) and
2 (quadratic, 12 coefficients — ``-order 2``); both need the same
least-squares machinery, requiring ≥3 / ≥6 GCPs respectively.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast, pandas_udf

QUERIES = {}
ORACLE = {}


def _register(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("ok", T.BooleanType(), False),
        T.StructField(
            "coordinates",
            T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
        ),
        T.StructField("error", T.StringType()),
    ]
)

_MIN_GCPS = {1: 3, 2: 6, 3: 10, "tps": 3}


def _design(px: np.ndarray, py: np.ndarray, order: int) -> np.ndarray:
    if order == 1:
        return np.column_stack([px, py, np.ones_like(px)])
    if order == 2:
        return np.column_stack(
            [px, py, px * px, py * py, px * py, np.ones_like(px)]
        )
    return np.column_stack(
        [
            px,
            py,
            px * px,
            py * py,
            px * py,
            px * px * px,
            px * px * py,
            px * py * py,
            py * py * py,
            np.ones_like(px),
        ]
    )


def order_from_transform_options(
    transform_options, n_gcps: int | None = None
) -> int:
    """Map the reference's ``transform_options`` to a polynomial order.

    The reference (mapwarper.js:86) passes ``map.transform_options``
    straight into its mask-to-GeoJSON helper, which delegates to GDAL's
    GCP transformer — so the option semantics are GDAL's public
    contract (gdal/alg/gdal_crs.cpp, GDALCreateGCPTransformerEx):

    - ``1``/``2``/``3`` — that exact polynomial order (GDAL ``-order N``);
      the fit then needs >= 3/6/10 GCPs respectively (``_MIN_GCPS``).
    - ``0``/``None``/missing — AUTO: GDAL picks from the GCP count —
      order 2 when >= 6 GCPs are available, else order 1. (GDAL never
      auto-selects order 3 — the "for now we avoid 3rd order" rule —
      and neither do we.)
    - ``'tps'``/``'-tps'`` — thin-plate spline (GDAL ``-tps``,
      gdal/alg/gdal_tps.cpp): exact interpolation through every GCP
      with minimum bending energy; returned as the ``"tps"`` sentinel,
      which ``fit_gcp_tps``/``_transform_one`` dispatch on. Needs
      >= 3 non-collinear GCPs (the affine part of the spline).
    """
    if transform_options in ("tps", "-tps"):
        return "tps"
    if transform_options in (None, 0, "0", ""):
        return 2 if (n_gcps or 0) >= _MIN_GCPS[2] else 1
    order = int(transform_options)
    if order not in _MIN_GCPS:
        raise ValueError(
            f"transform_options={transform_options!r}: GDAL polynomial "
            "orders are 1-3"
        )
    return order


def fit_gcp_polynomial(
    gcps: Iterable[Iterable[float]], order: int = 1
) -> tuple[np.ndarray, np.ndarray]:
    """Least-squares pixel→world fit from GCP rows ``[px, py, lat, lon]``.

    Returns (lon_coef, lat_coef) for the design (order 1: [px,py,1]).
    GCP component order matches the reference's mapwarper API rows
    (x, y, lat, lon).
    """
    g = np.asarray(list(gcps), dtype=np.float64)
    need = _MIN_GCPS[order]
    if g.ndim != 2 or g.shape[0] < need or g.shape[1] != 4:
        raise ValueError(
            f"need >= {need} GCPs of [px,py,lat,lon] for order {order}, "
            f"got shape {getattr(g, 'shape', None)}"
        )
    X = _design(g[:, 0], g[:, 1], order)
    lon_coef, *_ = np.linalg.lstsq(X, g[:, 3], rcond=None)
    lat_coef, *_ = np.linalg.lstsq(X, g[:, 2], rcond=None)
    return lon_coef, lat_coef


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    """TPS radial basis U(r) = r² · ln(r²) with U(0) = 0.

    Equivalent (×2) to the classic r² ln r — the constant factor is
    absorbed by the solved weights, so the interpolant is identical.
    """
    with np.errstate(divide="ignore", invalid="ignore"):
        k = r2 * np.log(r2)
    return np.where(r2 > 0.0, k, 0.0)


def fit_gcp_tps(
    gcps: Iterable[Iterable[float]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Thin-plate-spline pixel→world fit from GCP rows ``[px,py,lat,lon]``.

    Classic TPS interpolation (Bookstein 1989; GDAL's ``-tps``,
    gdal/alg/thinplatespline.cpp): solve the dense (n+3)×(n+3) system

        [ K  P ] [w]   [v]        K_ij = U(|p_i − p_j|),
        [ Pᵀ 0 ] [a] = [0]        P_i  = [1, x_i, y_i]

    once per target axis. Exact interpolation: the spline passes
    through every GCP; with GCPs sampled from an exact affine map the
    unique solution has w = 0 and reduces to that affine map.

    Returns ``(pts, sol_lon, sol_lat)`` where each ``sol`` is the
    concatenated ``[w (n), a0, ax, ay]``. Degenerate configurations
    (coincident or collinear GCPs) make the system singular —
    ``np.linalg.LinAlgError`` propagates and ``_transform_one`` turns
    it into an error record, never a crash.

    The fit is per-row work inside the Arrow-batched pandas UDF — the
    dense solve is O(n³) in the row's OWN GCP count (tens, not data
    volume), so the 100 TB story is unchanged: embarrassingly parallel
    per map, no shuffle, no driver traffic.
    """
    g = np.asarray(list(gcps), dtype=np.float64)
    need = _MIN_GCPS["tps"]
    if g.ndim != 2 or g.shape[0] < need or g.shape[1] != 4:
        raise ValueError(
            f"need >= {need} GCPs of [px,py,lat,lon] for tps, "
            f"got shape {getattr(g, 'shape', None)}"
        )
    pts = g[:, :2]
    n = pts.shape[0]
    diff = pts[:, None, :] - pts[None, :, :]
    K = _tps_kernel(np.einsum("ijk,ijk->ij", diff, diff))
    P = np.column_stack([np.ones(n), pts])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n, 0] = g[:, 3]  # lon
    rhs[:n, 1] = g[:, 2]  # lat
    sol = np.linalg.solve(A, rhs)
    return pts, sol[:, 0], sol[:, 1]


def apply_tps(
    pts: np.ndarray, sol: np.ndarray, xy: np.ndarray
) -> np.ndarray:
    """Evaluate a fitted TPS axis at query points ``xy`` (m×2)."""
    n = pts.shape[0]
    diff = xy[:, None, :] - pts[None, :, :]
    U = _tps_kernel(np.einsum("ijk,ijk->ij", diff, diff))
    return U @ sol[:n] + sol[n] + xy[:, 0] * sol[n + 1] + xy[:, 1] * sol[n + 2]


def _transform_one(mask, gcps, order):
    import json

    if isinstance(mask, str):
        mask = json.loads(mask)
    if isinstance(gcps, str):
        gcps = json.loads(gcps)
    if mask is None or len(mask) == 0:
        return (False, None, "empty mask")
    if gcps is None or len(gcps) == 0:
        return (False, None, "no GCPs")
    try:
        ring = np.asarray([list(p) for p in mask], dtype=np.float64)
        if order == "tps":
            pts, sol_lon, sol_lat = fit_gcp_tps(gcps)
            lon = apply_tps(pts, sol_lon, ring)
            lat = apply_tps(pts, sol_lat, ring)
        else:
            lon_c, lat_c = fit_gcp_polynomial(gcps, order)
            X = _design(ring[:, 0], ring[:, 1], order)
            lon = X @ lon_c
            lat = X @ lat_c
        if not (np.isfinite(lon).all() and np.isfinite(lat).all()):
            return (False, None, "non-finite transform result")
        coords = [[[float(x), float(y)] for x, y in zip(lon, lat)]]
        return (True, coords, None)
    except (ValueError, np.linalg.LinAlgError) as e:
        return (False, None, f"{type(e).__name__}: {e}")


def make_gcp_transform_udf(order: int = 1):
    """Result-struct pandas UDF: (mask ring, gcps) → {ok, coordinates, error}.

    Inputs arrive as JSON strings (see ``enrich_masks``): nested-list
    Arrow batches with zero leaf values segfault the worker's
    arrow→pandas step on pyspark 4.1.2, and a partition of all-failed
    fetches (null masks) is exactly that shape. Strings are immune.
    """

    @pandas_udf(RESULT_SCHEMA)
    def gcp_transform(mask: pd.Series, gcps: pd.Series) -> pd.DataFrame:
        rows = [_transform_one(m, g, order) for m, g in zip(mask, gcps)]
        return pd.DataFrame(rows, columns=["ok", "coordinates", "error"])

    return gcp_transform


def enrich_masks(
    maps: DataFrame,
    mask_col: str = "mask",
    gcps_col: str = "gcps",
    order: int = 1,
) -> DataFrame:
    """Conditional enrichment with the reference's gating (:81).

    Only ``mask_status ∈ {masked, masking}`` rows pass through Python;
    the rest are unioned back untouched with null enrichment columns.
    Success → ``maskGeometry`` polygon struct; failure → ``maskError``
    string (:90) — downstream validation rule #6 picks it up.
    """
    udf = make_gcp_transform_udf(order)
    gate = F.col("mask_status").isin("masked", "masking")
    masked = maps.filter(gate)
    unmasked = maps.filter(~gate | F.col("mask_status").isNull())
    res = F.col("_gcp_result")
    # JSON-string boundary (see make_gcp_transform_udf docstring).
    enriched = (
        masked.withColumn(
            "_gcp_result",
            udf(F.to_json(F.col(mask_col)), F.to_json(F.col(gcps_col))),
        )
        .withColumn(
            "maskGeometry",
            F.when(
                res["ok"],
                F.struct(
                    F.lit("Polygon").alias("type"),
                    res["coordinates"].alias("coordinates"),
                ),
            ),
        )
        .withColumn("maskError", F.when(~res["ok"], res["error"]))
        .drop("_gcp_result")
    )
    geom_type = enriched.schema["maskGeometry"].dataType
    return enriched.unionByName(
        unmasked.withColumn(
            "maskGeometry", F.lit(None).cast(geom_type)
        ).withColumn("maskError", F.lit(None).cast("string"))
    )


# JSON body served by the per-map mask endpoint (the fetch half of the
# reference's maskToGeoJSON.getMaskAndTransform, mapwarper.js:84-86):
# the pixel-space mask ring and the GCP rows [px, py, lat, lon].
MASK_BODY_SCHEMA = T.StructType(
    [
        T.StructField("mask", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("gcps", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


def fetch_masks(
    spark,
    maps: DataFrame,
    config,
    map_id: str = "id",
    status_col: str = "mask_status",
) -> DataFrame:
    """The mask-FETCH hop of reference getMask (mapwarper.js:79-110).

    Only ``mask_status ∈ {masked, masking}`` map ids are requested
    (:81) — the gate runs before any network work, exactly like the
    reference. Fetched bodies parse JVM-side (``from_json``) into
    ``mask``/``gcps`` columns; fetch failures land in
    ``mask_fetch_error`` (error-as-data, :90). Compose with
    ``enrich_masks`` for the transform half. The join back to the maps
    stream is a plain equi-join on the map id — at scale the fetched
    side is bounded by the masked subset, not the corpus.
    """
    from ..sources.paginated_rest import fetch_by_key

    gate = F.col(status_col).isin("masked", "masking")
    fetched = fetch_by_key(
        spark, config, maps.filter(gate).select(map_id), map_id
    )
    parsed = fetched.select(
        F.col("key").alias("_mf_id"),
        F.when(F.col("ok"), F.from_json("body", MASK_BODY_SCHEMA)).alias(
            "_mb"
        ),
        F.when(~F.col("ok"), F.col("error")).alias("mask_fetch_error"),
    ).select(
        "_mf_id",
        F.col("_mb.mask").alias("mask"),
        F.col("_mb.gcps").alias("gcps"),
        "mask_fetch_error",
    )
    return maps.join(
        parsed, maps[map_id] == parsed["_mf_id"], "left"
    ).drop("_mf_id")


def attach_map_layers(
    maps: DataFrame,
    map_layers: DataFrame,
    map_id: str = "id",
    layers_map_id: str = "map_id",
    layer_id: str = "layer_id",
) -> DataFrame:
    """Left join maps to aggregated layer membership (replaces :57-77).

    The aggregated membership side is broadcast: it is bounded by the
    number of (map, layer) pairs — dimension-sized next to a 100 TB
    fact scan — so the maps side never shuffles.
    """
    grouped = map_layers.groupBy(F.col(layers_map_id).alias("_ml_map_id")).agg(
        F.sort_array(F.collect_set(F.col(layer_id))).alias("layerIds")
    )
    return (
        maps.join(
            broadcast(grouped),
            maps[map_id] == grouped["_ml_map_id"],
            "left",
        )
        .drop("_ml_map_id")
    )


# ---------------------------------------------------------------------------
# Oracle-gated queries. The fixture GCPs lie EXACTLY on an affine map
# (world = a·px + c, e·py + f), so the least-squares fit recovers the
# coefficients to ~1e-12 and DuckDB can reproduce the transformed ring
# with direct arithmetic; round(·, 6) absorbs the solver noise (values
# are multiples of 1e-5/1e-4 — never near a rounding midpoint).
# ---------------------------------------------------------------------------

_TOO_FEW_GCPS_MSG = (
    "ValueError: need >= 3 GCPs of [px,py,lat,lon] for order 1, "
    "got shape (2, 4)"
)


def synthetic_masked_maps(spark, sf_dir: str) -> DataFrame:
    """Pixel-space mask + exact-affine GCP fixture keyed by p_partkey<150.

    k%10==0 → unmasked (gated out of Python); k%17==0 → only 2 GCPs
    (error record); everything else transforms cleanly.
    """
    from ..sources.tables import load_table

    k = F.col("p_partkey")
    kd = k.cast("double")
    a = (k % 3 + 1).cast("double") * F.lit(0.0001)
    e = (k % 2 + 2).cast("double") * F.lit(0.00005)
    c = F.lit(-74.0) + kd * F.lit(0.001)
    f0 = F.lit(40.7) + kd * F.lit(0.0005)
    w = (k % 50 + 100).cast("double")
    h = (k % 40 + 80).cast("double")

    def gcp(px: float, py: float) -> Column:
        return F.array(
            F.lit(px),
            F.lit(py),
            e * F.lit(py) + f0,  # lat
            a * F.lit(px) + c,  # lon
        )

    full_gcps = F.array(gcp(0.0, 0.0), gcp(200.0, 0.0), gcp(0.0, 200.0), gcp(200.0, 200.0))
    short_gcps = F.array(gcp(0.0, 0.0), gcp(200.0, 0.0))
    zero = F.lit(0.0)
    ring = F.array(
        F.array(zero, zero),
        F.array(w, zero),
        F.array(w, h),
        F.array(zero, h),
        F.array(zero, zero),
    )
    return (
        load_table(spark, sf_dir, "part")
        .filter(k < 150)
        .select(
            k.cast("long").alias("id"),
            F.when(k % 10 == 0, "unmasked").otherwise("masked").alias("mask_status"),
            ring.alias("mask"),
            F.when(k % 17 == 0, short_gcps).otherwise(full_gcps).alias("gcps"),
        )
    )


def mw_gcp_transform(spark, sf_dir: str) -> DataFrame:
    maps = synthetic_masked_maps(spark, sf_dir)
    enriched = enrich_masks(maps)
    ring0 = F.element_at(F.col("maskGeometry")["coordinates"], 1)
    return (
        enriched.filter(F.col("maskGeometry").isNotNull())
        .select("id", F.posexplode(ring0).alias("idx", "pt"))
        .select(
            "id",
            "idx",
            F.round(F.element_at("pt", 1), 6).alias("lon"),
            F.round(F.element_at("pt", 2), 6).alias("lat"),
        )
    )


_register(
    "mw_gcp_transform",
    mw_gcp_transform,
    """
    WITH keys AS (
      SELECT p_partkey AS k FROM part
      WHERE p_partkey < 150 AND p_partkey % 10 <> 0 AND p_partkey % 17 <> 0
    ), pts AS (
      SELECT k, i.i::INT AS idx,
        CASE i.i WHEN 1 THEN (100 + k % 50) WHEN 2 THEN (100 + k % 50) ELSE 0 END AS px,
        CASE i.i WHEN 2 THEN (80 + k % 40) WHEN 3 THEN (80 + k % 40) ELSE 0 END AS py
      FROM keys CROSS JOIN (SELECT unnest(range(0, 5)) AS i) i
    )
    SELECT k::BIGINT AS id, idx,
      round((k % 3 + 1) * CAST(0.0001 AS DOUBLE) * px
            + (CAST(-74.0 AS DOUBLE) + k * CAST(0.001 AS DOUBLE)), 6) AS lon,
      round((k % 2 + 2) * CAST(0.00005 AS DOUBLE) * py
            + (CAST(40.7 AS DOUBLE) + k * CAST(0.0005 AS DOUBLE)), 6) AS lat
    FROM pts
    """,
)


def mw_gcp_transform_tps(spark, sf_dir: str) -> DataFrame:
    """The mw_gcp_transform surface under ``transform_options='tps'``
    (reference mapwarper.js:86 passes transform_options through to
    GDAL, whose ``-tps`` path is gdal/alg/gdal_tps.cpp). The fixture
    GCPs lie EXACTLY on an affine map, and TPS interpolation of
    affine data has the unique solution w=0 + that affine map — so
    the polynomial oracle SQL is shared verbatim, while the engine
    exercises the full dense-spline solve/apply path. round(·, 6)
    absorbs the (n+3)×(n+3) solver noise exactly as for lstsq."""
    maps = synthetic_masked_maps(spark, sf_dir)
    enriched = enrich_masks(maps, order=order_from_transform_options("tps"))
    ring0 = F.element_at(F.col("maskGeometry")["coordinates"], 1)
    return (
        enriched.filter(F.col("maskGeometry").isNotNull())
        .select("id", F.posexplode(ring0).alias("idx", "pt"))
        .select(
            "id",
            "idx",
            F.round(F.element_at("pt", 1), 6).alias("lon"),
            F.round(F.element_at("pt", 2), 6).alias("lat"),
        )
    )


_register(
    "mw_gcp_transform_tps",
    mw_gcp_transform_tps,
    ORACLE["mw_gcp_transform"],
)


def mw_gcp_errors(spark, sf_dir: str) -> DataFrame:
    maps = synthetic_masked_maps(spark, sf_dir)
    return (
        enrich_masks(maps)
        .filter(F.col("maskError").isNotNull())
        .select("id", F.col("maskError"))
    )


_register(
    "mw_gcp_errors",
    mw_gcp_errors,
    f"""
    SELECT p_partkey::BIGINT AS id,
           '{_TOO_FEW_GCPS_MSG}' AS maskError
    FROM part
    WHERE p_partkey < 150 AND p_partkey % 10 <> 0 AND p_partkey % 17 = 0
    """,
)


def mw_map_layers_join(spark, sf_dir: str) -> DataFrame:
    """Real join replacing the reference's N+1 per-map layer lookup."""
    from ..sources.tables import load_table

    k = F.col("p_partkey")
    maps = (
        load_table(spark, sf_dir, "part")
        .filter(k < 150)
        .select(k.cast("long").alias("id"))
    )
    membership = (
        load_table(spark, sf_dir, "part")
        .filter((k < 150) & (k % 43 != 0))
        .select(
            k.cast("long").alias("map_id"),
            F.explode(
                F.array(
                    (k % 25).cast("long"),
                    ((k * 3) % 25).cast("long"),
                    ((k * 7) % 25).cast("long"),
                )
            ).alias("layer_id"),
        )
    )
    joined = attach_map_layers(maps, membership)
    ids = F.col("layerIds")
    return joined.select(
        "id",
        F.when(ids.isNotNull(), F.size(ids)).otherwise(F.lit(0)).alias("n_layers"),
        F.when(ids.isNotNull(), F.concat_ws(",", ids.cast("array<string>"))).alias(
            "layer_csv"
        ),
    )


_register(
    "mw_map_layers_join",
    mw_map_layers_join,
    """
    WITH maps AS (
      SELECT p_partkey::BIGINT AS id FROM part WHERE p_partkey < 150
    ), member AS (
      SELECT p_partkey::BIGINT AS map_id,
             list_sort(list_distinct([
               (p_partkey % 25)::BIGINT,
               ((p_partkey * 3) % 25)::BIGINT,
               ((p_partkey * 7) % 25)::BIGINT
             ])) AS layer_ids
      FROM part WHERE p_partkey < 150 AND p_partkey % 43 <> 0
    )
    SELECT id,
           coalesce(len(layer_ids), 0)::INT AS n_layers,
           array_to_string(layer_ids, ',') AS layer_csv
    FROM maps LEFT JOIN member ON id = map_id
    """,
)
