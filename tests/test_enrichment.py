"""Unit tests for the GCP mask-enrichment operator (reference #20,
mapwarper.js:79-110): polynomial fit math, result-struct error
handling, masked-only gating, and the map-layers broadcast join."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_mapwarper_spark.operators.enrichment import (  # noqa: E402
    attach_map_layers,
    enrich_masks,
    fit_gcp_polynomial,
)


def _affine_gcps(a, b, c, d, e, f, pts):
    """GCP rows [px,py,lat,lon] for lon=a·px+b·py+c, lat=d·px+e·py+f."""
    return [
        [float(px), float(py), d * px + e * py + f, a * px + b * py + c]
        for px, py in pts
    ]


def test_affine_fit_with_shear_recovers_exactly():
    a, b, c, d, e, f = 1e-4, 2e-5, -74.0, -1e-5, 5e-5, 40.7
    gcps = _affine_gcps(a, b, c, d, e, f, [(0, 0), (500, 0), (0, 400), (500, 400)])
    lon_c, lat_c = fit_gcp_polynomial(gcps, order=1)
    assert np.allclose(lon_c, [a, b, c], atol=1e-9)
    assert np.allclose(lat_c, [d, e, f], atol=1e-9)


def test_order2_fit_recovers_quadratic():
    # lon = 1e-8·px² + 1e-4·px - 74 ; lat = 5e-5·py + 40.7
    pts = [(x, y) for x in (0, 100, 200, 300) for y in (0, 150, 300)]
    gcps = [
        [px, py, 5e-5 * py + 40.7, 1e-8 * px * px + 1e-4 * px - 74.0]
        for px, py in pts
    ]
    lon_c, lat_c = fit_gcp_polynomial(gcps, order=2)
    # design: [px, py, px², py², px·py, 1]
    assert np.allclose(lon_c, [1e-4, 0, 1e-8, 0, 0, -74.0], atol=1e-9)
    assert np.allclose(lat_c, [0, 5e-5, 0, 0, 0, 40.7], atol=1e-9)


def test_order3_fit_recovers_cubic():
    # lon = 2e-12·px³ + 1e-4·px - 74 ; lat = 3e-12·py³ + 40.7
    pts = [(x, y) for x in (0, 100, 200, 350) for y in (0, 120, 260, 400)]
    gcps = [
        [
            px,
            py,
            3e-12 * py**3 + 40.7,
            2e-12 * px**3 + 1e-4 * px - 74.0,
        ]
        for px, py in pts
    ]
    lon_c, lat_c = fit_gcp_polynomial(gcps, order=3)
    # design: [px,py,px²,py²,px·py,px³,px²y,px·y²,py³,1]
    assert np.allclose(
        lon_c, [1e-4, 0, 0, 0, 0, 2e-12, 0, 0, 0, -74.0], atol=1e-9
    )
    assert np.allclose(
        lat_c, [0, 0, 0, 0, 0, 0, 0, 0, 3e-12, 40.7], atol=1e-9
    )


def test_transform_options_maps_to_gdal_orders():
    """The reference forwards transform_options to GDAL (mapwarper.js:86)
    — pin the public GDAL contract: explicit 1-3 honored, 0/None auto
    (order 2 with >= 6 GCPs, else 1, never auto-3), tps refused."""
    from etl_mapwarper_spark.operators.enrichment import (
        order_from_transform_options,
    )

    assert order_from_transform_options(1) == 1
    assert order_from_transform_options(2, n_gcps=3) == 2  # explicit wins
    assert order_from_transform_options(3) == 3
    assert order_from_transform_options(None, n_gcps=4) == 1
    assert order_from_transform_options(0, n_gcps=6) == 2
    assert order_from_transform_options(0, n_gcps=100) == 2  # no auto-3
    assert order_from_transform_options("tps") == "tps"
    assert order_from_transform_options("-tps") == "tps"
    with pytest.raises(ValueError, match="orders are 1-3"):
        order_from_transform_options(7)


def test_enrich_masks_order2_golden(spark):
    """Fixture parity at order != 1: a quadratic pixel→world surface
    round-trips exactly through the order-2 enrichment path."""
    pts = [(x, y) for x in (0, 80, 160, 240) for y in (0, 100, 200)]
    gcps = [
        [
            float(px),
            float(py),
            1e-9 * py * py + 5e-5 * py + 40.7,
            1e-8 * px * px + 1e-4 * px - 74.0,
        ]
        for px, py in pts
    ]
    ring = [[0.0, 0.0], [160.0, 0.0], [160.0, 200.0], [0.0, 0.0]]
    df = spark.createDataFrame(
        [(1, "masked", ring, gcps)],
        "id int, mask_status string, mask array<array<double>>, "
        "gcps array<array<double>>",
    )
    out = enrich_masks(df, order=2).collect()[0]
    assert out["maskError"] is None
    got = out["maskGeometry"]["coordinates"][0]
    for (px, py), (lon, lat) in zip(ring, got):
        assert abs(lon - (1e-8 * px * px + 1e-4 * px - 74.0)) < 1e-9
        assert abs(lat - (1e-9 * py * py + 5e-5 * py + 40.7)) < 1e-9


def test_tps_interpolates_gcps_exactly_and_bends_between():
    """TPS contract (GDAL -tps / Bookstein 1989): the spline passes
    through EVERY GCP exactly, and with a non-affine displacement the
    surface genuinely differs from the order-1 least-squares fit."""
    from etl_mapwarper_spark.operators.enrichment import (
        apply_tps,
        fit_gcp_polynomial,
        fit_gcp_tps,
    )

    pts = [(0, 0), (200, 0), (0, 200), (200, 200), (100, 100)]
    # Affine base + a bump at the center point only -> non-affine data.
    gcps = [
        [
            float(px),
            float(py),
            5e-5 * py + 40.7 + (0.01 if (px, py) == (100, 100) else 0.0),
            1e-4 * px - 74.0,
        ]
        for px, py in pts
    ]
    p, sol_lon, sol_lat = fit_gcp_tps(gcps)
    xy = np.asarray([g[:2] for g in gcps])
    lon = apply_tps(p, sol_lon, xy)
    lat = apply_tps(p, sol_lat, xy)
    for g, lo, la in zip(gcps, lon, lat):
        assert abs(lo - g[3]) < 1e-9  # exact interpolation
        assert abs(la - g[2]) < 1e-9
    # The affine LSQ fit CANNOT pass through the bumped center point.
    lon_c, lat_c = fit_gcp_polynomial(gcps, order=1)
    lsq_lat = lat_c[0] * 100 + lat_c[1] * 100 + lat_c[2]
    assert abs(lsq_lat - gcps[4][2]) > 1e-3
    # Off-GCP evaluation: the bump decays smoothly, so a point between
    # center and a corner sits strictly between base and bumped values.
    mid = apply_tps(p, sol_lat, np.asarray([[50.0, 50.0]]))[0]
    base = 5e-5 * 50 + 40.7
    assert base < mid < gcps[4][2]


def test_tps_affine_data_reduces_to_affine_map():
    """GCPs sampled from an exact affine map: the unique TPS solution
    has zero kernel weights and reproduces the map everywhere — the
    property the mw_gcp_transform_tps oracle relies on."""
    from etl_mapwarper_spark.operators.enrichment import (
        apply_tps,
        fit_gcp_tps,
    )

    gcps = _affine_gcps(
        1e-4, 0, -74.0, 0, 5e-5, 40.7, [(0, 0), (200, 0), (0, 200), (200, 200)]
    )
    p, sol_lon, sol_lat = fit_gcp_tps(gcps)
    assert np.allclose(sol_lon[:4], 0.0, atol=1e-12)
    assert np.allclose(sol_lat[:4], 0.0, atol=1e-12)
    xy = np.asarray([[13.0, 57.0], [150.0, 20.0], [99.0, 180.0]])
    assert np.allclose(
        apply_tps(p, sol_lon, xy), 1e-4 * xy[:, 0] - 74.0, atol=1e-9
    )
    assert np.allclose(
        apply_tps(p, sol_lat, xy), 5e-5 * xy[:, 1] + 40.7, atol=1e-9
    )


def test_tps_degenerate_gcps_error_as_data(spark):
    """Collinear / coincident GCPs make the TPS system singular; the
    UDF path must land an error record, never raise on an executor."""
    ring = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 0.0]]
    collinear = [[float(x), 0.0, 40.7, -74.0 + x * 1e-4] for x in (0, 1, 2, 3)]
    df = spark.createDataFrame(
        [(1, "masked", ring, collinear), (2, "masked", ring, collinear[:2])],
        "id int, mask_status string, mask array<array<double>>, "
        "gcps array<array<double>>",
    )
    out = {r.id: r for r in enrich_masks(df, order="tps").collect()}
    assert out[1].maskGeometry is None and "LinAlgError" in out[1].maskError
    assert out[2].maskGeometry is None and "need >= 3 GCPs" in out[2].maskError


def test_too_few_gcps_raises_value_error():
    with pytest.raises(ValueError, match="need >= 3 GCPs"):
        fit_gcp_polynomial([[0, 0, 40.7, -74.0]], order=1)
    with pytest.raises(ValueError, match="need >= 6 GCPs"):
        fit_gcp_polynomial(
            _affine_gcps(1, 0, 0, 0, 1, 0, [(0, 0), (1, 0), (0, 1)]), order=2
        )


@pytest.fixture(scope="module")
def maps_df(spark):
    gcps = _affine_gcps(
        1e-4, 0, -74.0, 0, 5e-5, 40.7, [(0, 0), (200, 0), (0, 200), (200, 200)]
    )
    ring = [[0.0, 0.0], [100.0, 0.0], [100.0, 80.0], [0.0, 80.0], [0.0, 0.0]]
    rows = [
        (1, "masked", ring, gcps),
        (2, "masking", ring, gcps),
        (3, "unmasked", ring, gcps),  # gated out of Python
        (4, "masked", ring, gcps[:2]),  # too few GCPs -> error record
        (5, "masked", [], gcps),  # empty mask -> error record
        (6, None, ring, gcps),  # null status treated as unmasked
    ]
    return spark.createDataFrame(
        rows,
        "id INT, mask_status STRING, mask ARRAY<ARRAY<DOUBLE>>, "
        "gcps ARRAY<ARRAY<DOUBLE>>",
    )


def test_enrich_masks_success_and_gating(spark, maps_df):
    out = {r.id: r for r in enrich_masks(maps_df).collect()}
    for i in (1, 2):
        geom = out[i].maskGeometry
        assert geom.type == "Polygon" and out[i].maskError is None
        lon, lat = geom.coordinates[0][2]  # pixel (100, 80)
        assert lon == pytest.approx(-74.0 + 1e-4 * 100, abs=1e-9)
        assert lat == pytest.approx(40.7 + 5e-5 * 80, abs=1e-9)
    for i in (3, 6):  # never entered Python: both columns null
        assert out[i].maskGeometry is None and out[i].maskError is None
    assert "need >= 3 GCPs" in out[4].maskError
    assert out[4].maskGeometry is None
    assert out[5].maskError == "empty mask"


def test_enrich_masks_never_throws_on_garbage(spark):
    df = spark.createDataFrame(
        [(1, "masked", [[0.0], [1.0]], [[1.0, 2.0]])],
        "id INT, mask_status STRING, mask ARRAY<ARRAY<DOUBLE>>, "
        "gcps ARRAY<ARRAY<DOUBLE>>",
    )
    rows = enrich_masks(df).collect()  # must not raise
    assert rows[0].maskError is not None


def test_attach_map_layers_left_join_and_broadcast(spark):
    maps = spark.createDataFrame([(1,), (2,), (3,)], "id INT")
    member = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 10), (2, 12)], "map_id INT, layer_id INT"
    )
    out = attach_map_layers(maps, member)
    got = {r.id: r.layerIds for r in out.collect()}
    assert got[1] == [10, 11]  # deduped + sorted
    assert got[2] == [12]
    assert got[3] is None  # left join keeps layer-less maps
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
