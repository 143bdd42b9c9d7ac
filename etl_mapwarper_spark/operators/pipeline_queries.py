"""Driver-gate queries for the two-step pipeline (pipeline.py).

These run the WHOLE reference workflow end-to-end — paginated REST
download (count-first fan-out for maps, short-page loop for layers)
→ parquet checkpoint → transform step (validation split, projection,
edge derivation) — against a deterministic in-process API that serves
the SAME fixture records as operators/mapwarper.py. The oracle SQL is
therefore shared verbatim with the mw_* queries: if the pipeline's
plumbing (pagination, JSON round-trip, checkpointing, step chaining)
changes any value anywhere, the hash comparison fails.

Reference trace covered end-to-end: mapwarper.js:151-219 (download) →
:417-437 (transform), chained via dirs (:152-153 ↔ :424).
"""

from __future__ import annotations

import functools
import json
import math
import tempfile
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import PipelineConfig, PipelineDirs, run_pipeline
from ..sources.paginated_rest import FetchResult, RestSourceConfig
from ..sources.tables import load_table
from .mapwarper import _map_row
from .mapwarper_queries import ORACLE as MW_ORACLE

QUERIES = {}
ORACLE = {}


def _register(name, fn, sql=None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE[name] = sql


# ---------------------------------------------------------------------------
# Deterministic fake API. Module-level + functools.partial → picklable
# for executor-side fetch inside scan_pages' mapPartitions.
# ---------------------------------------------------------------------------


def _map_item(k: int) -> dict:
    names = [
        "id", "title", "description", "nypl_digital_id", "uuid",
        "parent_uuid", "bbox", "map_type", "status", "mask_status",
        "transform_options", "depicts_year", "issue_year", "maskError",
        "maskGeometry", "gcps", "layerIds",
    ]
    row = dict(zip(names, _map_row(k)))
    geom = row["maskGeometry"]
    if geom is not None:
        row["maskGeometry"] = {"type": geom[0], "coordinates": geom[1]}
    return row


def _layer_item(n: int, r: int) -> dict:
    return {
        "id": n,
        "name": "Layer " + str(n),
        "depicts_year": str(1860 + n) if n % 5 != 0 else None,
        "issue_year": str(1910 + n) if n % 10 < 8 else None,
        "maps_count": r * 3 + n % 4,
        "bbox": "-74.1,40.6,-73.8,40.9" if n % 6 != 0 else None,
    }


def _serve(url: str, timeout_s: float, kind: str, rows: tuple) -> FetchResult:
    q = parse_qs(urlparse(url).query)
    page = int(q["page"][0])
    per_page = int(q["per_page"][0])
    if kind == "maps":
        items = [_map_item(k) for k in rows]
    else:
        items = [_layer_item(n, r) for n, r in rows]
    start = (page - 1) * per_page
    body = {
        "total_entries": len(items),
        "items": items[start : start + per_page],
    }
    return FetchResult(200, json.dumps(body))


def _config(spark: SparkSession, sf_dir: str) -> PipelineConfig:
    map_keys = tuple(
        sorted(
            int(r[0])
            for r in load_table(spark, sf_dir, "part")
            .filter(F.col("p_partkey") < 150)
            .select("p_partkey")
            .collect()
        )
    )
    layer_rows = tuple(
        sorted(
            (int(r[0]), int(r[1]))
            for r in load_table(spark, sf_dir, "nation")
            .select("n_nationkey", "n_regionkey")
            .collect()
        )
    )
    fast = dict(requests_per_second=1e9, backoff_s=0.0, max_concurrency=4)
    return PipelineConfig(
        maps_source=RestSourceConfig(
            url_template="http://fake/maps.json?page={page}&per_page={per_page}",
            per_page=50,
            fetcher=functools.partial(_serve, kind="maps", rows=map_keys),
            **fast,
        ),
        layers_source=RestSourceConfig(
            url_template="http://fake/layers.json?page={page}&per_page={per_page}",
            per_page=10,
            fetcher=functools.partial(_serve, kind="layers", rows=layer_rows),
            **fast,
        ),
    )


# One pipeline run per (session, sf_dir); all pipe_* queries read the
# same checkpoint outputs.
_RUNS: dict = {}


def _outputs(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (spark, sf_dir)
    if key not in _RUNS:
        workdir = tempfile.mkdtemp(prefix="mw_pipeline_")
        _RUNS[key] = run_pipeline(spark, _config(spark, sf_dir), workdir)
    return _RUNS[key]


# ---------------------------------------------------------------------------
# End-to-end with the mask-fetch hop (reference getMask,
# mapwarper.js:79-110): the maps API serves items WITHOUT mask data;
# a per-map mask endpoint serves {mask, gcps}; download fetches masks
# for the gated subset, the Arrow GCP stage transforms them, and both
# steps run through run_pipeline's parquet checkpoint chain. The
# fixture GCPs are the exact-affine family from
# enrichment.synthetic_masked_maps, so the oracle SQL is shared
# verbatim with mw_gcp_transform — any drift anywhere in the chain
# (pagination, JSON, keyed fetch, join-back, enrichment, checkpoint)
# breaks the hash.
# ---------------------------------------------------------------------------


def _affine_params(k: int):
    a = (k % 3 + 1) * 0.0001
    e = (k % 2 + 2) * 0.00005
    c = -74.0 + k * 0.001
    f0 = 40.7 + k * 0.0005
    w = float(k % 50 + 100)
    h = float(k % 40 + 80)
    return a, e, c, f0, w, h


def _map_item_unenriched(k: int) -> dict:
    row = _map_item(k)
    row["maskGeometry"] = None
    row["gcps"] = None
    row["maskError"] = None
    # gating mirrors enrichment.synthetic_masked_maps: k%10 unmasked
    row["mask_status"] = "unmasked" if k % 10 == 0 else "masked"
    return row


def _serve_mask(url: str, timeout_s: float) -> FetchResult:
    from urllib.parse import urlparse

    k = int(urlparse(url).path.split("/")[-2])
    a, e, c, f0, w, h = _affine_params(k)

    def gcp(px: float, py: float) -> list:
        return [px, py, e * py + f0, a * px + c]

    if k % 17 == 0:
        gcps = [gcp(0.0, 0.0), gcp(200.0, 0.0)]
    else:
        gcps = [
            gcp(0.0, 0.0),
            gcp(200.0, 0.0),
            gcp(0.0, 200.0),
            gcp(200.0, 200.0),
        ]
    ring = [[0.0, 0.0], [w, 0.0], [w, h], [0.0, h], [0.0, 0.0]]
    return FetchResult(200, json.dumps({"mask": ring, "gcps": gcps}))


def _serve_unenriched(url: str, timeout_s: float, rows: tuple) -> FetchResult:
    q = parse_qs(urlparse(url).query)
    page = int(q["page"][0])
    per_page = int(q["per_page"][0])
    items = [_map_item_unenriched(k) for k in rows]
    start = (page - 1) * per_page
    body = {
        "total_entries": len(items),
        "items": items[start : start + per_page],
    }
    return FetchResult(200, json.dumps(body))


def _e2e_config(spark: SparkSession, sf_dir: str) -> PipelineConfig:
    base = _config(spark, sf_dir)
    map_keys = base.maps_source.fetcher.keywords["rows"]
    fast = dict(requests_per_second=1e9, backoff_s=0.0, max_concurrency=4)
    return PipelineConfig(
        maps_source=RestSourceConfig(
            url_template="http://fake/maps.json?page={page}&per_page={per_page}",
            per_page=50,
            fetcher=functools.partial(_serve_unenriched, rows=map_keys),
            **fast,
        ),
        layers_source=base.layers_source,
        mask_source=RestSourceConfig(
            url_template="http://fake/maps/{id}/mask.json",
            fetcher=_serve_mask,
            **fast,
        ),
        enrich=True,
        transform_order=1,
    )


_E2E_RUNS: dict = {}


def _e2e_outputs(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (spark, sf_dir)
    if key not in _E2E_RUNS:
        workdir = tempfile.mkdtemp(prefix="mw_pipeline_e2e_")
        _E2E_RUNS[key] = run_pipeline(spark, _e2e_config(spark, sf_dir), workdir)
    return _E2E_RUNS[key]


def pipe_rest_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    maps = _e2e_outputs(spark, sf_dir)["maps"]
    ring0 = F.element_at(F.col("maskGeometry")["coordinates"], 1)
    return (
        maps.filter(F.col("maskGeometry").isNotNull())
        .select("id", F.posexplode(ring0).alias("idx", "pt"))
        .select(
            "id",
            "idx",
            F.round(F.element_at("pt", 1), 6).alias("lon"),
            F.round(F.element_at("pt", 2), 6).alias("lat"),
        )
    )


from .enrichment import ORACLE as ENRICH_ORACLE  # noqa: E402

_register(
    "pipe_rest_end_to_end",
    pipe_rest_end_to_end,
    ENRICH_ORACLE["mw_gcp_transform"],
)


# ---------------------------------------------------------------------------
# Queries — projections identical to the mw_* fixture queries, oracle
# SQL shared verbatim.
# ---------------------------------------------------------------------------


def pipe_map_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _outputs(spark, sf_dir)["map_objects"]
    return out.select(
        "id",
        "name",
        "validSince",
        "validUntil",
        F.col("data.description").alias("description"),
        F.col("data.imageId").alias("imageId"),
        F.col("data.uuid").alias("uuid"),
        F.col("data.parentUuid").alias("parentUuid"),
        F.col("data.inset").alias("inset"),
        F.col("data.masked").alias("masked"),
        F.col("data.nyplUrl").alias("nyplUrl"),
        F.col("data.tileUrl").alias("tileUrl"),
        F.col("data.area").alias("area"),
    )


_register("pipe_map_objects", pipe_map_objects, MW_ORACLE["mw_map_objects"])


def pipe_layer_objects(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _outputs(spark, sf_dir)["layer_objects"]
    return out.select(
        "id",
        "name",
        "validSince",
        "validUntil",
        F.col("data.mapCount").alias("mapCount"),
        F.col("data.tileUrl").alias("tileUrl"),
        F.element_at(F.col("data.bbox"), 1).alias("bbox_w"),
        F.element_at(F.col("data.bbox"), 2).alias("bbox_s"),
        F.element_at(F.col("data.bbox"), 3).alias("bbox_e"),
        F.element_at(F.col("data.bbox"), 4).alias("bbox_n"),
    )


_register(
    "pipe_layer_objects", pipe_layer_objects, MW_ORACLE["mw_layer_objects"]
)


def pipe_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _outputs(spark, sf_dir)["relations"]


_register("pipe_relations", pipe_relations, MW_ORACLE["mw_relations"])


def pipe_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = _outputs(spark, sf_dir)["logs"]
    return logs.select("id", "imageId", F.explode("logs").alias("log")).select(
        "id",
        "imageId",
        F.col("log.type").alias("log_type"),
        F.col("log.message").alias("message"),
    )


_register("pipe_logs", pipe_logs, MW_ORACLE["mw_map_logs"])
