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
