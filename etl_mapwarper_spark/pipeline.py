"""Two-step ETL pipeline — the reference's public API surface.

The reference module's ENTIRE public API is an ordered list of step
functions, ``module.exports.steps = [download, transform]``
(mapwarper.js:441-444), run by a framework that hands each step its
output dir (``dirs.current``) and the previous step's output dir
(``dirs.previous``; :152-153, :424). This module re-expresses that
contract Spark-first:

- a step is ``step(spark, config, dirs) -> dict[str, DataFrame]`` —
  it writes its outputs under ``dirs.current`` and returns the
  DataFrames it wrote (handy for tests and interactive use);
- the inter-step handoff is **Parquet** (columnar, splittable,
  prunable), not the reference's NDJSON (:152-153 ↔ :424) — NDJSON
  remains available at the export boundary via ``export_ndjson``;
- ``run_pipeline`` chains the steps exactly like the spacetime-etl
  framework: step N+1's ``dirs.previous`` is step N's
  ``dirs.current`` — which also gives step-level restartability, the
  same property the reference gets from its directory convention.

Step 1 — ``download`` (reference :151-219): paginated REST scans
(count-first fan-out for maps :183-199, short-page loop for layers
:112-149), error quarantine (:122-129), optional conditional
mask→GeoJSON enrichment (:79-110) and optional map↔layer membership
join (:57-77, replaced by a real aggregate+broadcast join).

Step 2 — ``transform`` (reference :417-437): route records by type
(:418-421), validation split into clean objects vs quarantine logs
(:358-361), relation edge derivation (:333-346), layer projection
(:399-415); writes ``objects``, ``relations``, ``logs`` sinks.

Scale: every transform is a narrow column expression over the
parquet checkpoint — one scan stage per input, no shuffle (only the
optional membership join shuffles, and its aggregated side is
broadcast). The REST scan's parallelism is bounded by the politeness
budget, not the cluster size (see sources/paginated_rest.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .operators.enrichment import attach_map_layers, enrich_masks
from .operators.mapwarper import (
    map_logs,
    map_objects,
    map_relations,
    transform_layers,
)
from .sources.ndjson import to_ndjson_lines
from .sources.paginated_rest import (
    RestSourceConfig,
    fetch_count,
    page_errors,
    page_items,
    scan_pages,
    scan_until_short_page,
)

# Item schemas for the two REST streams (the reference reads these
# fields off the API JSON; SURVEY.md §1.2-1.3). maskGeometry/gcps are
# present when the API items arrive pre-enriched (or after the
# enrichment stage fills them).
MAP_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("nypl_digital_id", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("parent_uuid", T.StringType()),
        T.StructField("bbox", T.StringType()),
        T.StructField("map_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("mask_status", T.StringType()),
        T.StructField("transform_options", T.StringType()),
        T.StructField("depicts_year", T.StringType()),
        T.StructField("issue_year", T.StringType()),
        T.StructField("maskError", T.StringType()),
        T.StructField(
            "maskGeometry",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField(
                        "coordinates",
                        T.ArrayType(T.ArrayType(T.ArrayType(T.DoubleType()))),
                    ),
                ]
            ),
        ),
        T.StructField("gcps", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("layerIds", T.ArrayType(T.LongType())),
    ]
)

LAYER_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("depicts_year", T.StringType()),
        T.StructField("issue_year", T.StringType()),
        T.StructField("maps_count", T.IntegerType()),
        T.StructField("bbox", T.StringType()),
    ]
)


@dataclass(frozen=True)
class PipelineDirs:
    """Mirror of the framework's dirs (mapwarper.js:152-153, :424)."""

    current: str
    previous: Optional[str] = None


@dataclass(frozen=True)
class PipelineConfig:
    """Pipeline parameters (the reference's ``config`` argument).

    ``enrich``: run the GCP mask→GeoJSON stage on mask/gcps columns
    (reference :79-110). Off when the API serves pre-enriched items.
    ``mask_source``: optional per-map mask endpoint (``{id}`` URL
    template). When set, ``download`` performs the reference's mask
    FETCH hop (getMask, :79-110) before the transform: masked maps'
    ``mask``/``gcps`` come from this endpoint rather than the items
    payload, and fetch failures surface as ``maskError``.
    ``map_layers_source``: optional membership stream config; when
    set, ``download`` attaches ``layerIds`` via a real join instead
    of the reference's N+1 lookups (``config.includeMapLayers``,
    :172-181).
    """

    maps_source: RestSourceConfig
    layers_source: RestSourceConfig
    mask_source: Optional[RestSourceConfig] = None
    map_item_schema: T.StructType = field(default=MAP_ITEM_SCHEMA)
    layer_item_schema: T.StructType = field(default=LAYER_ITEM_SCHEMA)
    enrich: bool = False
    transform_order: int = 1
    map_layers_source: Optional[RestSourceConfig] = None
    map_layers_item_schema: T.StructType = field(
        default_factory=lambda: T.StructType(
            [
                T.StructField("map_id", T.LongType()),
                T.StructField("layer_id", T.LongType()),
            ]
        )
    )
    # Importable module names an enrichment stage needs at runtime;
    # checked driver-side BEFORE any fetch/submit (see precheck).
    required_modules: tuple = ()

    def precheck(self) -> None:
        """Fail fast before any work is submitted.

        Mirror of the reference's environment gate (mapwarper.js:
        168-171 aborts the whole run when gdal_translate is missing).
        Without this, a missing optional dependency surfaces as a
        mid-crawl executor NotImplementedError after the politeness
        budget was already spent. The engine's own GCP transform is
        numpy-native, so ``enrich`` implies numpy; callers extend via
        ``required_modules`` (e.g. codec libs for media enrichment).
        """
        import importlib

        mods = set(self.required_modules)
        if self.enrich:
            mods.add("numpy")
        missing = []
        for m in sorted(mods):
            try:
                importlib.import_module(m)
            except ImportError:
                missing.append(m)
        if missing:
            raise RuntimeError(
                "pipeline precheck failed — missing required "
                f"dependencies {missing}; aborting before any fetch "
                "(reference mapwarper.js:168-171)"
            )


def _write(df: DataFrame, dirs: PipelineDirs, name: str) -> DataFrame:
    df.write.mode("overwrite").parquet(os.path.join(dirs.current, name))
    return df


def download(
    spark: SparkSession, config: PipelineConfig, dirs: PipelineDirs
) -> dict[str, DataFrame]:
    """Step 1 (reference :151-219): crawl maps + layers, quarantine
    fetch errors, optionally enrich masks and attach layer membership;
    checkpoint everything as parquet under ``dirs.current``."""
    config.precheck()  # abort before the first fetch (:168-171)
    out: dict[str, DataFrame] = {}

    # Layers branch (:155-166): short-page loop.
    layer_pages = scan_until_short_page(spark, config.layers_source)
    layers = page_items(layer_pages, config.layer_item_schema).drop("page")
    out["layers"] = _write(layers, dirs, "layers")
    out["layer_errors"] = _write(page_errors(layer_pages), dirs, "layer_errors")

    # Maps branch (:183-212): count precheck then fan-out.
    total = fetch_count(config.maps_source)
    num_pages = -(-total // config.maps_source.per_page)
    map_pages = scan_pages(spark, config.maps_source, num_pages)
    maps = page_items(map_pages, config.map_item_schema).drop("page")
    out["map_errors"] = _write(page_errors(map_pages), dirs, "map_errors")

    if config.mask_source is not None:
        # Reference getMask hop (:79-110): masks/GCPs come from the
        # Warper API per map, not the items payload.
        from pyspark.sql import functions as F

        from .operators.enrichment import fetch_masks

        maps = fetch_masks(
            spark,
            maps.drop("gcps", "maskGeometry", "maskError"),
            config.mask_source,
        )

    if config.enrich:
        maps = enrich_masks(maps, order=config.transform_order)
        if config.mask_source is not None:
            from pyspark.sql import functions as F

            # fetch-level errors win over transform-level ones, like
            # the reference's maskError attachment on fetch failure
            maps = maps.withColumn(
                "maskError",
                F.coalesce(F.col("mask_fetch_error"), F.col("maskError")),
            ).drop("mask_fetch_error")
    elif config.mask_source is not None:
        from pyspark.sql import functions as F

        # Schema-stable non-enrich branch: the checkpointed maps table
        # must look the same whether or not the transform ran — fetch
        # failures still surface as maskError (reference :90), and
        # maskGeometry exists (null: nothing computed it yet).
        maps = maps.withColumnRenamed(
            "mask_fetch_error", "maskError"
        ).withColumn(
            "maskGeometry",
            F.lit(None).cast(MAP_ITEM_SCHEMA["maskGeometry"].dataType),
        )
    if config.mask_source is not None:
        # raw pixel-space mask ring is fetch-internal (the transform
        # consumes it); MAP_ITEM_SCHEMA has no such column
        maps = maps.drop("mask")

    if config.map_layers_source is not None:
        membership_pages = scan_until_short_page(
            spark, config.map_layers_source
        )
        membership = page_items(
            membership_pages, config.map_layers_item_schema
        ).drop("page")
        maps = attach_map_layers(maps.drop("layerIds"), membership)

    out["maps"] = _write(maps, dirs, "maps")
    return out


def transform(
    spark: SparkSession, config: PipelineConfig, dirs: PipelineDirs
) -> dict[str, DataFrame]:
    """Step 2 (reference :417-437): previous checkpoint → objects +
    relations + logs sinks. The reference routes one mixed NDJSON
    stream by ``line.type`` (:418-421, :429); the Spark-first shape
    keeps one DataFrame per variant and unions the object outputs."""
    assert dirs.previous is not None, "transform needs dirs.previous"
    maps = spark.read.parquet(os.path.join(dirs.previous, "maps"))
    layers = spark.read.parquet(os.path.join(dirs.previous, "layers"))

    from pyspark.sql import functions as F

    mo = map_objects(maps)
    lo = transform_layers(layers)
    # Map and layer objects have different nested `data` shapes (the
    # reference's oneOf output schema, mapwarper.dataset.json:41-153);
    # they stay one-DataFrame-per-variant, and the unified tagged
    # stream serializes the variant payload to JSON at the boundary.
    def _boundary(df: DataFrame) -> DataFrame:
        cols = [
            "id",
            "type",
            "name",
            "validSince",
            "validUntil",
            F.to_json(F.col("data")).alias("data_json"),
        ]
        cols.append(
            F.to_json(F.col("geometry")).alias("geometry_json")
            if "geometry" in df.columns
            else F.lit(None).cast("string").alias("geometry_json")
        )
        return df.select(*cols)

    out = {
        "map_objects": _write(mo, dirs, "map_objects"),
        "layer_objects": _write(lo, dirs, "layer_objects"),
        "objects": _write(
            _boundary(mo).unionByName(_boundary(lo)), dirs, "objects"
        ),
        "relations": _write(map_relations(maps), dirs, "relations"),
        "logs": _write(map_logs(maps), dirs, "logs"),
    }
    return out


# The reference's public API (mapwarper.js:441-444).
steps: list[Callable[..., dict[str, DataFrame]]] = [download, transform]


def run_pipeline(
    spark: SparkSession, config: PipelineConfig, workdir: str
) -> dict[str, DataFrame]:
    """Run all steps; step N+1 reads step N's directory (framework
    semantics, :152-153 ↔ :424). Returns the union of step outputs."""
    outputs: dict[str, DataFrame] = {}
    previous: Optional[str] = None
    for i, step in enumerate(steps):
        current = os.path.join(workdir, f"step{i}_{step.__name__}")
        os.makedirs(current, exist_ok=True)
        outputs.update(
            step(spark, config, PipelineDirs(current=current, previous=previous))
        )
        previous = current
    return outputs


def export_ndjson(df: DataFrame, path: str) -> None:
    """Final-boundary NDJSON export (reference sink format, :164-165)."""
    to_ndjson_lines(df).write.mode("overwrite").text(path)


def export_ndjson_file(df: DataFrame, path: str) -> None:
    """SINGLE-file exact-format NDJSON export.

    The reference's sink is one newline-delimited file —
    ``JSON.stringify`` per record, ``intersperse('\\n')``, one write
    (mapwarper.js:164-165) — and that single file IS the framework
    handoff format. Spark's text sink writes a directory of
    part-files; this export writes them distributed (all
    serialization stays on executors via ``to_json``), then streams
    the parts in partition order into one file with a bounded-buffer
    copy — the driver never materializes the dataset, only relays
    bytes. Field order is the DataFrame's column order, so the byte
    format is stable for a given schema. Use for boundary handoffs
    only; 100 TB intermediates stay parquet (see sources/ndjson.py).
    """
    import glob
    import shutil

    tmp = path + ".parts.tmp"
    to_ndjson_lines(df).write.mode("overwrite").text(tmp)
    parts = sorted(glob.glob(os.path.join(tmp, "part-*")))
    with open(path, "wb") as out:
        for p in parts:
            with open(p, "rb") as src:
                shutil.copyfileobj(src, out, length=1 << 20)
    shutil.rmtree(tmp)
