"""End-to-end tests for the two-step pipeline (pipeline.py).

The pipeline must reproduce the standalone operators' outputs exactly
(same fixture records served through the fake REST API, JSON
round-trip, parquet checkpoints) and quarantine fetch errors as data.
"""

from __future__ import annotations

from etl_mapwarper_spark.operators.mapwarper import (
    map_objects,
    synthetic_maps,
)
from etl_mapwarper_spark.operators.pipeline_queries import _config, _outputs
from etl_mapwarper_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from etl_mapwarper_spark.sources.paginated_rest import RestSourceConfig

from conftest import SF_DIR


def _rows(df, cols):
    return sorted(map(repr, df.select(*cols).collect()))


def test_pipeline_matches_operator_outputs(spark, tmp_path):
    out = _outputs(spark, SF_DIR)
    direct = map_objects(synthetic_maps(spark, SF_DIR))
    cols = ["id", "name", "validSince", "validUntil", "data", "geometry"]
    assert _rows(out["map_objects"], cols) == _rows(direct, cols)
    # unified boundary stream holds every object exactly once
    n_maps = direct.count()
    n_layers = out["layer_objects"].count()
    assert out["objects"].count() == n_maps + n_layers
    # relation targets use the layer surrogate key
    rel = out["relations"]
    assert rel.filter(~rel.dst.startswith("layer-")).count() == 0


def test_pipeline_outputs_are_checkpointed(spark, tmp_path):
    """Step 2 reads ONLY step 1's directory — rerunning transform from
    the checkpoint gives identical results without refetching."""
    from etl_mapwarper_spark.pipeline import PipelineDirs, transform

    cfg = _config(spark, SF_DIR)
    wd = str(tmp_path / "pipe")
    run_pipeline(spark, cfg, wd)
    again = transform(
        spark,
        cfg,
        PipelineDirs(current=str(tmp_path / "re"), previous=f"{wd}/step0_download"),
    )
    out = _outputs(spark, SF_DIR)
    cols = ["id", "name", "validSince", "validUntil"]
    assert _rows(again["map_objects"], cols) == _rows(out["map_objects"], cols)


def test_download_quarantines_fetch_errors(spark, tmp_path):
    """A failing page becomes error records; the step still completes
    and good pages' items survive (reference mapwarper.js:122-129)."""
    from etl_mapwarper_spark.sources.paginated_rest import (
        with_injected_failures,
    )

    base = _config(spark, SF_DIR)
    flaky_maps = RestSourceConfig(
        url_template=base.maps_source.url_template,
        per_page=base.maps_source.per_page,
        requests_per_second=1e9,
        backoff_s=0.0,
        retries=1,
        max_concurrency=4,
        fetcher=with_injected_failures(base.maps_source.fetcher, [2]),
    )
    cfg = PipelineConfig(
        maps_source=flaky_maps, layers_source=base.layers_source
    )
    from etl_mapwarper_spark.pipeline import PipelineDirs, download

    out = download(
        spark, cfg, PipelineDirs(current=str(tmp_path / "dl"), previous=None)
    )
    errs = out["map_errors"].collect()
    assert [e.page for e in errs] == [2]
    assert "HTTP 500" in errs[0].error
    # pages 1 and 3 still landed their items
    assert out["maps"].count() > 0


def test_download_maps_schema_stable_across_enrich_flag(spark, tmp_path):
    """With mask_source set, the checkpointed maps schema must be the
    same whether enrich ran or not: fetch failures land in maskError,
    maskGeometry always exists, and the internal mask_fetch_error /
    raw mask columns never leak into the checkpoint."""
    import dataclasses

    from etl_mapwarper_spark.operators.pipeline_queries import _e2e_config
    from etl_mapwarper_spark.pipeline import PipelineDirs, download

    def cols(enrich):
        cfg = dataclasses.replace(
            _e2e_config(spark, SF_DIR), enrich=enrich
        )
        out = download(
            spark,
            cfg,
            PipelineDirs(
                current=str(tmp_path / f"dl_{enrich}"), previous=None
            ),
        )
        return out["maps"].schema

    s_plain, s_enriched = cols(False), cols(True)
    # simpleString ignores nullability flags — the consumer-visible
    # column shape is what must not drift
    plain = {f.name: f.dataType.simpleString() for f in s_plain.fields}
    enriched = {f.name: f.dataType.simpleString() for f in s_enriched.fields}
    assert set(plain) == set(enriched), (
        f"schema drift: {set(plain) ^ set(enriched)}"
    )
    for name in ("maskError", "maskGeometry"):
        assert name in plain
        assert plain[name] == enriched[name]
    for leaked in ("mask_fetch_error", "mask"):
        assert leaked not in plain


def test_precheck_aborts_before_any_fetch(spark):
    """A missing enrichment dependency must abort the run driver-side
    BEFORE the first request (reference mapwarper.js:168-171), not as
    a mid-crawl executor error after politeness budget was spent."""
    import dataclasses

    import pytest

    from etl_mapwarper_spark.operators.pipeline_queries import _e2e_config
    from etl_mapwarper_spark.pipeline import PipelineDirs, download

    calls = []

    def exploding_fetcher(url, timeout_s):
        calls.append(url)
        raise AssertionError("fetch happened despite failed precheck")

    base = _e2e_config(spark, SF_DIR)
    cfg = dataclasses.replace(
        base,
        maps_source=dataclasses.replace(
            base.maps_source, fetcher=exploding_fetcher
        ),
        layers_source=dataclasses.replace(
            base.layers_source, fetcher=exploding_fetcher
        ),
        required_modules=("definitely_not_a_real_module_xyz",),
    )
    with pytest.raises(RuntimeError, match="precheck failed"):
        download(spark, cfg, PipelineDirs(current="/tmp/never", previous=None))
    assert calls == [], "precheck must run before any fetch"
    # and a satisfiable precheck passes
    dataclasses.replace(base, required_modules=("json", "math")).precheck()


def test_export_ndjson_single_file_golden(spark, tmp_path):
    """export_ndjson_file writes ONE newline-delimited file whose bytes
    match the reference sink format (mapwarper.js:164-165): compact
    JSON.stringify per record, nulls dropped, one '\\n' between."""
    from pyspark.sql import functions as F

    from etl_mapwarper_spark.pipeline import export_ndjson_file

    # objects-boundary shape (mapwarper.dataset.json: id/type/name/
    # validSince/validUntil + serialized data payload)
    df = spark.createDataFrame(
        [
            ("26986", "st:Map", "Plate 1", 1857, 1857, '{"nyplDigitalId":"X1"}'),
            ("layer-860", "st:Layer", "Manhattan", 1857, None, '{"mapsCount":4}'),
        ],
        "id string, type string, name string, validSince int, validUntil int, data_json string",
    ).coalesce(1).orderBy("id")
    out = tmp_path / "objects.ndjson"
    export_ndjson_file(df, str(out))
    expected = (
        '{"id":"26986","type":"st:Map","name":"Plate 1","validSince":1857,'
        '"validUntil":1857,"data_json":"{\\"nyplDigitalId\\":\\"X1\\"}"}\n'
        '{"id":"layer-860","type":"st:Layer","name":"Manhattan",'
        '"validSince":1857,"data_json":"{\\"mapsCount\\":4}"}\n'
    )
    assert out.read_text() == expected
    assert out.is_file()
