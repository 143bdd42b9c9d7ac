"""JSON-Schema→StructType converter: unit + live output contract.

The integration test loads the reference's actual dataset descriptor
(read-only) and checks our transform outputs against the declared
contract — the same validation the reference framework applies to
every written object (mapwarper.js:432).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from etl_mapwarper_spark.functions.json_schema import (  # noqa: E402
    apply_flatten_paths,
    json_schema_to_datatype,
)
from tests.conftest import SF_DIR  # noqa: E402

DESCRIPTOR = "/root/reference/mapwarper.dataset.json"


def test_scalars_and_required_nullability():
    dt = json_schema_to_datatype(
        {
            "type": "object",
            "required": ["a"],
            "properties": {
                "a": {"type": "string"},
                "b": {"type": "integer"},
                "c": {"type": "number"},
                "d": {"type": "boolean"},
            },
        }
    )
    assert dt == T.StructType(
        [
            T.StructField("a", T.StringType(), False),
            T.StructField("b", T.LongType(), True),
            T.StructField("c", T.DoubleType(), True),
            T.StructField("d", T.BooleanType(), True),
        ]
    )


def test_array_tuple_items_and_typo_type():
    # draft-04 tuple form collapses to merged element type; an items
    # key implies array even with a misspelled type (observed in the
    # reference descriptor: "aray")
    dt = json_schema_to_datatype(
        {
            "type": "aray",
            "items": [{"type": "number"}, {"type": "number"}],
        }
    )
    assert dt == T.ArrayType(T.DoubleType())


def test_oneof_merges_variants_with_nullability():
    dt = json_schema_to_datatype(
        {
            "oneOf": [
                {
                    "type": "object",
                    "required": ["x"],
                    "properties": {"x": {"type": "string"}},
                },
                {
                    "type": "object",
                    "required": ["y"],
                    "properties": {"y": {"type": "integer"}},
                },
            ]
        }
    )
    # both fields nullable: each is absent from the other variant
    assert dt == T.StructType(
        [
            T.StructField("x", T.StringType(), True),
            T.StructField("y", T.LongType(), True),
        ]
    )


@pytest.mark.skipif(
    not os.path.exists(DESCRIPTOR), reason="reference descriptor not present"
)
def test_output_contract_matches_descriptor(spark):
    """Our map/layer object ``data`` structs carry exactly the fields
    the descriptor's variants declare, with compatible Spark types."""
    descriptor = json.load(open(DESCRIPTOR))
    variants = descriptor["schema"]["oneOf"]
    by_marker = {
        ("mapCount" if "mapCount" in v["properties"] else "map"): v
        for v in variants
    }
    layer_dt = json_schema_to_datatype(by_marker["mapCount"])
    map_dt = json_schema_to_datatype(by_marker["map"])

    from etl_mapwarper_spark.operators.mapwarper import (
        map_objects,
        synthetic_layers,
        synthetic_maps,
        transform_layers,
    )

    map_df = map_objects(synthetic_maps(spark, SF_DIR))
    layer_df = transform_layers(synthetic_layers(spark, SF_DIR))

    map_fields = {
        f.name: f.dataType for f in map_df.schema["data"].dataType.fields
    }
    layer_fields = {
        f.name: f.dataType for f in layer_df.schema["data"].dataType.fields
    }
    assert set(map_fields) == {
        f.name for f in map_dt.fields
    }, "map data struct drifted from the declared contract"
    assert set(layer_fields) == {f.name for f in layer_dt.fields}
    # spot-check types on contract-critical fields
    assert isinstance(map_fields["area"], T.DoubleType)
    assert isinstance(map_fields["gcps"], T.ArrayType)
    assert isinstance(layer_fields["bbox"], T.ArrayType)
    assert isinstance(layer_fields["mapCount"], (T.LongType, T.IntegerType))


@pytest.mark.skipif(
    not os.path.exists(DESCRIPTOR), reason="reference descriptor not present"
)
def test_flatten_paths_project_declared_columns(spark):
    descriptor = json.load(open(DESCRIPTOR))
    from etl_mapwarper_spark.operators.mapwarper import (
        map_objects,
        synthetic_maps,
    )

    map_df = map_objects(synthetic_maps(spark, SF_DIR))
    flat = apply_flatten_paths(map_df, descriptor["flattenPaths"])
    # map-variant flatten targets present as top-level columns now
    for col in ["uuid", "inset", "imageId", "area", "gcps"]:
        assert col in flat.columns
    assert "data" not in flat.columns
    assert flat.count() == map_df.count()
