"""Metadata-source schema import: Marquez / OpenMetadata documents ->
FieldSpec trees -> runnable generation plans, plus profile enrichment
(reference surface: MetadataSourceBuilder.scala / MetadataSourceModels
.scala with the sample documents' shapes)."""

from __future__ import annotations

import os

import pytest

from data_caterer_spark.operators import metadata as M
from data_caterer_spark.operators.generator import generate

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "metadata")
MARQUEZ = os.path.join(FIXTURES, "marquez_dataset.json")
OPENMETA = os.path.join(FIXTURES, "openmetadata_tables.json")


def test_marquez_parse_types():
    specs = {s.name: s for s in M.from_marquez(MARQUEZ)}
    assert specs["product_id"].type == "int"
    assert specs["sku"].type == "string"
    assert specs["summary"].type == "string"
    assert specs["unit_price"].type == "double"
    assert specs["in_stock"].type == "boolean"
    assert specs["added_on"].type == "date"
    assert specs["updated_at"].type == "timestamp"
    assert M.marquez_dataset_name(MARQUEZ) == "public.products"


def test_openmetadata_parse_nested():
    tables = M.from_openmetadata(OPENMETA)
    assert set(tables) == {"dim_shipment", "fact_delivery"}
    cols = {s.name: s for s in tables["dim_shipment"]}
    assert cols["shipment_id"].type == "long"
    assert cols["carrier"].type == "string" and cols["carrier"].max_len == 40
    assert cols["declared_value"].type == "decimal"
    assert cols["declared_value"].precision == 12
    assert cols["declared_value"].scale == 2
    assert cols["destination"].type == "struct"
    assert [f.name for f in cols["destination"].fields] == ["city", "zip"]
    assert cols["scan_events"].type == "array"
    assert cols["scan_events"].element.type == "struct"
    assert cols["tags"].type == "array"
    assert cols["tags"].element.type == "string"


def test_parse_errors():
    with pytest.raises(M.MetadataParseError, match="unmapped"):
        M.from_marquez('{"name": "x", "fields": [{"name": "g", "type": "GEOMETRY"}]}')
    with pytest.raises(M.MetadataParseError, match="no fields"):
        M.from_marquez('{"name": "x"}')
    with pytest.raises(M.MetadataParseError, match="no tables"):
        M.from_openmetadata('{"paging": {}}')


def test_generation_plan_purely_from_metadata(spark):
    """A generation run seeded by the metadata document ALONE: the
    generated schema mirrors the imported one, nested parts included."""
    specs = M.from_openmetadata(OPENMETA)["dim_shipment"]
    from dataclasses import replace

    specs = [replace(s, seed=100 + i) for i, s in enumerate(specs)]
    df = generate(spark, specs, 50, num_partitions=2)
    assert df.count() == 50
    dt = dict(df.dtypes)
    assert dt["shipment_id"] == "bigint"
    assert dt["declared_value"] == "decimal(12,2)"
    assert dt["destination"].startswith("struct<city:string,zip:string")
    assert dt["scan_events"].startswith("array<struct<ts:timestamp")
    assert dt["tags"] == "array<string>"
    row = df.first()
    assert row["destination"]["city"] is not None
    assert len(row["carrier"]) <= 40


def test_merge_with_profiles_overlays_observed_bounds(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # metadata knows names/types; the data supplies observed ranges
    specs = M.from_marquez(
        '{"name": "lineitem", "fields": ['
        '{"name": "l_quantity", "type": "NUMERIC"},'
        '{"name": "l_returnflag", "type": "VARCHAR"},'
        '{"name": "l_orderkey", "type": "BIGINT"}]}'
    )
    merged = {s.name: s for s in M.merge_with_profiles(specs, li)}
    # low-cardinality columns regenerate from their observed categories
    q = merged["l_quantity"]
    assert q.one_of is not None
    assert min(q.one_of) >= 1 and max(q.one_of) <= 50
    assert merged["l_returnflag"].one_of is not None
    assert set(merged["l_returnflag"].one_of) <= {"A", "N", "R"}
    # high-cardinality numerics get observed bounds
    k = merged["l_orderkey"]
    assert k.one_of is None and k.min is not None and k.max > k.min
