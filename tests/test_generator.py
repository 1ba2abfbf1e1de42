"""Generator tests — exact emitted SQL (mirroring the reference's pinned
expression tests, ``RandomDataGeneratorTest.scala:87,106``) plus sampled
bounds/behavior over real materialization."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.operators.generator import (
    FieldSpec,
    assign_foreign_key,
    enforce_unique,
    field_sql,
    generate,
    per_column_count,
    wrapped_field_sql,
)


def test_exact_int_expression():
    # reference pins "CAST(ROUND(RAND() * 5 + 5, 0) AS INT)" for min 5 max 10
    assert field_sql(FieldSpec("f", "int", min=5, max=10)) == (
        "CAST(ROUND(RAND() * 5 + 5, 0) AS INT)"
    )
    assert field_sql(FieldSpec("f", "int", min=5, max=10, seed=1)) == (
        "CAST(ROUND(RAND(1) * 5 + 5, 0) AS INT)"
    )


def test_exact_boolean_and_oneof():
    assert field_sql(FieldSpec("f", "boolean")) == "BOOLEAN(ROUND(RAND()))"
    assert field_sql(FieldSpec("f", one_of=["a", "b"])) == (
        "ELEMENT_AT(ARRAY('a', 'b'), CAST(RAND() * 2 AS INT) + 1)"
    )


def test_null_edge_wrapping():
    sql = wrapped_field_sql(FieldSpec("f", "int", null_prob=0.1))
    assert sql.startswith("CASE WHEN RAND() <= 0.1 THEN NULL ELSE ")
    sql = wrapped_field_sql(FieldSpec("f", "double", edge_prob=0.05))
    assert "CASE WHEN RAND() <= 0.05 THEN" in sql and "NaN" in sql


def test_generated_bounds_and_types(spark):
    fields = [
        FieldSpec("i", "int", min=5, max=10, seed=42),
        FieldSpec("l", "long", min=-100, max=100, seed=7),
        FieldSpec("d", "double", min=0, max=1, seed=3),
        FieldSpec("s", "string", min_len=5, max_len=10, seed=9),
        FieldSpec("b", "boolean", seed=11),
        FieldSpec("c", one_of=["x", "y", "z"], seed=13),
        FieldSpec("dt", "date", min="2020-01-01", max="2020-12-31", seed=17),
        FieldSpec(
            "ts", "timestamp",
            min="2020-01-01 00:00:00", max="2020-01-02 00:00:00", seed=19,
        ),
        FieldSpec("arr", "array", element=FieldSpec("e", "int", min=0, max=9),
                  array_min_len=1, array_max_len=4, seed=23),
        FieldSpec("derived", sql="i * 2"),
    ]
    df = generate(spark, fields, 500)
    rows = df.collect()
    assert len(rows) == 500
    for r in rows:
        assert 5 <= r["i"] <= 10
        assert -100 <= r["l"] <= 100
        assert 0.0 <= r["d"] <= 1.0
        assert 5 <= len(r["s"]) <= 10
        assert r["b"] in (True, False)
        assert r["c"] in ("x", "y", "z")
        assert dt.date(2020, 1, 1) <= r["dt"] <= dt.date(2020, 12, 31)
        assert 1 <= len(r["arr"]) <= 4 and all(0 <= e <= 9 for e in r["arr"])
        assert r["derived"] == r["i"] * 2
    # seeded determinism: same spec -> same data
    again = generate(spark, fields, 500).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_null_injection_rate(spark):
    df = generate(spark, [FieldSpec("x", "int", null_prob=0.3, seed=5)], 2000)
    frac = df.where(F.col("x").isNull()).count() / 2000
    assert 0.2 < frac < 0.4


def test_per_column_count(spark):
    base = generate(spark, [FieldSpec("k", "int", min=0, max=9, seed=1)], 50)
    fixed = per_column_count(base, 3)
    assert fixed.count() == 150
    varied = per_column_count(base, 4, rand_seed=2, vary=True)
    per = varied.groupBy("k").count()
    assert varied.count() >= 50


def test_enforce_unique(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k int")
    prev = spark.createDataFrame([(3,), (4,)], "k int")
    got = sorted(r["k"] for r in enforce_unique(df, ["k"], prev).collect())
    assert got == [1, 2]


def test_assign_foreign_key(spark):
    src = spark.createDataFrame([(10,), (20,), (30,)], "cust_id long")
    tgt = generate(spark, [FieldSpec("order_id", "long", min=0, max=10**6, seed=4),
                           FieldSpec("cust_id", "long", min=0, max=0)], 90)
    out = assign_foreign_key(tgt, src, "cust_id", "cust_id")
    vals = [r["cust_id"] for r in out.collect()]
    assert set(vals) == {10, 20, 30}
    # ordinal round-robin: balanced assignment
    from collections import Counter
    assert set(Counter(vals).values()) == {30}
