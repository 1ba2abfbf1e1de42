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


def test_assign_foreign_key_plan_has_no_window(spark):
    """The scale property: no global (single-partition) window anywhere in
    the FK plan — ordinals come from per-partition offsets."""
    src = spark.createDataFrame([(10,), (20,), (30,)], "cust_id long")
    tgt = generate(
        spark,
        [FieldSpec("order_id", "long", min=0, max=10**6, seed=4),
         FieldSpec("cust_id", "long", min=0, max=0)],
        90,
        num_partitions=4,
    )
    out = assign_foreign_key(tgt, src, "cust_id", "cust_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # ordinals must still be dense: every row got a key
    assert out.where(F.col("cust_id").isNull()).count() == 0


def test_distributed_ordinal_dense_unique(spark):
    from data_caterer_spark.operators.generator import with_distributed_ordinal

    df = with_distributed_ordinal(spark.range(0, 1000, 1, 7))
    got = sorted(r["__ord"] for r in df.collect())
    assert got == list(range(1000))


def test_assign_foreign_key_composite_and_empty(spark):
    src = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x")], "k1 int, k2 string"
    )
    tgt = generate(
        spark,
        [FieldSpec("a", "int", min=0, max=9, seed=3),
         FieldSpec("k1", "int"), FieldSpec("k2")],
        60,
        num_partitions=3,
    )
    out = assign_foreign_key(tgt, src, ["k1", "k2"], ["k1", "k2"])
    got = {(r["k1"], r["k2"]) for r in out.collect()}
    assert got == {(1, "x"), (1, "y"), (2, "x")}
    with pytest.raises(ValueError, match="empty"):
        assign_foreign_key(tgt, src.where("k1 > 99"), "k1", "k1")


def test_foreign_key_toposort_and_apply(spark):
    from data_caterer_spark.operators.generator import (
        apply_foreign_keys,
        foreign_key_insert_order,
    )

    assert foreign_key_insert_order([("A", "B"), ("B", "C"), ("A", "C")]) == [
        "A", "B", "C",
    ]
    with pytest.raises(ValueError, match="cycle"):
        foreign_key_insert_order([("A", "B"), ("B", "A")])
    # chained references: C.k must come from B.k AFTER B.k was re-assigned
    a = spark.createDataFrame([(100,), (200,)], "k long")
    b = generate(spark, [FieldSpec("k", "long", min=0, max=0),
                         FieldSpec("x", "int", min=0, max=9, seed=5)], 10)
    c = generate(spark, [FieldSpec("k", "long", min=0, max=0)], 20)
    tables, order = apply_foreign_keys(
        {"A": a, "B": b, "C": c},
        [("A", "k", "B", "k"), ("B", "k", "C", "k")],
    )
    assert order == ["A", "B", "C"]
    assert {r["k"] for r in tables["B"].collect()} == {100, 200}
    assert {r["k"] for r in tables["C"].collect()} <= {100, 200}


def test_regex_generator(spark):
    """Mirror of RegexDataGeneratorTest.scala: ACC100[0-9]{5} -> length 11,
    prefix ACC100, full-pattern match; missing pattern raises."""
    import re

    df = generate(
        spark, [FieldSpec("acc", regex="ACC100[0-9]{5}", seed=1)], 50
    )
    pat = re.compile(r"^ACC100[0-9]{5}$")
    for r in df.collect():
        assert len(r["acc"]) == 11
        assert r["acc"].startswith("ACC100")
        assert pat.match(r["acc"])
    with pytest.raises(ValueError, match="regex"):
        field_sql(FieldSpec("f", "regex"))


def test_regex_subset_features(spark):
    import re

    cases = {
        "[A-Z]{2}-[0-9]{4}": r"^[A-Z]{2}-[0-9]{4}$",
        "(foo|ba[rz]){2}": r"^(foo|ba[rz]){2}$",
        "x[0-9]?y+": r"^x[0-9]?y+$",
        "\\d{3}(\\.| )\\w{2}": r"^[0-9]{3}(\.| )[a-zA-Z0-9_]{2}$",
        "a{2,4}": r"^a{2,4}$",
    }
    fields = [
        FieldSpec(f"f{i}", regex=p, seed=10 + i)
        for i, p in enumerate(cases)
    ]
    rows = generate(spark, fields, 200).collect()
    for i, (gen_pat, check_pat) in enumerate(cases.items()):
        rx = re.compile(check_pat)
        for r in rows:
            assert rx.match(r[f"f{i}"]), (gen_pat, r[f"f{i}"])
    # two digits from one {2} must not be perfectly correlated (per-draw seeds)
    digits = generate(spark, [FieldSpec("d", regex="[0-9]{2}", seed=3)], 200)
    assert digits.where("substr(d,1,1) != substr(d,2,1)").count() > 0


def test_regex_unsupported_patterns():
    from data_caterer_spark.operators.regexgen import regex_sql

    for bad in ["a(b", "[a-", "[^ab]", "a**", "a{4,2}", "\\p{L}", "."]:
        with pytest.raises(ValueError):
            regex_sql(bad)


def test_typed_generators_struct_decimal_binary_normal(spark):
    from decimal import Decimal

    fields = [
        FieldSpec("fee", "decimal", precision=8, scale=2, min=0, max=100, seed=1),
        FieldSpec("blob", "binary", min_len=3, max_len=6, seed=2),
        FieldSpec("norm", "double", stddev=2.0, mean=50.0, seed=3),
        FieldSpec("nested", "struct", seed=4, fields=[
            FieldSpec("city", one_of=["ny", "sf"]),
            FieldSpec("deep", "struct", fields=[FieldSpec("z", "int", min=0, max=5)]),
        ]),
    ]
    df = generate(spark, fields, 2000, num_partitions=4)
    assert df.schema.simpleString() == (
        "struct<fee:decimal(8,2),blob:binary,norm:double,"
        "nested:struct<city:string,deep:struct<z:int>>>"
    )
    rows = df.collect()
    for r in rows[:200]:
        assert Decimal("0") <= r["fee"] <= Decimal("100")
        assert 3 <= len(r["blob"]) <= 6
        assert r["nested"]["city"] in ("ny", "sf")
        assert 0 <= r["nested"]["deep"]["z"] <= 5
    import statistics

    norms = [r["norm"] for r in rows]
    assert abs(statistics.mean(norms) - 50.0) < 0.5
    assert abs(statistics.pstdev(norms) - 2.0) < 0.3
    with pytest.raises(ValueError, match="scale"):
        field_sql(FieldSpec("f", "decimal", precision=2, scale=2))


def test_infer_field_specs_round_trip(spark):
    """profile -> FieldSpec -> regenerate: type/range/one-of fidelity
    (MetadataUtil.scala:43-112)."""
    from data_caterer_spark.operators.inference import (
        infer_field_specs,
        profile_columns,
    )

    src = generate(
        spark,
        [
            FieldSpec("amount", "double", min=10, max=20, seed=1),
            FieldSpec("status", one_of=["a", "b", "c"], seed=2),
            FieldSpec("name", "string", min_len=4, max_len=8, seed=3),
            FieldSpec("qty", "int", min=0, max=50000, seed=4, null_prob=0.2),
            FieldSpec("bucket", "int", min=0, max=4, seed=5),
        ],
        3000,
        num_partitions=4,
    )
    profs = {p.name: p for p in profile_columns(src)}
    assert profs["status"].is_oneof()
    assert not profs["amount"].is_oneof()
    assert 0.15 < profs["qty"].null_ratio < 0.25

    specs = {s.name: s for s in infer_field_specs(src, seed=9)}
    assert specs["status"].type == "oneOf"
    assert sorted(specs["status"].one_of) == ["a", "b", "c"]
    assert specs["amount"].type == "double"
    assert specs["qty"].type == "int"
    # low-cardinality int is a one-of per the reference's threshold rule,
    # with NATIVE-typed values (reference stringifies; we keep the type)
    assert specs["bucket"].type == "oneOf"
    assert all(isinstance(v, int) for v in specs["bucket"].one_of)

    regen = generate(spark, list(specs.values()), 1000).collect()
    for r in regen:
        assert r["status"] in ("a", "b", "c")
        assert 10 <= r["amount"] <= 20
        assert 4 <= len(r["name"]) <= 8
        assert r["qty"] is None or 0 <= r["qty"] <= 50000
        assert r["bucket"] in (0, 1, 2, 3, 4)
