"""Exact-expression tests for the rule DSL.

Mirrors the reference's pinned emitted-SQL tests
(``api/src/test/.../ValidationConfigurationBuilderTest.scala:37-311``).
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import functions as F

from data_caterer_spark.operators.rules import (
    Rule,
    RuleSet,
    expr_rule,
    field,
    lit_sql,
)


def test_literal_rendering():
    assert lit_sql("abc") == "'abc'"
    assert lit_sql("o'brien") == "'o\\'brien'"
    assert lit_sql(10) == "10"
    assert lit_sql(1.5) == "1.5"
    assert lit_sql(True) == "true"
    assert lit_sql(date(2020, 1, 1)) == "DATE('2020-01-01')"
    assert lit_sql(datetime(2020, 1, 1, 2, 3, 4)) == "TIMESTAMP('2020-01-01 02:03:04')"


def test_emitted_expressions():
    f = field("amount")
    assert f.is_equal(10).expr == "amount == 10"
    assert f.is_not_equal(10).expr == "amount != 10"
    assert f.is_null().expr == "ISNULL(amount)"
    assert f.is_not_null().expr == "ISNOTNULL(amount)"
    assert f.less_than(100).expr == "amount < 100"
    assert f.less_than_or_equal(100).expr == "amount <= 100"
    assert f.greater_than(5).expr == "amount > 5"
    assert f.greater_than_or_equal(5).expr == "amount >= 5"
    assert f.between(5, 100).expr == "amount BETWEEN 5 AND 100"
    assert f.not_between(5, 100).expr == "amount NOT BETWEEN 5 AND 100"
    assert f.is_in(["a", "b"]).expr == "amount IN ('a', 'b')"
    assert f.not_in([1, 2]).expr == "amount NOT IN (1, 2)"
    assert f.is_equal_col("other").expr == "amount == other"
    assert f.less_than_col("other").expr == "amount < other"

    t = field("name")
    assert t.contains("pet").expr == "CONTAINS(name, 'pet')"
    assert t.not_contains("pet").expr == "!CONTAINS(name, 'pet')"
    assert t.matches("[a-z]+").expr == "REGEXP(name, '[a-z]+')"
    assert t.not_matches("[a-z]+").expr == "!REGEXP(name, '[a-z]+')"
    assert t.starts_with("p").expr == "STARTSWITH(name, 'p')"
    assert t.ends_with("r").expr == "ENDSWITH(name, 'r')"
    assert t.luhn_check().expr == "LUHN_CHECK(name)"
    assert t.has_type("string").expr == "TYPEOF(name) == 'string'"
    assert t.length_between(1, 10).expr == "LENGTH(name) BETWEEN 1 AND 10"

    a = field("tags")
    assert a.size(3).expr == "SIZE(tags) == 3"
    assert a.greater_than_size(1).expr == "SIZE(tags) > 1"
    assert a.less_than_or_equal_size(5).expr == "SIZE(tags) <= 5"


def test_boolean_algebra_and_modifiers():
    r = field("x").less_than(5) & field("y").is_not_null()
    assert r.expr == "(x < 5) AND (ISNOTNULL(y))"
    r2 = field("x").less_than(5) | field("x").greater_than(100)
    assert r2.expr == "(x < 5) OR (x > 100)"
    r3 = ~field("x").less_than(5)
    assert r3.expr == "!(x < 5)"
    r4 = field("x").less_than(5).with_id("small_x").threshold(0.1).describe("d")
    assert r4.rule_id == "small_x"
    assert r4.error_threshold == 0.1
    assert r4.description == "d"


def test_ruleset_hits_and_keep(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (200, "ok"), (5, None), (300, "bad")],
        "amount int, status string",
    )
    rs = RuleSet(
        [
            field("amount").less_than(100),
            field("status").is_equal("ok").flag_only(),
        ]
    )
    out = rs.apply(df).orderBy("amount").collect()
    assert [r.rule_hits for r in out] == [
        [],
        [],  # NULL status: rule evaluates NULL, not a failure (WHERE semantics)
        ["amount_less_than"],
        ["amount_less_than", "status_is_equal"],
    ]
    assert [r.keep for r in out] == [True, True, False, False]


def test_ruleset_rejects_duplicate_ids():
    import pytest

    with pytest.raises(ValueError):
        RuleSet([field("x").less_than(1), field("x").less_than(2)])


def test_rules_execute_on_spark(spark):
    df = spark.createDataFrame(
        [("4111111111111111", "a b c"), ("1234567890123456", "x")],
        "card string, words string",
    )
    ok = df.where(field("card").luhn_check().column).collect()
    assert len(ok) == 1 and ok[0].card == "4111111111111111"
    r = expr_rule("wc", "SIZE(SPLIT(words, ' ')) >= 2")
    assert df.where(r.column).count() == 1
