"""Rule-engine behavior tests on the reference's own golden fixtures.

Pins errorThreshold / group-by / unique / upstream-join semantics using the
4-row ``transactions`` fixture from ``ValidationOperationsTest.scala:15-67``
and the ``accounts`` fixture from ``ForeignKeyUtilTest.scala:222-224``
(shapes documented in FIXTURES.md §2).
"""

from __future__ import annotations

import datetime

import pytest

from data_caterer_spark.operators.rules import Rule, expr_rule, field
from data_caterer_spark.operators.validation import (
    validate_expression,
    validate_group_by,
    validate_rules,
    validate_unique,
    validate_upstream,
    upstream_join,
)

D = datetime.date(2020, 1, 1)


@pytest.fixture()
def transactions(spark):
    return spark.createDataFrame(
        [
            ("acc123", "peter", "txn1", D, 10.0),
            ("acc123", "peter", "txn2", D, 50.0),
            ("acc123", "peter", "txn3", D, 200.0),
            ("acc123", "peter", "txn4", D, 500.0),
        ],
        "account_id string, name string, transaction_id string, "
        "created_date date, amount double",
    )


@pytest.fixture()
def accounts(spark):
    return spark.createDataFrame(
        [
            ("acc123", "peter", D, 30, "D"),
            ("acc124", "jane", D, 40, "C"),
        ],
        "account_id string, name string, open_date date, age int, "
        "debitCredit string",
    )


def test_expression_pass(transactions):
    res = validate_expression(transactions, field("amount").less_than(1000))
    assert res.is_success and res.num_errors == 0 and res.total == 4


def test_expression_fail_with_samples(transactions):
    res = validate_expression(transactions, field("amount").less_than(100))
    assert not res.is_success
    assert res.num_errors == 2
    assert len(res.sample_errors) == 2
    assert {s["amount"] for s in res.sample_errors} == {200.0, 500.0}


def test_error_threshold_absolute(transactions):
    # threshold >= 1 is an absolute error budget (ValidationOperations.scala:20-27)
    ok = validate_expression(transactions, field("amount").less_than(100).threshold(2))
    assert ok.is_success
    bad = validate_expression(transactions, field("amount").less_than(100).threshold(1))
    assert not bad.is_success


def test_error_threshold_fractional(transactions):
    # threshold < 1 is a fraction of dfCount
    ok = validate_expression(transactions, field("amount").less_than(100).threshold(0.5))
    assert ok.is_success  # 2/4 <= 0.5
    bad = validate_expression(
        transactions, field("amount").less_than(100).threshold(0.1)
    )
    assert not bad.is_success


def test_single_pass_multi_rule(transactions):
    results = validate_rules(
        transactions,
        [
            field("amount").less_than(1000),
            field("amount").less_than(100),
            field("name").is_equal("peter"),
        ],
    )
    assert [r.is_success for r in results] == [True, False, True]
    assert [r.num_errors for r in results] == [0, 2, 0]


def test_group_by_validation(transactions):
    # sum(amount) per account == 760
    res = validate_group_by(
        transactions,
        ["account_id"],
        "amount",
        "sum",
        expr_rule("sum_check", "`sum(amount)` == 760.0"),
    )
    assert res.is_success and res.total == 1


def test_dataset_count_rule(transactions):
    res = validate_group_by(
        transactions, [], "", "count", expr_rule("count_check", "count == 4")
    )
    assert res.is_success


def test_unique_validation(transactions, spark):
    ok = validate_unique(transactions, ["transaction_id"])
    assert ok.is_success
    dup = transactions.union(transactions.limit(1))
    bad = validate_unique(dup, ["transaction_id"])
    assert not bad.is_success and bad.num_errors == 1  # one duplicate group


def test_upstream_join_prefixing(transactions, accounts):
    joined = upstream_join(
        transactions, accounts, "accounts", join_cols=["account_id"], join_type="inner"
    )
    assert "accounts_name" in joined.columns
    assert "accounts_age" in joined.columns
    assert "account_id" in joined.columns
    assert joined.count() == 4


def test_upstream_validation_outer_default(transactions, accounts):
    # default join type is outer (api Constants.scala:263): acc124 appears
    # with NULL transaction columns; rule on accounts_age still passes for
    # matched rows, NULL rows are not failures (WHERE semantics).
    res = validate_upstream(
        transactions,
        accounts,
        "accounts",
        expr_rule("age_check", "accounts_age == 30"),
        join_cols=["account_id"],
    )
    assert res.total == 5  # 4 matched + 1 unmatched account
    assert res.num_errors == 1  # acc124 age=40 fails explicitly


def test_upstream_anti_join_integrity(transactions, accounts):
    # referential integrity: every transaction account exists upstream
    # (ValidationConfigurationBuilderTest.scala:452-467 pattern)
    joined = upstream_join(
        transactions, accounts, "accounts", join_cols=["account_id"],
        join_type="left_anti",
    )
    assert joined.count() == 0


def test_upstream_expr_join(transactions, accounts):
    joined = upstream_join(
        transactions,
        accounts.withColumnRenamed("account_id", "acc_id"),
        "accounts",
        join_cols=[],
        join_expr="account_id == accounts_acc_id",
        join_type="inner",
    )
    assert joined.count() == 4


def test_nested_upstream_validation(spark, sf_dir):
    """Two-deep upstream chain: orders -> customer -> nation (reference
    nested-upstream pattern, ValidationOperations.scala:62-67)."""
    from data_caterer_spark.operators.rules import expr_rule
    from data_caterer_spark.operators.validation import (
        UpstreamSpec,
        apply_upstream_chain,
        validate_upstream_nested,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    spec = UpstreamSpec(
        upstream=customer.withColumnRenamed("c_custkey", "o_custkey"),
        name="cust",
        join_cols=["o_custkey"],
        join_type="left",
        broadcast=True,
        nested=UpstreamSpec(
            upstream=nation.withColumnRenamed("n_nationkey", "c_nationkey"),
            name="nat",
            join_cols=["c_nationkey"],
            join_type="left",
            broadcast=True,
        ),
    )
    flat = apply_upstream_chain(orders, spec)
    # both levels' prefixed columns exist on the flattened frame
    assert "cust_c_name" in flat.columns
    assert "cust_nat_n_name" in flat.columns
    res = validate_upstream_nested(
        orders,
        spec,
        expr_rule("nation_resolved", "ISNOTNULL(cust_nat_n_name)"),
    )
    assert res.is_success, res


def test_sample_collection_is_single_pass(spark):
    """N failing rules must not trigger N sample scans: the sample gather
    is one bounded two-stage job, so total Spark jobs are CONSTANT in the
    number of failing rules (AQE may split a query into a few jobs, but
    per-rule scans would add one job per extra rule)."""
    df = spark.range(0, 10_000).selectExpr(
        "id", "id % 7 as a", "id % 11 as b", "cast(id % 13 as double) as c"
    )
    all_rules = [
        field("a").less_than(1).with_id("r_a"),
        field("b").less_than(2).with_id("r_b"),
        field("c").less_than(3.0).with_id("r_c"),
        field("a").greater_than(5).with_id("r_a2"),
        field("b").greater_than(8).with_id("r_b2"),
    ]
    sc = spark.sparkContext

    def jobs_for(rules, tag):
        group = f"validate-rules-job-count-{tag}"
        sc.setJobGroup(group, "single-pass sample test", False)
        try:
            results = validate_rules(df, rules, num_sample_errors=5)
        finally:
            sc.setJobGroup("", "", False)
        return results, len(sc.statusTracker().getJobIdsForGroup(group))

    _, jobs_one = jobs_for(all_rules[:1], "one")
    results, jobs_five = jobs_for(all_rules, "five")
    assert jobs_five == jobs_one, (
        f"job count grew with rule count: {jobs_one} -> {jobs_five}"
    )
    for r in results:
        assert not r.is_success
        assert len(r.sample_errors) == 5
        # every sample genuinely violates its rule
        if r.rule_id == "r_a":
            assert all(s["a"] >= 1 for s in r.sample_errors)
        if r.rule_id == "r_b2":
            assert all(s["b"] <= 8 for s in r.sample_errors)
