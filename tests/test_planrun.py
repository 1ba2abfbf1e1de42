"""Unified PlanRun front-door tests over the ported reference fixtures
(account-create-plan.yaml + json-account-task.yaml + account-checks.yaml:
nested structs, array-of-struct, sql fields over nested columns, regex +
faker expressions, perColumn generator counts, cross-step FK, sink write,
read-back validations)."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.plans import planrun as P

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name: str, out: str) -> str:
    with open(os.path.join(FIXTURES, name)) as f:
        return f.read().replace("{out}", out)


def _plan(tmp_path) -> P.PlanRun:
    out = str(tmp_path)
    return P.parse_plan(
        _read("plan/account-create-plan.yaml", out),
        [_read("task/json-account-task.yaml", out)],
        [_read("validation/account-checks.yaml", out)],
        connections={"json": P.Connection("json", "json")},
    )


def test_parse_plan_shapes(tmp_path):
    plan = _plan(tmp_path)
    assert plan.name == "account_create_plan"
    assert [r.enabled for r in plan.task_refs] == [False, False, True]
    task = plan.tasks["json_account_file"]
    acct, txn = task.steps
    assert acct.records == 200 and txn.records == 100
    assert txn.per_column_records == 3 and txn.per_column_vary
    assert txn.count_seed == 28
    by_name = {f.name: f for f in acct.fields}
    assert by_name["account_id"].regex == "ACC1[0-9]{9}"
    assert by_name["details"].type == "struct"
    sub = {f.name: f for f in by_name["details"].fields}
    assert sub["name"].expression == "#{Name.name}"
    assert sub["updated_by"].type == "struct"
    assert by_name["transactions"].type == "array"
    assert by_name["transactions"].element.type == "struct"
    elem_fields = {f.name: f for f in by_name["transactions"].element.fields}
    assert elem_fields["tags"].type == "array"
    assert by_name["first_txn_date"].sql is not None
    assert plan.foreign_keys == [
        ("json.file_account.account_id", ["json.transactions.account_id"])
    ]
    assert len(plan.validations) == 1
    assert plan.validations[0].config_name == "account_checks"
    assert len(plan.validations[0].rules) == 3


def test_parse_errors():
    with pytest.raises(P.PlanParseError, match="unknown generator"):
        P._parse_field({"name": "x", "generator": {"type": "nope"}})
    with pytest.raises(P.PlanParseError, match="without sql"):
        P._parse_field({"name": "x", "generator": {"type": "sql"}})
    with pytest.raises(P.PlanParseError, match="no steps"):
        P.parse_task("name: t\nsteps: []")


def test_split_fk_struct_columns():
    steps = {"file_account", "transactions"}
    assert P._split_fk("json.file_account.account_id", steps) == (
        "file_account", "account_id",
    )
    assert P._split_fk("transactions.details.updated_by.user", steps) == (
        "transactions", "details.updated_by.user",
    )
    with pytest.raises(P.PlanParseError, match="no known step"):
        P._split_fk("nope.col", steps)


def test_plan_run_end_to_end(spark, tmp_path):
    plan = _plan(tmp_path)
    res = P.run_plan(spark, plan)

    # disabled tasks never ran; both enabled steps produced tables
    assert set(res.tables) == {"file_account", "transactions"}
    accounts = res.tables["file_account"]
    txns = res.tables["transactions"]
    assert accounts.count() == 200
    n_txn = txns.count()
    assert 100 <= n_txn <= 300  # perColumn 1..3 fan-out

    # FK integrity: every transaction account_id resolves to an account
    orphans = txns.join(
        accounts.select("account_id"), "account_id", "left_anti"
    ).count()
    assert orphans == 0

    # sql fields really derive from the nested columns
    bad_sql = accounts.where(
        "is_early_customer != (year = 2021) OR "
        "updated_time != details.updated_by.time OR "
        "first_txn_date != element_at(sort_array(transactions.txn_date), 1)"
    ).count()
    assert bad_sql == 0

    # sinks were written and read back
    back = spark.read.json(str(tmp_path / "txn-gen"))
    assert back.count() == n_txn

    # faker expression stayed in vocabulary
    from data_caterer_spark.operators.expressions import expression_vocabulary

    vocab = expression_vocabulary("#{Name.name}")
    for r in txns.select("name").distinct().collect():
        assert r["name"] in vocab

    # validations ran against the read-back sink with threshold semantics
    checks = res.validation_results["account_checks"]
    assert len(checks) == 3
    assert all(c.is_success for c in checks), [
        (c.rule_id, c.num_errors) for c in checks
    ]
    assert res.insert_order == ["file_account", "transactions"]


def test_plan_run_files_front_door(spark, tmp_path):
    out = str(tmp_path / "o")
    plan_d = tmp_path / "p"
    task_d = tmp_path / "t"
    val_d = tmp_path / "v"
    for d in (plan_d, task_d, val_d):
        d.mkdir()
    (plan_d / "plan.yaml").write_text(
        _read("plan/account-create-plan.yaml", out)
    )
    (task_d / "task.yaml").write_text(
        _read("task/json-account-task.yaml", out)
    )
    (val_d / "val.yaml").write_text(
        _read("validation/account-checks.yaml", out)
    )
    res = P.run_plan_files(
        spark,
        str(plan_d / "plan.yaml"),
        str(task_d),
        str(val_d),
        connections={"json": P.Connection("json", "json")},
    )
    assert res.tables["file_account"].count() == 200
    assert res.validation_results["account_checks"]


def test_wait_condition_gates_plan(spark, tmp_path):
    from data_caterer_spark.operators.waits import FileExistsWaitCondition

    plan = _plan(tmp_path)
    plan.wait = FileExistsWaitCondition(
        path=str(tmp_path / "__missing__"), is_retryable=False
    )
    with pytest.raises(RuntimeError, match="wait condition not met"):
        P.run_plan(spark, plan)


def test_foreign_key_delete_order_is_reverse_topo():
    from data_caterer_spark.operators.generator import (
        foreign_key_delete_order,
        foreign_key_insert_order,
    )

    rels = [("key1", "key2"), ("key2", "key3")]
    assert foreign_key_insert_order(rels) == ["key1", "key2", "key3"]
    # reference getDeleteOrder example: delete key3, key2, key1
    assert foreign_key_delete_order(rels) == ["key3", "key2", "key1"]


def test_run_flags_gate_phases_and_cleanup(spark, tmp_path):
    import os

    plan = _plan(tmp_path)
    res = P.run_plan(
        spark,
        plan,
        flags=P.RunFlags(enable_validation=False, enable_count=False),
    )
    # validation phase skipped; counts report the reference's -1 marker
    assert res.validation_results == {}
    assert all(s.num_records == -1 for s in res.step_results)
    # sinks were still written
    assert os.path.exists(str(tmp_path / "txn-gen"))
    # cleanup: children (transactions) deleted before parents (accounts)
    deleted = P.delete_generated_outputs(plan)
    assert [os.path.basename(d) for d in deleted] == [
        "txn-gen", "account-gen",
    ]
    assert not os.path.exists(str(tmp_path / "txn-gen"))
    assert not os.path.exists(str(tmp_path / "account-gen"))
    import pytest

    with pytest.raises(ValueError, match="enable_generate_data"):
        P.run_plan(
            spark, plan, flags=P.RunFlags(enable_generate_data=False)
        )
