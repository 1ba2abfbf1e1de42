"""Batch generation orchestration tests (BatchDataProcessor /
RecordCountUtil / CombinationCalculator parity)."""

from __future__ import annotations

import pytest

from data_caterer_spark.operators.generator import FieldSpec
from data_caterer_spark.plans.generation import (
    GenerationProcessor,
    GenStep,
    GenTask,
    SinkSpec,
    calculate_num_batches,
    total_combinations,
)


def _tasks(tmp_path=None):
    cust_sink = (
        SinkSpec(fmt="parquet", path=str(tmp_path / "cust")) if tmp_path else None
    )
    return [
        GenTask(
            "accounts",
            [
                GenStep(
                    "customers",
                    fields=[
                        FieldSpec("cust_id", "long", min=1, max=10**7, seed=7),
                        FieldSpec("tier", one_of=["gold", "silver"], seed=8),
                    ],
                    records=250,
                    unique_cols=["cust_id"],
                    sink=cust_sink,
                ),
                GenStep(
                    "orders",
                    fields=[
                        FieldSpec("order_id", "long", min=1, max=10**9, seed=9),
                        FieldSpec("cust_id", "long", min=0, max=0),
                    ],
                    records=400,
                    per_column_records=2,
                ),
            ],
        )
    ]


def test_calculate_num_batches_record_count_util_parity():
    tasks = _tasks()
    # totals: 250 + 400*2 = 1050 -> 11 batches at 100/batch
    nb, per_batch = calculate_num_batches(tasks, records_per_batch=100)
    assert nb == 11
    assert per_batch["accounts_customers"] == 250 // 11
    assert per_batch["accounts_orders"] == 400 // 11
    nb_one, _ = calculate_num_batches(tasks, records_per_batch=10**6)
    assert nb_one == 1


def test_processor_batches_fk_unique_and_report(spark, tmp_path):
    tasks = _tasks(tmp_path)
    proc = GenerationProcessor(spark, records_per_batch=300)
    tables, results = proc.run(
        tasks,
        foreign_keys=[("customers", "cust_id", "orders", "cust_id")],
        plan_name="demo",
    )
    customers, orders = tables["customers"], tables["orders"]
    # unique enforcement may drop collisions but never duplicates
    ids = [r["cust_id"] for r in customers.collect()]
    assert len(ids) == len(set(ids))
    assert 0 < len(ids) <= 250
    # per-column fan-out: 2 orders per generated base row, all batches
    assert orders.count() == 800
    # FK consistency: every order resolves against generated customers
    assert orders.join(customers, "cust_id", "left_anti").count() == 0
    # sink received every customer batch
    sunk = spark.read.parquet(str(tmp_path / "cust"))
    assert sunk.count() == customers.count()
    # report surface
    by_step = {r.step: r for r in results}
    assert by_step["orders"].num_records == 800
    assert by_step["customers"].sinks[0].format == "parquet"
    assert by_step["customers"].sinks[0].count == customers.count()
    # generator tables carry ACTUAL sampled values per field
    cust_fields = {f["name"]: f for f in by_step["customers"].fields}
    assert cust_fields["tier"]["sample_values"], cust_fields
    for v in cust_fields["tier"]["sample_values"].split(", "):
        assert v.strip("'") in ("gold", "silver")


def test_batches_do_not_repeat_seeded_rows(spark):
    tasks = [
        GenTask(
            "t",
            [
                GenStep(
                    "s",
                    fields=[FieldSpec("x", "long", min=0, max=10**12, seed=3)],
                    records=200,
                )
            ],
        )
    ]
    proc = GenerationProcessor(spark, records_per_batch=50)
    tables, _ = proc.run(tasks)
    vals = [r["x"] for r in tables["s"].collect()]
    assert len(vals) == 200
    # seeded RAND varies per batch: four identical 50-row batches would
    # leave only 50 distinct values
    assert len(set(vals)) > 150


def test_total_combinations():
    assert total_combinations(
        [
            FieldSpec("a", one_of=["x", "y", "z"]),
            FieldSpec("b", "boolean"),
            FieldSpec("c", regex="[A-C][0-9]{2}"),
        ]
    ) == 3 * 2 * (3 * 100)
    # alternation + optional quantifier: (ab|cd)? -> 1 + 2 per position
    assert total_combinations([FieldSpec("r", regex="(ab|cd)?")]) == 3
    # nested structs multiply through
    assert total_combinations(
        [FieldSpec("s", "struct", fields=[FieldSpec("t", one_of=[1, 2])])]
    ) == 2
    # unbounded generators are honest: None, not 1
    assert total_combinations([FieldSpec("n", "int", min=0, max=5)]) is None
    # derived/static columns add nothing
    assert total_combinations(
        [FieldSpec("a", one_of=["x"]), FieldSpec("d", sql="a"),
         FieldSpec("st", static="k")]
    ) == 1
