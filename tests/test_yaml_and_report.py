"""YAML front door, report writer, and Iceberg gating tests."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.operators.report import (
    validation_report_dict,
    validation_report_markdown,
    write_reports,
)
from data_caterer_spark.plans.yaml_config import YamlPlanError, load_plan

PLAN = """
name: transcript-quality
config:
  max_chars: 500
  keep_langs: [en, es]
rules:
  - id: text_non_null
    field: text
    op: is_not_null
  - id: len_range
    field: text
    op: length_between
    args: [1, 500]
  - id: role_ok
    field: role
    op: is_in
    args: [[user, assistant, system, tool]]
  - id: no_todo
    expr: "text NOT LIKE '%TODO%'"
    severity: flag
    error_threshold: 0.5
validations:
  - id: conv_non_null
    field: conv_id
    op: is_not_null
  - id: conv_size
    group_by: [conv_id]
    agg: count
    expr: "count <= 100000"
"""


def test_yaml_builds_same_rules_as_api():
    plan = load_plan(PLAN)
    assert plan.name == "transcript-quality"
    assert plan.config.max_chars == 500
    assert plan.config.keep_langs == ("en", "es")
    by_id = {r.rule_id: r for r in plan.rules}
    assert by_id["text_non_null"].expr == "ISNOTNULL(text)"
    assert by_id["len_range"].expr == "LENGTH(text) BETWEEN 1 AND 500"
    assert by_id["role_ok"].expr == (
        "role IN ('user', 'assistant', 'system', 'tool')"
    )
    assert by_id["no_todo"].severity == "flag"
    assert by_id["no_todo"].error_threshold == 0.5


def test_yaml_rejects_unknown_op_and_config():
    with pytest.raises(YamlPlanError, match="unknown rule op"):
        load_plan("rules:\n  - {id: x, field: f, op: not_a_thing}\n")
    with pytest.raises(YamlPlanError, match="unknown config keys"):
        load_plan("config: {nonsense: 1}\n")


def test_yaml_plan_executes(spark):
    from data_caterer_spark.fixtures import generate_transcripts_df
    from data_caterer_spark.plans.pipeline import QualityFilterPipeline

    plan = load_plan(PLAN)
    df = generate_transcripts_df(spark, n_convs=30)
    labeled = QualityFilterPipeline(plan.config).run(df)
    assert labeled.count() == df.count()
    results = plan.run_validations(df)
    by_id = {r.rule_id: r for r in results}
    assert by_id["conv_size"].is_success
    assert "conv_non_null" in by_id


def test_report_writers(spark, tmp_path):
    from data_caterer_spark.operators.rules import expr_rule
    from data_caterer_spark.operators.validation import validate_rules

    df = spark.createDataFrame([(1,), (2,), (50,)], "x int")
    results = validate_rules(
        df, [expr_rule("x_small", "x < 10"), expr_rule("x_pos", "x > 0")]
    )
    d = validation_report_dict(results)
    assert d["total_rules"] == 2 and d["passed"] == 1 and d["failed"] == 1
    md = validation_report_markdown(results)
    assert "**FAIL**" in md and "x_small" in md
    jpath, mpath = write_reports(results, str(tmp_path))
    loaded = json.load(open(jpath))
    assert loaded["results"][0]["rule_id"] == "x_small"
    assert loaded["results"][0]["sample_errors"] == [{"x": 50}]


def test_run_report_full_surface(spark, tmp_path):
    """ResultHtmlWriter-parity run report: overview + step/sink tables +
    validation section, in json/md/html artifacts."""
    from data_caterer_spark.operators.report import (
        SinkResult,
        StepResult,
        run_report_dict,
        write_run_report,
    )
    from data_caterer_spark.operators.rules import expr_rule
    from data_caterer_spark.operators.validation import validate_rules

    df = spark.createDataFrame([(1,), (2,), (50,)], "x int")
    vres = validate_rules(df, [expr_rule("x_small", "x < 10")])
    steps = [
        StepResult(
            step="generate_accounts",
            num_records=1000,
            is_success=True,
            sinks=[
                SinkResult(
                    name="accounts_sink", format="parquet",
                    save_mode="overwrite", count=1000, duration_s=1.5,
                    sample=["row1", "row2"],
                ),
            ],
        ),
        StepResult(step="load_txns", num_records=500, is_success=True),
    ]
    d = run_report_dict("demo_plan", steps, vres)
    assert d["overview"]["num_records"] == 1500
    assert d["overview"]["is_success"] is False  # validation failed
    assert d["steps"][0]["sinks"][0]["format"] == "parquet"
    paths = write_run_report("demo_plan", steps, str(tmp_path), vres)
    loaded = json.load(open(paths["json"]))
    assert loaded["validation"]["failed"] == 1
    html = open(paths["html"]).read()
    assert "accounts_sink" in html and "x_small" in html and "FAILURE" in html
    md = open(paths["md"]).read()
    assert "generate_accounts" in md and "1500 records" in md


def test_run_report_count_disabled_marker():
    """RunFlags(enable_count=False) steps carry the reference's -1
    num_records marker: rows/sec must be suppressed (not rendered as a
    negative rate) and the overview total must sum only counted steps."""
    from data_caterer_spark.operators.report import StepResult, run_report_dict

    steps = [
        StepResult(
            step="uncounted", num_records=-1, is_success=True, duration_s=2.0
        ),
        StepResult(
            step="counted", num_records=100, is_success=True, duration_s=2.0
        ),
    ]
    d = run_report_dict("p", steps)
    assert d["steps"][0]["rows_per_sec"] is None
    assert d["steps"][1]["rows_per_sec"] == 50.0
    assert d["overview"]["num_records"] == 100
    all_off = run_report_dict(
        "p", [StepResult(step="u", num_records=-1, is_success=True)]
    )
    assert all_off["overview"]["num_records"] == -1


def test_resolve_checkpoint_dir_cluster_safety(tmp_path):
    """Only local masters may default a driver-local checkpoint dir: on a
    cluster master an unshared local path silently loses checkpoint data
    mid-job, so the resolver must return None (keeping the visible
    localCheckpoint fallback) and warn."""
    import warnings

    from data_caterer_spark.config import resolve_checkpoint_dir

    assert resolve_checkpoint_dir("local[4]", str(tmp_path)) == str(tmp_path)
    assert resolve_checkpoint_dir(
        "spark://host:7077", str(tmp_path)
    ) == str(tmp_path)
    got = resolve_checkpoint_dir("local[*]", None)
    assert got is not None and os.path.isdir(got)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert resolve_checkpoint_dir("spark://host:7077", None) is None
        assert resolve_checkpoint_dir("yarn", None) is None
        assert len(w) == 2 and "durable shared storage" in str(w[0].message)


def test_run_report_html_golden(tmp_path):
    """Golden-file pin of the full HTML report surface (ResultHtmlWriter
    parity: generator tables, duration breakdown, validations with sample
    errors).  Timestamps are normalized before comparison."""
    import os
    import re

    from data_caterer_spark.operators.generator import FieldSpec
    from data_caterer_spark.operators.report import (
        SinkResult,
        StepResult,
        field_summary,
        run_report_html,
    )
    from data_caterer_spark.operators.validation import ValidationResult

    fields = [
        FieldSpec("account_id", regex="ACC1[0-9]{9}", seed=11),
        FieldSpec("name", expression="#{Name.name}", seed=15),
        FieldSpec("year", type="int", min=2021, max=2022, seed=12),
        FieldSpec("tier", one_of=["gold", "silver"], seed=13),
        FieldSpec("flags", type="array",
                  element=FieldSpec("flags_elem", type="string")),
        FieldSpec("derived", sql="year - 2000"),
    ]
    sampled = {
        "account_id": ["ACC1000000001", "ACC1482915307", "ACC1937154221"],
        "name": ["Jo Smith", "Ana Ruiz", "Kim Lee"],
        "year": [2021, 2022, 2021],
    }
    steps = [
        StepResult(
            step="file_account",
            num_records=200,
            is_success=True,
            duration_s=1.25,
            fields=[field_summary(f, samples=sampled.get(f.name)) for f in fields],
            sinks=[
                SinkResult(
                    name="file_account_sink", format="json",
                    save_mode="append", count=200, duration_s=1.25,
                )
            ],
        )
    ]
    vres = [
        ValidationResult(
            rule_id="amount_max", is_success=True, num_errors=0, total=200,
            description="amount <= 100",
        ),
        ValidationResult(
            rule_id="year_2021", is_success=False, num_errors=3, total=200,
            description="year == 2021",
            sample_errors=[
                {"account_id": "ACC1000000001", "year": 2022},
                {"account_id": "ACC1000000007", "year": 2022},
            ],
        ),
    ]
    html = run_report_html("account_create_plan", steps, vres)
    html = re.sub(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", "<TS>", html)
    golden_path = os.path.join(
        os.path.dirname(__file__), "fixtures", "report_golden.html"
    )
    if os.environ.get("REGEN_GOLDEN") == "1":  # regeneration escape hatch
        with open(golden_path, "w") as f:
            f.write(html)
    with open(golden_path) as f:
        assert html == f.read()
    # structural spot checks so a stale golden can't hide a regression
    for needle in (
        "<h2>Generators</h2>", "ACC1[0-9]{9}", "#{Name.name}",
        "<h2>Durations</h2>", "<h2>Sample errors</h2>", "ACC1000000007",
        "gold, silver", "year - 2000",
        # per-field SAMPLED VALUES (ResultHtmlWriter step pages show
        # generated data, not just the spec)
        "sample values", "ACC1482915307", "2021, 2022, 2021",
    ):
        assert needle in html, needle


def test_iceberg_gated(spark):
    from data_caterer_spark.config import iceberg_available
    from data_caterer_spark.sources import iceberg as ib

    if iceberg_available():
        pytest.skip("iceberg jar present; gating path not applicable")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        ib.create_transcripts_table(spark, "local.db.t")
