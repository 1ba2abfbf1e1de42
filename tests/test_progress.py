"""Live rows/sec progress stream (SparkRecordListener.scala:7-25 parity).

The reference appends one (finishTime, recordsWritten, memory) summary
per finished result task; the PySpark re-expression samples the status
tracker on a clock and rides an Observation on the action for the exact
record count.  These tests pin: exact counts, a flowing sample stream,
monotonic task counters, the enable_count=False marker, job-group
restoration, and the GenerationProcessor fusion (count costs no second
action when a sink is present).
"""

import pyspark.sql.functions as F
import pytest

from data_caterer_spark.operators.progress import (
    ProgressReport,
    RecordProgressTracker,
    run_with_progress,
)


def _slowish_df(spark, rows=200_000, parts=16):
    # enough per-task work that the 50 ms poller catches the run mid-flight
    return (
        spark.range(rows)
        .repartition(parts)
        .withColumn("h", F.sha2(F.col("id").cast("string"), 256))
        .withColumn("h2", F.sha2(F.col("h"), 256))
    )


def test_run_with_progress_exact_rows_and_stream(spark):
    df = _slowish_df(spark)
    rep = run_with_progress(df, name="t1", interval_s=0.05)
    assert rep.num_rows == 200_000
    assert rep.duration_s > 0
    assert rep.rows_per_sec is not None and rep.rows_per_sec > 0
    assert rep.samples, "poller recorded no samples"
    done = [s.completed_tasks for s in rep.samples]
    assert done == sorted(done), "completed_tasks must be monotonic"
    assert all(s.total_tasks >= s.completed_tasks for s in rep.samples)


def test_enable_count_false_reports_reference_marker(spark):
    df = _slowish_df(spark, rows=50_000, parts=4)
    rep = run_with_progress(df, name="t2", enable_count=False)
    # reference: "Count is disabled" -> -1 records, no rows/sec
    assert rep.num_rows == -1
    assert rep.rows_per_sec is None


def test_job_group_restored_after_run(spark):
    sc = spark.sparkContext
    sc.setJobGroup("outer-group", "outer")
    try:
        run_with_progress(
            _slowish_df(spark, rows=10_000, parts=2), name="t3"
        )
        assert sc.getLocalProperty("spark.jobGroup.id") == "outer-group"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)


def test_custom_action_counts_written_rows(spark, tmp_path):
    df = _slowish_df(spark, rows=30_000, parts=4)
    out = str(tmp_path / "sinked")
    tracker = RecordProgressTracker(spark, name="t4", interval_s=0.05)
    rep = tracker.run(
        df, lambda d: d.write.mode("overwrite").parquet(out)
    )
    assert rep.num_rows == 30_000
    assert spark.read.parquet(out).count() == 30_000


def test_generation_processor_fuses_count_into_sink(spark, tmp_path):
    """With a sink configured, the per-batch record count must ride the
    write action (Observation), not a second df.count() — asserted by
    the processor exposing one ProgressReport per batch whose num_rows
    sums to the step's reported records."""
    from data_caterer_spark.operators.generator import FieldSpec
    from data_caterer_spark.plans.generation import (
        GenerationProcessor,
        GenStep,
        GenTask,
        SinkSpec,
    )

    sink = SinkSpec(
        fmt="parquet", path=str(tmp_path / "accounts"), mode="append"
    )
    step = GenStep(
        name="accounts",
        fields=[
            FieldSpec("id", "long", min=0, max=10_000, seed=7),
            FieldSpec("name", "string", seed=11),
        ],
        records=900,
        sink=sink,
    )
    proc = GenerationProcessor(spark, records_per_batch=400)
    tables, results = proc.run([GenTask("t", [step])], plan_name="p")
    (res,) = results
    assert res.num_records == 900
    reports = proc.progress["t_accounts"]
    assert len(reports) == 3  # 400 + 400 + 100
    assert all(isinstance(r, ProgressReport) for r in reports)
    assert sum(r.num_rows for r in reports) == 900
    assert spark.read.parquet(sink.path).count() == 900
