"""Batch generation orchestration — the reference's top-level processor.

Maps ``BatchDataProcessor.scala`` + ``RecordCountUtil.scala:11-58`` +
``DataGeneratorProcessor.scala`` Spark-first:

* a plan is tasks -> steps; each step has a FieldSpec schema, a record
  count (fixed or generator-driven), optional per-column fan-out,
  optional unique columns, and an optional sink;
* total records split into batches of ``records_per_batch``
  (``calculate_num_batches`` mirrors RecordCountUtil: per-step
  records/batch = (records / perColumnAverage) / numBatches);
* per batch: generate -> enforce uniqueness against ALL previously
  generated batches (``UniqueFieldsUtil`` semantics) -> per-column
  fan-out -> multi-table foreign-key assignment in toposorted insert
  order (``ForeignKeyUtil``) -> append to sinks;
* every step accumulates a :class:`~..operators.report.StepResult` so
  :func:`~..operators.report.write_run_report` renders the same
  artifact surface as ``DataGenerationResultWriter``/``ResultHtmlWriter``.

Batching at 100 TB: each batch is an independent ``spark.range``
projection job with bounded output (sink-side memory/commit pressure is
the reason the reference batches), so the loop is driver-light — no
generated rows ever pass through the driver.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.generator import (
    FieldSpec,
    apply_foreign_keys,
    draw_count,
    enforce_unique,
    generate,
    per_column_count,
)
from ..operators.report import SinkResult, StepResult


@dataclass
class SinkSpec:
    """Where a step's generated batches land (SinkFactory surface)."""

    fmt: str = "parquet"
    path: str | None = None
    table: str | None = None
    mode: str = "append"
    options: dict[str, str] = dc_field(default_factory=dict)
    partition_by: Sequence[str] | None = None


@dataclass
class GenStep:
    """One generation step (reference ``Step``, PlanModels.scala)."""

    name: str
    fields: Sequence[FieldSpec]
    records: "int | tuple[int, int]" = 1000
    count_seed: int | None = None
    per_column_records: int | None = None  # fan-out after generation (max)
    per_column_min: int | None = None  # with vary: draw N in [min, max]
    per_column_vary: bool = False  # PerColumnCount-with-generator surface
    unique_cols: Sequence[str] | None = None
    sink: SinkSpec | None = None
    num_partitions: int | None = None


@dataclass
class GenTask:
    name: str
    steps: Sequence[GenStep]


def step_records(step: GenStep) -> int:
    if isinstance(step.records, tuple):
        return draw_count(step.records[0], step.records[1], step.count_seed)
    return step.records


def calculate_num_batches(
    tasks: Sequence[GenTask], records_per_batch: int = 100_000
) -> tuple[int, dict[str, int]]:
    """RecordCountUtil.calculateNumBatches parity: number of batches and
    per-step records-per-batch (per-column fan-out counts toward the
    total, so the base generation per batch is divided by the average)."""
    per_step: dict[str, int] = {}
    total = 0
    for task in tasks:
        for step in task.steps:
            n = step_records(step) * (step.per_column_records or 1)
            per_step[f"{task.name}_{step.name}"] = n
            total += n
    num_batches = max(1, -(-total // records_per_batch))
    # base rows generated per batch = records / numBatches (the per-column
    # fan-out multiplies output rows AFTER generation, which is why it
    # divides the base count — RecordCountUtil.stepToRecordCountMap)
    per_batch = {
        f"{t.name}_{s.name}": max(1, step_records(s) // num_batches)
        for t in tasks
        for s in t.steps
    }
    return num_batches, per_batch


class GenerationProcessor:
    """Drives multi-task, multi-batch generation with FK consistency,
    cross-batch uniqueness, sinks, and a run report."""

    def __init__(
        self,
        spark: SparkSession,
        records_per_batch: int = 100_000,
        enable_count: bool = True,
        enable_report_samples: bool = True,
    ):
        """``enable_count=False`` mirrors the reference's performance flag
        (``SinkFactory.scala:26-32`` — "Count is disabled. It will help
        with performance", record counts report -1): per-batch counts are
        an extra action per step per batch, material on slow sinks.

        ``enable_report_samples`` puts a few ACTUAL generated values per
        field into the run report's generator tables (ResultHtmlWriter's
        step pages show sampled data, not just the spec) — one bounded
        ``limit(3)`` action per step over the already-pinned batch."""
        self.spark = spark
        self.records_per_batch = records_per_batch
        self.enable_count = enable_count
        self.enable_report_samples = enable_report_samples
        #: per-step live progress streams (SparkRecordListener parity):
        #: one ProgressReport per sink write, keyed by "task_step"
        self.progress: dict[str, list] = {}

    def run(
        self,
        tasks: Sequence[GenTask],
        foreign_keys: Sequence[tuple] = (),
        plan_name: str = "generation",
    ) -> tuple[dict[str, DataFrame], list[StepResult]]:
        """Returns (final tables by step name, step results).

        Tables accumulate across batches (union); sinks receive one
        append per batch, so a crash loses at most one batch per sink
        (the reference's batch-commit granularity).
        """
        from ..sources.io import write_sink

        num_batches, per_batch = calculate_num_batches(
            tasks, self.records_per_batch
        )
        steps = {
            f"{t.name}_{s.name}": s for t in tasks for s in t.steps
        }
        short = {f"{t.name}_{s.name}": s.name for t in tasks for s in t.steps}
        accumulated: dict[str, DataFrame] = {}
        sink_stats: dict[str, dict] = {
            k: {"rows": 0, "wall": 0.0} for k in steps
        }
        issued: dict[str, int] = {k: 0 for k in steps}
        for batch in range(num_batches):
            generated: dict[str, DataFrame] = {}
            for key, step in steps.items():
                remaining = step_records(step) - issued[key]
                n = remaining if batch == num_batches - 1 else min(
                    per_batch[key], remaining
                )
                if n <= 0:
                    continue
                issued[key] += n
                # seeded specs must vary per batch or every batch would
                # regenerate identical rows (RAND(seed) restarts per job)
                from dataclasses import replace

                fields_b = [
                    replace(f, seed=f.seed + 1_000_003 * batch)
                    if f.seed is not None and batch > 0
                    else f
                    for f in step.fields
                ]
                df = generate(
                    self.spark,
                    fields_b,
                    n,
                    num_partitions=step.num_partitions,
                )
                if step.unique_cols:
                    df = enforce_unique(
                        df,
                        list(step.unique_cols),
                        previous=accumulated.get(short[key]),
                    )
                if step.per_column_records:
                    df = per_column_count(
                        df,
                        step.per_column_records,
                        rand_seed=step.count_seed,
                        vary=step.per_column_vary,
                        records_min=step.per_column_min,
                    )
                generated[short[key]] = df
            if foreign_keys:
                generated, _order = apply_foreign_keys(
                    generated,
                    [
                        fk
                        for fk in foreign_keys
                        if fk[0] in generated and fk[2] in generated
                    ],
                )
            for key, step in steps.items():
                name = short[key]
                if name not in generated:
                    continue
                df = generated[name]
                # batches must not re-evaluate with fresh RAND downstream:
                # pin this batch's rows before union/sink.  RELIABLE
                # checkpoint when a dir is configured (config.get_spark
                # defaults one): an executor loss mid-run would otherwise
                # kill the accumulated lineage of every prior batch;
                # localCheckpoint remains the no-dir fallback.
                from ..operators.dedup import truncate_lineage

                df = truncate_lineage(df)
                counted_in_sink = False
                if step.sink is not None:
                    sink = step.sink

                    def _write(d: DataFrame, s=sink) -> None:
                        write_sink(
                            d,
                            s.fmt,
                            path=s.path,
                            table=s.table,
                            mode=s.mode,
                            options=s.options or None,
                            partition_by=s.partition_by,
                        )

                    t0 = time.time()
                    if self.enable_count:
                        # SparkRecordListener parity: the row count rides
                        # the sink write as an Observation (the listener's
                        # outputMetrics.recordsWritten), so counting costs
                        # ZERO extra actions — df.count() here would
                        # re-execute the batch once per step per batch
                        from ..operators.progress import (
                            RecordProgressTracker,
                        )

                        tracker = RecordProgressTracker(
                            self.spark, name=f"sink-{key}-b{batch}"
                        )
                        rep = tracker.run(df, _write)
                        sink_stats[key]["rows"] += rep.num_rows
                        self.progress.setdefault(key, []).append(rep)
                        counted_in_sink = True
                    else:
                        _write(df)
                    sink_stats[key]["wall"] += time.time() - t0
                if not self.enable_count:
                    sink_stats[key]["rows"] = -1  # reference's disabled marker
                elif not counted_in_sink:
                    sink_stats[key]["rows"] += df.count()
                accumulated[name] = (
                    df
                    if name not in accumulated
                    else accumulated[name].unionByName(df)
                )
        results = []
        for key, step in steps.items():
            name = short[key]
            stats = sink_stats[key]
            sinks = []
            if step.sink is not None:
                sinks.append(
                    SinkResult(
                        name=f"{name}_sink",
                        format=step.sink.fmt,
                        save_mode=step.sink.mode,
                        options=dict(step.sink.options),
                        count=stats["rows"],
                        duration_s=round(stats["wall"], 3),
                    )
                )
            from ..operators.report import field_summary

            sample_rows: list = []
            if self.enable_report_samples and name in accumulated:
                # bounded: 3 rows off the pinned batch, never a full scan
                sample_rows = accumulated[name].limit(3).collect()

            def _samples(fname: str) -> "list | None":
                if not sample_rows or fname not in sample_rows[0].__fields__:
                    return None
                return [r[fname] for r in sample_rows]

            results.append(
                StepResult(
                    step=name,
                    num_records=stats["rows"],
                    is_success=True,
                    sinks=sinks,
                    fields=[
                        field_summary(f, samples=_samples(f.name))
                        for f in step.fields
                    ],
                    duration_s=round(stats["wall"], 3),
                )
            )
        return accumulated, results


def total_combinations(fields: Sequence[FieldSpec]) -> "int | None":
    """CombinationCalculator.totalCombinationsForSchema parity: product of
    per-field combination counts — ``one_of`` sets multiply by their
    size, bounded regex generators by their language size (computed from
    the compiled AST), booleans by 2, everything unbounded returns None
    (the reference's BigInt(1) treated "unknown" as 1; returning None is
    honest about open-ended generators)."""
    from ..operators.regexgen import _Parser

    def regex_count(pattern: str) -> int:
        atoms = _Parser(pattern, max_repeat=5).parse_seq(stop=set())

        def atom_count(a) -> int:
            if a.kind == "literal":
                base = 1
            elif a.kind == "class":
                base = len(a.chars)
            else:
                base = sum(
                    _seq_count(list(branch)) for branch in a.branches
                )
            # sum over allowed repeat lengths of base^length
            return sum(base ** r for r in range(a.lo, a.hi + 1))

        def _seq_count(atoms_) -> int:
            out = 1
            for a in atoms_:
                out *= atom_count(a)
            return out

        return _seq_count(atoms)

    total = 1
    for f in fields:
        if f.static is not None:
            continue
        if f.one_of is not None or f.type == "oneOf":
            total *= len(list(f.one_of or []))
        elif f.regex is not None:
            total *= regex_count(f.regex)
        elif f.type in ("boolean", "bool"):
            total *= 2
        elif f.type == "struct" and f.fields:
            sub = total_combinations(f.fields)
            if sub is None:
                return None
            total *= sub
        elif f.sql is not None:
            continue  # derived: no independent combinations
        else:
            return None  # unbounded numeric/string/date/... generator
    return total
