"""Unified PlanRun front door — one object tying generation tasks, foreign
keys, sinks, wait conditions, and post-generation validations together.

Reference parity:
* ``PlanRun.scala:11-136`` — the single builder surface exposing plan +
  tasks + generators + validations + connections;
* ``PlanParser.scala:16-31`` — YAML plan/task parsing
  (``sample/plan/account-create-plan.yaml`` + task files like
  ``sample/task/file/json-account-task.yaml``);
* plan YAML shape: ``tasks`` (name -> dataSourceName, enabled),
  ``sinkOptions.foreignKeys`` (``"dataSource.step.column"`` source ->
  list of targets), ``validations`` (names of validation configs);
* task YAML shape: steps with ``type``/``options.path``/``count``
  (records / perColumn) and a nested ``schema.fields`` tree whose
  generators are ``random|sql|oneOf|regex`` with options (min/max,
  minLen/maxLen, regex, expression, oneOf) — parsed into
  :class:`~..operators.generator.FieldSpec` trees;
* validation YAML shape (``sample/validation/simple-validation.yaml``):
  ``dataSources: {name: {options: {path}, validations: [{expr,
  errorThreshold}]}}`` — validations run against the data READ BACK from
  the sink, the reference's post-generation check.

Spark-first: parsing produces the same ``GenTask``/``GenStep``/
``FieldSpec`` objects the Python API builds; execution delegates to
:class:`~.generation.GenerationProcessor` (batched, FK-toposorted,
unique-enforced) and :func:`~..operators.validation.validate_rules`
(single-pass rule kernel).  Nothing new executes here — the front door is
pure composition, so the 100 TB properties of the underlying operators
(no driver-side rows, bounded sample gathers, distributed FK ordinals)
are inherited, not re-implemented.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

import yaml
from pyspark.sql import DataFrame, SparkSession

from ..operators.generator import FieldSpec
from ..operators.validation import ValidationResult, validate_rules
from ..operators.waits import WaitCondition
from .generation import GenerationProcessor, GenStep, GenTask, SinkSpec


class PlanParseError(ValueError):
    pass


@dataclass
class Connection:
    """A named data source (reference connection config): format plus
    pass-through options (path prefix for files, url/driver for jdbc)."""

    name: str
    fmt: str = "json"
    options: dict[str, str] = dc_field(default_factory=dict)


@dataclass
class PlanTaskRef:
    """Plan-level task reference (plan YAML ``tasks`` entries)."""

    name: str
    data_source: str
    enabled: bool = True


@dataclass
class ValidationSpec:
    """One data-source validation block from a validation YAML."""

    config_name: str
    data_source: str
    path: str | None
    rules: list[dict[str, Any]]  # [{expr, errorThreshold?, description?}]


@dataclass
class PlanRun:
    name: str
    description: str = ""
    task_refs: Sequence[PlanTaskRef] = ()
    tasks: dict[str, GenTask] = dc_field(default_factory=dict)
    connections: dict[str, Connection] = dc_field(default_factory=dict)
    # (source "step.column", [target "step.column", ...]) — parsed from
    # sinkOptions.foreignKeys "dataSource.step.column" triples
    foreign_keys: Sequence[tuple[str, Sequence[str]]] = ()
    validations: Sequence[ValidationSpec] = ()
    wait: WaitCondition | None = None


@dataclass
class RunFlags:
    """The reference's run-control flags (``FlagsConfig`` /
    ``DataCatererConfigurationBuilder`` enable* toggles): phase switches
    plus the count-avoidance performance flag."""

    enable_generate_data: bool = True
    enable_validation: bool = True
    enable_count: bool = True
    enable_delete_generated_records: bool = False
    enable_report_samples: bool = True


@dataclass
class PlanRunResult:
    tables: dict[str, DataFrame]
    step_results: list
    validation_results: dict[str, list[ValidationResult]]
    insert_order: list[str]


# ---------------------------------------------------------------------------
# task YAML -> FieldSpec tree
# ---------------------------------------------------------------------------

_RANDOM_DATE_MIN = "2020-01-01"
_RANDOM_DATE_MAX = "2022-12-31"
_RANDOM_TS_MIN = "2020-01-01 00:00:00"
_RANDOM_TS_MAX = "2022-12-31 23:59:59"


def _parse_field(fd: dict[str, Any]) -> FieldSpec:
    name = fd.get("name")
    if not name:
        raise PlanParseError(f"field without a name: {fd}")
    ftype = fd.get("type")
    gen = fd.get("generator") or {}
    gtype = gen.get("type", "random")
    opts = dict(gen.get("options") or {})
    seed = opts.get("seed")

    # nested struct: a field with its own schema and no scalar type
    sub_schema = fd.get("schema")
    if sub_schema is not None:
        subs = [_parse_field(x) for x in sub_schema.get("fields", [])]
        if ftype == "array":
            elem = FieldSpec(f"{name}_elem", type="struct", fields=subs, seed=seed)
            return FieldSpec(
                name, type="array", element=elem,
                array_min_len=int(opts.get("arrayMinLength", 1)),
                array_max_len=int(opts.get("arrayMaxLength", 3)),
                seed=seed,
            )
        return FieldSpec(name, type="struct", fields=subs, seed=seed)

    if ftype and ftype.startswith("array<") and ftype.endswith(">"):
        inner = ftype[len("array<"):-1]
        return FieldSpec(
            name, type="array",
            element=FieldSpec(f"{name}_elem", type=inner, seed=seed),
            array_min_len=int(opts.get("arrayMinLength", 1)),
            array_max_len=int(opts.get("arrayMaxLength", 3)),
            seed=seed,
        )

    if gtype == "sql":
        if "sql" not in opts:
            raise PlanParseError(f"field {name}: sql generator without sql")
        return FieldSpec(name, type=ftype or "string", sql=str(opts["sql"]))
    if gtype == "oneOf":
        vals = opts.get("oneOf")
        if not vals:
            raise PlanParseError(f"field {name}: oneOf without values")
        return FieldSpec(name, one_of=list(vals), seed=seed)
    if gtype == "regex":
        if "regex" not in opts:
            raise PlanParseError(f"field {name}: regex generator without regex")
        return FieldSpec(name, regex=str(opts["regex"]), seed=seed)
    if gtype != "random":
        raise PlanParseError(f"field {name}: unknown generator type {gtype!r}")

    if "expression" in opts:  # faker expression (RandomDataGenerator:63-66)
        return FieldSpec(name, expression=str(opts["expression"]), seed=seed)

    t = ftype or "string"
    spec = FieldSpec(name, type=t, seed=seed)
    if t == "date":
        spec.min = opts.get("min", _RANDOM_DATE_MIN)
        spec.max = opts.get("max", _RANDOM_DATE_MAX)
    elif t == "timestamp":
        spec.min = opts.get("min", _RANDOM_TS_MIN)
        spec.max = opts.get("max", _RANDOM_TS_MAX)
    else:
        if "min" in opts:
            spec.min = opts["min"]
        if "max" in opts:
            spec.max = opts["max"]
    if "minLen" in opts or "minLength" in opts:
        spec.min_len = int(opts.get("minLen", opts.get("minLength")))
    if "maxLen" in opts or "maxLength" in opts:
        spec.max_len = int(opts.get("maxLen", opts.get("maxLength")))
    if "nullProb" in opts:
        spec.null_prob = float(opts["nullProb"])
    if "stddev" in opts and "mean" in opts:
        spec.stddev = float(opts["stddev"])
        spec.mean = float(opts["mean"])
    return spec


def _parse_step(sd: dict[str, Any], conn: Connection | None) -> GenStep:
    name = sd.get("name")
    if not name:
        raise PlanParseError(f"step without a name: {sd}")
    count = sd.get("count") or {}
    records = int(count.get("records", 1000))
    per_col = count.get("perColumn")
    per_column_records = None
    per_column_min = None
    per_column_vary = False
    count_seed = None
    if per_col:
        gen_opts = dict((per_col.get("generator") or {}).get("options") or {})
        if "seed" in gen_opts:
            count_seed = int(gen_opts["seed"])
        if "max" in gen_opts:
            per_column_records = int(gen_opts["max"])
            per_column_min = int(gen_opts.get("min", 1))
            per_column_vary = per_column_min != per_column_records
        else:
            per_column_records = int(per_col.get("count", 1))
    fields = [
        _parse_field(f) for f in (sd.get("schema") or {}).get("fields", [])
    ]
    options = dict(sd.get("options") or {})
    path = options.pop("path", None)
    sink = None
    if path is not None or conn is not None:
        fmt = sd.get("type") or (conn.fmt if conn else "parquet")
        base_opts = dict(conn.options) if conn else {}
        base_opts.update(options)
        base_path = base_opts.pop("path", None)
        sink = SinkSpec(
            fmt=fmt,
            path=path or base_path,
            mode=str(base_opts.pop("saveMode", "append")).lower(),
            options=base_opts,
        )
        if sink.path is None and fmt != "jdbc":
            sink = None  # no sink target configured
    return GenStep(
        name=name,
        fields=fields,
        records=records,
        count_seed=count_seed,
        per_column_records=per_column_records,
        per_column_min=per_column_min,
        per_column_vary=per_column_vary,
        unique_cols=sd.get("uniqueColumns"),
        sink=sink,
        num_partitions=sd.get("numPartitions"),
    )


def _load_yaml(source: str) -> dict:
    if "\n" not in source and source.endswith((".yaml", ".yml")):
        with open(source) as f:
            doc = yaml.safe_load(f)
    else:
        doc = yaml.safe_load(source)
    if not isinstance(doc, dict):
        raise PlanParseError("YAML document must be a mapping")
    return doc


def parse_task(source: str, conn: Connection | None = None) -> GenTask:
    """Parse one task YAML (reference ``Task`` model) into a GenTask."""
    doc = _load_yaml(source)
    steps = [_parse_step(s, conn) for s in doc.get("steps", [])]
    if not steps:
        raise PlanParseError(f"task {doc.get('name')!r} has no steps")
    return GenTask(name=doc.get("name", "task"), steps=steps)


def parse_validation(source: str) -> list[ValidationSpec]:
    """Parse one validation YAML (``simple-validation.yaml`` shape)."""
    doc = _load_yaml(source)
    out = []
    for ds_name, block in (doc.get("dataSources") or {}).items():
        out.append(
            ValidationSpec(
                config_name=doc.get("name", "validation"),
                data_source=ds_name,
                path=((block.get("options") or {}).get("path")),
                rules=list(block.get("validations") or []),
            )
        )
    return out


def parse_plan(
    plan_source: str,
    task_sources: Sequence[str],
    validation_sources: Sequence[str] = (),
    connections: "dict[str, Connection] | None" = None,
    wait: WaitCondition | None = None,
) -> PlanRun:
    """Assemble a PlanRun from YAML documents (paths or literal YAML).

    ``connections`` maps dataSourceName -> Connection; the reference gets
    these from its application config, so they arrive as an argument here
    rather than from the plan document.
    """
    doc = _load_yaml(plan_source)
    connections = connections or {}
    refs = [
        PlanTaskRef(
            name=t["name"],
            data_source=t.get("dataSourceName", "default"),
            enabled=bool(t.get("enabled", True)),
        )
        for t in doc.get("tasks", [])
    ]
    tasks: dict[str, GenTask] = {}
    for src in task_sources:
        # the task's connection comes from the plan's task->dataSource map
        t_doc = _load_yaml(src)
        t_name = t_doc.get("name", "task")
        ref = next((r for r in refs if r.name == t_name), None)
        conn = connections.get(ref.data_source) if ref else None
        tasks[t_name] = parse_task(src, conn)
    fks = []
    for entry in (doc.get("sinkOptions") or {}).get("foreignKeys", []):
        # YAML shape: [source, [target, ...]]
        if not (isinstance(entry, list) and len(entry) == 2):
            raise PlanParseError(f"malformed foreignKeys entry: {entry}")
        fks.append((str(entry[0]), [str(x) for x in entry[1]]))
    wanted = set(doc.get("validations", []))
    validations = []
    for src in validation_sources:
        for spec in parse_validation(src):
            if not wanted or spec.config_name in wanted:
                validations.append(spec)
    return PlanRun(
        name=doc.get("name", "plan"),
        description=doc.get("description", ""),
        task_refs=refs,
        tasks=tasks,
        connections=connections,
        foreign_keys=fks,
        validations=validations,
        wait=wait,
    )


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def _split_fk(ref: str, step_names: set[str]) -> tuple[str, str]:
    """``dataSource.step.column`` (or ``step.column``) -> (step, column).
    Struct columns keep their dots: the step name is matched greedily
    against known steps."""
    parts = ref.split(".")
    for i in range(len(parts) - 1, 0, -1):
        step = parts[i - 1]
        if step in step_names:
            return step, ".".join(parts[i:])
    raise PlanParseError(
        f"foreign key {ref!r} references no known step (steps: "
        f"{sorted(step_names)})"
    )


def run_plan(
    spark: SparkSession,
    plan: PlanRun,
    records_per_batch: int = 100_000,
    flags: RunFlags | None = None,
) -> PlanRunResult:
    """Execute: wait -> generate (FK-toposorted, batched, sinks) ->
    validate the written outputs.  Disabled tasks are skipped
    (``account-create-plan.yaml`` disables its jms/kafka/http legs);
    ``flags`` gate the phases like the reference's enable* toggles."""
    from ..operators.generator import foreign_key_insert_order
    from ..operators.rules import expr_rule
    from ..sources.io import read_source

    flags = flags or RunFlags()
    if not flags.enable_generate_data:
        raise ValueError(
            "run_plan with enable_generate_data=False has nothing to run "
            "(validation-only runs read existing data: use validate_plan)"
        )
    if plan.wait is not None and not plan.wait.wait(spark):
        raise RuntimeError(f"plan {plan.name}: wait condition not met")

    enabled = [
        plan.tasks[r.name]
        for r in plan.task_refs
        if r.enabled and r.name in plan.tasks
    ]
    if not enabled:
        raise PlanParseError(f"plan {plan.name}: no enabled tasks")
    step_names = {s.name for t in enabled for s in t.steps}
    fk_tuples = []
    for src_ref, targets in plan.foreign_keys:
        try:
            src_step, src_col = _split_fk(src_ref, step_names)
        except PlanParseError:
            continue  # source lives in a disabled task (reference skips)
        for tgt_ref in targets:
            try:
                tgt_step, tgt_col = _split_fk(tgt_ref, step_names)
            except PlanParseError:
                continue
            fk_tuples.append((src_step, src_col, tgt_step, tgt_col))

    processor = GenerationProcessor(
        spark,
        records_per_batch=records_per_batch,
        enable_count=flags.enable_count,
        enable_report_samples=flags.enable_report_samples,
    )
    tables, step_results = processor.run(enabled, fk_tuples, plan.name)
    insert_order = (
        foreign_key_insert_order([(a, c) for a, _b, c, _d in fk_tuples])
        if fk_tuples
        else sorted(tables)
    )

    validation_results: dict[str, list[ValidationResult]] = {}
    for vspec in plan.validations if flags.enable_validation else ():
        conn = plan.connections.get(vspec.data_source)
        fmt = conn.fmt if conn else "parquet"
        if vspec.path is None:
            raise PlanParseError(
                f"validation {vspec.config_name}: no path for data source "
                f"{vspec.data_source}"
            )
        df = read_source(spark, fmt, path=vspec.path)
        rules = []
        for i, r in enumerate(vspec.rules):
            rule = expr_rule(f"{vspec.config_name}_{i}", r["expr"])
            if "errorThreshold" in r:
                rule = rule.threshold(float(r["errorThreshold"]))
            if "description" in r:
                rule = rule.describe(r["description"])
            rules.append(rule)
        validation_results[vspec.config_name] = validate_rules(df, rules)
    if flags.enable_delete_generated_records:
        delete_generated_outputs(plan)
    return PlanRunResult(
        tables=tables,
        step_results=step_results,
        validation_results=validation_results,
        insert_order=insert_order,
    )


def delete_generated_outputs(plan: PlanRun) -> list[str]:
    """Remove generated file-sink outputs in REVERSE FK order — children
    (referencing steps) first, parents last, so a partially-completed
    cleanup never leaves dangling references (the reference's
    delete-generated-records mode, ``ForeignKeyUtil.scala:206-240``
    getDeleteOrder).  Returns the deleted paths in deletion order.
    Connection-managed sinks (jdbc/kafka) are not touched here — their
    cleanup is a database operation, not a filesystem one."""
    import shutil

    from ..operators.generator import foreign_key_delete_order

    enabled = [
        plan.tasks[r.name]
        for r in plan.task_refs
        if r.enabled and r.name in plan.tasks
    ]
    step_names = {s.name for t in enabled for s in t.steps}
    fk_pairs = []
    for src_ref, targets in plan.foreign_keys:
        try:
            src_step, _ = _split_fk(src_ref, step_names)
        except PlanParseError:
            continue
        for t_ref in targets:
            try:
                tgt_step, _ = _split_fk(t_ref, step_names)
            except PlanParseError:
                continue
            fk_pairs.append((src_step, tgt_step))
    order = foreign_key_delete_order(fk_pairs) if fk_pairs else []
    ordered = order + sorted(s for s in step_names if s not in set(order))
    by_name = {s.name: s for t in enabled for s in t.steps}
    deleted = []
    for name in ordered:
        step = by_name.get(name)
        if step is None or step.sink is None or step.sink.path is None:
            continue
        shutil.rmtree(step.sink.path, ignore_errors=True)
        deleted.append(step.sink.path)
    return deleted


def run_plan_files(
    spark: SparkSession,
    plan_path: str,
    tasks_dir: str,
    validations_dir: str | None = None,
    connections: "dict[str, Connection] | None" = None,
) -> PlanRunResult:
    """File-system front door (PlanParser.scala:16-31 — plan file + task
    folder + validation folder)."""

    def _yamls(d: str) -> list[str]:
        out = []
        for root, _dirs, files in os.walk(d):
            out.extend(
                os.path.join(root, f)
                for f in sorted(files)
                if f.endswith((".yaml", ".yml"))
            )
        return out

    plan = parse_plan(
        plan_path,
        _yamls(tasks_dir),
        _yamls(validations_dir) if validations_dir else (),
        connections=connections,
    )
    return run_plan(spark, plan)
