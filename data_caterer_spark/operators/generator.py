"""Seeded test-data generation — the reference's other half.

data-caterer materializes batches by building ONE Spark SQL expression per
field and selecting them over an index DataFrame
(``DataGeneratorFactory.scala:21,29-39`` — `spark.range`-equivalent index +
``selectExpr``).  This module re-expresses that surface Spark-first:

* bounded numerics — ``CAST(ROUND(RAND(seed) * (max-min) + min, 0) AS INT)``
  (exact emitted form pinned by ``RandomDataGeneratorTest.scala:87,106``)
* random strings — ``CONCAT_WS('', TRANSFORM(SEQUENCE(1, n), i ->
  SUBSTR(charset, CEIL(RAND() * 62), 1)))`` (``RandomDataGenerator.scala:63-70``)
* dates / timestamps — ``DATE_ADD`` / ``TIMESTAMP_MILLIS`` over scaled rand
  (``:190-192, 225-227``)
* booleans — ``BOOLEAN(ROUND(RAND()))`` (``:235-237``)
* oneOf categorical pick (``OneOfDataGenerator.scala:25-28``)
* arrays — ``TRANSFORM(ARRAY_REPEAT(1, n), i -> elem)`` (``:283-292``)
* null / edge-case injection — ``CASE WHEN rand <= p THEN ... ELSE ...``
  (``DataGenerator.scala:31-54``)
* dependent sql fields — resolved in EXPLICIT dependency order (the
  reference re-selects twice to fake one nesting level,
  ``GeneratorUtil.scala:56-77``; we just topo-stage)
* per-column-value counts — ``explode(sequence(...))``
  (``DataGeneratorFactory.scala:98-117``, sans the Scala UDF)
* unique enforcement — dropDuplicates + left_anti vs prior batches
  (``UniqueFieldsUtil.scala:17-30``)
* FK value assignment — ordinal (row_number) join, the skew-free analog of
  the reference's ``zipWithIndex`` trick (``ForeignKeyUtil.scala:114-151``)

Everything is a Catalyst expression over ``spark.range`` — the row-at-a-time
driver path (``DataGeneratorFactory.scala:52-79``) is deliberately absent.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ALPHANUMERIC = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

# per-type edge cases, cf. DataGenerator.scala:51-52 (strings),
# RandomDataGenerator.scala:137-138 (doubles), :169-174 (dates)
EDGE_CASES: dict[str, list[Any]] = {
    "string": ["", "éèê", "你好", "\U0001f600", " leading", "trailing "],
    "int": [0, -1, 1, 2147483647, -2147483648],
    "long": [0, -1, 1, 9223372036854775807, -9223372036854775808],
    "double": [0.0, -0.0, float("nan"), float("inf"), float("-inf")],
}


@dataclass
class FieldSpec:
    """One generated field (reference: PlanModels.scala:65-81).

    Generator kinds cover the reference's full surface
    (``random|oneOf|regex|sql``, api Constants.scala:145-148) plus its
    typed emissions: decimal(p,s) (``DataType.scala:54-62``), binary
    (``RandomDataGenerator.scala:253-255``), nested structs
    (``:307-320``), and normal-distribution numerics (``:368-375`` —
    RANDN when stddev/mean are both set).
    """

    name: str
    # int|long|short|double|string|date|timestamp|boolean|oneOf|array
    # |decimal|binary|struct
    type: str = "string"
    min: Any = 0
    max: Any = 100
    min_len: int = 5
    max_len: int = 10
    one_of: Sequence[Any] | None = None
    element: "FieldSpec | None" = None  # for arrays
    array_min_len: int = 0
    array_max_len: int = 5
    null_prob: float = 0.0
    edge_prob: float = 0.0
    seed: int | None = None
    static: Any = None
    sql: str | None = None  # dependent expression over sibling fields
    decimals: int = 4  # rounding for double
    regex: str | None = None  # regex generator (bounded subset -> pure SQL)
    # faker-style expression, e.g. "#{Name.name}" (RandomDataGenerator.
    # scala:63-66 EXPRESSION metadata -> GENERATE_FAKER_EXPRESSION UDF;
    # compiled here to pure Catalyst SQL, operators/expressions.py)
    expression: str | None = None
    fields: "Sequence[FieldSpec] | None" = None  # struct subfields
    precision: int = 10  # decimal(p,s)
    scale: int = 2
    stddev: float | None = None  # normal distribution (with mean)
    mean: float | None = None


def _rand(seed: int | None) -> str:
    return f"RAND({seed})" if seed is not None else "RAND()"


def field_sql(spec: FieldSpec) -> str:
    """Emit the generator SQL for one field (pre null/edge wrapping).

    Exact shapes follow the reference emissions cited in the module
    docstring so behavior is auditable against its pinned tests.
    """
    r = _rand(spec.seed)
    t = spec.type
    if spec.static is not None:
        if isinstance(spec.static, str):
            return "'" + spec.static.replace("'", "\\'") + "'"
        return repr(spec.static)
    if spec.sql is not None:
        return spec.sql
    if spec.expression is not None:
        from .expressions import expression_sql

        return expression_sql(spec.expression, seed=spec.seed)
    if spec.regex is not None or t == "regex":
        from .regexgen import regex_sql

        if not spec.regex:
            raise ValueError(
                f"field {spec.name}: regex generator requires a pattern "
                "(reference: InvalidDataGeneratorConfigurationException)"
            )
        return regex_sql(spec.regex, seed=spec.seed)
    if t == "struct":
        if not spec.fields:
            raise ValueError(f"field {spec.name}: struct requires subfields")
        parts = []
        for i, sub in enumerate(spec.fields):
            if sub.seed is None and spec.seed is not None:
                from dataclasses import replace

                sub = replace(sub, seed=spec.seed + 31 * (i + 1))
            # recursive NAMED_STRUCT emission (RandomDataGenerator.scala:
            # 307-320) — subfields keep their own null/edge wrapping
            parts.append(f"'{sub.name}', {wrapped_field_sql(sub)}")
        return f"NAMED_STRUCT({', '.join(parts)})"
    if spec.one_of is not None or t == "oneOf":
        vals = list(spec.one_of or [])
        rendered = ", ".join(
            "'" + str(v).replace("'", "\\'") + "'" if isinstance(v, str) else repr(v)
            for v in vals
        )
        return f"ELEMENT_AT(ARRAY({rendered}), CAST({r} * {len(vals)} AS INT) + 1)"
    if t in ("int", "integer", "long", "short", "double", "decimal"):
        if spec.stddev is not None and spec.mean is not None:
            # normal distribution: RANDN * stddev + mean
            # (RandomDataGenerator.scala:368-375 — sqlRand RAND -> RANDN)
            rn = f"RANDN({spec.seed})" if spec.seed is not None else "RANDN()"
            base = f"{rn} * {spec.stddev} + {spec.mean}"
        else:
            diff = spec.max - spec.min
            base = f"{r} * {diff} + {spec.min}"
        if t in ("int", "integer"):
            return f"CAST(ROUND({base}, 0) AS INT)"
        if t == "long":
            return f"CAST(ROUND({base}, 0) AS LONG)"
        if t == "short":
            return f"CAST(ROUND({base}, 0) AS SHORT)"
        if t == "decimal":
            if spec.scale >= spec.precision:
                raise ValueError(
                    f"field {spec.name}: scale must be < precision "
                    "(reference DataType.scala:54-62)"
                )
            return (
                f"CAST(ROUND({base}, {spec.scale}) "
                f"AS DECIMAL({spec.precision}, {spec.scale}))"
            )
        return f"ROUND({base}, {spec.decimals})"
    if t == "binary":
        # printable-ASCII random bytes, exact reference emission shape
        # (RandomDataGenerator.scala:253-255: TO_BINARY(ARRAY_JOIN(
        #  TRANSFORM(ARRAY_REPEAT(...)), ...), 'utf-8'))
        n_expr = (
            f"CAST({r} * {spec.max_len - spec.min_len} + {spec.min_len} AS INT)"
        )
        return (
            f"TO_BINARY(ARRAY_JOIN(TRANSFORM(ARRAY_REPEAT(1, {n_expr}), "
            f"i -> CHAR(ROUND({_rand(spec.seed)} * 94 + 32, 0))), ''), 'utf-8')"
        )
    if t == "string":
        # random-length alphanumeric, vectorized (no UDF)
        len_expr = (
            f"CAST(ROUND({r} * {spec.max_len - spec.min_len} + {spec.min_len}, 0) AS INT)"
        )
        return (
            f"CONCAT_WS('', TRANSFORM(SEQUENCE(1, {len_expr}), i -> "
            f"SUBSTR('{ALPHANUMERIC}', CEIL({_rand(spec.seed)} * 62), 1)))"
        )
    if t == "date":
        lo, hi = str(spec.min), str(spec.max)
        return (
            f"DATE_ADD(DATE'{lo}', CAST({r} * DATEDIFF(DATE'{hi}', DATE'{lo}') AS INT))"
        )
    if t == "timestamp":
        lo, hi = str(spec.min), str(spec.max)
        return (
            f"CAST(TIMESTAMP_MILLIS(CAST({r} * "
            f"(UNIX_MILLIS(TIMESTAMP'{hi}') - UNIX_MILLIS(TIMESTAMP'{lo}')) "
            f"+ UNIX_MILLIS(TIMESTAMP'{lo}') AS LONG)) AS TIMESTAMP)"
        )
    if t in ("boolean", "bool"):
        return f"BOOLEAN(ROUND({r}))"
    if t == "array":
        elem = spec.element or FieldSpec(name="elem", type="string")
        if elem.seed is None and spec.seed is not None:
            from dataclasses import replace

            elem = replace(elem, seed=spec.seed + 1)
        n_expr = (
            f"CAST(ROUND({r} * {spec.array_max_len - spec.array_min_len} "
            f"+ {spec.array_min_len}, 0) AS INT)"
        )
        return f"TRANSFORM(ARRAY_REPEAT(1, {n_expr}), i -> {field_sql(elem)})"
    raise ValueError(f"unsupported generator type: {t}")


def _edge_literal(v: Any) -> str:
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, float):
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
    return repr(v)


def wrapped_field_sql(spec: FieldSpec) -> str:
    """Null/edge-case injection wrapper (DataGenerator.scala:31-54):
    CASE WHEN rand <= p THEN edge/null ELSE gen END."""
    expr = field_sql(spec)
    if spec.edge_prob > 0:
        edges = EDGE_CASES.get(spec.type, EDGE_CASES["string"])
        arr = ", ".join(_edge_literal(v) for v in edges)
        pick = (
            f"ELEMENT_AT(ARRAY({arr}), CAST({_rand(spec.seed)} * {len(edges)} AS INT) + 1)"
        )
        expr = f"CASE WHEN {_rand(spec.seed)} <= {spec.edge_prob} THEN {pick} ELSE {expr} END"
    if spec.null_prob > 0:
        expr = f"CASE WHEN {_rand(spec.seed)} <= {spec.null_prob} THEN NULL ELSE {expr} END"
    return expr


def draw_count(
    count_min: int, count_max: int, seed: int | None = None
) -> int:
    """Generator-driven record count: one deterministic draw in
    [count_min, count_max] (the reference's ``Count``-with-generator,
    ``PlanModels.scala:53-63`` — its count generator is evaluated once on
    the driver per batch, ``RecordCountUtil``).  A seeded splitmix64 step
    keeps the draw reproducible without an RNG object."""
    if count_min > count_max:
        raise ValueError("count_min must be <= count_max")
    state = ((seed if seed is not None else 0x9E3779B9) * 6364136223846793005
             + 1442695040888963407) % (1 << 64)
    return count_min + state % (count_max - count_min + 1)


def generate(
    spark: SparkSession,
    fields: Sequence[FieldSpec],
    count: "int | tuple[int, int]",
    num_partitions: int | None = None,
    count_seed: int | None = None,
) -> DataFrame:
    """Materialize ``count`` rows over a ``spark.range`` index.

    ``count`` may be a (min, max) tuple — the generator-driven Count
    surface: the total is drawn via :func:`draw_count`.

    Independent fields evaluate in one ``selectExpr``-style projection;
    ``sql``-dependent fields are applied afterwards IN LIST ORDER, each
    able to reference any earlier field (explicit staging instead of the
    reference's run-twice hack, ``GeneratorUtil.scala:56-77``).
    """
    if isinstance(count, tuple):
        count = draw_count(count[0], count[1], count_seed)
    rng = spark.range(0, count, 1, num_partitions) if num_partitions else spark.range(count)
    df = rng.withColumnRenamed("id", "__index_inc")
    independent = {
        f.name: F.expr(wrapped_field_sql(f)) for f in fields if f.sql is None
    }
    df = df.withColumns(independent)
    for f in fields:
        if f.sql is not None:
            df = df.withColumn(f.name, F.expr(f.sql))
    return df.select(*[f.name for f in fields])


def per_column_count(
    df: DataFrame,
    records_per_value: int,
    rand_seed: int | None = None,
    vary: bool = False,
    records_min: int | None = None,
) -> DataFrame:
    """N output records per input row (reference per-column-count explode,
    ``DataGeneratorFactory.scala:98-117`` — done with sequence+explode,
    no UDF).  ``vary`` draws N per row from [records_min or 1,
    records_per_value] — the PerColumnCount-with-generator surface."""
    if vary:
        lo = records_min if records_min is not None else 1
        n = F.expr(
            f"CAST(ROUND({_rand(rand_seed)} * {records_per_value - lo} + {lo}, 0) AS INT)"
        )
    else:
        n = F.lit(records_per_value)
    return df.withColumn("__rep", F.explode(F.sequence(F.lit(1), n))).drop("__rep")


def enforce_unique(
    df: DataFrame, cols: Sequence[str], previous: DataFrame | None = None
) -> DataFrame:
    """Unique-enforcement: dedup within the batch, anti-join against all
    previously generated values (``UniqueFieldsUtil.scala:17-30``)."""
    out = df.dropDuplicates(list(cols))
    if previous is not None:
        out = out.join(
            previous.select(*cols).dropDuplicates(list(cols)),
            on=list(cols),
            how="left_anti",
        )
    return out


def with_distributed_ordinal(df: DataFrame, out_col: str = "__ord") -> DataFrame:
    """Dense 0..n-1 ordinal with NO global window and NO single-partition
    funnel — the DataFrame analog of RDD ``zipWithIndex``
    (``ForeignKeyUtil.scala:242-252``):

    1. one tiny job counts rows per partition (num-partitions rows to the
       driver),
    2. the ordinal is ``offset[partition] + position-within-partition``,
       where position comes from the low 33 bits of
       ``monotonically_increasing_id`` (its documented layout: partition
       id in the high bits, a per-partition counter in the low 33) — a
       purely narrow, codegen'd projection.

    Requires a deterministically-partitioned input (a scan, ``spark.range``,
    or any deterministic lineage): partition COUNTS must match between the
    count job and the consuming job.  Within-partition order may differ —
    that permutes ordinals within a partition but keeps them dense+unique.
    """
    counts = (
        df.select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid")
        .count()
        .collect()
    )
    by_pid = {r["__pid"]: r["count"] for r in counts}
    max_pid = max(by_pid, default=-1)
    offsets, acc = [], 0
    for pid in range(max_pid + 1):
        offsets.append(acc)
        acc += by_pid.get(pid, 0)
    offset_arr = F.array(*[F.lit(o).cast("long") for o in offsets]) if offsets else F.array()
    mid = F.monotonically_increasing_id()
    pid = F.shiftright(mid, 33)
    pos = mid.bitwiseAND(F.lit((1 << 33) - 1))
    return df.withColumn(
        out_col, F.element_at(offset_arr, (pid + 1).cast("int")) + pos
    )


#: key-set size above which the ordinal join goes distributed instead of
#: broadcast — millions of composite keys exceed broadcast limits and OOM
#: the driver/executors; the reference's zipWithIndex join is always
#: distributed (``ForeignKeyUtil.scala:242-252``)
FK_BROADCAST_MAX_KEYS = 1_000_000


def assign_foreign_key(
    target: DataFrame,
    source: DataFrame,
    source_col: str | Sequence[str],
    target_col: str | Sequence[str],
    broadcast_max_keys: int = FK_BROADCAST_MAX_KEYS,
) -> DataFrame:
    """Overwrite ``target_col`` with values drawn from the source key set
    by ORDINAL join — the reference's skew-free zipWithIndex trick
    (``ForeignKeyUtil.scala:114-151, 242-252``).  Both ordinals come from
    :func:`with_distributed_ordinal` (per-partition offsets — no global
    window, no single-partition exchange); the equi-join key is the dense
    ordinal, never the (possibly hot) FK value, so no value skew.

    ``source_col``/``target_col`` accept column LISTS for composite keys
    (the reference's FK fields are lists, ``ForeignKeyUtil.scala:114-151``);
    the composite values travel together through one ordinal join.
    """
    src_cols = [source_col] if isinstance(source_col, str) else list(source_col)
    tgt_cols = [target_col] if isinstance(target_col, str) else list(target_col)
    if len(src_cols) != len(tgt_cols):
        raise ValueError("source_col/target_col arity mismatch")
    vals = [f"__fk_val{i}" for i in range(len(src_cols))]
    keys = source.select(
        *[F.col(s).alias(v) for s, v in zip(src_cols, vals)]
    ).distinct()
    # pin the distinct output before counting: ordinal assignment and the
    # join must see identical partition counts
    keys = keys.sortWithinPartitions(*vals)
    n = keys.count()
    if n == 0:
        raise ValueError(
            "assign_foreign_key: source key set is empty — every target "
            "row would get a NULL foreign key"
        )
    keys = with_distributed_ordinal(keys, "__ord")
    tgt = with_distributed_ordinal(target, "__ord").withColumn(
        "__ord", F.pmod(F.col("__ord"), F.lit(n))
    )
    # broadcast only a driver-safe key set (count is already in hand); a
    # large key set takes the distributed ordinal equi-join — dense ints,
    # no skew, the reference's zipWithIndex shape
    keyside = F.broadcast(keys) if n <= broadcast_max_keys else keys
    out = tgt.join(keyside, "__ord", "left")
    for t, v in zip(tgt_cols, vals):
        out = out.withColumn(t, F.col(v))
    return out.drop("__ord", *vals)


def foreign_key_insert_order(
    relationships: Sequence[tuple[str, str]]
) -> list[str]:
    """Topological insert order over (source_table, target_table) FK pairs
    — sources (referenced tables) first, as the reference computes for
    multi-table generation (``ForeignKeyUtil.scala:190-204``).  Stable:
    ties resolve in first-seen order.  Raises on cycles.
    """
    order: list[str] = []
    deps: dict[str, set[str]] = {}
    seen: list[str] = []
    for src, tgt in relationships:
        for t in (src, tgt):
            if t not in deps:
                deps[t] = set()
                seen.append(t)
        deps[tgt].add(src)
    remaining = dict(deps)
    while remaining:
        ready = [t for t in seen if t in remaining and not (remaining[t] & remaining.keys())]
        if not ready:
            raise ValueError(f"foreign-key cycle among: {sorted(remaining)}")
        for t in ready:
            order.append(t)
            del remaining[t]
    return order


def foreign_key_delete_order(
    relationships: Sequence[tuple[str, str]]
) -> list[str]:
    """Reverse topological order over (source, target) FK pairs —
    referencing tables first, referenced parents last, so sink cleanup
    never breaks referential integrity mid-delete
    (``ForeignKeyUtil.scala:206-240`` getDeleteOrder: for key2
    referencing key1 and key3 referencing key2, delete key3, key2,
    key1)."""
    return list(reversed(foreign_key_insert_order(relationships)))


def apply_foreign_keys(
    tables: dict[str, DataFrame],
    foreign_keys: Sequence[tuple[str, "str | Sequence[str]", str, "str | Sequence[str]"]],
) -> tuple[dict[str, DataFrame], list[str]]:
    """Multi-table FK orchestration: resolve the insert order, then assign
    each (source_table, source_cols, target_table, target_cols) FK in that
    order so chained references (A <- B <- C) see already-consistent
    parents.  Returns (updated tables, insert order).
    """
    order = foreign_key_insert_order(
        [(src, tgt) for src, _sc, tgt, _tc in foreign_keys]
    )
    out = dict(tables)
    for tname in order:
        for src, src_cols, tgt, tgt_cols in foreign_keys:
            if tgt != tname:
                continue
            out[tgt] = assign_foreign_key(
                out[tgt], out[src], src_cols, tgt_cols
            )
    return out, order
