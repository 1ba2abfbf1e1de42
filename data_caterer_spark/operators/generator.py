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
    """One generated field (reference: PlanModels.scala:65-81)."""

    name: str
    type: str = "string"  # int|long|double|string|date|timestamp|boolean|oneOf|array
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
    if spec.one_of is not None or t == "oneOf":
        vals = list(spec.one_of or [])
        rendered = ", ".join(
            "'" + str(v).replace("'", "\\'") + "'" if isinstance(v, str) else repr(v)
            for v in vals
        )
        return f"ELEMENT_AT(ARRAY({rendered}), CAST({r} * {len(vals)} AS INT) + 1)"
    if t in ("int", "integer"):
        diff = spec.max - spec.min
        return f"CAST(ROUND({r} * {diff} + {spec.min}, 0) AS INT)"
    if t == "long":
        diff = spec.max - spec.min
        return f"CAST(ROUND({r} * {diff} + {spec.min}, 0) AS LONG)"
    if t == "short":
        diff = spec.max - spec.min
        return f"CAST(ROUND({r} * {diff} + {spec.min}, 0) AS SHORT)"
    if t == "double":
        diff = spec.max - spec.min
        return f"ROUND({r} * {diff} + {spec.min}, {spec.decimals})"
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


def generate(
    spark: SparkSession,
    fields: Sequence[FieldSpec],
    count: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Materialize ``count`` rows over a ``spark.range`` index.

    Independent fields evaluate in one ``selectExpr``-style projection;
    ``sql``-dependent fields are applied afterwards IN LIST ORDER, each
    able to reference any earlier field (explicit staging instead of the
    reference's run-twice hack, ``GeneratorUtil.scala:56-77``).
    """
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
) -> DataFrame:
    """N output records per input row (reference per-column-count explode,
    ``DataGeneratorFactory.scala:98-117`` — done with sequence+explode,
    no UDF).  ``vary`` draws N in [1, records_per_value] per row."""
    if vary:
        n = F.expr(
            f"CAST(ROUND({_rand(rand_seed)} * {records_per_value - 1} + 1, 0) AS INT)"
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


def assign_foreign_key(
    target: DataFrame,
    source: DataFrame,
    source_col: str,
    target_col: str,
) -> DataFrame:
    """Overwrite ``target_col`` with values drawn from the source key set
    by ORDINAL join — the reference's skew-free zipWithIndex trick
    (``ForeignKeyUtil.scala:114-151, 242-252``) as a row_number join:
    distinct source keys get ordinals, target rows get ordinals modulo the
    key count, equi-join on the ordinal.  No value-skew because the join
    key is the dense ordinal, never the (possibly hot) FK value."""
    keys = source.select(F.col(source_col).alias("__fk_val")).distinct()
    n = keys.count()
    w_k = Window.orderBy("__fk_val")
    keys = keys.withColumn("__ord", F.row_number().over(w_k) - 1)
    w_t = Window.orderBy(F.monotonically_increasing_id())
    tgt = target.withColumn("__ord", F.pmod(F.row_number().over(w_t) - 1, F.lit(n)))
    out = tgt.join(F.broadcast(keys), "__ord", "left")
    return out.withColumn(target_col, F.col("__fk_val")).drop("__ord", "__fk_val")
