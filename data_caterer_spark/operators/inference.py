"""Metadata-driven generator inference: profile a table, get FieldSpecs.

The reference turns profiling statistics into generator metadata — min/max
bounds, null fraction, one-of value sets — and regenerates schema-shaped
data from them (``MetadataUtil.scala:43-112``; one-of thresholds
``Constants.scala:175-176``: distinct/count <= 0.2 and count >=
oneOfMinCount).  Spark-first re-expression:

* ONE aggregate pass computes every column's stats simultaneously
  (count / nulls / distinct / min / max / length bounds) — no
  ``ANALYZE TABLE`` + cache-manager introspection, no per-column scans;
* one-of value sets are collected only for columns that pass the
  threshold, all in a second single pass (grouping sets would over-shuffle
  for this: the value sets are tiny by construction);
* the output is directly a list of :class:`FieldSpec`, so
  ``generate(spark, infer_field_specs(df), n)`` round-trips
  profile -> schema -> synthetic data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

from .generator import FieldSpec

ONEOF_DISTINCT_RATIO = 0.2  # Constants.scala:175
ONEOF_MIN_COUNT = 1000  # Constants.scala:176
ONEOF_MAX_VALUES = 100  # don't collect unbounded categorical sets


@dataclass(frozen=True)
class ColumnProfile:
    name: str
    spark_type: str
    count: int
    nulls: int
    distinct: int
    min_v: Any
    max_v: Any
    min_len: int | None
    max_len: int | None

    @property
    def null_ratio(self) -> float:
        return self.nulls / self.count if self.count else 0.0

    def is_oneof(
        self,
        ratio: float = ONEOF_DISTINCT_RATIO,
        min_count: int = ONEOF_MIN_COUNT,
    ) -> bool:
        """MetadataUtil.determineIfOneOfColumn:95-112 (dates excluded)."""
        if self.spark_type in ("date", "timestamp") or self.count == 0:
            return False
        return (
            self.count >= min_count
            and self.distinct / self.count <= ratio
            and self.distinct <= ONEOF_MAX_VALUES
        )


_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> list[ColumnProfile]:
    """All columns' stats in ONE aggregate pass over the input."""
    fields = [f for f in df.schema.fields if cols is None or f.name in cols]
    aggs: list = [F.count(F.lit(1)).alias("__cnt")]
    for f in fields:
        c = f.name
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(F.approx_count_distinct(c).alias(f"{c}__dc"))
        simple = f.dataType.simpleString()
        if simple in _NUMERIC or simple in ("date", "timestamp") or simple.startswith("decimal"):
            aggs.append(F.min(c).alias(f"{c}__mn"))
            aggs.append(F.max(c).alias(f"{c}__mx"))
        elif simple == "string":
            aggs.append(F.min(F.length(c)).alias(f"{c}__lmn"))
            aggs.append(F.max(F.length(c)).alias(f"{c}__lmx"))
    row = df.agg(*aggs).collect()[0]
    out = []
    for f in fields:
        c = f.name
        out.append(
            ColumnProfile(
                name=c,
                spark_type=f.dataType.simpleString(),
                count=row["__cnt"],
                nulls=row["__cnt"] - row[f"{c}__nn"],
                distinct=row[f"{c}__dc"],
                min_v=row.asDict().get(f"{c}__mn"),
                max_v=row.asDict().get(f"{c}__mx"),
                min_len=row.asDict().get(f"{c}__lmn"),
                max_len=row.asDict().get(f"{c}__lmx"),
            )
        )
    return out


_TYPE_MAP = {
    "tinyint": "short",
    "smallint": "short",
    "int": "int",
    "bigint": "long",
    "float": "double",
    "double": "double",
    "string": "string",
    "date": "date",
    "timestamp": "timestamp",
    "boolean": "boolean",
}


def infer_field_specs(
    df: DataFrame,
    cols: list[str] | None = None,
    oneof_ratio: float = ONEOF_DISTINCT_RATIO,
    oneof_min_count: int = ONEOF_MIN_COUNT,
    seed: int | None = None,
) -> list[FieldSpec]:
    """profile -> FieldSpec list (the reference's metadata round trip).

    One stats pass + one pass collecting every one-of column's value set
    together (a union of tiny distincts — each passed the <=
    ONEOF_MAX_VALUES bound already).
    """
    profiles = profile_columns(df, cols)
    oneof_cols = [
        p.name for p in profiles if p.is_oneof(oneof_ratio, oneof_min_count)
    ]
    value_sets: dict[str, list] = {c: [] for c in oneof_cols}
    if oneof_cols:
        stacked = None
        for c in oneof_cols:
            part = (
                df.select(
                    F.lit(c).alias("__col"),
                    F.col(c).cast("string").alias("__val"),
                )
                .where(F.col("__val").isNotNull())
                .distinct()
            )
            stacked = part if stacked is None else stacked.unionByName(part)
        types = {p.name: p.spark_type for p in profiles}
        for r in stacked.collect():
            v: Any = r["__val"]
            # restore the native type (the reference stringifies via
            # Row.mkString — typed values regenerate with schema fidelity)
            t = types[r["__col"]]
            if t in ("tinyint", "smallint", "int", "bigint"):
                v = int(v)
            elif t in ("float", "double") or t.startswith("decimal"):
                v = float(v)
            elif t == "boolean":
                v = v == "true"
            value_sets[r["__col"]].append(v)
    specs: list[FieldSpec] = []
    for i, p in enumerate(profiles):
        base_type = _TYPE_MAP.get(p.spark_type)
        if base_type is None and p.spark_type.startswith("decimal"):
            base_type = "decimal"
        if base_type is None:
            continue  # arrays/structs/binary: not inferable from stats
        spec_seed = None if seed is None else seed + 17 * (i + 1)
        if p.name in value_sets and value_sets[p.name]:
            specs.append(
                FieldSpec(
                    name=p.name,
                    type="oneOf",
                    one_of=sorted(value_sets[p.name]),
                    null_prob=p.null_ratio,
                    seed=spec_seed,
                )
            )
            continue
        kw: dict[str, Any] = {}
        if base_type == "string":
            kw["min_len"] = p.min_len if p.min_len is not None else 5
            kw["max_len"] = p.max_len if p.max_len is not None else 10
        elif p.min_v is not None and p.max_v is not None:
            kw["min"], kw["max"] = p.min_v, p.max_v
        if base_type == "decimal":
            d = ST._parse_datatype_string(p.spark_type)
            kw["precision"], kw["scale"] = d.precision, d.scale
            kw["min"] = float(kw.get("min", 0))
            kw["max"] = float(kw.get("max", 100))
        specs.append(
            FieldSpec(
                name=p.name,
                type=base_type,
                null_prob=p.null_ratio,
                seed=spec_seed,
                **kw,
            )
        )
    return specs
