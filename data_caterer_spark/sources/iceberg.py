"""Iceberg catalog integration — the production table layer.

BASELINE north_rule names Iceberg as the table format; this sandbox image
has no ``iceberg-spark-runtime`` jar (``config.iceberg_available`` gates
every entry point here and the tests fall back to the parquet+manifest
path in ``sources/manifest.py``, which implements the same semantics).
The code below is the real production path: reviewed, importable, and
exercised automatically wherever a runtime jar is present.

Scale design encoded in the DDL:
* the resume-group id is an EXPLICIT column (``group_id =
  pmod(xxhash64(conv_id), N)``, the same expression as the
  parquet+manifest fallback's ``group_expr``) and that column IS the
  partition key.  One group == one partition BY CONSTRUCTION, so
  ``read_group`` prunes to exactly the group's files and
  ``overwrite_group``'s dynamic partition overwrite can never touch
  another group's rows.  (An Iceberg ``bucket(N, conv_id)`` transform
  would NOT line up with any Spark-side hash predicate: Iceberg buckets
  with murmur3 seed 0, Spark ``hash()`` with seed 42 — deriving both the
  read predicate and the write scope from the same stored column removes
  that whole failure class.)  Conversations still co-locate: same
  conv_id -> same group -> same partition.
* the lineage sidecar is an ordinary Iceberg table appended once per
  completed group; its snapshot history doubles as the audit log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import iceberg_available
from .manifest import group_expr

GROUP_COL = "group_id"

TRANSCRIPTS_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
    conv_id  STRING NOT NULL,
    turn_idx INT    NOT NULL,
    role     STRING,
    text     STRING,
    tool     STRING,
    ts       TIMESTAMP,
    group_id INT    NOT NULL
)
USING iceberg
PARTITIONED BY (group_id)
TBLPROPERTIES (
    'write.distribution-mode' = 'hash',
    'write.target-file-size-bytes' = '536870912'
)
"""

SIDECAR_DDL = """
CREATE TABLE IF NOT EXISTS {table} (
    run_id      STRING,
    run_scope   STRING,
    group_id    INT,
    rows_in     BIGINT,
    rows_kept   BIGINT,
    rule_hits   STRING,
    wall_s      DOUBLE,
    finished_at TIMESTAMP
)
USING iceberg
"""


def _require(spark: SparkSession) -> None:
    if not iceberg_available():
        raise RuntimeError(
            "iceberg-spark-runtime jar not on the classpath; use the "
            "parquet+manifest fallback (sources/manifest.py) or add the jar"
        )


def create_transcripts_table(
    spark: SparkSession, table: str, buckets: int = 256
) -> None:
    _require(spark)
    spark.sql(TRANSCRIPTS_DDL.format(table=table, buckets=buckets))


def create_sidecar_table(spark: SparkSession, table: str) -> None:
    _require(spark)
    spark.sql(SIDECAR_DDL.format(table=table))


def with_group(df: DataFrame, buckets: int) -> DataFrame:
    """Stamp the partition/resume group id (same ``group_expr`` as the
    parquet fallback: stable across runs and cluster sizes)."""
    if GROUP_COL in df.columns:
        return df
    return df.withColumn(GROUP_COL, group_expr("conv_id", buckets))


def append(df: DataFrame, table: str, buckets: int = 256) -> None:
    """Snapshot-committed append (SinkFactory save-mode analog)."""
    _require(df.sparkSession)
    with_group(df, buckets).writeTo(table).append()


def overwrite_group(df: DataFrame, table: str, group_id: int, buckets: int) -> None:
    """Idempotent re-write of ONE resume group: the rows are filtered to
    ``group_id`` (derived from the same expression that defines the
    table's partition column), so the dynamic partition overwrite
    replaces exactly that one partition — a crash mid-group followed by a
    retry replaces, never duplicates, and can never clobber another
    group's partition (the write scope and the read predicate share one
    definition)."""
    _require(df.sparkSession)
    scoped = with_group(df, buckets).where(F.col(GROUP_COL) == group_id)
    scoped.writeTo(table).overwritePartitions()


def completed_groups_from_sidecar(spark: SparkSession, table: str) -> set[int]:
    _require(spark)
    return {
        r["group_id"]
        for r in spark.read.table(table).select("group_id").distinct().collect()
    }


def snapshots(spark: SparkSession, table: str) -> DataFrame:
    """The table's snapshot log (audit/resume introspection)."""
    _require(spark)
    return spark.read.table(f"{table}.snapshots")


def read_group(
    spark: SparkSession, table: str, group_id: int, buckets: int
) -> DataFrame:
    """One resume group's rows.  The predicate is a literal equality on
    the partition column itself, so Iceberg prunes to exactly the group's
    files — per-group resume costs O(group), not O(table)."""
    _require(spark)
    return spark.read.table(table).where(F.col(GROUP_COL) == group_id)
