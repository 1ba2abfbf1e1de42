"""Batch sources and sinks.

Mirrors the reference's connection surface Spark-first:
* read — ``spark.read.format(fmt).options(conf).load()``
  (``ValidationProcessor.scala:101-115``, ``ValidationOperations.scala:90-98``)
* write — ``df.write.format(fmt).mode(saveMode).options(conf).save()``
  with ``partitionBy`` / ``repartition`` options
  (``SinkFactory.scala:65-96``)
* omit-column projection before the sink (``SinkFactory.scala:113-120``)

Iceberg is the production catalog (BASELINE north_rule); this sandbox has
no Iceberg runtime jar (``config.iceberg_available``), so the same
semantics run against partitioned parquet + the manifest sidecar in
``sources/manifest.py`` (snapshot/resume bookkeeping).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

BATCH_FORMATS = {"csv", "json", "parquet", "orc", "jdbc", "xml"}

# formats the reference treats as real-time/connection-managed and skips in
# batch validation (HTTP/JMS, ValidationProcessor.scala:104-108)
NON_BATCH_FORMATS = {"http", "jms"}

#: formats needing a runtime jar this distribution may not carry
#: (api Constants.scala:10-24 lists delta among supported formats; XML is
#: native in Spark 4, so only delta/iceberg/cassandra/kafka stay gated)
_JAR_GATED = {
    "avro": ("spark-avro", "org.apache.spark:spark-avro"),
    "delta": ("delta-spark", "io.delta:delta-spark"),
    "iceberg": ("iceberg-spark-runtime", "org.apache.iceberg:iceberg-spark-runtime"),
    "cassandra": ("spark-cassandra-connector", "com.datastax.spark:spark-cassandra-connector"),
    "kafka": ("spark-sql-kafka", "org.apache.spark:spark-sql-kafka-0-10"),
}


def format_available(fmt: str) -> bool:
    """True when ``fmt`` is usable in this runtime (native, or its jar is
    on the classpath)."""
    gate = _JAR_GATED.get(fmt)
    if gate is None:
        return True
    import os

    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    try:
        return any(gate[0] in j for j in os.listdir(jar_dir))
    except OSError:
        return False


def _require_format(fmt: str) -> None:
    if not format_available(fmt):
        jar_hint = _JAR_GATED[fmt][1]
        raise RuntimeError(
            f"format {fmt!r} needs a runtime jar not present in this "
            f"distribution — add {jar_hint} via spark.jars.packages"
        )


def read_source(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    table: str | None = None,
    options: Mapping[str, str] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Generic batch read.  ``table`` targets a catalog table (Iceberg in
    production); ``path`` targets files."""
    if fmt in NON_BATCH_FORMATS:
        raise ValueError(f"{fmt} is not a batch-readable source")
    _require_format(fmt)
    if table is not None:
        # catalog-table read keeps the configured options (Iceberg
        # snapshot-id/as-of-timestamp etc. arrive this way); a schema
        # cannot override a catalog table's own
        if schema is not None:
            raise ValueError("schema cannot be applied to a catalog table read")
        reader = spark.read
        if options:
            reader = reader.options(**dict(options))
        return reader.table(table)
    reader = spark.read.format(fmt)
    if options:
        reader = reader.options(**dict(options))
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "jdbc":
        # connection-managed source: url/dbtable/query arrive via options
        # (sources/jdbc.py builds them with the reference's quirks)
        return reader.load()
    if path is None:
        raise ValueError("one of path/table required")
    return reader.load(path)


def write_sink(
    df: DataFrame,
    fmt: str,
    path: str | None = None,
    table: str | None = None,
    mode: str = "append",
    options: Mapping[str, str] | None = None,
    partition_by: Sequence[str] | None = None,
    num_partitions: int | None = None,
    omit_cols: Sequence[str] | None = None,
) -> None:
    """Generic batch write with the reference's sink options.

    ``num_partitions`` mirrors the ``partitions`` sink option
    (``SinkFactory.scala:82-83``); ``partition_by`` mirrors ``partitionBy``
    (``:81,84-87``); ``omit_cols`` drops intermediate columns before the
    sink (``:113-120`` — the target drops score/debug columns unless asked
    to keep them).
    """
    _require_format(fmt)
    if omit_cols:
        df = df.drop(*omit_cols)
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    writer = df.write.format(fmt).mode(mode)
    if options:
        writer = writer.options(**dict(options))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "jdbc":
        # connection-managed sink: url/dbtable arrive via options
        writer.save()
    elif table is not None:
        writer.saveAsTable(table)
    elif path is not None:
        writer.save(path)
    else:
        raise ValueError("one of path/table required")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: "Sequence[str] | None" = None,
    path: "str | None" = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sort-ordered) table write — Spark's
    pre-shuffled storage layout: both sides of an equi-join bucketed and
    sorted on the join key read ALREADY co-partitioned and ordered, so
    the join plans with NO Exchange and NO Sort — the layout a 100 TB
    pipeline maintains for its fact/dimension keys so every downstream
    join and groupBy on that key is shuffle-free.

    Bucketed writes go through the session catalog (``saveAsTable``);
    ``path`` makes it an external table.  The bucket function is
    Murmur3 on the bucket columns — stable across writes, so INCREMENTAL
    appends land in the same bucket files."""
    if mode == "overwrite":
        # saveAsTable('overwrite') on a bucketed external table can
        # refuse to reuse the location — a clean drop gives overwrite
        # semantics.  NEVER on append: dropping a managed table deletes
        # its files, so an incremental append would silently lose all
        # previously written data.
        df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.format(fmt).mode(mode)
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
