"""JDBC source/sink — the reference's primary database connector surface.

Reference parity (Spark-first, not a port):
* connection config = url + driver + credentials + pass-through options
  (``DataCatererConfigurationBuilder.scala:75-135`` — ``postgres()`` /
  ``mysql()`` merge ``Map(DRIVER -> ...)`` into the step options);
* driver constants (``api model/Constants.scala:26-27``);
* the postgres quirk: when the driver is postgres and ``stringtype`` is
  unset, add ``stringtype=unspecified`` so generated strings coerce into
  enum/json/uuid columns (``SinkFactory.scala:89-96``);
* save-mode mapping: step option string -> Spark ``SaveMode``
  (``SinkFactory.scala:22``);
* sink partitioning via ``partitions`` (repartition before write,
  ``SinkFactory.scala:82-83``).

Scale design: a JDBC *read* of a big table must be range-partitioned
(``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``) or it
is a single-connection scan; a JDBC *write* is one connection per Spark
partition, so ``num_partitions`` bounds the connection count and
``batchsize`` amortizes the per-statement round trip (the reference's
load tests tune exactly these: ``load-test/RESULTS.md:41-44`` — shuffle
partitions down to 1-10, batchsize up to 1M, for 3M-row Postgres loads).

This sandbox has no database server, but pyspark bundles embedded Derby
(``derby-10.16.1.1.jar``), so the whole path is runtime-verified with a
``jdbc:derby:`` write -> partitioned read-back roundtrip (tests +
``jdbc_roundtrip_counts`` catalog query).
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

# driver constants (api model/Constants.scala:26-27 + embedded Derby)
POSTGRES_DRIVER = "org.postgresql.Driver"
MYSQL_DRIVER = "com.mysql.cj.jdbc.Driver"
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

#: url scheme -> driver class, for configs that omit ``driver``
_SCHEME_DRIVERS = {
    "postgresql": POSTGRES_DRIVER,
    "mysql": MYSQL_DRIVER,
    "derby": DERBY_DRIVER,
}

SAVE_MODES = {"append", "overwrite", "ignore", "error", "errorifexists"}


def infer_driver(url: str) -> str | None:
    """``jdbc:<scheme>:...`` -> driver class (None when unknown)."""
    parts = url.split(":", 2)
    if len(parts) < 2 or parts[0] != "jdbc":
        raise ValueError(f"not a jdbc url: {url!r}")
    return _SCHEME_DRIVERS.get(parts[1])


def jdbc_connection(
    url: str,
    username: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    options: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """Build the JDBC option map the reference's connection builders emit,
    including the postgres ``stringtype`` quirk (``SinkFactory.scala:89-96``).
    """
    conf: dict[str, str] = dict(options or {})
    conf["url"] = url
    drv = driver or infer_driver(url)
    if drv:
        conf["driver"] = drv
    if username is not None:
        conf["user"] = username
    if password is not None:
        conf["password"] = password
    # postgres: generated strings must coerce into enum/json/uuid columns
    if conf.get("driver", "").lower() == POSTGRES_DRIVER.lower():
        conf.setdefault("stringtype", "unspecified")
    return conf


def read_jdbc(
    spark: SparkSession,
    connection: Mapping[str, str],
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: "int | str | None" = None,
    upper_bound: "int | str | None" = None,
    num_partitions: int | None = None,
    fetchsize: int | None = None,
) -> DataFrame:
    """Batch JDBC read.  Pass ``partition_column`` + bounds + partitions
    for a parallel range-partitioned scan — without them a JDBC read is
    ONE connection pulling the whole table through the driver node, the
    classic 100 TB anti-pattern.  ``query`` pushes a subquery down to the
    database (column pruning/filtering happens server-side)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query required")
    reader = spark.read.format("jdbc").options(**dict(connection))
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        if query is not None:
            # Spark disallows partitionColumn with query; a subquery alias
            # as dbtable is the supported spelling
            raise ValueError("partitioned reads require table, not query")
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if fetchsize is not None:
        reader = reader.option("fetchsize", str(fetchsize))
    return reader.load()


def write_jdbc(
    df: DataFrame,
    connection: Mapping[str, str],
    table: str,
    mode: str = "append",
    batchsize: int | None = 10_000,
    num_partitions: int | None = None,
    isolation_level: str | None = None,
) -> None:
    """Batch JDBC write.  ``num_partitions`` repartitions before the write
    — one DB connection per partition (``SinkFactory.scala:82-83``; the
    reference's Postgres load tests converge on very FEW partitions +
    large ``batchsize`` for single-instance databases)."""
    mode = mode.lower()
    if mode not in SAVE_MODES:
        raise ValueError(f"unknown save mode {mode!r}; one of {sorted(SAVE_MODES)}")
    if num_partitions is not None:
        df = df.repartition(num_partitions)
    writer = df.write.format("jdbc").mode(mode).options(**dict(connection))
    writer = writer.option("dbtable", table)
    if batchsize is not None:
        writer = writer.option("batchsize", str(batchsize))
    if isolation_level is not None:
        writer = writer.option("isolationLevel", isolation_level)
    writer.save()


# --------------------------------------------------------------------------
# embedded Derby — the sandbox-verifiable JDBC database
# --------------------------------------------------------------------------


def derby_available() -> bool:
    """True when the embedded Derby jar ships with this pyspark."""
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return any(
            f.startswith("derby-") and f.endswith(".jar")
            for f in os.listdir(jars)
        )
    except OSError:
        return False


def derby_connection(db_dir: str, create: bool = True) -> dict[str, str]:
    """Connection config for an embedded Derby database at ``db_dir``."""
    suffix = ";create=true" if create else ""
    return jdbc_connection(f"jdbc:derby:{db_dir}{suffix}")
