"""JDBC connector tests: connection-config parity with the reference
(driver constants, postgres stringtype quirk, save modes) plus a real
embedded-Derby write -> partitioned read-back roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.sources import jdbc as J

needs_derby = pytest.mark.skipif(
    not J.derby_available(), reason="no embedded Derby jar in this pyspark"
)


def test_infer_driver_from_scheme():
    assert J.infer_driver("jdbc:postgresql://h:5432/db") == J.POSTGRES_DRIVER
    assert J.infer_driver("jdbc:mysql://h:3306/db") == J.MYSQL_DRIVER
    assert J.infer_driver("jdbc:derby:/tmp/x;create=true") == J.DERBY_DRIVER
    assert J.infer_driver("jdbc:sqlserver://h") is None
    with pytest.raises(ValueError):
        J.infer_driver("postgresql://not-jdbc")


def test_postgres_stringtype_quirk():
    # SinkFactory.scala:89-96 — postgres driver without stringtype gets
    # stringtype=unspecified; an explicit value is preserved
    conf = J.jdbc_connection("jdbc:postgresql://h/db", "u", "p")
    assert conf["driver"] == J.POSTGRES_DRIVER
    assert conf["stringtype"] == "unspecified"
    assert conf["user"] == "u" and conf["password"] == "p"
    explicit = J.jdbc_connection(
        "jdbc:postgresql://h/db", options={"stringtype": "varchar"}
    )
    assert explicit["stringtype"] == "varchar"
    # non-postgres drivers never get the quirk
    assert "stringtype" not in J.jdbc_connection("jdbc:mysql://h/db")


def test_write_jdbc_rejects_unknown_save_mode(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="save mode"):
        J.write_jdbc(df, {"url": "jdbc:derby:/tmp/x"}, "T", mode="upsert")


def test_read_jdbc_argument_validation(spark):
    conn = {"url": "jdbc:derby:/tmp/x"}
    with pytest.raises(ValueError, match="exactly one"):
        J.read_jdbc(spark, conn)
    with pytest.raises(ValueError, match="exactly one"):
        J.read_jdbc(spark, conn, table="T", query="SELECT 1")
    with pytest.raises(ValueError, match="lower_bound"):
        J.read_jdbc(spark, conn, table="T", partition_column="id")
    with pytest.raises(ValueError, match="table, not query"):
        J.read_jdbc(
            spark, conn, query="SELECT 1", partition_column="id",
            lower_bound=0, upper_bound=1, num_partitions=1,
        )


@needs_derby
def test_derby_roundtrip_save_modes(spark, tmp_path):
    db = str(tmp_path / "db")
    src = spark.range(0, 100, 1, 4).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    )
    conn = J.derby_connection(db)
    J.write_jdbc(src, conn, "T1", mode="overwrite", num_partitions=2)
    again = J.derby_connection(db, create=False)
    # append doubles the row count
    J.write_jdbc(src, again, "T1", mode="append")
    back = J.read_jdbc(spark, again, table="T1")
    assert back.count() == 200
    # overwrite resets it
    J.write_jdbc(src, again, "T1", mode="overwrite")
    assert J.read_jdbc(spark, again, table="T1").count() == 100
    # values and schema survive the roundtrip
    got = sorted(
        (r["ID"] if "ID" in back.columns else r["id"])
        for r in J.read_jdbc(spark, again, table="T1").collect()
    )
    assert got == list(range(100))


@needs_derby
def test_derby_partitioned_read_is_parallel(spark, tmp_path):
    db = str(tmp_path / "pdb")
    src = spark.range(0, 1000, 1, 4).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )
    J.write_jdbc(src, J.derby_connection(db), "T2", mode="overwrite")
    back = J.read_jdbc(
        spark,
        J.derby_connection(db, create=False),
        table="T2",
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=8,
        fetchsize=100,
    )
    assert back.rdd.getNumPartitions() == 8
    assert back.count() == 1000
    # pushed-down subquery read (Derby folds unquoted identifiers to
    # uppercase; Spark created the columns quoted, so quote them here)
    q = J.read_jdbc(
        spark,
        J.derby_connection(db, create=False),
        query='SELECT "id" FROM T2 WHERE "id" < 10',
    )
    assert q.count() == 10
