"""Bucketed storage layout: co-located joins plan with no exchange."""

import pyspark.sql.functions as F

from data_caterer_spark.sources.io import write_bucketed


def test_bucketed_join_plans_without_exchange(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    )
    write_bucketed(
        orders.select("o_custkey", "o_totalprice"),
        "t_orders_b",
        ["o_custkey"],
        n_buckets=4,
        sort_cols=["o_custkey"],
        path=str(tmp_path / "o"),
    )
    write_bucketed(
        customer.select("c_custkey", "c_nationkey"),
        "t_customer_b",
        ["c_custkey"],
        n_buckets=4,
        sort_cols=["c_custkey"],
        path=str(tmp_path / "c"),
    )
    o = spark.table("t_orders_b")
    c = spark.table("t_customer_b")
    joined = o.hint("merge").join(c, o["o_custkey"] == c["c_custkey"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located: zero shuffles
    # values still correct vs the plain (shuffling) join
    expected = (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).count()
    )
    assert joined.count() == expected


def test_bucketed_append_stays_colocated(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    write_bucketed(
        df, "t_app_b", ["k"], n_buckets=4, sort_cols=["k"],
        path=str(tmp_path / "a"),
    )
    # stable murmur3 placement: append does not break bucket pruning
    spark.range(1000, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).write.format("parquet").mode("append").insertInto("t_app_b")
    t = spark.table("t_app_b")
    assert t.count() == 2000
    j = t.alias("a").hint("merge").join(
        spark.table("t_app_b").alias("b"), "k"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert j.count() == 2000


def test_bucketed_append_mode_preserves_existing_rows(spark, tmp_path):
    from data_caterer_spark.sources.io import write_bucketed
    import pyspark.sql.functions as F

    df1 = spark.range(100).select(F.col("id").alias("k"))
    write_bucketed(df1, "t_keep_b", ["k"], n_buckets=4,
                   path=str(tmp_path / "keep"))
    df2 = spark.range(100, 150).select(F.col("id").alias("k"))
    write_bucketed(df2, "t_keep_b", ["k"], n_buckets=4,
                   path=str(tmp_path / "keep"), mode="append")
    assert spark.table("t_keep_b").count() == 150  # df1 NOT dropped
