"""grouped_topk: salted two-phase == plain window, deterministic ties."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_caterer_spark.operators.topk import grouped_topk


def _rows(df):
    return sorted(
        (r.g, r.rank, r.v, r.t) for r in df.select("g", "rank", "v", "t").collect()
    )


def test_two_phase_equals_plain_window(spark):
    df = spark.range(500).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 37 % 101).alias("v"),
        F.col("id").alias("t"),
    )
    fast = grouped_topk(df, ["g"], "v", 4, ["t"], salt_buckets=16)
    plain = grouped_topk(df, ["g"], "v", 4, ["t"], salt_buckets=1)
    assert _rows(fast) == _rows(plain)
    # every group has exactly min(k, group size) rows
    per_group = {r.g: r.n for r in fast.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert all(n == 4 for n in per_group.values())


def test_hot_group_and_ties(spark):
    # one giant group, all-equal order values: ranks fall back to the
    # tiebreak and the result is the k smallest tiebreaks
    df = spark.range(1000).select(
        F.lit(0).alias("g"), F.lit(5).alias("v"), F.col("id").alias("t")
    )
    out = grouped_topk(df, ["g"], "v", 3, ["t"])
    assert [(r.rank, r.t) for r in out.orderBy("rank").collect()] == [
        (1, 0), (2, 1), (3, 2),
    ]


def test_ascending_order(spark):
    df = spark.range(100).select(
        (F.col("id") % 2).alias("g"),
        F.col("id").alias("v"),
        F.col("id").alias("t"),
    )
    out = grouped_topk(df, ["g"], "v", 2, ["t"], descending=False)
    got = sorted((r.g, r.rank, r.v) for r in out.collect())
    assert got == [(0, 1, 0), (0, 2, 2), (1, 1, 1), (1, 2, 3)]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 4),        # group
            st.integers(-50, 50),     # value (dense -> many ties)
            st.integers(0, 10_000),   # tiebreak (may itself collide)
        ),
        min_size=1,
        max_size=120,
    ),
    k=st.integers(1, 5),
)
def test_property_matches_sequential(spark, rows, k):
    # dedup (g, v, t) triples: equal full rows make ANY top-k ambiguous
    rows = sorted(set(rows))
    df = spark.createDataFrame(rows, "g int, v int, t int")
    got = sorted(
        (r.g, r.rank, r.v, r.t)
        for r in grouped_topk(df, ["g"], "v", k, ["t"], salt_buckets=4).collect()
    )
    expected = []
    by_g: dict[int, list] = {}
    for g, v, t in rows:
        by_g.setdefault(g, []).append((v, t))
    for g, vs in by_g.items():
        ordered = sorted(vs, key=lambda p: (-p[0], p[1]))[:k]
        expected.extend((g, i + 1, v, t) for i, (v, t) in enumerate(ordered))
    assert got == sorted(expected)


def test_column_clash_raises(spark):
    import pytest

    df = spark.range(10).select(
        F.col("id").alias("g"), F.col("id").alias("v"),
        F.col("id").alias("t"), F.lit(1).alias("rank"),
    )
    with pytest.raises(ValueError, match="collide"):
        grouped_topk(df, ["g"], "v", 2, ["t"])
