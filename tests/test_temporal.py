"""Temporal operators: as-of join, interval bin join, CDC snapshot,
rolling RANGE frame — semantics on handcrafted rows + plan pinning
(the whole point of these operators is the plan shape at 100 TB)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from data_caterer_spark.operators.temporal import (
    asof_join,
    interval_bin_join,
    latest_snapshot,
    time_range_window,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10)), (1, _ts(30)), (2, _ts(5)), (3, _ts(7))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        # k=1: two candidates; k=2: exact-instant match (<= wins);
        # k=3: only FUTURE rows -> no match
        [
            (1, _ts(9), 100),
            (1, _ts(20), 200),
            (2, _ts(5), 300),
            (3, _ts(8), 400),
        ],
        "k long, ts timestamp, v long",
    )
    out = asof_join(left, right, ["k"], "ts", ["v"]).orderBy("k", "ts")
    rows = [(r.k, r.ts.minute, r.asof_v) for r in out.collect()]
    assert rows == [
        (1, 10, 100),  # 09:00 is the latest <= 10:00
        (1, 30, 200),
        (2, 5, 300),  # same-instant right row matches (<=)
        (3, 7, None),  # nothing at-or-before -> left row kept, null
    ]


def test_asof_join_null_keys_never_match(spark):
    # SQL equality semantics: NULL = NULL is not true, so a NULL-key
    # left row must come back UNMATCHED even when a NULL-key right row
    # exists at an earlier timestamp (window partitionBy would
    # otherwise group the NULLs together and match them).
    left = spark.createDataFrame(
        [(None, _ts(10)), (1, _ts(10))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(None, _ts(9), 100), (1, _ts(9), 200)],
        "k long, ts timestamp, v long",
    )
    out = asof_join(left, right, ["k"], "ts", ["v"]).orderBy(
        F.asc_nulls_first("k")
    )
    rows = [(r.k, r.asof_v) for r in out.collect()]
    assert rows == [(None, None), (1, 200)]


def test_asof_join_tiebreak_is_max(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(9), 7, 70), (1, _ts(9), 9, 90), (1, _ts(9), 8, 80)],
        "k long, ts timestamp, eid long, v long",
    )
    out = asof_join(
        left, right, ["k"], "ts", ["eid", "v"], tiebreak_col="eid"
    )
    r = out.collect()[0]
    assert (r.asof_eid, r.asof_v) == (9, 90)


def test_asof_join_plan_one_exchange_no_join(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("v"),
    )
    plan = _plan(asof_join(left, right, ["k"], "ts", ["v"]))
    assert "Join" not in plan, plan  # union trick: NO join operator
    assert plan.count("Exchange") == 1, plan  # one shuffle on the key


def test_interval_bin_join_boundaries(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(10), _ts(20))], "iid long, s timestamp, e timestamp"
    )
    points = spark.createDataFrame(
        # start inclusive, end exclusive; bin straddle (17:30 is in the
        # interval's second 600s bin when width=600)
        [(10, _ts(10)), (11, _ts(17, 30)), (12, _ts(20)), (13, _ts(9, 59))],
        "pid long, ts timestamp",
    )
    out = interval_bin_join(intervals, points, "s", "e", "ts", 600)
    assert sorted(r.pid for r in out.collect()) == [10, 11]


def test_interval_bin_join_no_nested_loop(spark):
    intervals = spark.range(20).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 600).alias("s"),
        F.timestamp_seconds(F.col("id") * 600 + 600).alias("e"),
    )
    points = spark.range(200).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") * 37).alias("ts"),
    )
    joined = interval_bin_join(intervals, points, "s", "e", "ts", 600)
    plan = _plan(joined)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # each qualifying pair appears exactly once (points carry ONE bin)
    n = joined.count()
    naive = intervals.crossJoin(points).where(
        (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
    )
    assert n == naive.count()


def test_latest_snapshot_tombstones_and_plan(spark):
    log = spark.createDataFrame(
        [
            # user 1: delete then a newer upsert -> survives
            (1, 1, "upsert", _ts(1)),
            (1, 2, "delete", _ts(2)),
            (1, 3, "upsert", _ts(3)),
            # user 2: latest row is the tombstone -> gone
            (2, 4, "upsert", _ts(1)),
            (2, 5, "delete", _ts(9)),
        ],
        "uid long, eid long, op string, ts timestamp",
    )
    snap = latest_snapshot(
        log, ["uid"], ["ts", "eid"], F.col("op") == "delete"
    )
    rows = [(r.uid, r.eid) for r in snap.collect()]
    assert rows == [(1, 3)]
    plan = _plan(snap)
    assert "Window" not in plan, plan  # max_by aggregate, not row_number
    assert "partial_max_by" in plan or "HashAggregate" in plan, plan


def test_time_range_window_inclusive_bound(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(59), 1), (1, dt.datetime(2024, 1, 1, 1, 0), 1)],
        "k long, ts timestamp, v long",
    )
    w = time_range_window(["k"], "ts", preceding_s=3600)
    out = ev.select("ts", F.count(F.lit(1)).over(w).alias("n")).orderBy("ts")
    # at 01:00:00 the 00:00:00 row is exactly 3600 s back -> inclusive
    assert [r.n for r in out.collect()] == [1, 2, 3]


def test_asof_property_matches_pandas(spark):
    """Property check vs pandas merge_asof on randomized inputs."""
    import random

    import pandas as pd

    rng = random.Random(20260818)
    for trial in range(5):
        left = sorted(
            (rng.randint(0, 3), rng.randint(0, 10_000_000))
            for _ in range(rng.randint(1, 60))
        )
        right = {
            (rng.randint(0, 3), rng.randint(0, 10_000_000), i)
            for i in range(rng.randint(1, 60))
        }
        ldf = spark.createDataFrame(
            [(k, dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(tzinfo=None), i)
             for i, (k, us) in enumerate(left)],
            "k long, ts timestamp, lid long",
        )
        rdf = spark.createDataFrame(
            [(k, dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(tzinfo=None), v)
             for k, us, v in right],
            "k long, ts timestamp, v long",
        )
        got = {
            r.lid: r.asof_v
            for r in asof_join(
                ldf, rdf, ["k"], "ts", ["v"], tiebreak_col="v"
            ).collect()
        }
        lp = pd.DataFrame(
            [(i, k, us) for i, (k, us) in enumerate(left)],
            columns=["lid", "k", "us"],
        ).sort_values(["us", "lid"])
        # mirror the tiebreak: among equal (k, us) keep max v
        rp = (
            pd.DataFrame(sorted(right), columns=["k", "us", "v"])
            .sort_values(["k", "us", "v"])
            .groupby(["k", "us"], as_index=False)
            .last()
            .sort_values(["us", "v"])
        )
        merged = pd.merge_asof(
            lp, rp, on="us", by="k", direction="backward"
        )
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in merged.itertuples()
        }
        assert got == want, f"trial {trial}"


def test_asof_join_null_payload_not_torn(spark):
    """A NULL payload field in the MATCHED right row must stay NULL —
    not fall through to an older right row's value (torn row)."""
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(5), 100), (1, _ts(9), None)],
        "k long, ts timestamp, v long",
    )
    r = asof_join(left, right, ["k"], "ts", ["v"]).collect()[0]
    assert r.asof_v is None  # matched row IS 09:00, its v is NULL
    assert r.asof_ts.minute == 9


def test_asof_join_string_tiebreak(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(9), "a", 1), (1, _ts(9), "c", 3), (1, _ts(9), "b", 2)],
        "k long, ts timestamp, sid string, v long",
    )
    out = asof_join(
        left, right, ["k"], "ts", ["sid", "v"], tiebreak_col="sid"
    ).collect()[0]
    assert (out.asof_sid, out.asof_v) == ("c", 3)  # max string tiebreak


def test_asof_join_null_right_ts_never_matches(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99)], "k long, ts timestamp, v long"
    )
    r = asof_join(left, right, ["k"], "ts", ["v"]).collect()[0]
    assert r.asof_v is None and r.asof_ts is None


def test_asof_join_column_clash_raises(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, _ts(1), 0)], "k long, ts timestamp, __side int"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 2)], "k long, ts timestamp, v long"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["k"], "ts", ["v"])


# --------------------------------------------------------------------------
# scd2_build
# --------------------------------------------------------------------------


def test_scd2_versions_chain(spark):
    from data_caterer_spark.operators.temporal import scd2_build

    log = spark.createDataFrame(
        [
            (1, _ts(1), "a"),
            (1, _ts(5), "b"),
            (1, _ts(9), "c"),
            (2, _ts(3), "x"),
        ],
        "k long, ts timestamp, v string",
    )
    out = scd2_build(log, ["k"], ["ts"], "ts")
    rows = {(r.k, r.version): r for r in out.collect()}
    assert rows[(1, 1)].v == "a" and rows[(1, 1)].valid_to == _ts(5)
    assert rows[(1, 2)].valid_from == _ts(5)
    assert rows[(1, 2)].valid_to == _ts(9)
    assert rows[(1, 3)].is_current and rows[(1, 3)].valid_to is None
    assert rows[(2, 1)].is_current
    # exactly one current version per key, intervals abut exactly
    assert sum(1 for r in rows.values() if r.k == 1 and r.is_current) == 1


def test_scd2_tiebreak_deterministic(spark):
    from data_caterer_spark.operators.temporal import scd2_build

    log = spark.createDataFrame(
        [(1, _ts(1), 2, "late"), (1, _ts(1), 1, "early")],
        "k long, ts timestamp, seq long, v string",
    )
    out = scd2_build(log, ["k"], ["ts", "seq"], "ts").collect()
    by_ver = {r.version: r.v for r in out}
    assert by_ver == {1: "early", 2: "late"}
