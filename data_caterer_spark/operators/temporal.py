"""Temporal joins and time-aligned compaction: as-of join, interval
(range) join, CDC latest-row snapshot, time-range rolling frames.

The reference validates static batches (SURVEY.md §2); an event /
transcript pipeline at 10^12-row scale also needs TIME-aligned operators,
and each of them has a naive Spark spelling that collapses at 100 TB.
Scale rules encoded here:

* ``asof_join`` — the UNION trick, not a join: both sides are tagged and
  unioned, ONE shuffle+sort on the key orders rows by ``(ts, side)``, and
  a running ``last(..., ignorenulls=True)`` over an
  unbounded-preceding..current frame carries the most recent right-side
  payload onto each left row.  There is no join operator in the plan at
  all, so a hot key costs a sort — never the O(n·m) block a
  ``l.ts >= r.ts`` theta-join degenerates to (Catalyst plans that as
  BroadcastNestedLoopJoin).  This is the distributed merge_asof shape
  (Flint / pandas merge_asof, done as one pass).
* ``interval_bin_join`` — equi-join on a derived time BIN plus an exact
  range refilter.  The bin width is chosen ~ the interval length so each
  interval explodes into <= 2 bins while a point event carries exactly
  ONE bin — so every (interval, event) pair appears at most once (no
  dedup pass) and Catalyst plans a plain shuffled equi-join.  A naive
  ``e.ts BETWEEN i.start AND i.end`` join has no equi key and goes
  nested-loop.
* ``latest_snapshot`` — CDC latest-row-wins compaction as ONE
  ``max_by(struct(payload), struct(order))`` aggregate: partial (map-side)
  combine keeps a hot key's state at one row per task, where the usual
  ``row_number() OVER (... DESC) = 1`` spelling buffers and fully sorts
  every partition.
* ``time_range_window`` — a RANGE frame over ``unix_micros(ts)``: Spark
  evaluates the bounded frame with a sliding buffer proportional to the
  frame's row count, not the partition, so per-key rolling features are
  sort-cost, not memory-cost.

Reference parity: the reference has no temporal operators; these extend
the §2.5 window family the same way ``operators/windows.py`` does, and
are first-class LLM-pipeline ops (event alignment, incident windows,
mutable-corpus compaction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "epoch_us",
    "interval_bin_join",
    "latest_snapshot",
    "scd2_build",
    "time_range_window",
]


def epoch_us(col: "str | Column") -> Column:
    """Microsecond epoch of a timestamp column, tolerant of
    TIMESTAMP_NTZ inputs (the testdata parquet type): the session tz is
    pinned to UTC (config.py), so the NTZ->TIMESTAMP cast is
    epoch-faithful and matches DuckDB ``epoch_us`` on naive values."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
    tiebreak_col: "str | None" = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the payload of the LATEST
    right row with the same key and ``right.ts <= left.ts`` (DuckDB
    ``ASOF LEFT JOIN`` semantics); unmatched left rows keep nulls.

    Implementation is the union trick (see module docstring): one
    exchange, one sort, a streaming running-``last`` frame — no join
    operator, no per-key quadratic block.  The matched right timestamp is
    exposed as ``{prefix}{ts_col}``.

    If several right rows share an exact ``(key, ts)``, ``tiebreak_col``
    (ordered ascending; running-last therefore keeps its MAX) makes the
    pick deterministic — mirror it in any oracle with a
    ``row_number() ... ORDER BY tiebreak DESC = 1`` pre-dedup.
    """
    keys = list(key_cols)
    clash = {"__side", "__tie", "__asof"} & (
        set(left.columns) | set(right.columns)
    )
    clash |= {f"{prefix}{c}" for c in list(payload_cols) + [ts_col]} & set(
        left.columns
    )
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with asof_join's "
            "working/output columns; rename them or change the prefix"
        )
    # A NULL right timestamp can never satisfy ts_right <= ts_left (SQL
    # three-valued logic; DuckDB ASOF returns no match) — but it would
    # sort NULLS FIRST here and pollute the running last.  Drop them.
    # Likewise NULL KEYS: window partitionBy groups NULLs together, so a
    # NULL-key left row would match a NULL-key right row where SQL
    # equality-join semantics (NULL = NULL is not true) produce no
    # match.  Dropping NULL-key RIGHT rows restores equality semantics;
    # NULL-key LEFT rows are kept and come back unmatched (nulls), same
    # as a left equality join.
    null_key = F.lit(False)
    for k in keys:
        null_key = null_key | F.col(k).isNull()
    right = right.where(F.col(ts_col).isNotNull() & ~null_key)
    # The whole right row travels as ONE struct (payloads + matched ts):
    # last(ignorenulls) over a struct is atomic — either the entire
    # matched row or nothing.  Carrying each payload column in its own
    # last() would let a NULL field fall through to an OLDER right row's
    # value, producing a torn row that matches no actual right row.
    payload = F.struct(
        *[F.col(c).alias(c) for c in payload_cols],
        F.col(ts_col).alias("__matched_ts"),
    )
    tie_src = (
        F.col(tiebreak_col) if tiebreak_col is not None else F.lit(0)
    )
    tie_type = (
        right.schema[tiebreak_col].dataType.simpleString()
        if tiebreak_col is not None
        else "int"
    )
    r = right.select(
        *keys,
        F.col(ts_col),
        payload.alias("__asof"),
        F.lit(0).alias("__side"),
        tie_src.alias("__tie"),  # native type: strings order too
    )
    l = left.withColumn("__side", F.lit(1)).withColumn(
        "__tie", F.lit(None).cast(tie_type)
    )
    # left rows get a null __asof struct; right rows get null left
    # columns.  Nulls in __tie sort FIRST under asc, but only __side
    # breaks the (ts) tie across sides, so the null never competes.
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__asof", F.last(F.col("__asof"), ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("__side") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[
                F.col(f"__asof.{c}").alias(f"{prefix}{c}")
                for c in payload_cols
            ],
            F.col("__asof.__matched_ts").alias(f"{prefix}{ts_col}"),
        )
    )


def interval_bin_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    bin_width_s: int,
) -> DataFrame:
    """Interval × point range join (``start <= ts < end``) as a time-bin
    equi-join.

    Intervals explode into the ``bin_width_s``-wide bins they overlap
    (pick ``bin_width_s`` >= the typical interval length so that is <= 2
    bins each); points carry exactly ONE bin, so each qualifying
    (interval, point) pair joins exactly once — no dedup needed — and the
    exact range predicate refilters within the bin.  The plan is a
    shuffled equi-join on the 8-byte bin key; a naive range join is a
    BroadcastNestedLoopJoin.

    Column names must not collide across the two inputs (project first).
    """
    if "__bin" in set(intervals.columns) | set(points.columns):
        raise ValueError(
            "input column __bin collides with interval_bin_join's "
            "working column; rename it"
        )
    w_us = int(bin_width_s) * 1_000_000
    binned_i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(CAST({start_col} AS TIMESTAMP)) div {w_us}"),
                F.expr(f"unix_micros(CAST({end_col} AS TIMESTAMP)) div {w_us}"),
            )
        ),
    )
    binned_p = points.withColumn(
        "__bin", F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div {w_us}")
    )
    return (
        binned_i.join(binned_p, "__bin")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bin")
    )


def latest_snapshot(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    delete_predicate: "Column | None" = None,
) -> DataFrame:
    """CDC latest-row-wins compaction: one row per key — the row with the
    lexicographically greatest ``order_cols`` — with rows whose final
    state matches ``delete_predicate`` (tombstones) dropped AFTER the
    latest-wins pick (a delete only holds if nothing newer supersedes it).

    Spelled as ``max_by(struct(all columns), struct(order_cols))`` — a
    plain aggregate with map-side partial combine, so a hot key holds ONE
    row of state per task.  The ``row_number() = 1`` spelling buffers and
    sorts whole partitions; at 10^12 rows that is the difference between
    a combine and a spill.
    """
    keys = list(key_cols)
    ordk = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in changelog.columns])
    latest = (
        changelog.groupBy(*keys)
        .agg(F.max_by(payload, ordk).alias("__row"))
        .select("__row.*")
    )
    if delete_predicate is not None:
        latest = latest.where(~delete_predicate)
    return latest


def time_range_window(
    key_cols: Sequence[str], ts_col: str, preceding_s: int
) -> Window:
    """A per-key RANGE frame covering ``[ts - preceding_s, ts]``
    (both ends inclusive) ordered by microsecond epoch — the Spark twin
    of SQL ``RANGE BETWEEN INTERVAL n PRECEDING AND CURRENT ROW``."""
    return (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy(epoch_us(ts_col))
        .rangeBetween(-int(preceding_s) * 1_000_000, 0)
    )


def scd2_build(
    changelog: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: every change
    row becomes a version with ``[valid_from, valid_to)`` validity and an
    ``is_current`` flag (the warehouse twin of ``latest_snapshot`` — keep
    ALL versions instead of the last; reference analog: the validation
    DSL checks static snapshots, SURVEY.md §2.5 extends to temporal).

    ``valid_to`` is the NEXT version's ``valid_from`` (``lead`` over the
    key), NULL (open) for the current version.  ONE shuffle on the key +
    a per-key sort — the same exchange a downstream as-of join on the
    dimension would need anyway, so at 10^12 rows the build is one pass
    and the sort never crosses keys (no global ordering).  Ties in
    ``ts_col`` are broken by the remaining ``order_cols`` so the version
    chain is deterministic under at-least-once change capture.
    """
    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        changelog.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn(
            "version", F.row_number().over(w).cast("int")
        )
    )
