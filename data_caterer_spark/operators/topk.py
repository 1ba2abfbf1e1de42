"""Per-group top-k with a salted two-phase scale path.

§2.6 (sorts/limits) extension: the GLOBAL top-k is already optimal in
Spark (orderBy+limit -> TakeOrderedAndProject, operators/similarity.py),
but per-GROUP top-k has no such physical operator — the standard
``row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`` spelling
sends EVERY row of a group to ONE reducer and sorts it there.  At 10^12
rows a hot group is a straggler; the sort carries the corpus to keep
~groups×k rows.

``grouped_topk`` runs the salted two-phase instead (the same skew
discipline as ``salted_conversation_stats``, operators/windows.py):

1. phase 1 partitions by ``(group, salt)`` — a hot group spreads over
   ``salt_buckets`` reducers — and keeps each subgroup's local top-k.
   Any row of the true top-k is necessarily in its own salt bucket's
   top-k, so the prune is EXACT, not approximate.
2. phase 2 re-ranks the surviving ``<= salt_buckets × k`` rows per group
   exactly.  That final shuffle carries ~groups×salt×k rows — nothing
   like the corpus.

Determinism: the ordering always appends ``tiebreak_cols``; the salt is
a hash of the tiebreaks (content-derived, cluster-size invariant), so
results are byte-stable across partitionings and oracles can mirror the
final ORDER BY directly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    tiebreak_cols: Sequence[str],
    descending: bool = True,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` (then ``tiebreak_cols``
    ascending, which also make the result deterministic), via the exact
    salted two-phase prune (see module docstring).  ``salt_buckets=1``
    degenerates to the plain single-window spelling."""
    groups = list(group_cols)
    ties = list(tiebreak_cols)
    if not ties:
        raise ValueError("tiebreak_cols required for a deterministic top-k")
    clash = {rank_col, "__salt", "__r1"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with grouped_topk's "
            "working columns; rename them or pass a different rank_col"
        )
    direction = (
        [F.col(order_col).desc()] if descending else [F.col(order_col).asc()]
    ) + [F.col(c).asc() for c in ties]

    pruned = df
    if salt_buckets > 1:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in ties]), F.lit(salt_buckets)
        )
        w1 = Window.partitionBy(*groups, "__salt").orderBy(*direction)
        pruned = (
            df.withColumn("__salt", salt)
            .withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k)
            .drop("__salt", "__r1")
        )

    w2 = Window.partitionBy(*groups).orderBy(*direction)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w2))
        .where(F.col(rank_col) <= k)
    )
