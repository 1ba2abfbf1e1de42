"""Privacy-risk validation: k-anonymity and l-diversity over
quasi-identifier combinations.

The graft's scrub pass removes DIRECT identifiers (emails, phones, card
numbers — ``functions/scrub.py``); re-identification risk then lives in
the quasi-identifiers: a (nation, segment, birth-year)-style combination
shared by too FEW rows singles those rows out.  Sweeney's k-anonymity
(a table is k-anonymous if every quasi-identifier combination covers >=
k rows) and Machanavajjhala's l-diversity (each combination must also
span >= l distinct sensitive values) are the standard release gates, and
they slot naturally beside the reference's groupBy validation rules
(``GroupByValidation``, api ValidationConfiguration.scala) — the same
single-pass aggregate kernel, a different predicate.

Distributed shape: ONE combinable groupBy over the quasi columns;
l-diversity pre-dedups (quasi, sensitive) before counting so the shuffle
never runs a two-phase count-distinct.  Both return the VIOLATING
combinations (bounded by the group count, not the row count) — at
10^12 rows the result is the small side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Quasi-identifier combinations covering FEWER than ``k`` rows
    (the re-identifiable groups), with their sizes.  Deterministic
    order-ready: callers sort by (group_size, *quasi_cols)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_threshold: int,
) -> DataFrame:
    """Quasi-identifier combinations whose rows span FEWER than
    ``l_threshold`` distinct sensitive values (attribute-disclosure
    groups: everyone in the group shares the sensitive attribute).

    ``dropDuplicates`` on (quasi, sensitive) first — the follow-up
    count is then a plain combinable aggregate (both stages hash on the
    same leading keys), not a count-distinct expansion."""
    return (
        df.select(*quasi_cols, sensitive_col)
        .dropDuplicates([*quasi_cols, sensitive_col])
        .groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("distinct_sensitive"))
        .where(F.col("distinct_sensitive") < l_threshold)
    )


def anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
) -> DataFrame:
    """One row: the table's actual k (min group size) and l (min
    distinct sensitive values per group) — the release-gate headline
    numbers.  Two aggregates over one shuffled grouping."""
    per_group = (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.count_distinct(F.col(sensitive_col)).alias("__l"),
        )
    )
    return per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("__n").alias("k_anonymity"),
        F.min("__l").alias("l_diversity"),
    )
