"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`data_caterer_spark.queries` — the catalog of every
implemented operator family from SURVEY.md §2 plus the training-data ops
(dedup / similarity / text analysis / multimodal / quality filter), each
paired with a DuckDB oracle where ANSI SQL can express it.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_caterer_spark.queries import QUERIES, resolve_oracles  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the keep/drop-and-scrub quality filter (rule bank +
    sequential PII/toxicity scrub, single Catalyst plan) over the sf0.001
    documents table."""
    return QUERIES["doc_quality_filter"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return resolve_oracles()
