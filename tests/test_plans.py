"""Physical-plan shape assertions — the scale-design contract.

Correct results can still ship a catastrophic plan at 100 TB; these tests
pin the plan properties the engine is designed around:

* filters reach the parquet scan (PushedFilters) and columns are pruned;
* small dimension joins broadcast (no shuffle of the fact side);
* the flagship filter is shuffle-free (pure projection);
* the full pipeline has exactly ONE exchange (the conv_id window sort)
  and exactly TWO Arrow (pandas-UDF) stages (langid, perplexity).
"""

from __future__ import annotations

import re

import pytest

from data_caterer_spark.queries import QUERIES


@pytest.fixture(autouse=True)
def _fresh_cache(spark):
    # other modules cache test tables; a cached relation becomes
    # InMemoryTableScan and hides the FileScan details asserted here
    spark.catalog.clearCache()
    yield


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _scan_cols(plan: str) -> set[str]:
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    return {c.split("#")[0] for c in m.group(1).split(",") if c}


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l" in plan
    # column pruning: FileScan's output attribute list (ReadSchema is
    # truncated at spark.sql.maxMetadataStringLength in toString output)
    assert _scan_cols(plan) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag",
        "l_linestatus", "l_shipdate",
    }


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(QUERIES["q3_top_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # top-k must not be a global sort
    assert "TakeOrderedAndProject" in plan


def test_flagship_filter_is_shuffle_free(spark, sf_dir):
    plan = _plan(QUERIES["doc_quality_filter"](spark, sf_dir))
    assert "Exchange" not in plan, "flagship keep/drop+scrub must be a pure projection"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "flagship path is JVM-only"
    )


def test_pipeline_exchange_and_arrow_budget(spark):
    from data_caterer_spark.fixtures import generate_transcripts_df
    from data_caterer_spark.plans.pipeline import QualityFilterPipeline

    df = generate_transcripts_df(spark, n_convs=5)
    out = QualityFilterPipeline().run(df)
    plan = _plan(out)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"pipeline must shuffle exactly once (conv_id window), got {n_exchanges}\n{plan}"
    n_arrow = plan.count("ArrowEvalPython")
    assert n_arrow == 2, f"exactly two Arrow stages (langid, ppl), got {n_arrow}"
    # no row-at-a-time Python anywhere
    assert "BatchEvalPython" not in plan


def test_upstream_join_broadcasts(spark, sf_dir):
    plan = _plan(QUERIES["upstream_join_validation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_exact_dedup_partial_aggregation(spark, sf_dir):
    # map-side combine before the shuffle: two HashAggregates around one
    # exchange, and the shuffle carries the hash, not the text
    plan = _plan(QUERIES["exact_dup_groups"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert _scan_cols(plan) == {"doc_id", "text"}


def test_topk_no_global_sort(spark, sf_dir):
    plan = _plan(QUERIES["embedding_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
