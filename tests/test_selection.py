"""DSIR importance-resampling tests: planted-target semantics, exact
fixed-point parity with the sequential kernel, partitioning invariance,
and the broadcast-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_caterer_spark.operators import selection as S

TARGET_ROWS = [
    (1, "spark pipelines shuffle data across executors"),
    (2, "spark executors run pipelines over partitioned data"),
    (3, "shuffle partitions move data between spark executors"),
    (4, "spark data pipelines repartition shuffle output across executors"),
]
RAW_ROWS = TARGET_ROWS + [
    (10, "spark pipelines shuffle data between executors nightly"),  # target-like
    (11, "the cat sat on the mat watching birds outside"),
    (12, "recipe for sourdough bread with rye flour and honey"),
    (13, None),
    (14, ""),
    (20, "gardening tips for roses tulips and seasonal bulbs"),
    (21, "match report the home team scored twice before halftime"),
    (22, "stock markets closed higher after the earnings reports"),
    (23, "travel guide to coastal villages and mountain trails"),
    (24, "movie review a slow first act but a strong finish"),
]

N_BUCKETS = 256


def _dfs(spark):
    raw = spark.createDataFrame(RAW_ROWS, "doc_id long, text string")
    target = spark.createDataFrame(TARGET_ROWS, "doc_id long, text string")
    return raw, target


def test_target_like_docs_outrank_off_target(spark):
    raw, target = _dfs(spark)
    rows = S.dsir_select(raw, target, k=7, n_buckets=N_BUCKETS).collect()
    picked = [r["doc_id"] for r in rows]
    # the unseen target-like doc is selected; every off-target doc is not
    # (empty/null docs score a neutral 0 — above off-target, below target)
    assert 10 in picked, picked
    assert not {11, 12, 20, 21, 22, 23, 24} & set(picked), picked
    w = {r["doc_id"]: r["log_weight_fixed"] for r in rows}
    assert all(w[t] > w[10] for t in (1, 2, 3, 4))  # in-target docs rank top


def test_weights_match_sequential_kernel_exactly(spark):
    """The distributed int64 sum must equal the pure-Python replay
    bit-for-bit (fixed-point arithmetic is order-independent)."""
    raw, target = _dfs(spark)
    t = S.bucket_counts(target, n_buckets=N_BUCKETS)
    r = S.bucket_counts(raw, n_buckets=N_BUCKETS)
    ratios = S.fixed_log_ratios(t, r, N_BUCKETS)
    got = {
        row["doc_id"]: row["log_weight_fixed"]
        for row in S.dsir_log_weights(raw, ratios, n_buckets=N_BUCKETS).collect()
    }
    want = S.score_rows_python(RAW_ROWS, ratios, N_BUCKETS)
    assert got == want
    # and the model fit itself matches the sequential count
    seq: dict[int, int] = {}
    for _i, text in RAW_ROWS:
        for g in S.ngram_strings(text):
            b = S.bucket_of(g, N_BUCKETS)
            seq[b] = seq.get(b, 0) + 1
    assert r == seq


def test_weights_invariant_under_partitioning(spark):
    raw, target = _dfs(spark)
    t = S.bucket_counts(target, n_buckets=N_BUCKETS)
    r = S.bucket_counts(raw, n_buckets=N_BUCKETS)
    ratios = S.fixed_log_ratios(t, r, N_BUCKETS)
    a = {
        row["doc_id"]: row["log_weight_fixed"]
        for row in S.dsir_log_weights(raw, ratios, n_buckets=N_BUCKETS).collect()
    }
    b = {
        row["doc_id"]: row["log_weight_fixed"]
        for row in S.dsir_log_weights(
            raw.repartition(7), ratios, n_buckets=N_BUCKETS
        ).collect()
    }
    assert a == b


def test_gumbel_variant_is_seeded_and_deterministic(spark):
    raw, target = _dfs(spark)
    pick = lambda seed: [  # noqa: E731
        r["doc_id"]
        for r in S.dsir_select(raw, target, k=3, n_buckets=N_BUCKETS, seed=seed).collect()
    ]
    assert pick(7) == pick(7)  # same seed -> same draw
    assert pick(7) == [
        r["doc_id"]
        for r in S.dsir_select(
            raw.repartition(5), target, k=3, n_buckets=N_BUCKETS, seed=7
        ).collect()
    ]  # cluster-layout invariant


def test_plan_broadcasts_ratio_table_no_cross_join(spark):
    raw, target = _dfs(spark)
    t = S.bucket_counts(target, n_buckets=N_BUCKETS)
    r = S.bucket_counts(raw, n_buckets=N_BUCKETS)
    ratios = S.fixed_log_ratios(t, r, N_BUCKETS)
    plan = (
        S.dsir_log_weights(raw, ratios, n_buckets=N_BUCKETS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_empty_and_null_text_score_zero(spark):
    raw, target = _dfs(spark)
    t = S.bucket_counts(target, n_buckets=N_BUCKETS)
    r = S.bucket_counts(raw, n_buckets=N_BUCKETS)
    ratios = S.fixed_log_ratios(t, r, N_BUCKETS)
    w = {
        row["doc_id"]: row["log_weight_fixed"]
        for row in S.dsir_log_weights(raw, ratios, n_buckets=N_BUCKETS).collect()
    }
    assert w[13] == 0 and w[14] == 0  # null/empty text: weight 0, row kept
    assert len(w) == len(RAW_ROWS)


def test_one_scan_pair_fit_matches_two_scans(spark):
    """bucket_counts_with_target (one flagged scan) must emit counts
    identical to two separate bucket_counts fits, and dsir_select via
    target_filter must select the same documents."""
    raw, _target = _dfs(spark)
    # target = the ids <= 4 slice of RAW (a predicate over the raw corpus)
    pred = F.col("doc_id") <= 4
    t1 = S.bucket_counts(raw.where(pred), n_buckets=N_BUCKETS)
    r1 = S.bucket_counts(raw, n_buckets=N_BUCKETS)
    t2, r2 = S.bucket_counts_with_target(raw, pred, n_buckets=N_BUCKETS)
    assert t1 == t2
    assert r1 == r2
    sel_two = [
        r["doc_id"]
        for r in S.dsir_select(
            raw, raw.where(pred), k=5, n_buckets=N_BUCKETS
        ).collect()
    ]
    sel_one = [
        r["doc_id"]
        for r in S.dsir_select(
            raw, None, k=5, n_buckets=N_BUCKETS, target_filter=pred
        ).collect()
    ]
    assert sel_two == sel_one


def test_diversity_cluster_sample_bounds_and_coverage(spark):
    import numpy as np
    from data_caterer_spark.operators.selection import (
        diversity_cluster_sample,
    )

    # 3 well-separated blobs of 40 rows each -> derived n_lists = 2..4;
    # every cluster must surface, each contributing <= per_cluster rows
    rng = np.random.RandomState(7)
    rows = []
    for b, center in enumerate([0.0, 10.0, -10.0]):
        for i in range(40):
            vec = (center + 0.01 * rng.randn(8)).tolist()
            rows.append((b * 1000 + i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = diversity_cluster_sample(
        df, per_cluster=2, rows_per_list=40
    ).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    assert all(len(v) <= 2 for v in by_cluster.values())
    # cluster sizes reported; every input row is assigned somewhere
    assert sum(v[0]["cluster_size"] for v in by_cluster.values()) == 120
    # well-separated blobs force >= 2 clusters; distances are valid
    assert len(by_cluster) >= 2
    assert all(r["dist_sq"] >= 0.0 for r in out)


def test_diversity_cluster_sample_plan_no_window(spark):
    from data_caterer_spark.operators.selection import (
        diversity_cluster_sample,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        diversity_cluster_sample(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the per-cluster top-k is the SALTED two-phase window (bounded
    # k-rows-per-subgroup state — a degenerate one-cluster k-means can
    # no longer buffer the corpus in a collect_list); the single Arrow
    # assignment pass is materialized ONCE (localCheckpoint), so the
    # returned plan reads the slim checkpoint — no Python at all here
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "collect_list" not in plan
