"""Heavy-hitter n-grams, k-anonymity/l-diversity, and URL filtering:
semantics on planted fixtures + plan-shape pins (combinable aggregates,
broadcast blocklist join, no cross joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_caterer_spark.operators import corpus as C
from data_caterer_spark.operators import privacy as P
from data_caterer_spark.operators import urlfilter as U

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "THE  Cat\tsat"),  # case/whitespace normalization
    (4, None),
    (5, ""),
]


def test_top_ngrams_counts_and_order(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = {(r["gram"], r["occurrences"]) for r in C.top_ngrams(df, k=3).collect()}
    # 'the' x4 (doc3 lowercases), 'cat' x3, then 'sat' x2 vs 'the cat' x3
    assert ("the", 4) in top and ("cat", 3) in top and ("the cat", 3) in top


def test_ngram_doc_frequency_dedups_within_doc(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        r["gram"]: r["doc_frequency"]
        for r in C.ngram_doc_frequencies(df).collect()
    }
    assert rows["the"] == 3  # docs 1,2,3 — doc 1's two 'the' count once
    assert rows["cat"] == 3
    assert rows["mat"] == 1


def test_corpus_aggregates_are_partial(spark):
    """The count shuffle must combine map-side (HashAggregate below the
    exchange), and the top-k must compile to TakeOrderedAndProject."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        C.top_ngrams(df, k=3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange")


PEOPLE = [
    # (nation, segment, balance_band) — one singleton group, one
    # homogeneous-sensitive group
    (1, "A", 10), (1, "A", 20), (1, "A", 30),
    (2, "B", 10), (2, "B", 10),
    (3, "C", 40),
]


def test_k_anonymity_and_l_diversity(spark):
    df = spark.createDataFrame(PEOPLE, "nation long, seg string, band long")
    kv = {
        (r["nation"], r["seg"]): r["group_size"]
        for r in P.k_anonymity_violations(df, ["nation", "seg"], 3).collect()
    }
    assert kv == {(2, "B"): 2, (3, "C"): 1}
    lv = {
        (r["nation"], r["seg"]): r["distinct_sensitive"]
        for r in P.l_diversity_violations(df, ["nation", "seg"], "band", 2).collect()
    }
    assert lv == {(2, "B"): 1, (3, "C"): 1}  # homogeneous groups
    s = P.anonymity_summary(df, ["nation", "seg"], "band").collect()[0]
    assert (s["n_groups"], s["k_anonymity"], s["l_diversity"]) == (3, 1, 1)


def test_l_diversity_avoids_count_distinct_expansion(spark):
    df = spark.createDataFrame(PEOPLE, "nation long, seg string, band long")
    plan = (
        P.l_diversity_violations(df, ["nation", "seg"], "band", 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "distinct" not in plan.lower() or "count(distinct" not in plan.lower()


URLS = [
    (1, "https://www.example.org/page"),
    (2, "https://93.184.216.34/index"),
    (3, "https://files.example.click/a"),
    (4, "https://example.org/photo.JPG"),
    (5, "https://example.org/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7"),
    (6, "https://example.org/best-casino-tips"),
    (7, "https://badsite.example/x"),
    (8, "https://www.badsite.example:8080/x"),  # port + www stripped
]


def test_url_filter_flags_each_rule(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    bl = spark.createDataFrame([("badsite.example",)], "domain string")
    out = {
        r["doc_id"]: (r["url_keep"], r["url_drop_reasons"])
        for r in U.filter_urls(df, domain_blocklist=bl).collect()
    }
    assert out[1] == (True, "")
    assert out[2] == (False, "ip_host")
    assert out[3] == (False, "bad_tld")
    assert out[4] == (False, "bad_extension")  # extension is case-normalized
    assert out[5] == (False, "excess_params")
    assert out[6] == (False, "blocked_word")
    assert out[7] == (False, "blocked_domain")
    assert out[8] == (False, "blocked_domain")


def test_url_blocklist_join_broadcasts(spark):
    df = spark.createDataFrame(URLS, "doc_id long, url string")
    bl = spark.createDataFrame([("badsite.example",)], "domain string")
    plan = (
        U.filter_urls(df, domain_blocklist=bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
