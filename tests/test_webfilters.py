"""Gopher and C4 rule banks: planted edge-case semantics + plan shape
(single scan, no exchange) + Spark-vs-DuckDB parity on crafted rows the
synthetic corpus can't exercise (bullets, ellipses, braces, lorem ipsum,
multi-line pages)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_caterer_spark.functions import webfilters as WF
from data_caterer_spark.queries import ORACLES

GOOD = (
    "the quick brown fox jumps over that lazy dog and it continues to "
    "run with great speed across the wide field of green grass while "
    "every other animal watches in quiet wonder at the sight before "
    "them because nothing have ever moved quite so fast in this place "
    "and be sure that nobody forgets it soon either way my friend."
)

DOCS = [
    (1, GOOD),  # passes every Gopher rule (>=50 words, stopwords, alpha)
    (2, "- item one\n- item two\n- item three"),  # bullet lines > 90%
    (3, "trailing thought...\nanother trailing thought..."),  # ellipsis ends
    (4, "### markdown " + "#" * 40 + " heading only few words"),  # symbol ratio
    (5, "12345 67890 11111 22222 33333"),  # no alphabetic words
    (6, None),
    (7, ""),
    (8, "short text only"),  # under min words
]

C4_DOCS = [
    (1, "This line has five good words.\nshort line\n"
        "Another line with enough words here!\nNo terminal punctuation line"),
    (2, "function() { return 1; }"),  # brace drop
    (3, "Lorem Ipsum dolor sit amet. It is fine. Really fine."),  # lorem drop
    (4, "Enable JavaScript to view this page. Please do. Thanks a lot."),
    (5, "One sentence only here."),  # < 3 sentences
    (6, None),
    (7, ""),
]


def test_gopher_flags_semantics(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in WF.gopher_flags(df).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["bullet_lines_ok"] is False
    assert rows[3]["ellipsis_lines_ok"] is False
    assert rows[4]["symbol_ratio_ok"] is False
    assert rows[5]["alpha_words_ok"] is False
    assert rows[6]["keep"] is False and rows[6]["n_words"] is None
    assert rows[7]["keep"] is False and rows[7]["n_words"] == 0
    assert rows[8]["words_in_range"] is False
    # flags are non-null booleans everywhere (driver hashability)
    for r in rows.values():
        for f in ("words_in_range", "mean_word_len_ok", "symbol_ratio_ok",
                  "bullet_lines_ok", "ellipsis_lines_ok", "alpha_words_ok",
                  "stopwords_ok", "keep"):
            assert isinstance(r[f], bool)


def test_c4_decisions_semantics(spark):
    df = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in WF.c4_decisions(df).collect()}
    r1 = rows[1]
    assert r1["n_lines"] == 4 and r1["kept_lines"] == 2
    assert r1["clean_text"] == (
        "This line has five good words.\nAnother line with enough words here!"
    )
    assert r1["keep"] is True and r1["n_sentences"] == 3
    assert rows[2]["has_brace"] is True and rows[2]["keep"] is False
    assert rows[3]["has_lorem_ipsum"] is True and rows[3]["keep"] is False
    assert rows[4]["has_javascript"] is True and rows[4]["keep"] is False
    assert rows[5]["keep"] is False  # < 3 sentences
    assert rows[6]["keep"] is False and rows[6]["n_lines"] is None
    assert rows[7]["keep"] is False and rows[7]["kept_lines"] == 0


@pytest.mark.parametrize("name", ["gopher_rule_decisions", "c4_filter_decisions"])
def test_crafted_rows_match_duckdb(spark, name):
    """The oracle must agree with the Spark bank on rows that exercise
    every rule edge — the synthetic documents table never trips the
    bullet/ellipsis/brace/lorem rules, so the sf-level driver check alone
    would leave those paths oracle-unverified."""
    data = DOCS if name == "gopher_rule_decisions" else C4_DOCS
    df = spark.createDataFrame(data, "doc_id long, text string")
    from data_caterer_spark.functions.webfilters import (
        c4_decisions,
        gopher_flags,
    )

    if name == "gopher_rule_decisions":
        out = gopher_flags(df).select(
            "doc_id", "n_words", "words_in_range", "mean_word_len_ok",
            "symbol_ratio_ok", "bullet_lines_ok", "ellipsis_lines_ok",
            "alpha_words_ok", "stopwords_ok", "keep")
    else:
        out = c4_decisions(df).select(
            "doc_id", "n_lines", "kept_lines", "n_sentences", "has_brace",
            "has_lorem_ipsum", "has_javascript", "keep",
            F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"))

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    cur = con.execute(ORACLES[name])
    cols = [d[0] for d in cur.description]
    duck = sorted((tuple(r[cols.index(c)] for c in sorted(cols))
                   for r in cur.fetchall()), key=repr)
    spark_rows = sorted((tuple(r[c] for c in sorted(out.columns))
                         for r in out.collect()), key=repr)
    assert sorted(cols) == sorted(out.columns)
    assert duck == spark_rows


def test_single_scan_no_exchange(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for out in (WF.gopher_flags(df), WF.c4_decisions(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_gopher_symbol_ratios_tested_separately(spark):
    """Rae et al. A1.1: hash and ellipsis ratios each vs 0.1 — a doc
    with both ratios at 0.06 (sum 0.12) passes the published rule."""
    import pyspark.sql.functions as F

    from data_caterer_spark.functions.webfilters import gopher_flags

    words = " ".join(["alpha"] * 100)
    text = words + " " + "#" * 6 + " " + "..." * 2
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = gopher_flags(df.select("doc_id", F.col("text")),
                       min_words=10, max_words=100000)
    r = out.collect()[0]
    assert r.symbol_ratio_ok  # 0.06 and 0.06, both under 0.1
    # but 11 hashes alone (> 0.1) still fails
    text2 = words + " " + "#" * 11
    df2 = spark.createDataFrame([(1, text2)], "doc_id long, text string")
    r2 = gopher_flags(df2, min_words=10, max_words=100000).collect()[0]
    assert not r2.symbol_ratio_ok


def test_robots_meta_directives(spark):
    from data_caterer_spark.functions.webfilters import (
        robots_meta_directives,
    )

    pages = [
        (1, '<html><head><meta name="robots" content="noindex, nofollow">'
            "</head><body>x</body></html>"),
        (2, '<html><head><meta name="ROBOTS" content="NONE"></head>'
            "<body>x</body></html>"),
        (3, '<html><head><meta name="robots" content="noarchive"></head>'
            "<body>x</body></html>"),
        (4, "<html><head></head><body>"
            '<meta name="robots" content="noindex"> quoted in body'
            "</body></html>"),
        (5, '<html><head><meta name="robots" content="noindexing-tips">'
            "</head><body>x</body></html>"),  # token, not substring
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    out = {r.doc_id: r for r in robots_meta_directives(df).collect()}
    assert not out[1].indexable and not out[1].followable
    assert out[1].archivable
    # none == noindex + nofollow (+ noarchive), case-insensitive
    assert not out[2].indexable and not out[2].followable
    assert not out[2].archivable
    assert out[3].indexable and out[3].followable and not out[3].archivable
    # body-quoted directive is content, not policy
    assert out[4].indexable and out[4].followable
    # directive matching is token-wise, not substring
    assert out[5].indexable
