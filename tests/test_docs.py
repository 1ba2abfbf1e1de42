"""Document text-analysis tests: token counting, quality, language heuristic."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.functions import docs as DOC


@pytest.fixture(scope="module")
def table(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_bpe_ish_count_matches_python_re(table):
    rows = (
        table.select("doc_id", "text", DOC.bpe_ish_token_count("text").alias("n"))
        .limit(200)
        .collect()
    )
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]")
    for r in rows:
        if r["text"] is None:
            continue
        assert r["n"] == len(pat.findall(r["text"])), r["text"][:50]


def test_quality_score_bounds_and_monotonicity(spark):
    df = spark.createDataFrame(
        [
            (1, "The weather is nice and the results of the test are good "
                "because they show that the model works well in practice."),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
            (3, "#$%^&*#$%^&*#$%^&*"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", DOC.quality_score("text").alias("q")).collect()
    }
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[1] > got[2] > got[3]
    assert got[4] == 0.0 and got[5] == 0.0


def test_heuristic_language_on_planted_sentences(spark):
    # the documents table's lang column is a synthetic label uncorrelated
    # with its (English keyword-soup) text, so ground truth comes from
    # planted sentences in real languages instead
    cases = [
        ("the results are good and they show that it works", "en"),
        ("el problema es que el servidor no responde y la red es lenta", "es"),
        ("le serveur ne répond pas et je ne sais pas pourquoi", "fr"),
        ("der server ist nicht erreichbar und die daten sind weg", "de"),
        ("o problema é que o servidor não responde e a rede é lenta", "pt"),
        ("il server non risponde e non sono sicuro del perché", "it"),
        ("zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(cases, "text string, want string")
    got = df.select("want", DOC.heuristic_language("text").alias("lh")).collect()
    for r in got:
        assert r["lh"] == r["want"], (r["want"], r["lh"])


def test_heuristic_language_deterministic_on_fixture(table):
    a = [tuple(r) for r in table.select("doc_id", DOC.heuristic_language("text").alias("lh")).collect()]
    b = [tuple(r) for r in table.select("doc_id", DOC.heuristic_language("text").alias("lh")).collect()]
    assert sorted(a) == sorted(b)
    assert {l for _, l in a} <= {"de", "en", "es", "fr", "it", "pt", "und"}


def test_document_features_single_projection(table):
    out = DOC.document_features(table.limit(10))
    cols = set(out.columns)
    for c in [
        "n_chars_calc", "n_tokens_ws", "n_tokens_bpe", "rep_ratio",
        "symbol_ratio", "ascii_ratio", "lang_heur", "quality", "fingerprint",
    ]:
        assert c in cols
    # no shuffle in the plan: features are projection-only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chat_json_byte_equality_vs_python_twin(spark):
    """Spark to_json output must be BYTE-equal to the sequential Jackson
    twin (py_chat_json) — incl. \\n, \\t, quotes, and non-ASCII text."""
    from data_caterer_spark.functions.chatfmt import (
        export_chat_jsonl,
        py_chat_json,
    )

    rows = [
        ("C1", 0, "user", 'say "hi"\n\tplease — ñoño'),
        ("C1", 1, "assistant", "ok \\ done \x07bell"),
        ("C2", 0, "user", "solo"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, scrubbed_text string"
    )
    got = {
        r["conv_id"]: r["chat_json"]
        for r in export_chat_jsonl(df).collect()
    }
    by_conv = {}
    for conv, _, role, text in rows:
        by_conv.setdefault(conv, []).append((role, text))
    for conv, msgs in by_conv.items():
        assert got[conv] == py_chat_json(msgs), conv
