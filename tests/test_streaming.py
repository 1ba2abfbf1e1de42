"""Structured-Streaming quality-filter tests.

Strategy: write the deterministic transcript fixture to parquet, stream it
back with a file source + ``availableNow`` trigger into a memory sink, and
compare against the batch pipeline on the same rows — stream/batch parity
for the stateless stages, plus watermark windowing and per-conversation
state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.fixtures import generate_transcripts_df
from data_caterer_spark.plans.pipeline import QualityFilterPipeline
from data_caterer_spark.streaming.quality_stream import (
    _stateless_rules,
    stateful_turn_order,
    streaming_quality_filter,
    windowed_conversation_metrics,
)


@pytest.fixture(scope="module")
def fixture_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in") / "transcripts")
    generate_transcripts_df(spark, n_convs=60).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, df, name, checkpoint_dir):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_matches_batch_stateless(spark, fixture_path, tmp_path):
    schema = spark.read.parquet(fixture_path).schema
    stream = spark.readStream.schema(schema).parquet(fixture_path)
    out = streaming_quality_filter(stream).select(
        "conv_id", "turn_idx", "keep", "rule_hits", "scrubbed_text"
    )
    got = _run_stream(spark, out, "qf_stream", str(tmp_path / "cp1"))

    batch_df = spark.read.parquet(fixture_path)
    pipe = QualityFilterPipeline()
    rules = _stateless_rules(pipe)
    batch = pipe.run(batch_df)
    # recompute keep/hits with the stateless bank for a fair comparison
    from data_caterer_spark.functions import text as T
    from data_caterer_spark.functions.langid import with_language
    from data_caterer_spark.functions.perplexity import with_perplexity
    from data_caterer_spark.functions.scrub import scrub_columns

    ref = T.with_text_features(batch_df)
    ref = with_language(ref)
    ref = with_perplexity(ref)
    ref = ref.withColumn("heur_hits", rules.hits_column())
    ref = scrub_columns(ref)
    ref = ref.withColumn("rule_hits", F.concat("heur_hits", "scrub_hits"))
    keep = rules.keep_column(F.col("heur_hits")) & ~F.array_contains(
        "scrub_hits", "toxicity"
    )
    ref = ref.withColumn("keep", keep)

    got_map = {
        (r["conv_id"], r["turn_idx"]): (r["keep"], list(r["rule_hits"]), r["scrubbed_text"])
        for r in got.collect()
    }
    ref_rows = ref.select("conv_id", "turn_idx", "keep", "rule_hits", "scrubbed_text").collect()
    assert len(got_map) == len(ref_rows)
    for r in ref_rows:
        assert got_map[(r["conv_id"], r["turn_idx"])] == (
            r["keep"], list(r["rule_hits"]), r["scrubbed_text"]
        )


def test_windowed_metrics_with_watermark(spark, fixture_path, tmp_path):
    schema = spark.read.parquet(fixture_path).schema
    stream = spark.readStream.schema(schema).parquet(fixture_path)
    win = windowed_conversation_metrics(stream, window="1 hour", watermark="2 hours")
    # append-mode windowed aggregation emits only closed windows; with
    # availableNow the final watermark closes all but the last — use
    # complete-less check via the query plan + a run that must not error
    q = (
        win.writeStream.format("memory")
        .queryName("qf_windows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("qf_windows").collect()
    total_turns = sum(r["turns"] for r in rows)
    # every emitted window is consistent
    for r in rows:
        assert 0 <= r["kept"] <= r["turns"]
        assert r["window_start"] < r["window_end"]
    assert total_turns > 0


def test_stateful_turn_order(spark, fixture_path, tmp_path):
    schema = spark.read.parquet(fixture_path).schema
    stream = spark.readStream.schema(schema).parquet(fixture_path)
    out = stateful_turn_order(stream)
    got = _run_stream(spark, out, "qf_order", str(tmp_path / "cp3"))
    rows = got.collect()
    batch = spark.read.parquet(fixture_path)
    assert len(rows) == batch.count()
    # single microbatch + sorted replay == batch window semantics: compare
    # against the batch lag features, applying the rules in Python so the
    # NULL-lag edge cases (first turn, null ts) match the explicit state
    # replay (three-valued SQL would yield NULL where the state gives a
    # definite boolean)
    from data_caterer_spark.operators.windows import with_turn_order_features

    ref_map = {}
    for r in with_turn_order_features(batch).collect():
        alternation_ok = not (
            r["prev_role"] is not None
            and r["role"] == r["prev_role"]
            and r["role"] in ("user", "assistant")
        )
        contiguous = (r["prev_turn_idx"] is None and r["turn_idx"] == 0) or (
            r["prev_turn_idx"] is not None
            and r["turn_idx"] == r["prev_turn_idx"] + 1
        )
        monotone = (
            r["prev_ts"] is None or r["ts"] is None or r["ts"] >= r["prev_ts"]
        )
        ref_map[(r["conv_id"], r["turn_idx"])] = (
            alternation_ok, contiguous, monotone
        )
    mismatches = [
        (r["conv_id"], r["turn_idx"])
        for r in rows
        if ref_map[(r["conv_id"], r["turn_idx"])]
        != (r["role_alternation_ok"], r["turn_contiguous"], r["ts_monotone"])
    ]
    assert not mismatches, mismatches[:5]


def test_streaming_exact_dedup_matches_batch_distinct(spark, fixture_path, tmp_path):
    """The streaming dedup's surviving fingerprint set equals the batch
    DISTINCT over the same input, and the plan carries dedup state with
    a watermark (bounded, not stream-lifetime)."""
    from data_caterer_spark.streaming.quality_stream import streaming_exact_dedup

    schema = spark.read.parquet(fixture_path).schema
    stream = spark.readStream.schema(schema).parquet(fixture_path)
    out = streaming_exact_dedup(stream)
    assert out.isStreaming
    got = {
        r["fp"]
        for r in _run_stream(
            spark, out, "dedup_stream", str(tmp_path / "cp")
        ).collect()
    }
    batch = spark.read.parquet(fixture_path)
    expect = {
        r["fp"]
        for r in batch.where(F.col("text").isNotNull())
        .select(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        .distinct()
        .collect()
    }
    assert got == expect and len(got) > 0
