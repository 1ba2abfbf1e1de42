"""Real-time sink payload conventions: Kafka frame shape (value/topic/
partition/headers with the reference's header DDL) and HTTP request
construction from prefixed columns — all testable without broker/server."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_caterer_spark.sources import realtime as RT


@pytest.fixture(scope="module")
def src(spark):
    return spark.createDataFrame(
        [(1, "A", "open", 0.5), (2, "B", "closed", 1.5)],
        "id long, flag string, status string, score double",
    )


def test_kafka_frame_shape_and_header_ddl(src):
    frame = RT.to_kafka_frame(
        src, topic="t", key_col="id", value_cols=["id", "flag"],
        header_cols=["status"], partition_col="id",
    )
    assert frame.columns == ["key", "value", "topic", "partition", "headers"]
    dt = dict(frame.dtypes)
    assert dt["key"] == "string" and dt["partition"] == "int"
    assert dt["headers"] == RT.KAFKA_HEADER_DDL.replace(":", ":")
    rows = {r["key"]: r for r in frame.collect()}
    body = json.loads(rows["1"]["value"])
    assert body == {"id": 1, "flag": "A"}
    h = rows["1"]["headers"][0]
    assert h["key"] == "status" and bytes(h["value"]) == b"open"


def test_kafka_frame_defaults_exclude_convention_cols(src):
    # no value_cols: every non-key/partition/header column is payload
    frame = RT.to_kafka_frame(src, topic="t", key_col="id", header_cols=["status"])
    body = json.loads(frame.first()["value"])
    assert set(body) == {"flag", "score"}
    with pytest.raises(ValueError, match="no payload"):
        RT.to_kafka_frame(
            src.select("id"), topic="t", key_col="id"
        )


def test_http_frame_url_substitution(spark):
    df = spark.createDataFrame(
        [(7, "x", "tok", 3)],
        "pathParamid long, queryParamq string, headerAuth string, n int",
    )
    frame = RT.to_http_frame(
        df, "https://h/api/{id}/sub", method="put",
        static_headers={"X-S": "1"},
    )
    r = frame.first()
    assert r["url"] == "https://h/api/7/sub?q=x"
    assert r["method"] == "PUT"
    assert json.loads(r["value"]) == {"n": 3}
    assert r["headers"] == {"X-S": "1", "Auth": "tok"}


def test_http_frame_template_errors(spark):
    df = spark.createDataFrame([(1,)], "pathParamid long")
    with pytest.raises(ValueError, match="unclosed"):
        RT.to_http_frame(df, "https://h/{id")
    with pytest.raises(ValueError, match="path param 'other'"):
        RT.to_http_frame(df, "https://h/{other}")


def test_http_frame_empty_body_is_null(spark):
    df = spark.createDataFrame([(5,)], "pathParamid long")
    r = RT.to_http_frame(df, "https://h/{id}", method="get").first()
    assert r["value"] is None and r["url"] == "https://h/5"


def test_kafka_frame_is_shuffle_free(src):
    plan = (
        RT.to_kafka_frame(src, "t", key_col="id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # narrow projection, codegen'd
