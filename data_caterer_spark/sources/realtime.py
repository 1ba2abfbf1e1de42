"""Real-time sink payload construction — Kafka / HTTP column conventions.

The reference's real-time connectors (Kafka/HTTP/JMS) are connection-managed
processors (``sink/SinkProcessor.scala`` trait; implementations are not in
the open core), but the COLUMN CONVENTIONS they consume are public
(``app model/Constants.scala:19-28``): a Kafka step emits ``value`` (the
message body), optional ``partition`` and ``headers`` — headers typed as
``array<struct<key:string,value:binary>>`` (``api model/Constants.scala:
223-224``, ``DataType.scala:130-132``) — and an HTTP step emits ``url`` /
``method`` / ``content_type`` / body plus ``pathParam<name>`` /
``queryParam<name>`` / ``header<name>`` prefixed columns
(``HTTP_PATH_PARAM_COL_PREFIX`` etc.).

This module builds those frames Spark-first as pure Catalyst projections:

* :func:`to_kafka_frame` — the exact shape Spark's kafka sink expects
  (``key``/``value``/``topic``/``partition``/``headers``), so the write is
  just ``df.write.format("kafka")`` once the jar is present (gated in
  ``io.py``);
* :func:`to_http_frame` — one row per request: url with path params
  substituted and query params appended, method, content type, JSON body,
  headers map.

The payload construction is the testable half — it runs and verifies
without any broker/server; only the final connection-managed write needs
the jar/endpoint.  At 100 TB the frame build is a narrow projection
(whole-stage codegen, no shuffle), and the sink parallelism is bounded the
same way as JDBC (one producer/connection per partition).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: reference constants (app model/Constants.scala:19-28)
REAL_TIME_BODY_COL = "value"
REAL_TIME_PARTITION_COL = "partition"
REAL_TIME_HEADERS_COL = "headers"
REAL_TIME_METHOD_COL = "method"
REAL_TIME_CONTENT_TYPE_COL = "content_type"
REAL_TIME_URL_COL = "url"
HTTP_PATH_PARAM_COL_PREFIX = "pathParam"
HTTP_QUERY_PARAM_COL_PREFIX = "queryParam"
HTTP_HEADER_COL_PREFIX = "header"

#: Kafka header DDL (api model/Constants.scala:223-224)
KAFKA_HEADER_DDL = "array<struct<key:string,value:binary>>"


def _headers_array(header_cols: Sequence[str]) -> Column:
    """``array<struct<key:string,value:binary>>`` from named columns —
    the Kafka header type the reference declares."""
    return F.array(
        *[
            F.struct(
                F.lit(c).alias("key"),
                F.col(c).cast("string").cast("binary").alias("value"),
            )
            for c in header_cols
        ]
    ).cast(KAFKA_HEADER_DDL)


def to_kafka_frame(
    df: DataFrame,
    topic: str,
    key_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    header_cols: Sequence[str] | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Project ``df`` into the kafka-sink frame: ``value`` = JSON of the
    selected payload columns, plus key/topic/partition/headers.

    The output is exactly what ``df.write.format("kafka")`` consumes, so
    production usage is ``write_sink(to_kafka_frame(...), "kafka",
    options={"kafka.bootstrap.servers": ...})`` (jar-gated)."""
    payload = list(value_cols) if value_cols is not None else [
        c for c in df.columns
        if c not in {key_col, partition_col} | set(header_cols or ())
    ]
    if not payload:
        raise ValueError("to_kafka_frame: no payload columns")
    out = [
        F.to_json(F.struct(*payload)).alias(REAL_TIME_BODY_COL),
        F.lit(topic).alias("topic"),
    ]
    if key_col is not None:
        out.insert(0, F.col(key_col).cast("string").alias("key"))
    if partition_col is not None:
        out.append(
            F.col(partition_col).cast("int").alias(REAL_TIME_PARTITION_COL)
        )
    if header_cols:
        out.append(_headers_array(header_cols).alias(REAL_TIME_HEADERS_COL))
    return df.select(*out)


def to_http_frame(
    df: DataFrame,
    url_template: str,
    method: str = "POST",
    content_type: str = "application/json",
    body_cols: Sequence[str] | None = None,
    static_headers: Mapping[str, str] | None = None,
) -> DataFrame:
    """One HTTP request per row from the reference's prefixed-column
    conventions:

    * ``pathParam<name>`` columns substitute ``{name}`` in the template;
    * ``queryParam<name>`` columns append ``?name=value&...`` (column
      order, URL-unescaped values are the caller's concern — generated
      ids/enums in practice);
    * ``header<name>`` columns plus ``static_headers`` become a
      ``map<string,string>``;
    * ``body_cols`` (default: every non-convention column) serialize as
      the JSON body.
    """
    path_params = {
        c[len(HTTP_PATH_PARAM_COL_PREFIX):]: c
        for c in df.columns
        if c.startswith(HTTP_PATH_PARAM_COL_PREFIX)
    }
    query_params = [
        (c[len(HTTP_QUERY_PARAM_COL_PREFIX):], c)
        for c in df.columns
        if c.startswith(HTTP_QUERY_PARAM_COL_PREFIX)
    ]
    header_cols = [
        (c[len(HTTP_HEADER_COL_PREFIX):], c)
        for c in df.columns
        if c.startswith(HTTP_HEADER_COL_PREFIX)
        and not c.startswith(HTTP_HEADER_COL_PREFIX + "_")
    ]
    convention = (
        set(path_params.values())
        | {c for _n, c in query_params}
        | {c for _n, c in header_cols}
    )
    payload = list(body_cols) if body_cols is not None else [
        c for c in df.columns if c not in convention
    ]

    url: Column = F.lit("")
    rest = url_template
    while "{" in rest:
        pre, _, tail = rest.partition("{")
        name, closed, rest = tail.partition("}")
        if not closed:
            raise ValueError(f"unclosed {{ in url template {url_template!r}")
        if name not in path_params:
            raise ValueError(
                f"url template needs path param {name!r} but no "
                f"{HTTP_PATH_PARAM_COL_PREFIX}{name} column exists"
            )
        url = F.concat(
            url, F.lit(pre), F.col(path_params[name]).cast("string")
        )
    url = F.concat(url, F.lit(rest))
    if query_params:
        parts = []
        for i, (name, c) in enumerate(query_params):
            sep = "?" if i == 0 else "&"
            parts.append(
                F.concat(
                    F.lit(f"{sep}{name}="), F.col(c).cast("string")
                )
            )
        url = F.concat(url, *parts)

    header_entries: list[Column] = []
    for k, v in (static_headers or {}).items():
        header_entries += [F.lit(k), F.lit(v)]
    for name, c in header_cols:
        header_entries += [F.lit(name), F.col(c).cast("string")]
    out = [
        url.alias(REAL_TIME_URL_COL),
        F.lit(method.upper()).alias(REAL_TIME_METHOD_COL),
        F.lit(content_type).alias(REAL_TIME_CONTENT_TYPE_COL),
        (
            F.to_json(F.struct(*payload))
            if payload
            else F.lit(None).cast("string")
        ).alias(REAL_TIME_BODY_COL),
    ]
    if header_entries:
        out.append(
            F.create_map(*header_entries).alias(REAL_TIME_HEADERS_COL)
        )
    return df.select(*out)
