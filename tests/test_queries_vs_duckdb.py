"""Driver-contract conformance: every ``queries()`` entry with an oracle
must match DuckDB on row count, column names, and order-insensitive values
— the same comparison the round driver performs at sf0.01.

Runs at sf0.001 for speed (the driver re-checks at sf0.01).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from data_caterer_spark.queries import ORACLES, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and collapse representation noise past round()
        return round(v + 0.0, 9)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _row_key(t):
    # total order even with NULLs mixed into numeric columns (None is
    # not <-comparable with int); identical on both sides, so any
    # consistent order works for the equality check
    return tuple((v is None, str(v)) for v in t)


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()),
        key=_row_key,
    ), cols


def _duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        (tuple(_norm(r[i]) for i in order) for r in cur.fetchall()),
        key=_row_key,
    )
    return rows, sorted(cols)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    import os

    from data_caterer_spark.golden import ORACLE_SF_ENV

    # golden VALUES oracles render against the same sf the query reads
    os.environ[ORACLE_SF_ENV] = sf_dir
    sql = ORACLES[name]() if callable(ORACLES[name]) else ORACLES[name]
    got, got_cols = _spark_rows(QUERIES[name](spark, sf_dir))
    want, want_cols = _duck_rows(duck, sql)
    assert got_cols == want_cols, f"{name}: columns {got_cols} != {want_cols}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    mism = [(a, b) for a, b in zip(got, want) if a != b][:5]
    assert got == want, f"{name}: first mismatches {mism}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_oracle_free_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
