"""Simulate the round driver's correctness gate at sf0.01.

Replicates the driver's comparison pipeline including the pandas
canonicalizer that round 1's flagship query crashed (sort_values over
every output column dies on unhashable list/ndarray cells).  For each
``queries()`` entry: run the Spark query, ``toPandas()``, sort columns
by name, ``sort_values`` across all columns, hash the values; when an
``oracle_sql()`` entry exists, run it in DuckDB over the same parquet
views and compare rows / schema / value-hash.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.01; with query names given,
       checks only those)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    # the driver's canonicalizer: column-name order, row order by values
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # stringify floats to a stable precision like the driver does
    return df


def _hash(df: pd.DataFrame) -> str:
    parts = []
    for col in df.columns:
        s = df[col]
        if s.dtype.kind == "f":
            s = s.round(6)
        parts.append(s.astype(str).str.cat(sep="\x1f"))
    return hashlib.md5("\x1e".join(parts).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from data_caterer_spark.config import get_spark

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    spark = get_spark(app_name="driver-sim")
    queries = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    only = set(sys.argv[2:])
    if only:
        queries = {n: q for n, q in queries.items() if n in only}

    results: dict[str, dict] = {}
    for name in sorted(queries):
        rec: dict = {}
        try:
            sdf = queries[name](spark, sf_dir)
            pdf = _canon(sdf.toPandas())
            rec["spark_rows"] = len(pdf)
            if name in oracles:
                odf = _canon(con.execute(oracles[name]).fetchdf())
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(pdf) == len(odf)
                rec["schema_match"] = list(pdf.columns) == list(odf.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _hash(pdf) == _hash(odf)
                )
            else:
                rec["err"] = "no_oracle"
        except Exception as e:  # noqa: BLE001 - mirror driver behavior
            rec["err"] = f"{type(e).__name__}: {e}"
        results[name] = rec
        status = (
            "PASS" if rec.get("hash_match")
            else rec.get("err", "MISMATCH")
        )
        print(f"{name:40s} {status}")

    bad = {
        n: r for n, r in results.items()
        if not r.get("hash_match") and r.get("err") != "no_oracle"
    }
    print(json.dumps({"total": len(results), "bad": list(bad)}, indent=1))
    for n, r in bad.items():
        print(n, r)
    spark.stop()


if __name__ == "__main__":
    main()
