"""Bit-exactness of the pure-Python Spark RNG replay (sparkrng.py).

The seeded-generation golden oracle (golden.seeded_table_golden_sql)
rests on XORShiftRandom reproducing Spark's RAND/RANDN streams exactly;
these tests pin that against the real engine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_caterer_spark.sparkrng import XORShiftRandom


def test_rand_stream_bit_exact(spark):
    got = [
        r["r"]
        for r in spark.range(0, 400, 1, 4).select(F.rand(42).alias("r")).collect()
    ]
    exp = []
    for p in range(4):
        rng = XORShiftRandom(42, p)
        exp += [rng.next_double() for _ in range(100)]
    assert got == exp  # float equality: bit-exact or bust


def test_randn_stream_bit_exact(spark):
    """nextGaussian goes through StrictMath.log/sqrt; the replay uses a
    pure-Python fdlibm log (sparkrng._strict_log), so every draw must be
    bit-identical — no platform-libm ulp flake left."""
    got = [
        r["g"]
        for r in spark.range(0, 400, 1, 4).select(F.randn(7).alias("g")).collect()
    ]
    exp = []
    for p in range(4):
        rng = XORShiftRandom(7, p)
        exp += [rng.next_gaussian() for _ in range(100)]
    assert got == exp  # float equality: bit-exact or bust


def test_strict_log_matches_libm_within_ulp():
    """_strict_log is fdlibm; sanity-pin it against math.log (they agree
    to <=1 ulp everywhere, and exactly on most inputs)."""
    import math as m
    import struct as st

    from data_caterer_spark.sparkrng import _strict_log

    def ulps(a: float, b: float) -> int:
        ia = st.unpack(">q", st.pack(">d", a))[0]
        ib = st.unpack(">q", st.pack(">d", b))[0]
        return abs(ia - ib)

    vals = [1e-300, 1e-10, 0.1, 0.5, 0.999999, 1.0, 1.000001, 2.0, 10.0,
            12345.6789, 1e300]
    vals += [0.001 + i * 0.013 for i in range(200)]
    assert all(ulps(_strict_log(v), m.log(v)) <= 1 for v in vals)
    assert _strict_log(1.0) == 0.0
    assert _strict_log(0.0) == float("-inf")
    assert m.isnan(_strict_log(-1.0))


def test_seeded_table_golden_rows_match_spark(spark):
    """Full generation replay == Spark output, every cell (including the
    lazy-CASE null stream, the regex digits, the struct JSON)."""
    from data_caterer_spark.golden import seeded_table_golden_rows
    from data_caterer_spark.queries import generate_seeded_table

    got = generate_seeded_table(spark, "").collect()
    exp = seeded_table_golden_rows()
    assert len(got) == len(exp) == 1000
    mismatched = 0
    for g, e in zip(got, exp):
        a, st, bal, op, yr, rich, fe, rc, sc, dj = e
        row_ok = (
            g["acct_id"] == a
            and g["status"] == st
            and (g["balance"] == bal or (g["balance"] is None and bal is None))
            and g["opened"] == op
            and g["year"] == yr
            and (g["is_rich"] == rich or (g["is_rich"] is None and rich is None))
            and float(g["fee"]) == fe
            and g["ref_code"] == rc
            and g["score"] == sc
            and g["details"].asDict(recursive=True)
            == {"tier": dj.split('"')[3], "limits": {"daily": int(dj.rsplit(":", 1)[1].rstrip("}}"))}}
        )
        mismatched += not row_ok
    assert mismatched == 0
