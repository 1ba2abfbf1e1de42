"""JVM-side (Catalyst, codegen-able) text feature columns.

Each factory here is the Spark SQL mirror of a pure-Python kernel in
``textcore.py``; parity is pinned by tests/test_parity.py over the fixture
corpus.  Patterns use explicit ASCII classes so Java regex and Python ``re``
agree (see textcore module docstring).

These are the fast path: no Python crosses the JVM boundary for any of
them — the reference's own rule engine is likewise pure Spark SQL
(``ValidationOperations.scala:13``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_PATTERN = "[ \\t\\n\\r\\f]+"
NON_ALNUM_PATTERN = "[^A-Za-z0-9 \\t\\n\\r\\f]"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: str | Column) -> Column:
    """Non-empty whitespace tokens (mirror of ``textcore.tokens_of``)."""
    return F.filter(F.split(_col(text), WS_PATTERN), lambda x: x != "")


def token_count(text: str | Column) -> Column:
    # explicit null guard: legacy (non-ANSI) mode has size(NULL) == -1,
    # which would silently flip null-text rule semantics
    c = _col(text)
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(tokens(c))
    )


def word_repetition_ratio(text: str | Column) -> Column:
    """1 - distinct/total lowercased tokens (``textcore.word_repetition_ratio``)."""
    c = _col(text)
    toks = F.transform(tokens(c), lambda x: F.lower(x))
    n = F.size(toks)
    ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(ratio)


def symbol_ratio(text: str | Column) -> Column:
    """Non-alphanumeric character fraction (``textcore.symbol_ratio``)."""
    c = _col(text)
    n = F.length(c)
    kept = F.length(F.regexp_replace(c, NON_ALNUM_PATTERN, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - kept).cast("double") / n.cast("double")
    )


def char_run_flag(text: str | Column, run: int = 10) -> Column:
    """True when any single character repeats >= ``run`` times in a row."""
    return _col(text).rlike(f"(.)\\1{{{run - 1},}}")


def fingerprint(text: str | Column) -> Column:
    """32-bit CRC over whitespace-normalized lowercase text
    (``textcore.fingerprint``).  crc32 is a Spark built-in, so exact-dup
    fingerprints never leave the JVM."""
    normalized = F.lower(F.array_join(tokens(text), " "))
    return F.crc32(normalized.cast("binary"))


def stopword_ratio(text: str | Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords — cheap English-quality signal."""
    toks = F.transform(tokens(text), lambda x: F.lower(x))
    n = F.size(toks)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def ascii_ratio(text: str | Column) -> Column:
    """Fraction of characters in printable ASCII — fast langid prefilter."""
    c = _col(text)
    n = F.length(c)
    kept = F.length(F.regexp_replace(c, "[^ -~]", ""))
    return F.when(n == 0, F.lit(1.0)).otherwise(
        kept.cast("double") / n.cast("double")
    )
