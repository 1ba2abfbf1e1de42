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
WS_CHARS = " \t\n\r\f"
NON_ALNUM_PATTERN = "[^A-Za-z0-9 \\t\\n\\r\\f]"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: str | Column) -> Column:
    """Non-empty whitespace tokens (mirror of ``textcore.tokens_of``).

    HOF-free formulation (lambda higher-order functions are interpreted,
    not codegen'd — measured 8x slower than this): trim the whitespace
    charset with ``btrim`` so ``split`` can't produce edge empties (a
    maximal-run ws regex can't produce interior empties), and special-case
    the all-whitespace string, whose split would be [""].
    """
    t = F.btrim(_col(text), F.lit(WS_CHARS))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS_PATTERN)
    )


def tokens_lower(text: str | Column) -> Column:
    """Lowercased tokens — lowering the whole string once instead of a
    per-token ``transform`` (same result, no interpreted lambda)."""
    t = F.btrim(F.lower(_col(text)), F.lit(WS_CHARS))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS_PATTERN)
    )


def normalized(text: str | Column) -> Column:
    """Lowercased, single-space-joined text — equal to
    ``" ".join(tokens_of(text)).lower()`` via ONE regexp pass."""
    t = F.btrim(_col(text), F.lit(WS_CHARS))
    return F.lower(F.regexp_replace(t, WS_PATTERN, " "))


def token_count(text: str | Column) -> Column:
    # explicit null guard: legacy (non-ANSI) mode has size(NULL) == -1,
    # which would silently flip null-text rule semantics
    c = _col(text)
    return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(
        F.size(tokens(c))
    )


REP_TOKEN_CAP = 200  # keep in sync with textcore.REP_TOKEN_CAP


def word_repetition_ratio(text: str | Column) -> Column:
    """1 - distinct/total over the first REP_TOKEN_CAP lowercased tokens
    (``textcore.word_repetition_ratio``).  The cap bounds the per-row
    distinct-set cost on pathological mega-documents."""
    c = _col(text)
    toks = F.slice(tokens_lower(c), 1, REP_TOKEN_CAP)
    n = F.size(toks)
    ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n.cast("double")
    )
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(ratio)


ALNUM_WS_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" + WS_CHARS
)


def symbol_ratio(text: str | Column) -> Column:
    """Non-alphanumeric character fraction (``textcore.symbol_ratio``).

    ``translate`` deletes the keep-set char-by-char with a plain lookup
    table — measured 16x faster than the negated-class regex forms
    (Java regex negated classes were the single slowest kernel in the
    pipeline) and byte-identical in result.
    """
    c = _col(text)
    n = F.length(c)
    symbols = F.length(F.translate(c, ALNUM_WS_CHARS, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        symbols.cast("double") / n.cast("double")
    )


def char_run_flag(text: str | Column, run: int = 10) -> Column:
    """True when any single character repeats >= ``run`` times in a row."""
    return _col(text).rlike(f"(.)\\1{{{run - 1},}}")


def fingerprint(text: str | Column) -> Column:
    """32-bit CRC over whitespace-normalized lowercase text
    (``textcore.fingerprint``).  crc32 is a Spark built-in, so exact-dup
    fingerprints never leave the JVM."""
    return F.crc32(normalized(text).cast("binary"))


def stopword_ratio(text: str | Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords — cheap English-quality signal."""
    toks = tokens_lower(text)
    n = F.size(toks)
    sw = F.array(*[F.lit(w) for w in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )


def with_text_features(df, text_col: str = "text", char_run: int = 10):
    """Add the heuristic-rule feature block in a token-shared staged plan.

    The lowered token array is materialized once (``__toks``) and reused by
    ``n_tokens`` and ``rep_ratio`` — multiply-referenced, so CollapseProject
    keeps it a real column instead of re-splitting the text per consumer.
    Each output column equals its standalone kernel (pinned by
    tests/test_parity.py): lowering does not change the token count.
    """
    from pyspark.sql import functions as _F

    c = _col(text_col)
    toks_col = "__toks"
    df = df.withColumn(toks_col, tokens_lower(c))
    toks = _F.col(toks_col)
    n = _F.size(toks)
    n_tokens = _F.when(c.isNull(), _F.lit(None).cast("int")).otherwise(n)
    toks_capped = _F.slice(toks, 1, REP_TOKEN_CAP)
    nc = _F.size(toks_capped)
    rep = _F.when(nc == 0, _F.lit(0.0)).otherwise(
        _F.lit(1.0)
        - _F.size(_F.array_distinct(toks_capped)).cast("double") / nc.cast("double")
    )
    rep = _F.when(c.isNull(), _F.lit(None).cast("double")).otherwise(rep)
    df = df.withColumns(
        {
            "n_chars": _F.length(c),
            "n_tokens": n_tokens,
            "rep_ratio": rep,
            "symbol_ratio": symbol_ratio(c),
            "has_char_run": char_run_flag(c, char_run),
        }
    )
    return df.drop(toks_col)


PRINTABLE_ASCII = "".join(chr(i) for i in range(0x20, 0x7F))


def ascii_ratio(text: str | Column) -> Column:
    """Fraction of characters in printable ASCII — fast langid prefilter.
    translate-based for the same reason as :func:`symbol_ratio`."""
    c = _col(text)
    n = F.length(c)
    non_ascii = F.length(F.translate(c, PRINTABLE_ASCII, ""))
    return F.when(n == 0, F.lit(1.0)).otherwise(
        (n - non_ascii).cast("double") / n.cast("double")
    )
