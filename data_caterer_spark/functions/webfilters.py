"""Published web-corpus quality-rule banks: Gopher and C4.

Two canonical keep/drop banks every large-scale pretraining pipeline
runs, expressed as single-scan Catalyst plans over a ``text`` column —
zero shuffles, zero Python, so at 100 TB each is a pure map stage whose
filters ride predicate pushdown when composed with downstream ops.

* :func:`gopher_flags` — the Gopher/MassiveWeb document filters
  (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1.1):
  word-count bounds, mean-word-length band, hash/ellipsis symbol ratio,
  bullet-line and ellipsis-line fractions, alphabetic-word fraction,
  and the 2-of-8 English stopword presence rule.
* :func:`c4_decisions` — the C4 heuristics (Raffel et al. 2020, JMLR
  "Exploring the Limits of Transfer Learning", §2.2): line-level
  terminal-punctuation + min-words retention with document reassembly,
  plus the page-level lorem-ipsum / curly-brace / "javascript" /
  min-3-sentences drops.

Both banks follow the repo's rule-engine conventions (the reference's
own validation DSL is likewise pure Spark SQL — see
``operators/rules.py``): every per-rule column is a nullable boolean and
the ``keep`` verdict coalesces NULL to FALSE (an unknown is a drop,
matching the flagship ``doc_quality_filter``).

All expressions use explicit ASCII character classes so the Java-regex
Spark side and the RE2 DuckDB oracle side agree byte-for-byte
(see ``functions/text.py`` module docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WS_CHARS, tokens, tokens_lower

#: Gopher's "must contain 2 of these" English stopwords (App. A1.1).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: Gopher word-count bounds.  The published MassiveWeb bounds are
#: [50, 100_000]; they are parameters here because the rule *shape* is
#: the operator — tests and the small-SF catalog query pin their own.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000

#: C4 terminal punctuation set (period, !, ?, end-quote).
C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def _lines(c: Column) -> Column:
    """Newline-split lines, trailing empties kept (both engines keep
    them: Spark ``split`` limit -1, DuckDB ``string_split``)."""
    return F.split(c, "\\n", -1)


def _coal(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
) -> DataFrame:
    """Add the seven Gopher document-filter booleans and ``keep``.

    Feature extraction is arithmetic over counts, never per-token Python:
    total word chars come from ``translate``-deleting whitespace (one
    lookup-table pass, same trick as ``text.symbol_ratio``), hash and
    ellipsis counts from length deltas of ``translate``/``replace``.

    Emitted columns (all nullable boolean except the int ``n_words``):
    ``n_words, words_in_range, mean_word_len_ok, symbol_ratio_ok,
    bullet_lines_ok, ellipsis_lines_ok, alpha_words_ok, stopwords_ok,
    keep``.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)

    def _frac(num: Column, den: Column) -> Column:
        # lazily-guarded division: CaseWhen evaluates only the matching
        # branch, so the zero-denominator row never divides (ANSI-safe)
        return F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).otherwise(F.lit(None).cast("double"))

    # mean word length == (non-whitespace chars) / n_words
    word_chars = F.length(F.translate(c, WS_CHARS, ""))
    mean_wl = _frac(word_chars, n_words)
    hash_cnt = F.length(c) - F.length(F.translate(c, "#", ""))
    ellipsis_cnt = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    # Rae et al. A1.1 tests EACH symbol's ratio against 0.1 ("symbol-to-
    # word ratio greater than 0.1 for either the hash symbol or
    # ellipsis") — a combined sum would be stricter than the paper
    hash_ratio = _frac(hash_cnt, n_words)
    ellipsis_ratio = _frac(ellipsis_cnt, n_words)
    lines = _lines(c)
    n_lines = F.size(lines)
    bullet_frac = _frac(
        F.size(
            F.filter(
                lines,
                lambda x: F.substring(F.ltrim(x), 1, 1).isin("-", "*"),
            )
        ),
        n_lines,
    )
    ellipsis_line_frac = _frac(
        F.size(F.filter(lines, lambda x: F.rtrim(x).endswith("..."))),
        n_lines,
    )
    alpha_frac = _frac(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))), n_words
    )
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    sw_hits = F.size(F.array_intersect(F.array_distinct(tokens_lower(c)), sw))

    flags = {
        "words_in_range": n_words.between(min_words, max_words),
        # guard the 0-word division: a wordless doc fails, not NaN-passes
        "mean_word_len_ok": (n_words > 0) & mean_wl.between(3.0, 10.0),
        "symbol_ratio_ok": (n_words > 0)
        & (hash_ratio <= 0.1)
        & (ellipsis_ratio <= 0.1),
        "bullet_lines_ok": (n_lines > 0) & (bullet_frac <= 0.9),
        "ellipsis_lines_ok": (n_lines > 0) & (ellipsis_line_frac <= 0.3),
        "alpha_words_ok": (n_words > 0) & (alpha_frac >= 0.8),
        "stopwords_ok": sw_hits >= 2,
    }
    # flags are emitted pre-coalesced (non-null booleans): NULL text is a
    # drop, and the coalesce also absorbs legacy size(NULL) = -1 quirks so
    # the columns hash identically against an ANSI oracle
    out = df.withColumn(
        "n_words",
        F.when(c.isNull(), F.lit(None).cast("int")).otherwise(n_words),
    )
    keep = F.lit(True)
    for name, col in flags.items():
        out = out.withColumn(name, _coal(col & c.isNotNull()))
        keep = keep & _coal(col & c.isNotNull())
    return out.withColumn("keep", keep)


def c4_line_keep(line: Column) -> Column:
    """C4's line-retention predicate: >= 5 words AND terminal punctuation."""
    return (F.size(tokens(line)) >= C4_MIN_LINE_WORDS) & F.substring(
        F.rtrim(line), -1, 1
    ).isin(*C4_TERMINALS)


def c4_decisions(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the C4 page-level flags, line-retention counts, and the
    reassembled clean text.

    ``clean_text`` keeps only lines passing :func:`c4_line_keep`,
    re-joined with newlines *in original order* (array ``filter`` is
    order-preserving — no shuffle, no window).  Sentences are non-empty
    trimmed segments between ASCII terminal punctuation.

    Emitted columns: ``n_lines, kept_lines, n_sentences (ints);
    has_brace, has_lorem_ipsum, has_javascript (bools); keep (bool);
    clean_text (string)``.
    """
    c = F.col(text_col)
    lines = _lines(c)
    kept = F.filter(lines, c4_line_keep)
    low = F.lower(c)
    sentences = F.filter(
        F.transform(F.split(c, "[.!?]", -1), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    has_brace = low.contains("{")
    has_lorem = low.contains("lorem ipsum")
    # word-boundary match so 'javascript' the token hits but e.g. a URL
    # path '/javascripts/' still hits too — C4 drops on the substring
    has_js = low.contains("javascript")
    n_sent = F.size(sentences)
    keep = (
        _coal((n_sent >= C4_MIN_SENTENCES) & c.isNotNull())
        & ~_coal(has_brace)
        & ~_coal(has_lorem)
        & ~_coal(has_js)
    )

    def _int(col: Column) -> Column:
        # NULL text -> NULL count (not legacy size(NULL) = -1)
        return F.when(c.isNull(), F.lit(None).cast("int")).otherwise(col)

    return df.withColumns(
        {
            "n_lines": _int(F.size(lines)),
            "kept_lines": _int(F.size(kept)),
            "n_sentences": _int(n_sent),
            "has_brace": _coal(has_brace),
            "has_lorem_ipsum": _coal(has_lorem),
            "has_javascript": _coal(has_js),
            "keep": keep,
            "clean_text": F.array_join(kept, "\n"),
        }
    )


def robots_meta_directives(
    df: DataFrame, html_col: str = "html"
) -> DataFrame:
    """Parse the page-level ``<meta name="robots">`` directive and derive
    the crawl-compliance verdicts a corpus builder must honor (the
    robots-exclusion protocol's HTML half; the HTTP half is the
    ``X-Robots-Tag`` header carried by the fetcher): ``indexable`` —
    page may enter the corpus; ``followable`` — its outlinks may seed
    the frontier; ``archivable`` — a cached copy may be kept.

    Only the ``<head>`` is scanned (a robots string quoted in body text
    is content, not a directive); tag name and directive tokens are
    case-insensitive per the protocol; ``none`` ≡ ``noindex, nofollow``.
    Pure Catalyst regexp projections — a zero-shuffle scan stage at any
    corpus size."""
    head = F.regexp_extract(F.col(html_col), r"(?s)<head>(.*?)</head>", 1)
    content = F.lower(
        F.regexp_extract(
            head,
            r'(?is)<meta\s+name="robots"\s+content="([^"]*)"',
            1,
        )
    )
    has_tok = lambda t: content.rlike(rf"(^|[,\s]){t}([,\s]|$)")  # noqa: E731
    none_tok = has_tok("none")
    return df.withColumns(
        {
            "robots_content": content,
            "indexable": ~(has_tok("noindex") | none_tok),
            "followable": ~(has_tok("nofollow") | none_tok),
            "archivable": ~(has_tok("noarchive") | none_tok),
        }
    )
