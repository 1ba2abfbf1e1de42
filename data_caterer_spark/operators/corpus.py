"""Corpus-level n-gram statistics: heavy hitters and document frequency.

Training-data pipelines lean on frequent-n-gram tables constantly —
boilerplate discovery ("the quick brown fox" headers repeated across a
crawl), contamination forensics, stopword derivation, and the hot-key
lists that feed the dedup paths' skew guards (``dedup.py``'s
``max_block`` probes are exactly a heavy-hitter question).

Distributed shape (the wordcount shape, deliberately):

* one scan, n-grams exploded IN the scan stage (no text shuffles);
* ONE combinable groupBy — partial aggregation map-side, so the shuffle
  carries per-partition partial counts, never raw occurrences;
* top-k via ``orderBy().limit(k)`` which Spark compiles to
  TakeOrderedAndProject: per-partition heaps + a tiny driver merge, no
  global sort of the count table.

Tokenization is the package-wide shared normalization
(``functions.bpe.words_column`` — lowercase, ASCII ``\\s+`` split), so
heavy-hitter grams are directly usable as keys against the dedup and
DSIR bucket paths.  Reference anchor: the closest reference surface is
the ``oneOf`` detection profiler (MetadataUtil's distinct-count
statistics); corpus n-gram tables are a new-build requirement of the
training-data brief, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .selection import ngram_column


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    include_bigrams: bool = True,
    min_count: int = 1,
) -> DataFrame:
    """(gram, occurrences) over the corpus — one explode + one
    combinable groupBy.  ``min_count`` prunes the long tail AFTER the
    aggregate (it cannot push below it) but BEFORE any downstream join
    or collect, which is where a 100 TB corpus's hapax mass (URLs, hex
    blobs) would otherwise go."""
    counts = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(ngram_column(text_col, include_bigrams)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    if min_count > 1:
        counts = counts.where(F.col("occurrences") >= min_count)
    return counts


def top_ngrams(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    include_bigrams: bool = True,
) -> DataFrame:
    """Top-``k`` most frequent n-grams, deterministic (count desc, gram
    asc) — TakeOrderedAndProject over the count table."""
    return (
        ngram_counts(df, text_col, include_bigrams)
        .orderBy(F.desc("occurrences"), F.asc("gram"))
        .limit(k)
    )


def ngram_doc_frequencies(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_bigrams: bool = True,
    min_df: int = 1,
) -> DataFrame:
    """(gram, doc_frequency): in how many DISTINCT documents each n-gram
    appears.  ``array_distinct`` dedups within the document BEFORE the
    explode, so the shuffle carries at most one row per (doc, gram) and
    the aggregate is a plain combinable count — no count(distinct id)
    two-phase shuffle."""
    counts = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.explode(
                F.array_distinct(ngram_column(text_col, include_bigrams))
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_frequency"))
    )
    if min_df > 1:
        counts = counts.where(F.col("doc_frequency") >= min_df)
    return counts
