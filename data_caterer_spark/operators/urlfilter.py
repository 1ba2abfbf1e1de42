"""URL / domain filtering — the crawl-hygiene stage that runs BEFORE any
text model ever sees a document.

Web-scale corpora (C4, RefinedWeb, Dolma) gate documents on their source
URL first: blocklisted registered domains, raw-IP hosts, adult/spam
TLDs, media/binary path extensions, parameter-stuffed tracking URLs, and
blocklisted words anywhere in the URL.  It is the cheapest filter in the
pipeline (no text scan — a few regexes over a short string) and at
10^12 rows it removes work from every later stage, so it must stay pure
Catalyst: every flag here is a regexp/`locate` projection, and the
domain blocklist attaches via a broadcast LEFT join on the extracted
registered domain (an ``isin`` literal stops scaling at list sizes a
real blocklist reaches — Dolma's is ~10^5 domains).

All regexes use constructs Java regex and RE2 interpret identically
(character classes, anchors, bounded repeats — no lookaround), so the
DuckDB oracle can run the SAME patterns.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: host part: text between '://' and the first '/', '?' or '#'
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"
#: path part (no query/fragment)
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
#: IPv4 (optionally with :port)
IP_HOST_RE = r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}(:[0-9]+)?$"

#: TLDs whose crawl mass is overwhelmingly spam/adult (placeholder set —
#: production swaps in its curated list)
DEFAULT_BAD_TLDS = ("xxx", "click", "loan", "top")
#: binary/media extensions that are not text documents
DEFAULT_BAD_EXTENSIONS = (
    "jpg", "jpeg", "png", "gif", "mp3", "mp4", "avi", "zip", "exe", "pdf",
)
#: URL substrings that gate the document (placeholder for the standard
#: public word blocklists)
DEFAULT_BLOCKED_WORDS = ("casino", "viagra", "porn", "xvideos")
#: more '&'-separated params than this marks a tracking/session URL
DEFAULT_MAX_QUERY_PARAMS = 6


def url_host(url: Column) -> Column:
    """Lowercased host (with port if present); '' when unparseable."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def url_registered_domain(url: Column) -> Column:
    """Blocklist join key: host minus port and a leading ``www.``.

    Deliberately NOT a public-suffix-list eTLD+1 computation (that table
    is a runtime input in production); blocklists built on the same
    normalization match exactly."""
    host = url_host(url)
    no_port = F.regexp_replace(host, r":[0-9]+$", "")
    return F.regexp_replace(no_port, r"^www\.", "")


def url_path(url: Column) -> Column:
    return F.regexp_extract(F.lower(url), _PATH_RE, 1)


def url_flags(
    url: Column,
    bad_tlds: Sequence[str] = DEFAULT_BAD_TLDS,
    bad_extensions: Sequence[str] = DEFAULT_BAD_EXTENSIONS,
    blocked_words: Sequence[str] = DEFAULT_BLOCKED_WORDS,
    max_query_params: int = DEFAULT_MAX_QUERY_PARAMS,
) -> "dict[str, Column]":
    """Name -> boolean Column for every URL-level rule EXCEPT the domain
    blocklist (which needs a join — see :func:`filter_urls`)."""
    lower = F.lower(url)
    host = url_registered_domain(url)
    path = url_path(url)
    tld = F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1)
    ext = F.regexp_extract(path, r"\.([a-z0-9]+)$", 1)
    n_params = F.when(
        F.locate("?", lower) > 0,
        F.size(F.split(F.substring_index(lower, "?", -1), "&")),
    ).otherwise(F.lit(0))
    word_hit = F.lit(False)
    for w in blocked_words:
        word_hit = word_hit | (F.locate(w, lower) > 0)
    return {
        "ip_host": url_host(url).rlike(IP_HOST_RE),
        "bad_tld": tld.isin(*[str(t) for t in bad_tlds]),
        "bad_extension": ext.isin(*[str(e) for e in bad_extensions]),
        "excess_params": n_params > max_query_params,
        "blocked_word": word_hit,
    }


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    domain_blocklist: "DataFrame | None" = None,
    bad_tlds: Sequence[str] = DEFAULT_BAD_TLDS,
    bad_extensions: Sequence[str] = DEFAULT_BAD_EXTENSIONS,
    blocked_words: Sequence[str] = DEFAULT_BLOCKED_WORDS,
    max_query_params: int = DEFAULT_MAX_QUERY_PARAMS,
    keep_col: str = "url_keep",
    reasons_col: str = "url_drop_reasons",
) -> DataFrame:
    """Adds ``url_keep`` (boolean) and ``url_drop_reasons`` (the firing
    rule names, '|'-joined in fixed order — hash-stable).

    ``domain_blocklist`` is a one-column (``domain``) DataFrame joined
    LEFT on the registered domain and explicitly broadcast: the list is
    always the small side (10^5 rows vs 10^12 documents), and the big
    side keeps its partitioning — no shuffle of the corpus."""
    url = F.col(url_col)
    flags = url_flags(
        url, bad_tlds, bad_extensions, blocked_words, max_query_params
    )
    out = df
    if domain_blocklist is not None:
        # dedup the small side: public blocklists routinely repeat
        # entries, and a duplicated key would MULTIPLY corpus rows
        bl = domain_blocklist.select(
            F.col("domain").alias("__bl_domain"),
            F.lit(True).alias("__bl_hit"),
        ).dropDuplicates(["__bl_domain"])
        out = (
            out.withColumn("__dom", url_registered_domain(url))
            .join(
                F.broadcast(bl),
                F.col("__dom") == F.col("__bl_domain"),
                "left",
            )
            .drop("__bl_domain", "__dom")
        )
        flags = {"blocked_domain": F.coalesce(F.col("__bl_hit"), F.lit(False)),
                 **flags}
    # fail CLOSED on a NULL url: rlike/locate propagate NULL, which
    # would leave keep=NULL (neither side of a boolean filter) and an
    # empty reason string — a NULL url is a drop with its own reason
    flags = {"null_url": url.isNull(), **flags}
    reason_parts = [
        F.when(F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in flags.items()
    ]
    keep = F.lit(True)
    for cond in flags.values():
        keep = keep & ~F.coalesce(cond, F.lit(False))
    out = out.withColumn(
        reasons_col, F.concat_ws("|", *reason_parts)
    ).withColumn(keep_col, keep)
    return out.drop("__bl_hit") if domain_blocklist is not None else out
