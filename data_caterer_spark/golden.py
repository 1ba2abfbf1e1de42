"""Golden-oracle rendering for the flagship transcript quality filter.

The BASELINE criterion grades the Spark pipeline against *reference
labels*: the single-threaded pure-Python :class:`ReferenceLabeler`
replays the same rule bank row-by-row (``labeler.py``).  This module runs
that labeler over the deterministic seed-42 fixture and renders its
output as a literal ``VALUES`` relation in ANSI SQL, so the driver's
DuckDB harness can hash-compare the distributed plan against the
sequential reference — the F1/byte-equality criterion as an oracle query.

Byte-equality of scrubbed text is checked via md5 (hex over UTF-8 bytes):
Spark computes ``md5(cast(scrubbed_text as binary))`` and the golden side
``hashlib.md5(text.encode("utf-8"))`` — identical digests iff identical
bytes, and the oracle SQL stays small enough to ship as a literal.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache

#: sf dir the VALUES oracles are rendered against — must match the sf the
#: driver runs queries at (its correctness harness uses sf0.01; pytest
#: overrides via this env var to its own fixture dir)
ORACLE_SF_ENV = "SPARK_GRAFT_ORACLE_SF"
DEFAULT_ORACLE_SF = "/root/testdata/sf0.01"


def _oracle_sf_dir() -> str:
    return os.environ.get(ORACLE_SF_ENV, DEFAULT_ORACLE_SF)


def _spark_round(x: float, scale: int) -> float:
    """Replicate Spark's ROUND on doubles exactly: BigDecimal(double) is
    the exact binary value, setScale(scale, HALF_UP), back to double.
    Python's built-in round() is banker's rounding — NOT equivalent."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(x).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)
    )


def _documents(sf_dir: str) -> list[tuple[int, "str | None"]]:
    import duckdb

    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()


def _values_sql(rows: list[str], cols: str) -> str:
    return f"SELECT * FROM (VALUES {', '.join(rows)}) AS g({cols})"


def langid_golden_sql(sf_dir: str | None = None) -> str:
    """Independent single-threaded replay of the langid kernel over the
    documents parquet — verifies the Spark side's broadcast-model Arrow
    UDF plumbing end-to-end (same deterministic kernel, textcore.py)."""
    from .functions.textcore import LangIdModel

    model = LangIdModel.train()
    rows = []
    for doc_id, text in _documents(sf_dir or _oracle_sf_dir()):
        lang, score = model.predict_one(text)
        rows.append(
            f"(CAST({doc_id} AS BIGINT), '{lang}', "
            f"CAST('{_spark_round(score, 6)!r}' AS DOUBLE))"
        )
    return _values_sql(rows, "doc_id, doc_lang, lang_score")


def perplexity_golden_sql(sf_dir: str | None = None) -> str:
    """Same for the hashed-trigram perplexity kernel."""
    from .functions.textcore import PerplexityModel

    model = PerplexityModel.train()
    rows = []
    for doc_id, text in _documents(sf_dir or _oracle_sf_dir()):
        rows.append(
            f"(CAST({doc_id} AS BIGINT), "
            f"CAST('{_spark_round(model.score_one(text), 2)!r}' AS DOUBLE))"
        )
    return _values_sql(rows, "doc_id, ppl")


def media_golden_sql(n: int = 300) -> str:
    """Pure-Python replay of synthesize_media_df + the deterministic fake
    image decode — verifies the mapInPandas batching/schema plumbing
    (operators/multimodal.py) independent of Spark."""
    rows = []
    for media_id in range(0, n, 3):  # pmod(id,3)==0 -> 'image'
        hexdigest = hashlib.sha256(str(media_id).encode()).hexdigest()
        payload = (hexdigest * 64)[:128].encode("utf-8")
        h = int.from_bytes(payload[:8], "big", signed=False)
        width = h % 1920 + 16
        height = h // 1920 % 1080 + 16
        mean_luma = (h % 255) / 255.0
        rows.append(
            f"(CAST({media_id} AS BIGINT), CAST({width} AS INTEGER), "
            f"CAST({height} AS INTEGER), CAST(3 AS INTEGER), "
            f"CAST('{mean_luma!r}' AS DOUBLE))"
        )
    return _values_sql(rows, "media_id, width, height, channels, mean_luma")


@lru_cache(maxsize=4)
def transcript_golden_rows(
    n_convs: int = 200, seed: int = 42
) -> tuple[tuple[str, int, bool, str, str | None], ...]:
    """Reference-labeler output as (conv_id, turn_idx, keep, rule_hits
    joined with '|', md5-of-scrubbed-text-or-None) tuples."""
    from .fixtures import generate_transcripts
    from .labeler import ReferenceLabeler

    rows = generate_transcripts(n_convs=n_convs, seed=seed)
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    if len(set(keys)) != len(keys):
        raise ValueError(
            "fixture produced duplicate (conv_id, turn_idx) keys; "
            "golden rows would be ambiguous"
        )
    labeled = ReferenceLabeler().label_rows(rows)
    out = []
    for t in labeled:
        digest = (
            None
            if t.scrubbed_text is None
            else hashlib.md5(t.scrubbed_text.encode("utf-8")).hexdigest()
        )
        out.append(
            (t.conv_id, t.turn_idx, t.keep, "|".join(t.rule_hits), digest)
        )
    return tuple(out)


def transcript_golden_sql(n_convs: int = 200, seed: int = 42) -> str:
    """The golden rows as one ``SELECT ... FROM (VALUES ...)`` statement.

    All values are plain literals from a closed alphabet (CONV ids, rule
    ids, hex digests) — no escaping hazards.
    """
    vals = []
    for conv_id, turn_idx, keep, hits, digest in transcript_golden_rows(
        n_convs, seed
    ):
        md5_lit = "CAST(NULL AS VARCHAR)" if digest is None else f"'{digest}'"
        vals.append(
            f"('{conv_id}', {turn_idx}, {'TRUE' if keep else 'FALSE'}, "
            f"'{hits}', {md5_lit})"
        )
    return (
        "SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, keep, "
        "rule_hits, scrub_md5 FROM (VALUES "
        + ", ".join(vals)
        + ") AS g(conv_id, turn_idx, keep, rule_hits, scrub_md5)"
    )
