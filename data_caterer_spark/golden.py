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
from functools import lru_cache


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
