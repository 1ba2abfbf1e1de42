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


# --------------------------------------------------------------------------
# media codecs: encode/decode round trips on arbitrary shapes/signals
# --------------------------------------------------------------------------

import numpy as np

from data_caterer_spark.operators import mediacodec as C


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_ppm_bmp_roundtrip_any_shape(w, h, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(C.decode_pnm(C.encode_ppm(img)), img)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    gray = img[:, :, 0]
    assert np.array_equal(C.decode_pnm(C.encode_ppm(gray)), gray)


@given(
    st.integers(min_value=1, max_value=5000),
    st.sampled_from([8000, 16000, 22050, 44100]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_wav_roundtrip_any_signal(n, sr, seed):
    sig = np.random.RandomState(seed).uniform(-1, 1, n)
    sr2, pcm = C.decode_wav(C.encode_wav(sig, sr))
    assert sr2 == sr and pcm.shape == (n,)
    # 16-bit quantization error bound: encode scales by 32767, decode by
    # 32768 (the usual PCM convention), so worst case is |x|/32768 scale
    # skew + half-step rounding
    assert np.abs(pcm - sig).max() <= 1.5 / 32768 + 1e-9


@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_y4m_roundtrip_any_frames(n_frames, half_w, half_h, seed):
    rng = np.random.RandomState(seed)
    w, h = half_w * 2, half_h * 2  # C420 needs even dims
    frames = [
        rng.randint(0, 256, (h, w)).astype(np.uint8) for _ in range(n_frames)
    ]
    w2, h2, _fps, out = C.decode_y4m(C.encode_y4m(frames))
    assert (w2, h2, len(out)) == (w, h, n_frames)
    assert all(np.array_equal(a, b) for a, b in zip(frames, out))


@given(
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
)
@settings(max_examples=150, deadline=None)
def test_resize_shape_and_value_domain(in_w, in_h, out_w, out_h):
    img = np.arange(in_w * in_h * 3, dtype=np.int64).reshape(in_h, in_w, 3)
    img = (img % 256).astype(np.uint8)
    r = C.resize_nearest(img, out_w, out_h)
    assert r.shape == (out_h, out_w, 3)
    # nearest-neighbor never invents values
    assert set(np.unique(r)) <= set(np.unique(img))


@given(st.lists(st.integers(min_value=0, max_value=100), max_size=30),
       st.integers(min_value=0, max_value=300))
@settings(max_examples=200, deadline=None)
def test_budget_prefix_invariant_sequential(costs, budget):
    # the operator's WHERE cum<=budget equals "longest prefix that fits"
    # for non-negative costs: verify the pure-python model of it
    cum, keep = 0, 0
    for c in costs:
        cum += c
        if cum > budget:
            break
        keep += 1
    cums = np.cumsum(costs) if costs else np.array([])
    kept_filter = int((cums <= budget).sum())
    assert kept_filter == keep


# --------------------------------------------------------------------------
# round-3 kernels: fdlibm log, temperature mixing, IVF sizing
# --------------------------------------------------------------------------

import struct

from data_caterer_spark.operators.sampling import (
    fraction_threshold,
    temperature_fractions,
)
from data_caterer_spark.operators.similarity import derive_n_lists
from data_caterer_spark.sparkrng import _strict_log


@given(
    st.floats(
        min_value=5e-324, max_value=1.7e308,
        allow_nan=False, allow_infinity=False,
    )
)
@settings(max_examples=2000, deadline=None)
def test_strict_log_within_one_ulp_of_libm(x):
    """fdlibm log (StrictMath) and the platform libm agree to <= 1 ulp on
    every representable positive double, subnormals included."""
    a, b = _strict_log(x), math.log(x)
    ia = struct.unpack(">q", struct.pack(">d", a))[0]
    ib = struct.unpack(">q", struct.pack(">d", b))[0]
    assert abs(ia - ib) <= 1, (x, a, b)


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.integers(min_value=1, max_value=10**9),
        min_size=1,
        max_size=20,
    ),
    st.floats(min_value=0.05, max_value=1.0),
)
@settings(max_examples=300, deadline=None)
def test_temperature_fractions_properties(counts, alpha):
    f = temperature_fractions(counts, alpha)
    assert set(f) == set(counts)
    assert all(0.0 < v <= 1.0 for v in f.values())
    assert math.isclose(max(f.values()), 1.0)
    # bigger strata never keep a larger fraction than smaller ones
    ordered = sorted(counts, key=counts.get)
    for a, b in zip(ordered, ordered[1:]):
        assert f[a] >= f[b] - 1e-12


@given(st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=500, deadline=None)
def test_fraction_threshold_is_monotone_hex(frac):
    thr = fraction_threshold(frac)
    if frac >= 1.0:
        assert thr == "g"
    else:
        assert re.fullmatch(r"[0-9a-f]{8}", thr)
        # monotone: a larger fraction never gets a smaller threshold
        assert fraction_threshold(min(1.0, frac + 0.1)) >= thr


@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=500, deadline=None)
def test_derive_n_lists_bounds_and_monotonicity(n, rpl):
    lists = derive_n_lists(n, rows_per_list=rpl)
    assert 4 <= lists <= 65_536
    assert derive_n_lists(n + rpl, rows_per_list=rpl) >= lists
