"""Pure-Python/numpy text kernels shared by the Spark pandas UDFs and the
single-threaded reference labeler (``data_caterer_spark.labeler``).

Both sides import THESE functions, so keep/drop decisions and scrubbed text
are byte-identical by construction — the F1/byte-equality criterion in
BASELINE.json reduces to "the Spark plan calls the same kernels on the same
rows".  No pyspark imports here.

Regex patterns are authored in the common subset of Java regex (Spark
``regexp_replace``/``RLIKE``) and Python ``re``: explicit ASCII classes, no
``\\d``/``\\s`` shorthands (their Unicode semantics differ between engines),
no lookaround.  The scrub bank order is TOTAL and documented — scrubbing is
sequential, so order is part of the spec (SURVEY.md §7 "hard parts").

The langid model is an n-gram-profile classifier standing in for fastText
(the fasttext lib is not in this image).  It keeps fastText's deployment
shape — a broadcast binary model, batch predict — so a real
``fasttext.load_model`` can be swapped in behind ``LangIdModel``.
"""

from __future__ import annotations

import math
import re
import zlib
from dataclasses import dataclass

import numpy as np

# --------------------------------------------------------------------------
# tokenization / feature kernels (mirrored by SQL in functions/text.py)
# --------------------------------------------------------------------------

# explicit ASCII whitespace — identical in Java regex and Python re
WS_RE = re.compile(r"[ \t\n\r\f]+")
NON_ALNUM_RE = re.compile(r"[^A-Za-z0-9 \t\n\r\f]")


def tokens_of(text: str) -> list[str]:
    return [t for t in WS_RE.split(text) if t != ""]


def token_count(text: str) -> int:
    return len(tokens_of(text))


# repetition ratio is computed over the first REP_TOKEN_CAP tokens: the
# signal saturates long before that, and an unbounded distinct over
# pathological mega-documents made the JVM kernel allocation-bound
# (measured: the array_distinct stage stopped scaling with cores).
REP_TOKEN_CAP = 200


def word_repetition_ratio(text: str) -> float:
    """1 - distinct/total over the first REP_TOKEN_CAP lowercased tokens;
    0.0 if empty."""
    toks = [t.lower() for t in tokens_of(text)[:REP_TOKEN_CAP]]
    if not toks:
        return 0.0
    return 1.0 - len(set(toks)) / len(toks)


def symbol_ratio(text: str) -> float:
    """Fraction of characters that are not ASCII alphanumerics/whitespace."""
    n = len(text)
    if n == 0:
        return 0.0
    kept = len(NON_ALNUM_RE.sub("", text))
    return (n - kept) / n


def fingerprint(text: str) -> int:
    """Deterministic 32-bit document fingerprint (rolling CRC over the
    whitespace-normalized lowercase text).  Used for exact-dup detection."""
    normalized = " ".join(tokens_of(text)).lower()
    return zlib.crc32(normalized.encode("utf-8"))


# --------------------------------------------------------------------------
# PII / toxicity scrub bank — TOTAL order, applied sequentially
# --------------------------------------------------------------------------

TOXICITY_LEXICON = [
    # stand-in lexicon for the fixture suite; production swaps in a real one
    "frakking", "dangblast", "scumweasel", "gorramit", "shazbot",
]

# (rule_id, pattern, replacement) — order matters: CARD before PHONE so a
# 16-digit run is tagged as a card, not a phone; EMAIL first so user@host
# digits are not half-eaten by later numeric patterns.
SCRUB_BANK: list[tuple[str, str, str]] = [
    (
        "pii_email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "[EMAIL]",
    ),
    (
        "pii_card",
        r"\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\b",
        "[CARD]",
    ),
    (
        "pii_ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "[SSN]",
    ),
    (
        "pii_phone",
        r"\+?[0-9]{1,3}[- .]?\(?[0-9]{3}\)?[- .]?[0-9]{3}[- .]?[0-9]{4}\b",
        "[PHONE]",
    ),
    (
        "pii_ip",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "[IP]",
    ),
    (
        "toxicity",
        r"(?i)\b(" + "|".join(TOXICITY_LEXICON) + r")\b",
        "[TOX]",
    ),
]

_COMPILED_BANK = [(rid, re.compile(pat), rep) for rid, pat, rep in SCRUB_BANK]


def scrub_text(text: str | None) -> tuple[str | None, list[str]]:
    """Apply the scrub bank in order; return (scrubbed, hit rule ids)."""
    if text is None:
        return None, []
    hits: list[str] = []
    out = text
    for rid, rx, rep in _COMPILED_BANK:
        new = rx.sub(rep, out)
        if new != out:
            hits.append(rid)
        out = new
    return out, hits


# --------------------------------------------------------------------------
# seed corpora (composed for this project; public common vocabulary)
# --------------------------------------------------------------------------

SEED_CORPORA: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and runs into the "
        "forest where it finds a quiet stream of water flowing between "
        "old stones. people often ask how the weather will change next "
        "week and whether they should bring an umbrella to work. thank "
        "you for your message, i will look into the problem and get back "
        "to you with an answer as soon as possible. the model returned an "
        "error because the input file was missing a required column. "
        "please check the documentation before opening a new ticket. "
        "what time does the train leave tomorrow morning from the main "
        "station? i think we should test this function with a larger "
        "dataset before we ship it to production. the results look good "
        "overall but there are a few edge cases we still need to handle."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y corre "
        "hacia el bosque donde encuentra un arroyo tranquilo. la gente "
        "pregunta a menudo cómo cambiará el tiempo la próxima semana y si "
        "deberían llevar un paraguas al trabajo. gracias por tu mensaje, "
        "voy a revisar el problema y te responderé lo antes posible. el "
        "modelo devolvió un error porque faltaba una columna en el "
        "archivo de entrada. por favor consulta la documentación antes de "
        "abrir un nuevo caso. ¿a qué hora sale el tren mañana por la "
        "mañana desde la estación principal?"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et "
        "court vers la forêt où il trouve un ruisseau tranquille. les "
        "gens demandent souvent comment le temps va changer la semaine "
        "prochaine et s'ils devraient apporter un parapluie au travail. "
        "merci pour votre message, je vais examiner le problème et vous "
        "répondre dès que possible. le modèle a renvoyé une erreur parce "
        "qu'une colonne manquait dans le fichier d'entrée. veuillez "
        "consulter la documentation avant d'ouvrir un nouveau dossier."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft "
        "in den wald wo er einen ruhigen bach findet. die leute fragen "
        "oft wie sich das wetter nächste woche ändern wird und ob sie "
        "einen regenschirm zur arbeit mitbringen sollten. danke für ihre "
        "nachricht, ich werde mir das problem ansehen und mich so bald "
        "wie möglich bei ihnen melden. das modell hat einen fehler "
        "zurückgegeben weil eine spalte in der eingabedatei fehlte. bitte "
        "lesen sie die dokumentation bevor sie ein neues ticket öffnen."
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cachorro preguiçoso e corre "
        "para a floresta onde encontra um riacho tranquilo. as pessoas "
        "perguntam com frequência como o tempo vai mudar na próxima "
        "semana e se deveriam levar um guarda-chuva para o trabalho. "
        "obrigado pela sua mensagem, vou analisar o problema e retornar "
        "o mais rápido possível. o modelo retornou um erro porque faltava "
        "uma coluna no arquivo de entrada."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e corre verso "
        "la foresta dove trova un ruscello tranquillo. le persone "
        "chiedono spesso come cambierà il tempo la prossima settimana e "
        "se dovrebbero portare un ombrello al lavoro. grazie per il tuo "
        "messaggio, esaminerò il problema e ti risponderò il prima "
        "possibile. il modello ha restituito un errore perché mancava una "
        "colonna nel file di input."
    ),
}

# --------------------------------------------------------------------------
# language identification — n-gram profile model (fastText stand-in)
# --------------------------------------------------------------------------

_LETTERS_RE = re.compile(r"[^a-zà-ÿäöüßñç ]+")

LANGID_BUCKETS = 1 << 14
LANGID_ALPHA = 0.05


def _langid_clean(text: str) -> str:
    cleaned = _LETTERS_RE.sub(" ", text.lower())
    cleaned = " ".join(cleaned.split())
    return f" {cleaned} "


@dataclass
class LangIdModel:
    """Hashed byte-trigram log-probability profiles per language.

    Deployment shape mirrors a broadcast fastText model: ``to_bytes`` /
    ``from_bytes`` for ``SparkContext.broadcast``, batch ``predict``.
    Scoring is a dense numpy matrix gather over FNV-hashed trigrams — no
    per-gram Python (the dict-profile formulation cost ~50us/text; this is
    ~3us) — the same dense-lookup shape as a real fastText model.
    """

    langs: list[str]
    profiles: np.ndarray  # float64[n_langs, LANGID_BUCKETS] log-probs
    unseen_logp: float = -12.0
    min_grams: int = 8

    @classmethod
    def train(cls, corpora: dict[str, str] | None = None) -> "LangIdModel":
        corpora = corpora or SEED_CORPORA
        langs = sorted(corpora)
        mat = np.zeros((len(langs), LANGID_BUCKETS), dtype=np.float64)
        for i, lang in enumerate(langs):
            idx = _hash_ngrams(_langid_clean(corpora[lang]), buckets=LANGID_BUCKETS)
            counts = np.zeros(LANGID_BUCKETS, dtype=np.float64)
            np.add.at(counts, idx.astype(np.int64), 1.0)
            total = counts.sum()
            mat[i] = np.log(
                (counts + LANGID_ALPHA) / (total + LANGID_ALPHA * LANGID_BUCKETS)
            )
        return cls(langs=langs, profiles=mat)

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(self)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "LangIdModel":
        import pickle

        return pickle.loads(raw)

    def predict_one(self, text: str | None) -> tuple[str, float]:
        """Returns (lang, avg trigram log-prob of the winning language).

        Deterministic: ``langs`` is sorted and ``argmax`` takes the first
        maximum, so ties break alphabetically; texts with too little
        letter signal get ('und', unseen_logp).
        """
        if text is None:
            return "und", self.unseen_logp
        idx = _hash_ngrams(_langid_clean(text), buckets=LANGID_BUCKETS)
        if idx.size < self.min_grams:
            return "und", self.unseen_logp
        scores = self.profiles[:, idx.astype(np.int64)].mean(axis=1)
        best = int(np.argmax(scores))
        return self.langs[best], float(scores[best])

    def predict(self, texts: list[str | None]) -> tuple[list[str], list[float]]:
        """Batch scoring, BIT-IDENTICAL to ``predict_one`` per row.

        Texts are grouped by gram count and each group scores as ONE
        gather + ``mean`` over the last axis: numpy's pairwise reduction
        along a contiguous last axis depends only on that row's sequence,
        so ``profiles[:, idx_mat].mean(axis=2)`` equals the per-text
        ``profiles[:, idx].mean(axis=1)`` bit-for-bit, while the per-text
        numpy fixed costs (~90us/text in the loop formulation) collapse to
        one call per group (~2x whole-kernel speedup on short turns).
        ``argmax(axis=0)`` keeps the same first-maximum tie-break."""
        n = len(texts)
        langs: list[str] = ["und"] * n
        scores: list[float] = [self.unseen_logp] * n
        present = [(j, _langid_clean(t)) for j, t in enumerate(texts) if t is not None]
        hashed = _hash_ngrams_batch(
            [c for _j, c in present], buckets=LANGID_BUCKETS
        )
        groups: dict[int, list[tuple[int, np.ndarray]]] = {}
        for (j, _c), idx in zip(present, hashed):
            if idx.size < self.min_grams:
                continue
            groups.setdefault(idx.size, []).append((j, idx))
        for g, items in groups.items():
            mat = np.empty((len(items), g), dtype=np.int64)
            for row, (_j, idx) in enumerate(items):
                mat[row] = idx.astype(np.int64)
            sc = self.profiles[:, mat].mean(axis=2)  # [n_langs, K]
            best = sc.argmax(axis=0)
            for col, (j, _idx) in enumerate(items):
                b = int(best[col])
                langs[j] = self.langs[b]
                scores[j] = float(sc[b, col])
        return langs, scores


    def predict_margin_one(self, text: str | None) -> tuple[str, float]:
        """(lang, top1 - top2 margin) — the language-ID CONFIDENCE gate
        (CCNet drops low-margin docs: two close profiles mean the text is
        mixed/ambiguous).  'und' rows get margin 0.0."""
        if text is None:
            return "und", 0.0
        idx = _hash_ngrams(_langid_clean(text), buckets=LANGID_BUCKETS)
        if idx.size < self.min_grams:
            return "und", 0.0
        scores = self.profiles[:, idx.astype(np.int64)].mean(axis=1)
        best = int(np.argmax(scores))
        others = np.delete(scores, best)
        return self.langs[best], float(scores[best] - others.max())

    def predict_margin(
        self, texts: list[str | None]
    ) -> tuple[list[str], list[float]]:
        """Batch margins, bit-identical per row to ``predict_margin_one``
        (same grouped gather as ``predict``; the margin is a difference
        of two entries of the same per-row score vector, so grouping
        cannot change it)."""
        n = len(texts)
        langs: list[str] = ["und"] * n
        margins: list[float] = [0.0] * n
        present = [
            (j, _langid_clean(t)) for j, t in enumerate(texts) if t is not None
        ]
        hashed = _hash_ngrams_batch(
            [c for _j, c in present], buckets=LANGID_BUCKETS
        )
        groups: dict[int, list[tuple[int, np.ndarray]]] = {}
        for (j, _c), idx in zip(present, hashed):
            if idx.size < self.min_grams:
                continue
            groups.setdefault(idx.size, []).append((j, idx))
        for g, items in groups.items():
            mat = np.empty((len(items), g), dtype=np.int64)
            for row, (_j, idx) in enumerate(items):
                mat[row] = idx.astype(np.int64)
            sc = self.profiles[:, mat].mean(axis=2)  # [n_langs, K]
            best = sc.argmax(axis=0)
            masked = sc.copy()
            masked[best, np.arange(sc.shape[1])] = -np.inf
            second = masked.max(axis=0)
            for col, (j, _idx) in enumerate(items):
                b = int(best[col])
                langs[j] = self.langs[b]
                margins[j] = float(sc[b, col] - second[col])
        return langs, margins


# --------------------------------------------------------------------------
# perplexity — hashed char-trigram LM (KenLM-style stand-in)
# --------------------------------------------------------------------------

# bucket count sized to the seed corpus: with B >> corpus-trigram-count the
# smoothing denominator dominates every score and the threshold loses all
# meaning (measured: 2^16 buckets pushed clean English to ppl ≈ 35k).  4096
# buckets + α=0.02 give clean ≈ 1.6k-4.7k vs gibberish ≥ 16k on held-out text.
PPL_BUCKETS = 1 << 12
PPL_ALPHA = 0.02
_HASH_BASE = np.uint64(1099511628211)
_HASH_SEED = np.uint64(14695981039346656037)


def _hash_ngrams_batch(
    texts: list[str], n: int = 3, buckets: int | None = None
) -> list[np.ndarray]:
    """Per-text FNV n-gram hashes from ONE concatenated buffer.

    All texts hash in three numpy passes over a single byte array; each
    text's grams are the slice of window positions fully inside it, so
    every value equals ``_hash_ngrams`` on that text alone (windows that
    straddle a boundary are simply never selected).  Collapses the
    per-text numpy fixed costs that dominate short-turn batches."""
    b = np.uint64(buckets if buckets is not None else PPL_BUCKETS)
    payloads = [t.encode("utf-8") for t in texts]
    big = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    if big.size < n:
        return [np.empty(0, dtype=np.uint64) for _ in texts]
    windows = np.lib.stride_tricks.sliding_window_view(big, n).astype(np.uint64)
    h = np.full(windows.shape[0], _HASH_SEED, dtype=np.uint64)
    for i in range(n):
        h = (h ^ windows[:, i]) * _HASH_BASE
    h %= b
    out: list[np.ndarray] = []
    off = 0
    for p in payloads:
        ln = len(p)
        if ln < n:
            out.append(np.empty(0, dtype=np.uint64))
        else:
            out.append(h[off : off + ln - n + 1])
        off += ln
    return out


def _hash_ngrams(text: str, n: int = 3, buckets: int | None = None) -> np.ndarray:
    """FNV-1a over byte n-grams, vectorized; deterministic across platforms."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if data.size < n:
        return np.empty(0, dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, n).astype(np.uint64)
    h = np.full(windows.shape[0], _HASH_SEED, dtype=np.uint64)
    for i in range(n):
        h = (h ^ windows[:, i]) * _HASH_BASE
    return h % np.uint64(buckets if buckets is not None else PPL_BUCKETS)


@dataclass
class PerplexityModel:
    """Laplace-smoothed hashed-trigram LM; ppl = exp(-mean log p(gram))."""

    logprob: np.ndarray  # float64[PPL_BUCKETS]
    empty_ppl: float = 1e6

    @classmethod
    def train(cls, corpus: str | None = None) -> "PerplexityModel":
        corpus = corpus or SEED_CORPORA["en"]
        counts = np.zeros(PPL_BUCKETS, dtype=np.float64)
        idx = _hash_ngrams(" ".join(corpus.lower().split()))
        np.add.at(counts, idx.astype(np.int64), 1.0)
        total = counts.sum()
        logp = np.log((counts + PPL_ALPHA) / (total + PPL_ALPHA * PPL_BUCKETS))
        return cls(logprob=logp)

    def to_bytes(self) -> bytes:
        return self.logprob.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "PerplexityModel":
        return cls(logprob=np.frombuffer(raw, dtype=np.float64).copy())

    def score_one(self, text: str | None) -> float:
        if text is None:
            return self.empty_ppl
        normalized = " ".join(text.lower().split())
        idx = _hash_ngrams(normalized)
        if idx.size == 0:
            return self.empty_ppl
        mean_logp = float(np.mean(self.logprob[idx.astype(np.int64)]))
        return float(math.exp(-mean_logp))

    def score(self, texts: list[str | None]) -> list[float]:
        """Batch scoring, BIT-IDENTICAL to ``score_one`` per row (same
        group-by-gram-count gather as ``LangIdModel.predict``; the final
        ``math.exp`` stays the scalar libm call ``score_one`` makes)."""
        n = len(texts)
        out: list[float] = [self.empty_ppl] * n
        present = [
            (j, " ".join(t.lower().split()))
            for j, t in enumerate(texts)
            if t is not None
        ]
        hashed = _hash_ngrams_batch([norm for _j, norm in present])
        groups: dict[int, list[tuple[int, np.ndarray]]] = {}
        for (j, _norm), idx in zip(present, hashed):
            if idx.size == 0:
                continue
            groups.setdefault(idx.size, []).append((j, idx))
        for g, items in groups.items():
            mat = np.empty((len(items), g), dtype=np.int64)
            for row, (_j, idx) in enumerate(items):
                mat[row] = idx.astype(np.int64)
            means = self.logprob[mat].mean(axis=1)  # [K]
            for col, (j, _idx) in enumerate(items):
                out[j] = float(math.exp(-float(means[col])))
        return out
