"""BPE tokenizer tests: merge-training determinism on the canonical
textbook example, greedy apply semantics, distributed/sequential parity
on real testdata."""

from __future__ import annotations

from data_caterer_spark.functions import bpe as B


def test_train_bpe_textbook_example():
    # Sennrich's canonical corpus: low/lower/newest/widest frequencies
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B.train_bpe(counts, n_merges=4)
    # 'es' wins round 1 (freq 9: newest+widest), then 'es'+'t', then
    # 'est'+'</w>'; 'lo' (freq 7) comes after
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", B.END)
    assert merges[3] == ("l", "o")


def test_apply_bpe_uses_lowest_rank_first():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = B.train_bpe(counts, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert B.apply_bpe_word("newest", ranks) == ["newest" + B.END] or (
        "est" + B.END in B.apply_bpe_word("newest", ranks)
    )
    # unseen word falls back to characters + learned sub-units
    toks = B.apply_bpe_word("lowest", ranks)
    assert "".join(toks).replace(B.END, "") == "lowest"
    assert B.tokenize_text(None, ranks) == []
    assert B.tokenize_text("  ", ranks) == []


def test_train_is_deterministic_and_early_stops():
    counts = {"ab": 1, "cd": 1}  # no pair repeats -> no merges
    assert B.train_bpe(counts, n_merges=10) == []
    counts2 = {"aaab": 3}
    m1 = B.train_bpe(counts2, 5)
    m2 = B.train_bpe(dict(reversed(list(counts2.items()))), 5)
    assert m1 == m2


def test_vocab_collect_is_bounded(spark):
    """The training collect must never exceed max_vocab_rows, and the
    freq floor must drop hapax noise BEFORE the driver sees it — the
    crawl-scale guard (a web corpus's raw token set defeats Heaps' law)."""
    rows = [(i, f"common words here noise{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 53 distinct words; hapax floor removes the 50 noise{i} singletons
    floored = B.word_frequencies(df, min_freq=2).collect()
    assert {r["word"] for r in floored} == {"common", "words", "here"}
    capped = B.word_frequencies(df, min_freq=1, max_vocab_rows=10).collect()
    assert len(capped) == 10
    # deterministic top-N: the three freq-50 words always survive the cap
    assert {"common", "words", "here"} <= {r["word"] for r in capped}
    # the pure-Python twin agrees (golden replay trains on the same set)
    counts: dict[str, int] = {}
    for _i, text in rows:
        for w in B.split_words(text):
            counts[w] = counts.get(w, 0) + 1
    assert B.cap_word_counts(counts, min_freq=2) == {
        r["word"]: r["freq"] for r in floored
    }
    assert B.cap_word_counts(counts, min_freq=1, max_vocab_rows=10) == {
        r["word"]: r["freq"] for r in capped
    }


def test_normalization_matches_spark_split(spark):
    """Train and apply must split identically: Java \\s is ASCII-only, so
    the Python side must NOT split on Unicode whitespace (NBSP) — a bare
    str.split() would (the round-3 mismatch)."""
    nbsp_text = "alpha\u00a0beta gamma\tdelta\x0bepsilon"
    df = spark.createDataFrame([(1, nbsp_text)], "doc_id long, text string")
    spark_words = [
        r["word"] for r in B.word_frequencies(df).orderBy("word").collect()
    ]
    assert sorted(B.split_words(nbsp_text)) == spark_words
    assert "alpha\u00a0beta" in spark_words  # NBSP is NOT a separator


def test_distributed_tokenization_matches_sequential(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    merges = B.train_bpe_on_corpus(docs, n_merges=80)
    assert len(merges) > 10
    out = {
        r["doc_id"]: r["toks"]
        for r in B.with_bpe_tokens(docs, merges, tokens_col="toks").select(
            "doc_id", "toks"
        ).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for r in docs.select("doc_id", "text").collect():
        assert out[r["doc_id"]] == B.tokenize_text(r["text"], ranks)
    # tokens reconstruct the normalized text exactly
    for r in docs.select("doc_id", "text").collect():
        if r["text"]:
            joined = "".join(out[r["doc_id"]]).replace(B.END, " ").strip()
            assert joined == " ".join(B.split_words(r["text"]))
