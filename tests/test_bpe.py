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
            assert joined == " ".join(r["text"].lower().split())
