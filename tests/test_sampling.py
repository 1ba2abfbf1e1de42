"""Deterministic sampling + decontamination operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_caterer_spark.operators import dedup as D
from data_caterer_spark.operators import sampling as S


def test_fraction_threshold_bounds():
    assert S.fraction_threshold(0.0) == "00000000"
    # 1.0 is the exact identity: the sentinel sorts after every hex
    # bucket, so the strict '<' compare keeps ALL keys (a 'ffffffff'
    # clamp silently dropped keys hashing to the top bucket)
    assert S.fraction_threshold(1.0) == "g"
    assert all(c < "g" for c in "0123456789abcdef")
    assert S.fraction_threshold(0.2) == "33333333"
    import pytest

    with pytest.raises(ValueError):
        S.fraction_threshold(1.5)


def test_hash_sample_fraction_one_is_identity(spark):
    df = spark.range(5_000)
    assert S.hash_sample(df, ["id"], 1.0).count() == 5_000


def test_temperature_fractions_math():
    counts = {"en": 800, "fr": 100, "de": 100}
    # alpha=1: natural proportions -> keep everything
    assert S.temperature_fractions(counts, alpha=1.0) == {
        "en": 1.0, "fr": 1.0, "de": 1.0,
    }
    f = S.temperature_fractions(counts, alpha=0.5)
    # smallest strata keep 1.0; the big one downsamples by sqrt ratio
    assert f["fr"] == 1.0 and f["de"] == 1.0
    assert abs(f["en"] - (100 / 800) ** 0.5) < 1e-12
    # resulting mix hits the n^alpha target shares
    kept = {k: counts[k] * f[k] for k in counts}
    shares = {k: v / sum(kept.values()) for k, v in kept.items()}
    target = {k: counts[k] ** 0.5 for k in counts}
    target = {k: v / sum(target.values()) for k, v in target.items()}
    assert all(abs(shares[k] - target[k]) < 1e-12 for k in counts)
    import pytest

    with pytest.raises(ValueError):
        S.temperature_fractions(counts, alpha=0.0)


def test_temperature_mix_flattens_skew(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    before = {
        r["lang"]: r["count"]
        for r in docs.groupBy("lang").count().collect()
    }
    sampled, fracs = S.temperature_mix(docs, "lang", ["doc_id"], alpha=0.5)
    after = {
        r["lang"]: r["count"]
        for r in sampled.groupBy("lang").count().collect()
    }
    # skew strictly reduced; smallest language kept whole
    smallest = min(before, key=before.get)
    biggest = max(before, key=before.get)
    assert fracs[smallest] == 1.0
    assert after[smallest] == before[smallest]
    assert after[biggest] < before[biggest]
    assert (after[biggest] / after[smallest]) < (
        before[biggest] / before[smallest]
    )
    # determinism: rerun is identical
    again, _ = S.temperature_mix(docs, "lang", ["doc_id"], alpha=0.5)
    assert {
        r["lang"]: r["count"] for r in again.groupBy("lang").count().collect()
    } == after


def test_hash_sample_deterministic_and_approximate(spark):
    df = spark.range(20_000).select(F.col("id"))
    a = S.hash_sample(df, ["id"], 0.1, seed=7)
    b = S.hash_sample(df, ["id"], 0.1, seed=7)
    n1, n2 = a.count(), b.count()
    assert n1 == n2  # exact determinism, not RNG
    assert 0.08 * 20_000 < n1 < 0.12 * 20_000
    # a different seed draws a different (but equally deterministic) set
    c = S.hash_sample(df, ["id"], 0.1, seed=8)
    assert c.count() != 0
    overlap = a.join(c, "id").count()
    assert overlap < n1  # seeds decorrelate


def test_hash_sample_repartition_stable(spark):
    df = spark.range(5_000)
    base = {r["id"] for r in S.hash_sample(df, ["id"], 0.2).collect()}
    shuffled = {
        r["id"]
        for r in S.hash_sample(df.repartition(17), ["id"], 0.2).collect()
    }
    assert base == shuffled  # sample is a function of the key, not layout


def test_with_split_leakage_safe(spark):
    # rows sharing a conv key must share a split (turn-level rows)
    df = spark.range(3_000).select(
        (F.col("id") % 300).alias("conv"), F.col("id").alias("turn")
    )
    s = S.with_split(df, ["conv"], test_fraction=0.3, seed=42)
    leaks = (
        s.groupBy("conv")
        .agg(F.count_distinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert leaks == 0
    splits = {r["split"] for r in s.select("split").distinct().collect()}
    assert splits == {"train", "test"}


def test_stratified_fractions_scale_per_stratum(spark):
    df = spark.range(30_000).select(
        F.col("id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("stratum"),
    )
    out = S.stratified_hash_sample(
        df, "stratum", {"a": 0.3, "b": 0.05}, ["id"], seed=42
    )
    counts = {
        r["stratum"]: r["count"]
        for r in out.groupBy("stratum").count().collect()
    }
    assert 0.25 * 10_000 < counts["a"] < 0.35 * 10_000
    assert 0.03 * 10_000 < counts["b"] < 0.07 * 10_000
    assert "c" not in counts  # default fraction 0 drops unlisted strata


def test_decontaminate_drops_planted_overlap(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely unrelated text about spark shuffle partitions"),
        (3, "quick brown fox jumps over the lazy dog again and again"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "a quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    hits = D.contamination_overlap(corpus, ev, min_overlap=3)
    got = {r["doc_id"]: r["n_shared"] for r in hits.collect()}
    assert 1 in got and 3 in got and 2 not in got
    kept = D.decontaminate(corpus, ev, min_overlap=3)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_contamination_overlap_counts_match_python(spark):
    from data_caterer_spark.golden import _py_word_shingles

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.where(F.col("doc_id") % 25 == 0)
    corpus = docs.where(F.col("doc_id") % 25 != 0)
    got = {
        r["doc_id"]: r["n_shared"]
        for r in D.contamination_overlap(corpus, ev, min_overlap=1).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    eval_sh = set()
    for r in rows:
        if r["doc_id"] % 25 == 0:
            eval_sh |= _py_word_shingles(r["text"], 3)
    for r in rows:
        if r["doc_id"] % 25 == 0:
            continue
        n = len(_py_word_shingles(r["text"], 3) & eval_sh)
        assert got.get(r["doc_id"], 0) == n


def test_bottom_k_sample_exact_size_and_stability(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = S.bottom_k_sample(docs, ["doc_id"], k=37)
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    assert len(ids_a) == 37
    # rerun + repartition invariance (the reservoir-equivalence claim)
    b = S.bottom_k_sample(docs.repartition(7), ["doc_id"], k=37)
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b
    # k >= n degenerates to the identity sample
    n = docs.count()
    assert S.bottom_k_sample(docs, ["doc_id"], k=n + 10).count() == n


def test_bottom_k_sample_subset_nesting(spark):
    # bottom-k sketches nest: the 10-sample is a prefix of the 30-sample
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small = {
        r["doc_id"]
        for r in S.bottom_k_sample(docs, ["doc_id"], 10).collect()
    }
    big = {
        r["doc_id"]
        for r in S.bottom_k_sample(docs, ["doc_id"], 30).collect()
    }
    assert small < big
