"""Similarity-search tests: exact brute force vs numpy, LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_caterer_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _np_cosine(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return None
    return float(a @ b / (na * nb))


def test_cosine_topk_matches_numpy(emb):
    rows = emb.limit(200).collect()
    q = [float(x) for x in rows[3]["embedding"]]
    got = S.cosine_topk(emb.limit(200), q, k=5).collect()
    scored = sorted(
        ((r["vec_id"], round(_np_cosine(r["embedding"], q), 6)) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == scored


def test_brute_force_knn_self_excluded(emb):
    out = S.brute_force_knn_join(emb.limit(50), k=3).collect()
    assert all(r["id_a"] != r["id_b"] for r in out)
    by_a = {}
    for r in out:
        by_a.setdefault(r["id_a"], []).append(r)
    for rs in by_a.values():
        assert len(rs) == 3
        assert [r["rank"] for r in sorted(rs, key=lambda x: x["rank"])] == [1, 2, 3]


def test_lsh_recall_at_k(emb):
    dim = len(emb.first()["embedding"])
    sample = emb.limit(200)
    exact = S.brute_force_knn_join(sample, k=3).collect()
    # random embeddings are LSH's worst case (top neighbors are nearly
    # orthogonal, so per-plane collision p is barely over 1/2): use few
    # planes and many tables.  For cos~0.35 pairs p=(1-theta/pi)~0.61 =>
    # per-table 0.61^4~0.14, 16 tables => ~0.91 expected recall.
    approx = S.lsh_knn_join(sample, dim, k=3, num_tables=16, num_planes=4).collect()
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact}
    approx_pairs = {(r["id_a"], r["id_b"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, recall


def test_ivf_knn_recall_and_shape(emb):
    """IVF coarse-quantizer path: sane top-k shape and usable recall vs
    brute force (multiprobe covers centroid-boundary neighbors)."""
    dim = len(emb.first()["embedding"])
    sample = emb.limit(200)
    exact = {
        (r["id_a"], r["id_b"])
        for r in S.brute_force_knn_join(sample, k=3).collect()
    }
    out = S.ivf_knn_join(sample, dim, k=3, n_lists=8, probes=3).collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r["id_a"], []).append(r)
    for rs in by_a.values():
        assert len(rs) <= 3
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
    approx = {(r["id_a"], r["id_b"]) for r in out}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall


def test_ivf_derive_n_lists_scaling():
    # constant rows-per-list: list count grows linearly with input size so
    # the per-list candidate self-join stays linear in n
    assert S.derive_n_lists(0) == 4
    assert S.derive_n_lists(1_000) == 16  # ceil(1000/64)
    assert S.derive_n_lists(1_000_000) == 15_625
    assert S.derive_n_lists(10**10) == 65_536  # driver-sample cap
    assert S.derive_n_lists(1_000, rows_per_list=100) == 10


def test_ivf_hash_sample_balances_clustered_input(spark):
    """Training on a seeded hash sample keeps inverted lists near-balanced
    even when storage order is cluster-sorted — the case where a
    storage-prefix limit(N) sample sees ONLY the leading cluster and every
    trailing row funnels into a handful of hot lists (quadratic candidate
    blocks at scale)."""
    rng = np.random.RandomState(7)
    dim, per_cluster, n_clusters = 8, 250, 4
    rows = []
    vid = 0
    for c in range(n_clusters):  # storage order == cluster order (sorted)
        center = rng.normal(0, 10, dim)
        for _ in range(per_cluster):
            vec = [float(x) for x in center + rng.normal(0, 0.5, dim)]
            rows.append((vid, vec))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n = len(rows)
    n_lists = 8
    # hash-sampled training (the shipped path): sample ~60% of rows
    cent = S.train_ivf_centroids(
        df, dim, n_lists=n_lists, sample_rows=int(n * 0.6),
        id_col="vec_id", n_rows=n,
    )
    assigned = S.with_ivf_list(df, cent, probes=1)
    occ = {
        r["l"]: r["count"]
        for r in assigned.select(F.element_at("ivf_list", 1).alias("l"))
        .groupBy("l").count().collect()
    }
    hash_max = max(occ.values())
    # prefix training (the biased fallback) on the same budget: sees only
    # the first clusters
    cent_prefix = S.train_ivf_centroids(
        df, dim, n_lists=n_lists, sample_rows=int(n * 0.25)
    )
    occ_p = {
        r["l"]: r["count"]
        for r in S.with_ivf_list(df, cent_prefix, probes=1)
        .select(F.element_at("ivf_list", 1).alias("l"))
        .groupBy("l").count().collect()
    }
    prefix_max = max(occ_p.values())
    mean = n / n_lists
    # balanced: no list holds more than 3x its fair share
    assert hash_max <= 3 * mean, (hash_max, mean)
    # and strictly better than the biased prefix sample, which dumps the
    # unseen clusters into few lists
    assert hash_max <= prefix_max, (hash_max, prefix_max)


def test_semantic_dedup_drops_planted_duplicates(emb, spark):
    """SemDeDup semantics on planted near-identical vectors: a tiny
    perturbation of an existing vector shares its k-means cluster, so the
    pair meets inside the cluster, exceeds cos >= 1-eps, and the higher
    id drops; unrelated random vectors survive."""
    base = emb.limit(60)
    dim = len(emb.first()["embedding"])
    dup = base.limit(10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
        "label",
    )
    both = base.unionByName(dup)
    drops = {
        r["vec_id"]
        for r in S.semantic_dedup_drops(both, dim, eps=0.05).collect()
    }
    planted = {r["vec_id"] + 100000 for r in base.limit(10).collect()}
    # every planted duplicate pair lost exactly its higher-id member
    assert drops == planted, (sorted(drops)[:5], sorted(planted)[:5])


def test_semantic_dedup_degenerate_cluster_is_bounded(spark):
    """The skew guard: a degenerate embedding distribution (600 identical
    vectors — k-means CANNOT split them geometrically) must not produce
    one O(c^2) join block / unbounded union-find group.  The oversized
    cluster is salt-split into ceil(size/cap) sub-clusters, bounding
    every block near the cap; the pass still drops all but one
    representative PER SUB-CLUSTER."""
    n, dim = 600, 8
    rows = [(i, [1.0] + [0.0] * (dim - 1), "dup") for i in range(n)]
    # mutually orthogonal one-hots: cos 0 with everything, never dropped
    rows += [
        (1000 + j, [0.0] * (j + 1) + [1.0] + [0.0] * (dim - j - 2), "uniq")
        for j in range(dim - 1)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    cap = 64
    pairs = S.semantic_dedup_pairs(
        df, dim, eps=0.05, rows_per_cluster=16, max_cluster_size=cap
    )
    per_block = {
        r["cluster"]: r["cnt"]
        for r in pairs.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # the degenerate cluster split into multiple salted sub-blocks …
    dup_blocks = [c for c in per_block if len(per_block) > 1]
    assert len(dup_blocks) > 1
    # … and no block approaches the uncapped C(600,2)=179700; salting is
    # statistical, so allow 2x the expected per-sub block
    expected_sub = -(-n // cap)  # 10 sub-clusters, ~60 rows each
    per_sub_bound = (2 * n // expected_sub) * (2 * n // expected_sub - 1) // 2
    assert max(per_block.values()) <= per_sub_bound, per_block
    total_pairs = sum(per_block.values())
    assert total_pairs < n * (n - 1) // 4  # far below the quadratic block
    # semantics: one representative kept per sub-cluster, everything else
    # drops; unrelated vectors never drop
    drops = {
        r["vec_id"]
        for r in S.semantic_dedup_drops(
            df, dim, eps=0.05, rows_per_cluster=16, max_cluster_size=cap
        ).collect()
    }
    assert drops <= set(range(n))
    assert len(drops) >= n - 2 * expected_sub


def test_multiprobe_improves_recall(emb):
    dim = len(emb.first()["embedding"])
    sample = emb.limit(200)
    exact = {(r["id_a"], r["id_b"]) for r in S.brute_force_knn_join(sample, k=3).collect()}
    plain = {
        (r["id_a"], r["id_b"])
        for r in S.lsh_knn_join(sample, dim, k=3, num_tables=4, num_planes=8).collect()
    }
    probed = {
        (r["id_a"], r["id_b"])
        for r in S.lsh_knn_join(
            sample, dim, k=3, num_tables=4, num_planes=8, probes=3
        ).collect()
    }
    r_plain = len(exact & plain) / len(exact)
    r_probed = len(exact & probed) / len(exact)
    assert r_probed >= r_plain, (r_plain, r_probed)
    assert r_probed > 0.2, r_probed


def test_lsh_neardup_finds_planted_dups(emb, spark):
    # plant two exact-duplicate vectors; they hash to identical buckets in
    # every table, so recall of cos>=0.99 pairs is structural, not luck
    dim = len(emb.first()["embedding"])
    base = emb.limit(20)
    dup = base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    both = base.unionByName(dup)
    pairs = S.embedding_neardup_pairs(both, dim, min_cosine=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {(r["vec_id"], r["vec_id"] + 100000) for r in base.collect()}
    assert want <= got


def test_deterministic_across_runs(emb):
    dim = len(emb.first()["embedding"])
    a = S.lsh_knn_join(emb.limit(100), dim, k=2).collect()
    b = S.lsh_knn_join(emb.limit(100), dim, k=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_quantized_topk_recall_vs_exact(emb):
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"] for r in S.cosine_topk(emb, q, k=10).collect()}
    quant = {r["vec_id"] for r in S.quantized_cosine_topk(emb, q, k=10).collect()}
    # int8 keeps ~2 decimal digits of the cosine: ordering stays close
    assert len(exact & quant) >= 7
    assert 0 in quant  # the query vector itself stays the top hit


def test_quantization_error_bound(spark):
    import math

    from data_caterer_spark.operators.similarity import quantize_query

    vec = [0.91, -0.44, 0.002, 127.0, -3.5]
    qv = quantize_query(vec)
    s = max(abs(x) for x in vec) / 127.0
    for x, qx in zip(vec, qv):
        assert qx == float(math.floor(x / s + 0.5))
        assert abs(qx * s - x) <= s / 2 + 1e-12  # half-step error bound
    assert quantize_query([0.0, 0.0]) == [0.0, 0.0]


def test_pq_encode_decode_error_bounded_and_deterministic(emb):
    """PQ codebooks reconstruct within quantization error; encoding is
    deterministic across calls (seeded sample + seeded k-means)."""
    x = S.pq_training_sample(emb, dim=64, n_rows=emb.count())
    books = S.pq_fit_codebooks(x, m_subspaces=8, k_codes=16)
    books2 = S.pq_fit_codebooks(x, m_subspaces=8, k_codes=16)
    assert np.array_equal(books, books2)
    codes = S.pq_encode(x, books)
    assert codes.shape == (len(x), 8)
    assert codes.min() >= 0 and codes.max() < 16
    # reconstruction MSE strictly below the trivial (all-zeros) quantizer
    recon = np.concatenate(
        [books[m][codes[:, m]] for m in range(8)], axis=1
    )
    assert ((x - recon) ** 2).mean() < (x**2).mean() * 0.9


def test_pq_adc_matches_decomposed_distance(emb):
    """ADC score == sum of per-subspace squared distances to the chosen
    codewords (the LUT path computes exactly the decomposed distance)."""
    x = S.pq_training_sample(emb, dim=64, n_rows=emb.count())
    books = S.pq_fit_codebooks(x, m_subspaces=8, k_codes=16)
    q = x[3]
    codes = S.pq_encode(x[:50], books)
    adc = S.pq_adc_scores(codes, S.pq_adc_lut(q, books))
    d_sub = 8
    for row in range(0, 50, 7):
        manual = 0.0
        for m in range(8):
            cw = books[m][codes[row, m]]
            qs = q[m * d_sub : (m + 1) * d_sub]
            manual += float(((qs - cw) ** 2).sum())
        assert adc[row] == pytest.approx(manual, rel=1e-9)


def test_pq_adc_topk_recall_vs_exact(emb):
    """PQ ADC + exact re-rank recovers most of the true top-10 (64-dim,
    8x16 codebooks keep plenty of signal), and the Spark path agrees with
    the driver-side kernels on the candidate set."""
    q = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    books = S.pq_fit_codebooks(
        S.pq_training_sample(emb, dim=64, n_rows=emb.count()),
        m_subspaces=16,
        k_codes=32,
    )
    got = S.pq_adc_topk(emb, books, q, k=10, rerank=50).collect()
    assert len(got) == 10
    assert got[0]["vec_id"] == 0 and got[0]["cos_sim"] == pytest.approx(1.0)
    exact = {r["vec_id"] for r in S.cosine_topk(emb, q, k=10).collect()}
    assert len({r["vec_id"] for r in got} & exact) >= 7
