"""End-to-end corpus curation: the full training-data funnel in ONE
Spark DAG — the composition a real user runs, not just the stages.

    URL hygiene -> classifier quality gate -> exact dedup -> DSIR
    importance weighting -> per-source funnel metrics

Every stage is one of the package's verified operators; this module
wires them so the INTEGRATION is itself driver-verified (the golden
replay chains the same shared kernels sequentially).  Stage order
follows the standard crawl recipe (C4/RefinedWeb/Dolma): the cheap
URL rules run first so later stages never featurize documents that a
regex would have dropped; the classifier gates before dedup so the
dedup shuffle carries only quality survivors; DSIR weights are fit on
the deduped corpus (duplicate mass would otherwise bias the raw model).

Scale shape: stage outputs stay in the same DataFrame lineage (no
intermediate actions besides the classifier/DSIR model fits, which
collect only bounded tables — partial gradients per partition and
n_bucket count rows); the funnel metrics are one combinable groupBy
over the source key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import classifier as CLS
from ..operators import selection as SEL
from ..operators import urlfilter as U


def curation_funnel(
    docs: DataFrame,
    url_col: str = "url",
    label: "Column | None" = None,
    domain_blocklist: "DataFrame | None" = None,
    n_features: int = 512,
    iters: int = 4,
    lr: float = 0.5,
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-source funnel: (source, n_input, n_url, n_quality, n_unique,
    weight_fixed_sum) — document counts surviving each stage plus the
    DSIR weight mass of the final survivors (all int64, so the row is
    exact under any partitioning)."""
    if label is None:
        label = F.col("lang") == "en"

    # stage 1: URL hygiene (pure projections + broadcast blocklist join)
    staged = U.filter_urls(docs, url_col, domain_blocklist=domain_blocklist)
    url_ok = staged.where(F.col("url_keep"))

    # stage 2: classifier gate — train on the URL survivors' weak labels,
    # score the same survivors (bounded collects only: per-partition
    # gradient partials)
    model = CLS.train(
        url_ok, label, n_features=n_features, iters=iters, lr=lr
    )
    scored = CLS.infer(url_ok, model).withColumnRenamed("keep", "cls_keep")
    quality = (
        url_ok.join(scored.select("doc_id", "cls_keep"), "doc_id")
        .where(F.col("cls_keep"))
    )

    # stage 3: exact dedup — min doc_id per normalized-text fingerprint
    # (the streaming twin uses the same md5 key)
    # NULL text -> NULL fingerprint: groupBy keeps the NULL group (one
    # keeper row), but a null-UNSAFE join key would drop every null-fp
    # row — the sequential replay keeps the min-doc_id null-text row, so
    # the join must be null-safe on __fp (doc_id itself is never null)
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    with_fp = quality.withColumn("__fp", fp)
    keepers = with_fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    unique = with_fp.join(
        keepers,
        with_fp["__fp"].eqNullSafe(keepers["__fp"])
        & (with_fp["doc_id"] == keepers["doc_id"]),
        "left_semi",
    ).drop("__fp")

    # stage 4: DSIR importance weights over the deduped corpus (one-scan
    # pair fit; ratio table broadcast; int64 per-doc sums)
    t_counts, r_counts = SEL.bucket_counts_with_target(
        unique, label, n_buckets=n_buckets
    )
    ratios = SEL.fixed_log_ratios(t_counts, r_counts, n_buckets)
    weights = SEL.dsir_log_weights(unique, ratios, n_buckets=n_buckets)
    weighted = unique.join(
        weights.select("doc_id", "log_weight_fixed"), "doc_id"
    )

    # funnel metrics: one combinable groupBy per stage over the source
    # key, assembled with outer joins on the tiny per-source tables
    def per_source(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("source").agg(F.count(F.lit(1)).alias(name))

    funnel = (
        per_source(docs, "n_input")
        .join(per_source(url_ok, "n_url"), "source", "left")
        .join(per_source(quality, "n_quality"), "source", "left")
        .join(
            weighted.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_unique"),
                F.sum("log_weight_fixed").alias("weight_fixed_sum"),
            ),
            "source",
            "left",
        )
    )
    zero = F.lit(0).cast("long")
    return funnel.select(
        "source",
        F.coalesce("n_input", zero).alias("n_input"),
        F.coalesce("n_url", zero).alias("n_url"),
        F.coalesce("n_quality", zero).alias("n_quality"),
        F.coalesce("n_unique", zero).alias("n_unique"),
        F.coalesce("weight_fixed_sum", zero).alias("weight_fixed_sum"),
    )


def curation_funnel_sequential(
    rows: "list[dict]",
    url_of: "callable",
    blocked_domains: "set[str]",
    n_features: int = 512,
    iters: int = 4,
    lr: float = 0.5,
    n_buckets: int = 4096,
) -> "list[tuple]":
    """Single-threaded replay of :func:`curation_funnel` over dicts with
    doc_id/text/lang/source — same shared kernels stage by stage, so the
    funnel rows match the cluster bit-for-bit.  ``url_of(doc_id)`` must
    reproduce the url column; URL rules replay via
    :func:`urlfilter_python_flags`."""
    import hashlib

    # stage 1
    url_ok = [
        r
        for r in rows
        if not any(
            urlfilter_python_flags(url_of(r["doc_id"]), blocked_domains).values()
        )
    ]
    # stage 2
    labeled = [
        (r["doc_id"], r["text"], 1 if r["lang"] == "en" else 0) for r in url_ok
    ]
    model = CLS.train_sequential(
        labeled, n_features=n_features, iters=iters, lr=lr
    )
    half = SEL.FIXED_SCALE // 2
    quality = [
        r
        for r in url_ok
        if CLS.score_doc(r["text"], model.weights, model.bias, n_features)[0]
        >= half
    ]
    # stage 3
    best: dict[object, int] = {}
    for r in quality:
        t = r["text"]
        # None mirrors Spark's NULL fingerprint group (distinct from '')
        f = (
            None
            if t is None
            else hashlib.md5(t.strip(" ").lower().encode("utf-8")).hexdigest()
        )
        if f not in best or r["doc_id"] < best[f]:
            best[f] = r["doc_id"]
    keep_ids = set(best.values())
    unique = [r for r in quality if r["doc_id"] in keep_ids]
    # stage 4
    def counts(rs):
        out: dict[int, int] = {}
        for r in rs:
            for g in SEL.ngram_strings(r["text"]):
                b = SEL.bucket_of(g, n_buckets)
                out[b] = out.get(b, 0) + 1
        return out

    t_counts = counts([r for r in unique if r["lang"] == "en"])
    r_counts = counts(unique)
    ratios = SEL.fixed_log_ratios(t_counts, r_counts, n_buckets)
    w = SEL.score_rows_python(
        [(r["doc_id"], r["text"]) for r in unique], ratios, n_buckets
    )
    # funnel rows
    sources = sorted({r["source"] for r in rows})
    out = []
    for s in sources:
        u = [r for r in unique if r["source"] == s]
        out.append(
            (
                s,
                sum(1 for r in rows if r["source"] == s),
                sum(1 for r in url_ok if r["source"] == s),
                sum(1 for r in quality if r["source"] == s),
                len(u),
                sum(w[r["doc_id"]] for r in u),
            )
        )
    return out


def urlfilter_python_flags(
    url: str, blocked_domains: "set[str]"
) -> "dict[str, bool]":
    """Pure-Python twin of ``urlfilter.url_flags`` + the blocklist join
    (same regexes — all constructs Java regex and Python re share)."""
    import re

    lower = url.lower()
    m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", lower)
    host = m.group(1) if m else ""
    dom = re.sub(r"^www\.", "", re.sub(r":[0-9]+$", "", host))
    mp = re.match(r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", lower)
    path = mp.group(1) if mp else ""
    tld_m = re.search(r"\.([a-z0-9-]+)$", dom)
    ext_m = re.search(r"\.([a-z0-9]+)$", path)
    if "?" in lower:
        n_params = len(lower.rsplit("?", 1)[1].split("&"))
    else:
        n_params = 0
    return {
        "blocked_domain": dom in blocked_domains,
        "ip_host": bool(
            re.match(
                r"^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}(:[0-9]+)?$",
                host,
            )
        ),
        "bad_tld": (tld_m.group(1) if tld_m else "") in U.DEFAULT_BAD_TLDS,
        "bad_extension": (ext_m.group(1) if ext_m else "")
        in U.DEFAULT_BAD_EXTENSIONS,
        "excess_params": n_params > U.DEFAULT_MAX_QUERY_PARAMS,
        "blocked_word": any(w in lower for w in U.DEFAULT_BLOCKED_WORDS),
    }
