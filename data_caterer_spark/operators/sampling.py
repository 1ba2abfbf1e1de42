"""Deterministic hash-based sampling — train-set curation operators.

A 100 TB training-data pipeline samples by HASH, not by RNG: the sample
must be reproducible across retries/backfills, stable under repartition,
and consistent at the unit-of-leakage level (every turn of a conversation
lands in the same split, or eval rows leak into train).  ``rand(seed)``
gives none of that — its draw depends on row position within a partition.

All operators here filter on ``md5(salt || key)``: a pure projection +
filter, no shuffle, no state — Catalyst pushes it into the scan, and the
same expression is valid ANSI SQL, so every sample is DuckDB-verifiable
(the driver's correctness gate) with no golden replay needed.

The threshold trick: the first 8 hex chars of the digest are a uniform
draw from 16^8 values; lexicographic comparison of lowercase hex equals
numeric comparison, so ``substr(md5(k), 1, 8) < hex(fraction * 16^8)``
keeps an (asymptotically) ``fraction`` share, deterministically per key.

Reference parity note: data-caterer has no sampling surface (its Count
generators draw row counts, ``PlanModels.scala:53-63``); this module is
part of the beyond-reference training-pipeline surface the build brief
asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: field separator for multi-column keys (never appears in the data's ids)
_SEP = "\x1f"


#: threshold strictly above every 8-hex-char bucket — fraction >= 1.0 keeps
#: ALL keys (a clamp to 'ffffffff' with a strict '<' compare would silently
#: drop the ~2^-32 of keys hashing exactly to the max bucket)
_KEEP_ALL = "g"


def fraction_threshold(fraction: float) -> str:
    """``fraction`` in [0, 1] -> lowercase hex threshold for a strict ``<``
    compare against the first 8 digest chars.  ``fraction >= 1.0`` returns a
    sentinel that sorts after every hex string, so 1.0 is exactly the
    identity sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return _KEEP_ALL
    # clamp guards float rounding for fractions infinitesimally below 1.0
    return format(min(int(fraction * 16**8), 16**8 - 1), "08x")


def hash_bucket(cols: list[str], seed: int = 42) -> Column:
    """First 8 hex chars of md5(seed || key columns) — the uniform draw."""
    key = F.concat_ws(_SEP, F.lit(str(seed)), *[F.col(c).cast("string") for c in cols])
    return F.substring(F.md5(key), 1, 8)


def hash_sample(
    df: DataFrame, cols: list[str], fraction: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed by ``cols``.

    Rows with equal keys are kept or dropped together — sample at the
    conversation/document level by passing the id column, not the row."""
    return df.where(hash_bucket(cols, seed) < F.lit(fraction_threshold(fraction)))


def with_split(
    df: DataFrame,
    cols: list[str],
    test_fraction: float = 0.1,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment, leakage-safe by construction:
    the split is a pure function of the key columns, so every row sharing
    a key (every turn of a conversation) lands in the same split — on any
    cluster size, in any run."""
    is_test = hash_bucket(cols, seed) < F.lit(fraction_threshold(test_fraction))
    return df.withColumn(
        out_col, F.when(is_test, F.lit("test")).otherwise(F.lit("train"))
    )


def temperature_fractions(
    counts: "dict[str, int]", alpha: float = 0.7
) -> "dict[str, float]":
    """Per-stratum keep fractions for temperature-based mixing.

    Multilingual-LM practice (public: the mBERT / XLM-R exponential-
    smoothing recipe): target shares ``q_i ∝ n_i^alpha`` flatten a skewed
    source distribution (alpha=1 keeps natural proportions, alpha->0
    approaches uniform).  A filtering pipeline can only DOWNSAMPLE, so
    keep fractions are ``f_i = n_i^(alpha-1)`` scaled so the most
    downweighted-per-row stratum keeps 1.0 — the largest mix achieving
    the target proportions without replication."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    ratio = {k: n ** (alpha - 1.0) for k, n in counts.items() if n > 0}
    if not ratio:
        return {}
    m = max(ratio.values())
    return {k: min(1.0, r / m) for k, r in ratio.items()}


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    key_cols: list[str],
    alpha: float = 0.7,
    seed: int = 42,
) -> "tuple[DataFrame, dict[str, float]]":
    """Deterministic temperature-mixed sample: one tiny count aggregate
    to size the strata (driver-side — strata are languages/sources, a
    bounded set), then ONE scan filtered by the per-stratum md5 threshold
    (:func:`stratified_hash_sample`).  Returns (sampled df, fractions)."""
    counts = {
        r[stratum_col]: r["count"]
        for r in df.groupBy(stratum_col).count().collect()
        if r[stratum_col] is not None
    }
    fracs = temperature_fractions(counts, alpha)
    return (
        stratified_hash_sample(df, stratum_col, fracs, key_cols, seed=seed),
        fracs,
    )


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix curator
    ("20% of code, 5% of chat, ...").  One scan, no shuffle: the stratum
    picks a threshold (a small CASE), the key hash draws against it.
    Strata not listed in ``fractions`` keep ``default_fraction``."""
    thr: Column = F.lit(fraction_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.where(hash_bucket(key_cols, seed) < thr)


def mix_plan(
    df: DataFrame,
    budget_tokens: int,
    weights: "dict[str, int] | None" = None,
    max_epochs: int = 2,
    stratum_col: str = "source",
    token_count_col: "Column | None" = None,
) -> DataFrame:
    """Training-data recipe planner: given a total token budget and target
    mix weights (parts; uniform when None), compute each source's planned
    token allocation, capped at ``max_epochs`` passes over what the
    source actually has (the Chinchilla/LLaMA-style repeat cap).

    ONE tiny combinable aggregate (|sources| rows) then driver-free
    integer arithmetic in the projection: ``target = budget * w / W``
    (integer div), ``planned = least(target, max_epochs * available)``,
    ``fill_ratio = planned / target``.  Everything cross-row is int64, so
    the plan is exact on any cluster size — floats appear only in the
    final rounded ratio."""
    from pyspark.sql import functions as F

    from ..functions import text as T

    tok = (
        token_count_col
        if token_count_col is not None
        else T.token_count("text")
    )
    counts = df.groupBy(stratum_col).agg(
        F.sum(tok).cast("long").alias("tokens")
    )
    if weights is None:
        w_col, total_w = F.lit(1).cast("long"), None
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        w_col, total_w = mapping[F.col(stratum_col)].cast("long"), sum(
            weights.values()
        )
    counts = counts.withColumn("__w", w_col)
    if total_w is None:
        # uniform: W = number of strata (tiny cross-row count)
        total = counts.agg(F.count(F.lit(1))).collect()[0][0]
    else:
        total = total_w
    target = F.expr(f"{int(budget_tokens)} * __w div {int(total)}")
    planned = F.least(target, F.lit(int(max_epochs)) * F.col("tokens"))
    return counts.select(
        stratum_col,
        "tokens",
        target.cast("long").alias("target_tokens"),
        planned.cast("long").alias("planned_tokens"),
        F.round(
            planned.cast("double") / target.cast("double"), 6
        ).alias("fill_ratio"),
    )


def bottom_k_sample(
    df: DataFrame, cols: list[str], k: int, seed: int = 42
) -> DataFrame:
    """Exact-size uniform sample WITHOUT replacement: the k rows whose
    key hash is smallest (a bottom-k sketch — the distributed,
    deterministic equivalent of one-pass reservoir sampling).

    Vitter's Algorithm R is inherently sequential (state = the running
    reservoir); the bottom-k spelling commutes — each task carries only
    its local k smallest (Spark plans the orderBy+limit as
    TakeOrderedAndProject, never a global sort), merges are order-free,
    and the result is identical on 1 core or 1000 executors, across
    reruns and input re-partitioning.  ``fraction``-style hash sampling
    (:func:`hash_sample`) gives a binomial size; bottom-k gives exactly
    ``min(k, n)`` rows.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return (
        df.withColumn("__draw", hash_bucket(cols, seed))
        .orderBy("__draw", *cols)
        .limit(k)
        .drop("__draw")
    )
