"""The quality-filter pipeline: one staged DataFrame plan per BASELINE
north_star —

    scan → conversation window features → JVM text features
         → langid (pandas UDF, broadcast model)
         → perplexity (pandas UDF, broadcast table)
         → heuristic RuleSet (pure Catalyst)
         → regex scrub (JVM regexp_replace chain)
         → keep / rule_hits / scrubbed_text

Stage boundaries are chosen so Arrow crosses the JVM↔Python fence exactly
ONCE (the fused langid+perplexity stage, ``functions/scoring.py``);
everything else stays inside whole-stage codegen.  Rule ids, thresholds, and evaluation order are the single source
of truth shared with the pure-Python reference labeler
(``data_caterer_spark.labeler``), which replays the same rules row-by-row —
the byte-equality / F1 criterion compares the two.

Reference lineage: each heuristic rule is a data-caterer validation-DSL
predicate (cited per rule below, ``ValidationBuilder.scala``); the
keep/drop reframing is SURVEY.md §2.2.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.langid import with_language  # noqa: F401 (single-model path)
from ..functions.perplexity import with_perplexity  # noqa: F401
from ..functions.scoring import with_model_scores
from ..functions.scrub import scrub_columns, scrub_udf
from ..functions.textcore import LangIdModel, PerplexityModel
from ..operators.rules import Rule, RuleSet, expr_rule
from ..operators.windows import (
    stable_order,
    with_conversation_stats,
    with_turn_order_features,
)

TOXICITY_RULE_ID = "toxicity"


@dataclass(frozen=True)
class QualityFilterConfig:
    """All thresholds in one place; shared by pipeline and labeler."""

    min_chars: int = 1
    max_chars: int = 8000
    min_tokens: int = 1
    max_rep_ratio: float = 0.6
    max_symbol_ratio: float = 0.3
    char_run: int = 10
    allowed_roles: tuple[str, ...] = ("assistant", "system", "tool", "user")
    keep_langs: tuple[str, ...] = ("en",)
    max_ppl: float = 5000.0
    salt_buckets: int = 16
    drop_on_toxicity: bool = True
    use_udf_scrub: bool = False  # pandas-UDF scrub instead of JVM chain
    with_conv_stats: bool = False  # salted per-conversation aggregates


class QualityFilterPipeline:
    def __init__(
        self,
        config: QualityFilterConfig | None = None,
        langid_model: LangIdModel | None = None,
        ppl_model: PerplexityModel | None = None,
    ):
        self.config = config or QualityFilterConfig()
        self.langid_model = langid_model
        self.ppl_model = ppl_model

    # ------------------------------------------------------------------
    def with_features(self, df: DataFrame) -> DataFrame:
        """JVM text features (token-shared staged projection), then window
        features.  Text features come FIRST so the conv_id exchange
        materializes them — nothing downstream re-tokenizes, and the
        shuffle rows carry compact numerics instead of recomputed HOFs."""
        df = T.with_text_features(df, char_run=self.config.char_run)
        df = with_turn_order_features(df)
        if self.config.with_conv_stats:
            df = with_conversation_stats(df, salt_buckets=self.config.salt_buckets)
        return df

    # ------------------------------------------------------------------
    def heuristic_rules(self) -> RuleSet:
        """The data-caterer-derived rule bank over feature columns.

        severity 'drop' rules decide keep; 'flag' rules only record hits.
        NULL evaluation is never a hit (WHERE semantics, rules.py).
        """
        c = self.config
        roles = ", ".join(f"'{r}'" for r in c.allowed_roles)
        langs = ", ".join(f"'{l}'" for l in c.keep_langs)
        return RuleSet(
            [
                # isNotNull (ValidationBuilder.scala:216-222)
                expr_rule("text_non_null", "ISNOTNULL(text)"),
                # length between (size rules :312-334 applied to strings)
                expr_rule(
                    "len_in_range",
                    f"n_chars BETWEEN {c.min_chars} AND {c.max_chars}",
                ),
                expr_rule("min_tokens", f"n_tokens >= {c.min_tokens}"),
                # between (:264-278) on derived ratios
                expr_rule("rep_ratio_max", f"rep_ratio <= {c.max_rep_ratio}"),
                expr_rule(
                    "symbol_ratio_max", f"symbol_ratio <= {c.max_symbol_ratio}"
                ),
                # notMatches (:288-294) — repeated-char runs
                expr_rule("no_char_run", "!(has_char_run)"),
                # in (:280-286)
                expr_rule("role_valid", f"ISNOTNULL(role) AND role IN ({roles})"),
                # isEqualCol-style consistency (:200-206)
                expr_rule(
                    "tool_consistent", "(role == 'tool') == ISNOTNULL(tool)"
                ),
                expr_rule("lang_keep", f"lang IN ({langs})"),
                expr_rule("ppl_max", f"ppl <= {c.max_ppl}"),
                # cross-turn rules (flag-only): new-build windows, SURVEY §2.5
                expr_rule(
                    "role_alternation",
                    "!(role == prev_role AND role IN ('user', 'assistant'))",
                ).flag_only(),
                expr_rule(
                    "turn_contiguous",
                    "(ISNULL(prev_turn_idx) AND turn_idx == 0) "
                    "OR turn_idx == prev_turn_idx + 1",
                ).flag_only(),
                expr_rule(
                    "ts_monotone", "ISNULL(prev_ts) OR ts >= prev_ts"
                ).flag_only(),
            ]
        )

    # ------------------------------------------------------------------
    def run(self, df: DataFrame, ordered: bool = False) -> DataFrame:
        """Full pipeline.  Adds: prev_* window cols, feature cols, lang,
        lang_score, ppl, rule_hits, keep, scrubbed_text, scrub_hits."""
        cfg = self.config
        df = self.with_features(df)
        # both models in ONE Arrow crossing (functions/scoring.py) —
        # outputs byte-identical to the two single-model stages
        df = with_model_scores(
            df, langid_model=self.langid_model, ppl_model=self.ppl_model
        )
        rules = self.heuristic_rules()
        df = df.withColumn("heur_hits", rules.hits_column())
        if cfg.use_udf_scrub:
            df = df.withColumn("__scrub", scrub_udf()(F.col("text"))).withColumns(
                {
                    "scrubbed_text": F.col("__scrub.scrubbed_text"),
                    "scrub_hits": F.col("__scrub.scrub_hits"),
                }
            ).drop("__scrub")
        else:
            df = scrub_columns(df)
        # total rule_hits order: heuristic bank order, then scrub bank order
        df = df.withColumn("rule_hits", F.concat("heur_hits", "scrub_hits"))
        keep = rules.keep_column(F.col("heur_hits"))
        if cfg.drop_on_toxicity:
            keep = keep & ~F.array_contains("scrub_hits", TOXICITY_RULE_ID)
        df = df.withColumn("keep", keep).drop("heur_hits")
        if ordered:
            df = stable_order(df)
        return df

    # ------------------------------------------------------------------
    def metrics(self, labeled: DataFrame) -> DataFrame:
        """Rule-hit metrics sidecar rows (reference analog:
        ``ValidationResult``/``SinkResult`` summaries, ResultModels.scala:
        36-51).  One aggregate pass: totals + per-rule hit counts."""
        totals = labeled.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_if(F.col("keep")).alias("kept"),
        ).withColumn("rule_id", F.lit("__total__"))
        per_rule = (
            labeled.select(F.explode("rule_hits").alias("rule_id"))
            .groupBy("rule_id")
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("kept", F.lit(None).cast("long"))
        )
        return totals.select("rule_id", "rows", "kept").unionByName(
            per_rule.select("rule_id", "rows", "kept")
        )
