"""Dataset-level validation engine.

Re-expresses the reference's three validation subtypes
(``api/.../model/ValidationModels.scala:15-37``) and their execution kernel
(``app/.../validation/ValidationOperations.scala:12-98``) Spark-first:

* expression validation  — ``ExpressionValidationOps.validate`` (:32-36)
* group-by validation    — ``GroupByValidationOps.validate``   (:38-51)
* upstream (cross-source) validation — ``UpstreamDataSourceValidationOps``
  (:53-98): read the other source, prefix its non-join columns, join
  (default ``outer``), recurse.

Scale departure from the reference: the reference runs TWO actions per rule
(`df.count()` then `errors.count()`, plus caching the whole input —
``ValidationProcessor.scala:71,112``).  At 10^12 rows that is two full scans
per rule.  Here a whole RuleSet is evaluated in ONE aggregate pass
(``count(*)`` + one conditional count per rule, map-side combined), and
error samples are fetched lazily only for failed rules via ``limit(n)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rules import Rule

# agg types supported by group-by validation, cf. reference
# ``api Constants.scala:332-337`` (sum/count/min/max/avg/stddev) + "unique".
AGG_FUNCTIONS = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "avg": F.avg,
    "stddev": F.stddev,
}

UPSTREAM_JOIN_DEFAULT = "outer"  # reference default, api Constants.scala:263
EXPR_JOIN_PREFIX = "expr:"  # reference ValidationOperations.scala:75


@dataclass
class ValidationResult:
    """Mirror of the reference result model
    (``app/.../model/ValidationModels.scala:18-24``)."""

    rule_id: str
    is_success: bool
    num_errors: int
    total: int
    description: str = ""
    sample_errors: list[dict[str, Any]] = dc_field(default_factory=list)


def _threshold_pass(num_errors: int, total: int, threshold: float | None) -> bool:
    """Pass/fail semantics from ``ValidationOperations.scala:18-29``:
    no threshold ⇒ any error fails; threshold ≥ 1 ⇒ absolute error budget;
    threshold < 1 ⇒ fraction of the dataset."""
    if num_errors == 0:
        return True
    if threshold is None:
        return False
    if threshold >= 1:
        return num_errors <= threshold
    return total > 0 and (num_errors / total) <= threshold


def validate_rules(
    df: DataFrame,
    rules: Sequence[Rule],
    num_sample_errors: int = 5,
) -> list[ValidationResult]:
    """Evaluate all rules in a single aggregate pass.

    The reference evaluates each rule as ``df.where(!(expr)).count()``
    (``ValidationOperations.scala:12-17``) against a cached input.  The
    single-pass form below is algebraically identical: WHERE keeps rows
    where the negated expression is true, i.e. rows where ``expr`` is
    exactly false are errors and NULL-valued rows are not.
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(rules):
        aggs.append(
            F.count_if(r.column == F.lit(False)).alias(f"__err_{i}")
        )
    row = df.agg(*aggs).collect()[0]
    total = row["__total"]
    failed_idx = [
        i for i in range(len(rules)) if row[f"__err_{i}"] > 0
    ]
    # Error samples for ALL failed rules in ONE extra scan (the reference
    # surfaces the first numSampleErrorRecords=5 failing rows per rule —
    # ValidationProcessor.scala:133, api Constants.scala:264 — via one
    # filtered scan per rule; at 10^12 rows x N failing rules that is N
    # scans).  The cap is enforced BEFORE any aggregation: a collect_list
    # + slice would buffer EVERY failing row per (rule, partition) group
    # in the partial-aggregate buffers — a high-failure-rate partition
    # OOMs long before the slice runs.  Instead a mapInPandas pre-pass
    # emits at most k rows per failed rule per input partition (Arrow
    # batches in, narrow, no shuffle; it stops consuming once every rule
    # has k), so the one small groupBy that follows sees at most
    # partitions x rules x k rows total.  Rows cross as to_json strings
    # (nulls kept) — sample dicts come back via json.loads, which keeps
    # JSON-representable types and renders dates/timestamps as strings.
    samples_by_rule: dict[int, list[dict[str, Any]]] = {}
    if failed_idx and num_sample_errors > 0:
        import json

        fail_arr = F.array_compact(
            F.array(
                *[
                    F.when(rules[i].column == F.lit(False), F.lit(i))
                    for i in failed_idx
                ]
            )
        )
        failing = (
            df.withColumn("__failed", fail_arr)
            .where(F.size("__failed") > 0)
            .select(
                "__failed",
                F.to_json(
                    F.struct(*df.columns), {"ignoreNullFields": "false"}
                ).alias("__js"),
            )
        )
        k = num_sample_errors
        rid_list = [int(i) for i in failed_idx]

        def _cap_per_partition(batches):
            import pandas as pd

            counts = dict.fromkeys(rid_list, 0)
            need = len(rid_list) * k
            got = 0
            for pdf in batches:
                out_rid: list[int] = []
                out_js: list[str] = []
                for fl, js in zip(pdf["__failed"], pdf["__js"]):
                    for rid in fl:
                        rid = int(rid)
                        if counts[rid] < k:
                            counts[rid] += 1
                            got += 1
                            out_rid.append(rid)
                            out_js.append(js)
                if out_rid:
                    yield pd.DataFrame({"__rid": out_rid, "__js": out_js})
                if got >= need:
                    return  # partition satisfied: stop consuming input

        capped = failing.mapInPandas(
            _cap_per_partition, "__rid int, __js string"
        )
        gathered = capped.groupBy("__rid").agg(
            F.slice(F.collect_list("__js"), 1, k).alias("__rows")
        )
        for rec in gathered.collect():
            samples_by_rule[rec["__rid"]] = [
                json.loads(s) for s in rec["__rows"]
            ]
    results = []
    for i, r in enumerate(rules):
        num_errors = row[f"__err_{i}"]
        ok = _threshold_pass(num_errors, total, r.error_threshold)
        results.append(
            ValidationResult(
                rule_id=r.rule_id,
                is_success=ok,
                num_errors=num_errors,
                total=total,
                description=r.description,
                sample_errors=samples_by_rule.get(i, []),
            )
        )
    return results


def validate_expression(
    df: DataFrame, rule: Rule, num_sample_errors: int = 5
) -> ValidationResult:
    return validate_rules(df, [rule], num_sample_errors)[0]


def group_by_validation_df(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_col: str,
    agg_type: str,
) -> DataFrame:
    """Build the aggregate DataFrame a group-by rule is applied to.

    Mirrors ``GroupByValidationOps.validate`` (``ValidationOperations.scala:
    38-51``): ``df.groupBy(cols).agg(Map(aggCol -> aggType))``; the result
    column is named ``aggType(aggCol)`` (``ValidationBuilder.scala:396``).
    Empty ``group_cols`` + count ⇒ whole-dataset row-count rule
    (``ValidationBuilder.scala:165-167``).
    """
    if agg_type == "unique":
        # unique(cols) ⇒ groupBy(cols).count, rule is `count == 1`
        # (ValidationBuilder.scala:175-178)
        return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("count"))
    if agg_type == "count" and not agg_col:
        out = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("count"))
        return out
    fn = AGG_FUNCTIONS[agg_type]
    return df.groupBy(*group_cols).agg(fn(agg_col).alias(f"{agg_type}({agg_col})"))


def validate_group_by(
    df: DataFrame,
    group_cols: Sequence[str],
    agg_col: str,
    agg_type: str,
    rule: Rule,
    num_sample_errors: int = 5,
) -> ValidationResult:
    agg_df = group_by_validation_df(df, group_cols, agg_col, agg_type)
    if agg_type == "unique" and rule is None:
        rule = Rule(rule_id="unique_" + "_".join(group_cols), expr="count == 1")
    return validate_expression(agg_df, rule, num_sample_errors)


def validate_unique(
    df: DataFrame, cols: Sequence[str], num_sample_errors: int = 5
) -> ValidationResult:
    """unique(cols): every group has exactly one row
    (``ValidationBuilder.scala:175-178``)."""
    rule = Rule(rule_id="unique_" + "_".join(cols), expr="count == 1")
    return validate_group_by(df, cols, "", "unique", rule, num_sample_errors)


def prefix_upstream(upstream: DataFrame, name: str, join_cols: Sequence[str]) -> DataFrame:
    """Prefix non-join columns of the upstream source with ``<name>_``
    (``ValidationOperations.scala:72-81``, prefix const ``api
    Constants.scala:343``)."""
    renames = {
        c: f"{name}_{c}" for c in upstream.columns if c not in set(join_cols)
    }
    return upstream.withColumnsRenamed(renames)


def upstream_join(
    df: DataFrame,
    upstream: DataFrame,
    upstream_name: str,
    join_cols: Sequence[str] | None = None,
    join_expr: str | None = None,
    join_type: str = UPSTREAM_JOIN_DEFAULT,
    broadcast_upstream: bool = False,
) -> DataFrame:
    """Join validated data against another source
    (``ValidationOperations.scala:72-88``).  ``join_expr`` covers the
    reference's ``expr:`` theta-join prefix (:75).

    Scale note the reference lacks: pass ``broadcast_upstream=True`` for
    small dimension sources to avoid a shuffle of the (huge) fact side.
    """
    if join_cols is None and join_expr is None:
        raise ValueError("one of join_cols / join_expr required")
    up = prefix_upstream(upstream, upstream_name, join_cols or [])
    if broadcast_upstream:
        up = F.broadcast(up)
    if join_expr is not None:
        return df.join(up, on=F.expr(join_expr), how=join_type)
    return df.join(up, on=list(join_cols), how=join_type)


def validate_upstream(
    df: DataFrame,
    upstream: DataFrame,
    upstream_name: str,
    rule: Rule,
    join_cols: Sequence[str] | None = None,
    join_expr: str | None = None,
    join_type: str = UPSTREAM_JOIN_DEFAULT,
    num_sample_errors: int = 5,
) -> ValidationResult:
    """Upstream validation incl. anti-join existence checks: with
    ``join_type='left_anti'`` + a dataset-count rule this is the reference's
    referential-integrity pattern
    (``ValidationConfigurationBuilderTest.scala:452-467``)."""
    joined = upstream_join(
        df, upstream, upstream_name, join_cols, join_expr, join_type
    )
    return validate_expression(joined, rule, num_sample_errors)


@dataclass
class UpstreamSpec:
    """One level of upstream joining; ``nested`` recurses — the reference's
    upstream-validation-inside-upstream-validation
    (``ValidationOperations.scala:62-67``, example
    ``PlanProcessorTest.scala:247-253``)."""

    upstream: DataFrame
    name: str
    join_cols: Sequence[str] | None = None
    join_expr: str | None = None
    join_type: str = UPSTREAM_JOIN_DEFAULT
    broadcast: bool = False
    nested: "UpstreamSpec | None" = None


def apply_upstream_chain(df: DataFrame, spec: UpstreamSpec) -> DataFrame:
    """Fold a (possibly nested) chain of upstream joins onto ``df``.

    Each level prefixes the upstream's non-join columns with its name, so
    a two-deep chain yields ``a_b_col``-style columns exactly like the
    reference's recursive rename-then-join."""
    joined = upstream_join(
        df,
        spec.upstream
        if spec.nested is None
        else apply_upstream_chain(spec.upstream, spec.nested),
        spec.name,
        spec.join_cols,
        spec.join_expr,
        spec.join_type,
        broadcast_upstream=spec.broadcast,
    )
    return joined


def validate_upstream_nested(
    df: DataFrame,
    spec: UpstreamSpec,
    rule: Rule,
    num_sample_errors: int = 5,
) -> ValidationResult:
    """Nested upstream validation: join the whole chain, then apply the
    rule to the flattened result."""
    return validate_expression(
        apply_upstream_chain(df, spec), rule, num_sample_errors
    )
