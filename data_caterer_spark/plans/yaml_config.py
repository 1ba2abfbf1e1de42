"""YAML front door — the reference's entry point 1.

data-caterer drives runs from YAML plans parsed into model objects
(``PlanParser.scala:16-31``, ``YamlFileParser.scala:19-37``; validation
YAML shape at ``app/src/test/resources/sample/validation/
simple-validation.yaml:8-13``).  This loader gives the same two front
doors / one compiled plan property (SURVEY.md §3): a YAML document builds
the exact same ``Rule`` / ``RuleSet`` / ``QualityFilterConfig`` objects
the Python API builds.

Document shape::

    name: transcript-quality
    config:                      # QualityFilterConfig overrides
      max_chars: 8000
      keep_langs: [en]
    rules:                       # per-row keep/drop rules
      - id: text_non_null
        field: text
        op: is_not_null
      - id: len_range
        field: text
        op: length_between
        args: [1, 8000]
      - id: no_placeholder
        expr: "text NOT LIKE '%TODO%'"
        severity: flag           # drop (default) | flag
        error_threshold: 0.05    # dataset-QA budget (reference semantics)
    validations:                 # dataset-level checks (reference subtypes)
      - field: conv_id
        op: is_not_null
      - group_by: [conv_id]
        agg: count
        expr: "count <= 100000"

``op`` names are the FieldRules method names; ``args`` feeds positional
arguments.  Unknown ops fail loudly at load time, matching the
reference's parse-time validation.
"""

from __future__ import annotations

from dataclasses import fields as dc_fields
from typing import Any

import yaml

from ..operators.rules import FieldRules, Rule, RuleSet, expr_rule, field
from .pipeline import QualityFilterConfig


class YamlPlanError(ValueError):
    pass


def _build_rule(spec: dict[str, Any]) -> Rule:
    severity_flag = spec.get("severity", "drop") == "flag"
    threshold = spec.get("error_threshold")
    if "expr" in spec:
        rule = expr_rule(spec.get("id", "expr_rule"), spec["expr"])
    else:
        try:
            fname, op = spec["field"], spec["op"]
        except KeyError as e:
            raise YamlPlanError(f"rule needs field+op or expr: {spec}") from e
        builder = field(fname)
        method = getattr(FieldRules, op, None)
        if method is None or op.startswith("_"):
            raise YamlPlanError(f"unknown rule op: {op!r}")
        args = spec.get("args", [])
        if not isinstance(args, list):
            args = [args]
        rule = method(builder, *args)
        if "id" in spec:
            rule = rule.with_id(spec["id"])
    if "description" in spec:
        rule = rule.describe(spec["description"])
    if threshold is not None:
        rule = rule.threshold(threshold)
    if severity_flag:
        rule = rule.flag_only()
    return rule


def _build_config(overrides: dict[str, Any]) -> QualityFilterConfig:
    valid = {f.name for f in dc_fields(QualityFilterConfig)}
    unknown = set(overrides) - valid
    if unknown:
        raise YamlPlanError(f"unknown config keys: {sorted(unknown)}")
    coerced = {
        k: tuple(v) if isinstance(v, list) else v for k, v in overrides.items()
    }
    return QualityFilterConfig(**coerced)


class YamlPlan:
    """Parsed plan: name, pipeline config, per-row rules, dataset checks."""

    def __init__(
        self,
        name: str,
        config: QualityFilterConfig,
        rules: RuleSet,
        validations: list[dict[str, Any]],
    ):
        self.name = name
        self.config = config
        self.rules = rules
        self.validations = validations

    def run_validations(self, df, num_sample_errors: int = 5):
        """Execute the dataset-level checks (reference validation phase)."""
        from ..operators.validation import validate_group_by, validate_rules

        results = []
        plain = [
            _build_rule(v) for v in self.validations if "group_by" not in v
        ]
        if plain:
            results.extend(validate_rules(df, plain, num_sample_errors))
        for v in self.validations:
            if "group_by" not in v:
                continue
            rule = expr_rule(v.get("id", "groupby_rule"), v["expr"])
            results.append(
                validate_group_by(
                    df,
                    v["group_by"],
                    v.get("agg_col", ""),
                    v.get("agg", "count"),
                    rule,
                    num_sample_errors,
                )
            )
        return results


def load_plan(source: str) -> YamlPlan:
    """Parse a YAML document (string or path)."""
    if "\n" not in source and source.endswith((".yaml", ".yml")):
        with open(source) as f:
            doc = yaml.safe_load(f)
    else:
        doc = yaml.safe_load(source)
    if not isinstance(doc, dict):
        raise YamlPlanError("plan document must be a mapping")
    rules = RuleSet([_build_rule(r) for r in doc.get("rules", [])])
    config = _build_config(doc.get("config", {}))
    return YamlPlan(
        name=doc.get("name", "unnamed"),
        config=config,
        rules=rules,
        validations=doc.get("validations", []),
    )
