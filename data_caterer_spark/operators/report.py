"""Run-result reporting — the reference's result-writer surface
(``DataGenerationResultWriter`` + ``ResultHtmlWriter``; models at
``app/.../model/ResultModels.scala:7-51``) as JSON + markdown + HTML
artifacts.

Model mapping (ResultModels.scala):
* ``SinkResult``   (:36-51) -> :class:`SinkResult` — per-sink name/format/
  save-mode/options/count/success/sample/duration.
* ``StepResultSummary`` (:29-34) -> :class:`StepResult` — per-step record
  count + success + its sink results.
* run report = overview (plan summary, ResultHtmlWriter.planSummary) +
  step/sink tables (stepsSummary/dataSourceDetails) + validation tables
  (validations/validationSummary).

The machine artifact is JSON (dashboards/CI over a 10^12-row run), the
human artifacts are markdown and a dependency-free static HTML page.
"""

from __future__ import annotations

import html as _html
import json
import time
from dataclasses import dataclass, field as dc_field
from typing import Any, Sequence

from .validation import ValidationResult


@dataclass
class SinkResult:
    """ResultModels.scala:36-51 (sans JVM-isms)."""

    name: str
    format: str
    save_mode: str = "append"
    options: dict[str, str] = dc_field(default_factory=dict)
    count: int = -1
    is_success: bool = True
    sample: Sequence[str] = ()
    duration_s: float = 0.0
    exception: str | None = None


@dataclass
class StepResult:
    """StepResultSummary (ResultModels.scala:29-34).

    ``fields`` carries the per-step generator table the reference's HTML
    report renders (ResultHtmlWriter's step pages: field name, type,
    generator kind, options); ``duration_s`` the step's wall-clock."""

    step: str
    num_records: int
    is_success: bool
    sinks: Sequence[SinkResult] = ()
    fields: Sequence[dict] = ()
    duration_s: float = 0.0


def _compact_value(v, width: int = 36) -> str:
    s = repr(v) if isinstance(v, str) else str(v)
    return s if len(s) <= width else s[: width - 1] + "…"


def field_summary(spec, samples: "Sequence | None" = None) -> dict:
    """One generator-table row for a FieldSpec (kind + compact options).

    ``samples`` — a few ACTUAL generated values for the field
    (ResultHtmlWriter's step pages render sampled data per field, not
    just the spec); compacted into one display string."""
    if spec.static is not None:
        kind, opts = "static", repr(spec.static)
    elif spec.sql is not None:
        kind, opts = "sql", spec.sql
    elif spec.expression is not None:
        kind, opts = "expression", spec.expression
    elif spec.regex is not None or spec.type == "regex":
        kind, opts = "regex", spec.regex or ""
    elif spec.one_of is not None or spec.type == "oneOf":
        vals = list(spec.one_of or [])
        kind = "oneOf"
        opts = ", ".join(str(v) for v in vals[:8]) + (
            ", ..." if len(vals) > 8 else ""
        )
    elif spec.type == "struct":
        kind = "struct"
        opts = ", ".join(f.name for f in (spec.fields or []))
    elif spec.type == "array":
        kind = "array"
        opts = (
            f"{spec.element.type if spec.element else 'string'}"
            f"[{spec.array_min_len}..{spec.array_max_len}]"
        )
    elif spec.type == "string":
        kind, opts = "random", f"len {spec.min_len}..{spec.max_len}"
    elif spec.stddev is not None and spec.mean is not None:
        kind, opts = "random", f"normal(mean={spec.mean}, stddev={spec.stddev})"
    else:
        kind, opts = "random", f"{spec.min}..{spec.max}"
    return {
        "name": spec.name,
        "type": spec.type,
        "generator": kind,
        "options": opts,
        "null_prob": spec.null_prob,
        "seed": spec.seed,
        "sample_values": (
            ""
            if samples is None
            else ", ".join(_compact_value(v) for v in samples)
        ),
    }


def run_report_dict(
    plan_name: str,
    steps: Sequence[StepResult],
    validations: Sequence[ValidationResult] = (),
) -> dict:
    """Overview + per-step/sink + validation sections (the
    ResultHtmlWriter index/overview page as data)."""
    return {
        "plan": plan_name,
        "generated_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "overview": {
            "num_steps": len(steps),
            # count-disabled steps carry the reference's -1 marker: sum
            # only counted steps; all-disabled propagates the marker
            "num_records": (
                sum(s.num_records for s in steps if s.num_records >= 0)
                if any(s.num_records >= 0 for s in steps)
                else -1
            ),
            "is_success": all(s.is_success for s in steps)
            and all(v.is_success for v in validations),
            "total_duration_s": round(
                sum(sk.duration_s for s in steps for sk in s.sinks), 3
            ),
        },
        "steps": [
            {
                "step": s.step,
                "num_records": s.num_records,
                "is_success": s.is_success,
                "duration_s": s.duration_s,
                # SparkRecordListener.scala:7-23 parity: per-step rows/sec.
                # num_records < 0 is the reference's count-disabled marker
                # (RunFlags.enable_count=False) — suppress, don't render a
                # negative rate
                "rows_per_sec": (
                    round(s.num_records / s.duration_s, 1)
                    if s.duration_s > 0 and s.num_records >= 0
                    else None
                ),
                "fields": list(s.fields),
                "sinks": [
                    {
                        "name": k.name,
                        "format": k.format,
                        "save_mode": k.save_mode,
                        "options": dict(k.options),
                        "count": k.count,
                        "is_success": k.is_success,
                        "sample": list(k.sample)[:5],
                        "duration_s": k.duration_s,
                        "exception": k.exception,
                    }
                    for k in s.sinks
                ],
            }
            for s in steps
        ],
        "validation": validation_report_dict(list(validations))
        if validations
        else None,
    }


def run_report_markdown(
    plan_name: str,
    steps: Sequence[StepResult],
    validations: Sequence[ValidationResult] = (),
) -> str:
    d = run_report_dict(plan_name, steps, validations)
    o = d["overview"]
    lines = [
        f"# Run report — {d['plan']}",
        "",
        f"{'SUCCESS' if o['is_success'] else '**FAILURE**'} — "
        f"{o['num_records']} records across {o['num_steps']} steps in "
        f"{o['total_duration_s']}s, generated {d['generated_at']}",
        "",
        "| step | records | status | sinks |",
        "| --- | --- | --- | --- |",
    ]
    for s in d["steps"]:
        sinks = ", ".join(
            f"{k['name']}({k['format']}/{k['save_mode']})" for k in s["sinks"]
        )
        lines.append(
            f"| {s['step']} | {s['num_records']} | "
            f"{'PASS' if s['is_success'] else '**FAIL**'} | {sinks} |"
        )
    if d["validation"]:
        lines += ["", validation_report_markdown(list(validations))]
    return "\n".join(lines) + "\n"


def _html_table(headers: list[str], rows: list[list[Any]]) -> str:
    head = "".join(f"<th>{_html.escape(str(h))}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{_html.escape(str(c))}</td>" for c in r) + "</tr>"
        for r in rows
    )
    return f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"


def run_report_html(
    plan_name: str,
    steps: Sequence[StepResult],
    validations: Sequence[ValidationResult] = (),
) -> str:
    """Static single-file HTML (ResultHtmlWriter.index/overview analog:
    overview cards, step summary, sink details, validation table — no
    external JS/CSS)."""
    d = run_report_dict(plan_name, steps, validations)
    o = d["overview"]
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        f"<title>Run report — {_html.escape(d['plan'])}</title>",
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse;margin:1em 0}"
        "td,th{border:1px solid #999;padding:4px 8px}"
        ".ok{color:green}.bad{color:red}</style></head><body>",
        f"<h1>Run report — {_html.escape(d['plan'])}</h1>",
        f"<p class='{'ok' if o['is_success'] else 'bad'}'>"
        f"{'&#9989; SUCCESS' if o['is_success'] else '&#10060; FAILURE'} — "
        f"{o['num_records']} records, {o['num_steps']} steps, "
        f"{o['total_duration_s']}s — {d['generated_at']}</p>",
        "<h2>Steps</h2>",
        _html_table(
            ["step", "records", "status"],
            [
                [s["step"], s["num_records"], "PASS" if s["is_success"] else "FAIL"]
                for s in d["steps"]
            ],
        ),
        "<h2>Sinks</h2>",
        _html_table(
            ["step", "sink", "format", "save mode", "count", "duration (s)", "status"],
            [
                [s["step"], k["name"], k["format"], k["save_mode"], k["count"],
                 k["duration_s"], "OK" if k["is_success"] else "FAIL"]
                for s in d["steps"]
                for k in s["sinks"]
            ],
        ),
    ]
    # per-step generator tables (ResultHtmlWriter step pages)
    gen_steps = [s for s in d["steps"] if s.get("fields")]
    if gen_steps:
        parts.append("<h2>Generators</h2>")
        for s in gen_steps:
            parts.append(f"<h3>{_html.escape(s['step'])}</h3>")
            parts.append(
                _html_table(
                    ["field", "type", "generator", "options", "null prob",
                     "seed", "sample values"],
                    [
                        [f["name"], f["type"], f["generator"], f["options"],
                         f["null_prob"], "" if f["seed"] is None else f["seed"],
                         f.get("sample_values", "")]
                        for f in s["fields"]
                    ],
                )
            )
    # duration breakdown (steps + sinks)
    parts += [
        "<h2>Durations</h2>",
        _html_table(
            ["step", "step wall (s)", "sink wall (s)"],
            [
                [s["step"], s["duration_s"],
                 round(sum(k["duration_s"] for k in s["sinks"]), 3)]
                for s in d["steps"]
            ],
        ),
    ]
    if d["validation"]:
        v = d["validation"]
        parts += [
            "<h2>Validations</h2>",
            _html_table(
                ["rule", "description", "status", "errors", "total",
                 "threshold"],
                [
                    [r["rule_id"], r.get("description", ""),
                     "PASS" if r["is_success"] else "FAIL",
                     r["num_errors"], r["total"],
                     r.get("error_threshold", "")]
                    for r in v["results"]
                ],
            ),
        ]
        # sample errors for failed rules (ResultHtmlWriter's error pages)
        failed = [
            r for r in v["results"]
            if not r["is_success"] and r.get("sample_errors")
        ]
        if failed:
            parts.append("<h2>Sample errors</h2>")
            for r in failed:
                parts.append(f"<h3>{_html.escape(r['rule_id'])}</h3>")
                samples = r["sample_errors"][:5]
                cols = sorted({k for s_ in samples for k in s_})
                parts.append(
                    _html_table(
                        cols,
                        [[s_.get(c, "") for c in cols] for s_ in samples],
                    )
                )
    parts.append("</body></html>")
    return "".join(parts)


def write_run_report(
    plan_name: str,
    steps: Sequence[StepResult],
    out_dir: str,
    validations: Sequence[ValidationResult] = (),
) -> dict[str, str]:
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    artifacts = {
        "json": json.dumps(
            run_report_dict(plan_name, steps, validations), indent=2, default=str
        ),
        "md": run_report_markdown(plan_name, steps, validations),
        "html": run_report_html(plan_name, steps, validations),
    }
    for ext, content in artifacts.items():
        p = os.path.join(out_dir, f"{plan_name}.{ext}")
        with open(p, "w") as f:
            f.write(content)
        paths[ext] = p
    return paths


def validation_report_dict(
    results: Sequence[ValidationResult], name: str = "validation"
) -> dict:
    return {
        "name": name,
        "generated_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "total_rules": len(results),
        "passed": sum(1 for r in results if r.is_success),
        "failed": sum(1 for r in results if not r.is_success),
        "results": [
            {
                "rule_id": r.rule_id,
                "is_success": r.is_success,
                "num_errors": r.num_errors,
                "total": r.total,
                "error_rate": round(r.num_errors / r.total, 6) if r.total else 0.0,
                "description": r.description,
                "sample_errors": r.sample_errors[:5],
            }
            for r in results
        ],
    }


def validation_report_markdown(
    results: Sequence[ValidationResult], name: str = "validation"
) -> str:
    d = validation_report_dict(results, name)
    lines = [
        f"# Validation report — {d['name']}",
        "",
        f"{d['passed']}/{d['total_rules']} rules passed "
        f"({d['failed']} failed), generated {d['generated_at']}",
        "",
        "| rule | status | errors | total | error rate |",
        "| --- | --- | --- | --- | --- |",
    ]
    for r in d["results"]:
        status = "PASS" if r["is_success"] else "**FAIL**"
        lines.append(
            f"| {r['rule_id']} | {status} | {r['num_errors']} | "
            f"{r['total']} | {r['error_rate']} |"
        )
    failed = [r for r in d["results"] if not r["is_success"] and r["sample_errors"]]
    if failed:
        lines.append("")
        lines.append("## Sample errors")
        for r in failed:
            lines.append(f"### {r['rule_id']}")
            for s in r["sample_errors"]:
                lines.append(f"- `{json.dumps(s, default=str)[:300]}`")
    return "\n".join(lines) + "\n"


def write_reports(
    results: Sequence[ValidationResult],
    out_dir: str,
    name: str = "validation",
) -> tuple[str, str]:
    import os

    os.makedirs(out_dir, exist_ok=True)
    jpath = os.path.join(out_dir, f"{name}.json")
    mpath = os.path.join(out_dir, f"{name}.md")
    with open(jpath, "w") as f:
        json.dump(validation_report_dict(results, name), f, indent=2, default=str)
    with open(mpath, "w") as f:
        f.write(validation_report_markdown(results, name))
    return jpath, mpath
