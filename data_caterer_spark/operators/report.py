"""Run-result reporting — the reference's result-writer surface
(``DataGenerationResultWriter`` + ``ResultHtmlWriter``; models at
``app/.../model/ResultModels.scala:36-51``) as JSON + markdown artifacts.

No HTML templating: the consumers of a 10^12-row run are dashboards and
CI, so the machine artifact is JSON and the human artifact is markdown.
"""

from __future__ import annotations

import json
import time
from typing import Sequence

from .validation import ValidationResult


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
