"""PII provenance and template-turn detection (transcript-native ops)."""

import pyspark.sql.functions as F

from data_caterer_spark.operators.dedup import template_turn_counts
from data_caterer_spark.operators.privacy import pii_provenance


def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def test_pii_provenance_planted_echo(spark):
    df = _conv(
        spark,
        [
            ("c1", 0, "user", "reach me at jane@example.com please"),
            ("c1", 1, "assistant", "noted: jane@example.com it is"),
            ("c1", 2, "user", "thanks"),
            # assistant introduces PII itself -> NOT an echo
            ("c2", 0, "assistant", "call +1 555-123-4567 for support"),
            ("c2", 1, "user", "ok"),
            # user mentions AFTER assistant -> still not an echo
            ("c3", 0, "assistant", "my ip is 10.0.0.1"),
            ("c3", 1, "user", "mine is 10.0.0.2"),
            ("c4", 0, "user", None),
        ],
    )
    got = {
        (r["conv_id"], r["kind"]): r
        for r in pii_provenance(df).collect()
    }
    assert set(got) == {
        ("c1", "pii_email"),
        ("c2", "pii_phone"),
        ("c3", "pii_ip"),
    }
    e = got[("c1", "pii_email")]
    assert (
        e["first_turn_idx"],
        e["first_role"],
        e["n_turns"],
        e["echoed_by_assistant"],
    ) == (0, "user", 2, True)
    assert not got[("c2", "pii_phone")]["echoed_by_assistant"]
    ip = got[("c3", "pii_ip")]
    assert ip["n_turns"] == 2 and not ip["echoed_by_assistant"]


def test_pii_provenance_plan_has_no_window_or_python(spark):
    df = _conv(spark, [("c", 0, "user", "a@b.co")])
    plan = (
        pii_provenance(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_template_turn_counts(spark):
    canned = "I'm sorry, I can't help with that."
    rows = []
    for i in range(4):
        rows.append((f"c{i}", 0, "user", f"unique question {i} here"))
        rows.append((f"c{i}", 1, "assistant", canned))
    rows.append(("c0", 2, "assistant", canned))  # repeat inside c0
    rows.append(("c5", 0, "user", None))
    got = {
        r["conv_id"]: (r["n_turns"], r["n_template_turns"])
        for r in template_turn_counts(_conv(spark, rows), min_convs=3).collect()
    }
    assert got == {
        "c0": (3, 2),
        "c1": (2, 1),
        "c2": (2, 1),
        "c3": (2, 1),
        "c5": (1, 0),
    }


def test_template_bank_requires_distinct_convs(spark):
    # 5 repeats inside ONE conversation never reach min_convs=3
    rows = [("c0", i, "user", "same text") for i in range(5)]
    rows.append(("c1", 0, "user", "same text"))
    got = {
        r["conv_id"]: r["n_template_turns"]
        for r in template_turn_counts(_conv(spark, rows), min_convs=3).collect()
    }
    assert got == {"c0": 0, "c1": 0}
