"""Chat-format JSON rendering — the training-export shape.

After filter + scrub, a curated conversation ships as one JSON object
per line: ``{"messages":[{"role":"user","content":"..."}, ...]}`` (the
OpenAI/HF chat-jsonl convention).  The render is pure Catalyst —
``collect_list(struct)`` per conversation, ``array_sort`` on the
leading ``turn_idx`` struct field for stable order, ``to_json`` — so
the export is one combinable aggregate keyed by conv_id: no window, no
UDF, and at 10^12 turns it shuffles exactly the kept turns once.

Byte-exactness: Spark's ``to_json`` (Jackson) writes compact JSON with
minimal escaping (``"`` ``\\`` and C0 controls; non-ASCII raw UTF-8).
:func:`py_json_escape` / :func:`py_chat_json` are the sequential twin
used by the golden replay, so the oracle compares md5-of-bytes, not a
re-parse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Jackson's C0 shorthand escapes (everything else < 0x20 is \\u00XX)
_SHORTHAND = {
    "\b": "\\b",
    "\t": "\\t",
    "\n": "\\n",
    "\f": "\\f",
    "\r": "\\r",
}


def py_json_escape(s: str) -> str:
    """Jackson-compatible minimal string escape (the to_json twin)."""
    out = []
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch in _SHORTHAND:
            out.append(_SHORTHAND[ch])
        elif ch < " ":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def py_chat_json(messages: list[tuple[str, str]]) -> str:
    """Sequential twin of :func:`chat_json_column` for (role, content)
    pairs already in turn order."""
    body = ",".join(
        f'{{"role":"{py_json_escape(r)}","content":"{py_json_escape(c)}"}}'
        for r, c in messages
    )
    return f'{{"messages":[{body}]}}'


def chat_messages(
    turn_idx: str = "turn_idx",
    role: str = "role",
    content: str = "scrubbed_text",
) -> Column:
    """Aggregate expression: the conversation's (role, content) messages
    in turn order, as ``array<struct<role,content>>``.  ``array_sort``
    orders by the leading struct field (turn_idx, unique per conv), then
    the index is projected away — no window, no per-group sort exchange
    beyond the one groupBy shuffle."""
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(turn_idx), F.col(role), F.col(content)))
    )
    return F.transform(
        ordered,
        lambda m: F.struct(
            m[role].alias("role"), m[content].alias("content")
        ),
    )


def chat_json_column(messages: Column) -> Column:
    """Render the messages array as the chat-jsonl object (compact
    Jackson JSON, byte-stable vs :func:`py_chat_json`)."""
    return F.to_json(F.struct(messages.alias("messages")))


def export_chat_jsonl(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_idx: str = "turn_idx",
    role: str = "role",
    content: str = "scrubbed_text",
) -> DataFrame:
    """Curated turns -> one chat-format JSON document per conversation:
    (conv_id, n_msgs, chat_json).  Callers filter (keep, non-null
    content) first; conversations with zero surviving turns drop out of
    the export, which is the intended curation semantics."""
    msgs = chat_messages(turn_idx, role, content).alias("__m")
    return (
        df.groupBy(conv_col)
        .agg(msgs)
        .select(
            conv_col,
            F.size("__m").cast("int").alias("n_msgs"),
            chat_json_column(F.col("__m")).alias("chat_json"),
        )
    )
