"""Deterministic transcript fixture generator (seed=42, FIXTURES.md §1).

Synthesizes the BASELINE input_hint table — ``conv_id:string,
turn_idx:int32, role:string, text:string, tool:string, ts:timestamp`` —
with planted anomalies at known rates, mirroring the reference's seeded
generation semantics: bounded seeded numerics
(``RandomDataGenerator.scala:324-382``), categorical oneOf pick
(``OneOfDataGenerator.scala:25-28``), null/edge-case injection
(``DataGenerator.scala:31-54``), regex-shaped ids
(``RegexDataGenerator.scala:17-30`` — conv ids match ``CONV[0-9]{8}``).

Everything is driver-free at generation time only for small scales
(tests/bench); at real scale the table exists in Iceberg already — the
generator is test scaffolding, not a production path.
"""

from __future__ import annotations

import datetime as dt
import random
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST

TRANSCRIPT_SCHEMA = ST.StructType(
    [
        ST.StructField("conv_id", ST.StringType(), False),
        ST.StructField("turn_idx", ST.IntegerType(), False),
        ST.StructField("role", ST.StringType(), True),
        ST.StructField("text", ST.StringType(), True),
        ST.StructField("tool", ST.StringType(), True),
        ST.StructField("ts", ST.TimestampType(), True),
    ]
)

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

# English sentence bank — deliberately DISJOINT from the langid/ppl seed
# corpora so language-ID isn't graded on memorized training text.
EN_SENTENCES = [
    "Could you explain how the cache invalidation works in this module?",
    "Sure, the cache entries expire after five minutes unless pinned.",
    "I ran the job again and it finished without any errors this time.",
    "The report shows a small increase in latency during peak hours.",
    "Let me check the configuration file and get back to you shortly.",
    "We should add a retry with exponential backoff around that call.",
    "The deployment completed and all health checks are passing now.",
    "Can you summarize the main differences between the two designs?",
    "The first design favors throughput while the second favors latency.",
    "Remember to rotate the credentials before the end of the month.",
    "I pushed a fix that handles the empty input case correctly.",
    "The customer asked whether we support exporting data as parquet.",
    "Yes, parquet export is available from the settings page today.",
    "Please review the pull request when you have a spare moment.",
    "Looks good overall, I left two small comments about naming.",
    "The meeting moved to Thursday afternoon at three o'clock.",
    "Thanks for the update, I will adjust the schedule accordingly.",
    "Searching the knowledge base for relevant troubleshooting steps.",
    "Running the requested script and collecting the output now.",
    "The query planner chose a broadcast join for the smaller table.",
]

NON_EN_SENTENCES = [
    # es / fr / de / pt / it — held-out sentences, same vocab family as the
    # langid profiles but not the training strings
    "no entiendo por qué el servidor no responde a las peticiones hoy.",
    "gracias por la ayuda, el problema quedó resuelto esta mañana.",
    "je ne comprends pas pourquoi le serveur ne répond plus aujourd'hui.",
    "merci beaucoup pour votre aide avec le rapport de la semaine.",
    "der server antwortet heute nicht und ich weiß nicht warum das so ist.",
    "vielen dank für die hilfe mit dem bericht von letzter woche.",
    "não entendo por que o servidor não responde aos pedidos hoje.",
    "obrigado pela ajuda, o problema foi resolvido esta manhã cedo.",
    "non capisco perché il server non risponde alle richieste oggi.",
    "grazie mille per l'aiuto con il rapporto della settimana scorsa.",
]

PII_SNIPPETS = [
    "you can reach me at john.doe{n}@example.com for details",
    "my phone number is +1 555-{d3}-{d4} call anytime",
    "the card on file is 4111 1111 1111 1111 please update it",
    "my ssn is {d3}-62-{d4} as requested",
    "the server lives at 192.168.{d1}.{d2} behind the proxy",
]

TOX_SNIPPETS = [
    "that frakking build is broken again",
    "what a scumweasel move from the vendor",
    "gorramit the tests are red once more",
]

TOOLS = ["search", "code", "browser"]
BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)


def _gibberish(rng: random.Random, n: int) -> str:
    return "".join(
        rng.choice("qwxzjkvbpf aeiou") for _ in range(n)
    )


def generate_turn_text(rng: random.Random) -> tuple[str | None, str]:
    """Returns (text, planted_kind). Kind is generation metadata only —
    golden labels always come from the reference labeler, not from here."""
    r = rng.random()
    if r < 0.04:
        return rng.choice(NON_EN_SENTENCES), "non_en"
    if r < 0.08:
        tmpl = rng.choice(PII_SNIPPETS)
        text = tmpl.format(
            n=rng.randint(1, 99),
            d1=rng.randint(1, 254),
            d2=rng.randint(1, 254),
            d3=f"{rng.randint(100, 999)}",
            d4=f"{rng.randint(1000, 9999)}",
        )
        return "Quick note: " + text + ".", "pii"
    if r < 0.10:
        return (
            rng.choice(EN_SENTENCES) + " " + rng.choice(TOX_SNIPPETS) + ".",
            "toxic",
        )
    if r < 0.12:
        word = rng.choice(["again", "stop", "ha", "ok"])
        return " ".join([word] * rng.randint(15, 40)), "rep_spam"
    if r < 0.14:
        return "#!$%^&*" * rng.randint(5, 20), "symbol_spam"
    if r < 0.16:
        return _gibberish(rng, rng.randint(40, 120)), "gibberish"
    if r < 0.165:
        return rng.choice(EN_SENTENCES) * 400, "too_long"
    if r < 0.175:
        return rng.choice(["", "   ", "\t\n"]), "blank"
    if r < 0.18:
        return None, "null_text"
    if r < 0.185:
        return "x" * rng.randint(12, 30), "char_run"
    # clean English: 1-3 sentences
    k = rng.randint(1, 3)
    return " ".join(rng.choice(EN_SENTENCES) for _ in range(k)), "clean"


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    hot_conv_turns: int = 0,
) -> list[dict]:
    """Deterministic list of turn dicts. ``hot_conv_turns`` plants one
    pathological conversation for skew tests (SURVEY.md §7.4)."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for ci in range(n_convs):
        conv_id = f"CONV{rng.randint(0, 99999999):08d}"
        n_turns = rng.randint(3, 12)
        conv_start = BASE_TS + dt.timedelta(
            minutes=rng.randint(0, 500_000)
        )
        has_system = rng.random() < 0.3
        idx = 0
        expected_idx = 0
        ts = conv_start
        for t in range(n_turns):
            if t == 0 and has_system:
                role = "system"
            elif rng.random() < 0.06:
                role = rng.choice(["tool", "user", "assistant", "robot"])
            else:
                role = "user" if expected_idx % 2 == (0 if not has_system else 1) else "assistant"
            text, kind = generate_turn_text(rng)
            tool = None
            if role == "tool":
                tool = rng.choice(TOOLS) if rng.random() > 0.15 else None
            elif rng.random() < 0.01:
                tool = rng.choice(TOOLS)  # planted inconsistency
            turn_idx = idx
            if rng.random() < 0.02:
                turn_idx = idx + rng.randint(1, 3)  # planted gap
            if rng.random() < 0.01 and t > 0:
                ts = ts - dt.timedelta(seconds=rng.randint(30, 300))
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )
            idx = turn_idx + 1
            expected_idx += 1
            ts = ts + dt.timedelta(seconds=rng.randint(5, 180))
    if hot_conv_turns > 0:
        conv_id = "CONVHOT00000001"
        ts = BASE_TS
        for i in range(hot_conv_turns):
            text, _ = generate_turn_text(rng)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": i,
                    "role": "user" if i % 2 == 0 else "assistant",
                    "text": text,
                    "tool": None,
                    "ts": ts,
                }
            )
            ts = ts + dt.timedelta(seconds=1)
    return rows


def transcripts_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [
            (
                r["conv_id"],
                r["turn_idx"],
                r["role"],
                r["text"],
                r["tool"],
                r["ts"],
            )
            for r in rows
        ],
        TRANSCRIPT_SCHEMA,
    )


def generate_transcripts_df(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    hot_conv_turns: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    df = transcripts_df(
        spark, generate_transcripts(n_convs, seed, hot_conv_turns)
    )
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def generate_transcripts_distributed(
    spark: SparkSession,
    n_convs: int,
    seed: int = 42,
    convs_per_task: int = 2000,
) -> DataFrame:
    """Executor-side generation for bench-scale fixtures: each task derives
    its own ``random.Random(seed + chunk)`` so no rows cross the driver —
    the reference's vectorized-generation discipline (SURVEY.md §1.1) at the
    whole-chunk level."""
    import pandas as pd

    n_chunks = max(1, (n_convs + convs_per_task - 1) // convs_per_task)

    def gen(iterator: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in iterator:
            for chunk in pdf["id"].tolist():
                take = min(convs_per_task, n_convs - chunk * convs_per_task)
                rows = generate_transcripts(take, seed=seed + chunk)
                yield pd.DataFrame(
                    rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
                )

    return (
        spark.range(n_chunks)
        .repartition(n_chunks)
        .mapInPandas(gen, schema=TRANSCRIPT_DDL)
    )
