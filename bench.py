#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Modes:
  python bench.py                  # full headline suite
  python bench.py --job pipeline   # just the transcript quality-filter
                                   # pipeline (used by scripts/scaling_bench.py
                                   # to measure N-vs-4N-core scaling)

Each query is forced with a noop-format write (full computation, no
driver-side collect — the 100 TB execution shape).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# transcripts synthesized for the pipeline job: ~7.5 turns/conv average
PIPELINE_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))

HEADLINE = [
    "doc_quality_filter",       # flagship keep/drop + scrub (pure Catalyst)
    "q1_pricing_summary",       # scan-heavy agg, predicate pushdown
    "q3_top_revenue",           # broadcast join + top-k
    "rule_violation_counts",    # whole rule bank in one aggregate pass
    "window_turn_order",        # window shuffle + lag/row_number
    "ngram_jaccard_dups",       # inverted-index self-join dedup
    "minhash_lsh_dups",         # signature + banding dedup
    "simhash_dups",             # fingerprint + chunk-block dedup
    "embedding_topk",           # brute-force cosine top-k
    "lsh_knn_embeddings",       # LSH knn join
    "langid_documents",         # pandas-UDF broadcast-model inference
    "perplexity_documents",     # pandas-UDF numpy scoring
    "scrub_documents",          # sequential regex scrub chain
]


def force(df) -> int:
    """Execute the full plan without moving rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_pipeline(spark) -> tuple[float, int]:
    """The BASELINE north-star job: synthesize transcripts executor-side,
    run the full quality-filter pipeline, write noop.  Returns (sec, turns)."""
    from data_caterer_spark.fixtures import generate_transcripts_distributed
    from data_caterer_spark.plans.pipeline import QualityFilterPipeline

    # fixed 128-chunk layout regardless of CPUS so the scaling comparison
    # (local[8] vs local[32]) runs the IDENTICAL job on identical input
    df = generate_transcripts_distributed(
        spark, n_convs=PIPELINE_CONVS, convs_per_task=max(1, PIPELINE_CONVS // 128)
    )
    df = df.localCheckpoint()  # materialize input so we time the pipeline, not synthesis
    n_turns = df.count()
    pipe = QualityFilterPipeline()

    def out(frame):
        return pipe.run(frame).select(
            "conv_id", "turn_idx", "keep", "rule_hits", "scrubbed_text"
        )

    # warm-up: one full execution spins Python workers, JIT-compiles the
    # codegen'd stages, and pages the checkpointed input; a production run
    # over 10^12 turns amortizes all of that to zero, so the steady-state
    # rate is the second full execution
    force(out(df))
    t0 = time.time()
    force(out(df))
    return time.time() - t0, n_turns


def run_scaling(n: int = 4, repeats: int = 2) -> dict | None:
    """Two-cluster-size evidence (BASELINE: efficiency >= 0.8 from N to 4N
    executors).  No real cluster in this sandbox, so the same job runs at
    two parallelism levels — taskset-pinned local[N] vs local[4N] in fresh
    JVMs — on identical input; configs are interleaved and each keeps its
    best trial (co-tenant noise on this box varies runs up to 3x).
    Efficiency = rate(4N) / (4 * rate(N))."""
    import shutil
    import subprocess

    if shutil.which("taskset") is None:
        return None
    repo = os.path.dirname(os.path.abspath(__file__))
    best: dict[int, float] = {}
    t_start = time.time()
    for it in range(repeats):
        # wall-clock budget: one interleaved pair is enough evidence if
        # the box is slow today
        if it > 0 and time.time() - t_start > 240:
            break
        for cpus in (n, n * 4):
            env = dict(os.environ)
            env["SPARK_GRAFT_CPUS"] = str(cpus)
            env.setdefault("SPARK_GRAFT_BENCH_CONVS", str(PIPELINE_CONVS))
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}",
                sys.executable, os.path.join(repo, "bench.py"),
                "--job", "pipeline",
            ]
            try:
                out = subprocess.run(
                    cmd, capture_output=True, text=True, env=env, cwd=repo,
                    timeout=1800, check=True,
                )
            except (subprocess.SubprocessError, OSError):
                return None
            line = [
                l for l in out.stdout.strip().splitlines() if l.startswith("{")
            ][-1]
            rate = json.loads(line)["pipeline_turns_per_sec"]
            best[cpus] = max(best.get(cpus, 0.0), rate)
    eff = best[n * 4] / (4.0 * best[n])
    return {
        "protocol": "taskset-pinned, interleaved, best-of-%d" % repeats,
        "cpus_n": n,
        "cpus_4n": n * 4,
        "turns_per_sec_n": round(best[n], 1),
        "turns_per_sec_4n": round(best[n * 4], 1),
        "efficiency": round(eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", default="all", choices=["all", "pipeline"])
    args = ap.parse_args()

    # scaling subprocesses run FIRST (before this process pins 32 cores)
    scaling = None
    if args.job == "all" and os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        scaling = run_scaling()

    from data_caterer_spark.config import get_spark
    from data_caterer_spark.queries import QUERIES

    spark = get_spark(
        app_name="dcs-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    pipe_sec, n_turns = run_pipeline(spark)
    timings["transcript_pipeline"] = round(pipe_sec, 3)

    if args.job == "all":
        for name in HEADLINE:
            t0 = time.time()
            force(QUERIES[name](spark, SF_DIR))
            timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "pipeline_turns": n_turns,
        "pipeline_turns_per_sec": round(n_turns / pipe_sec, 1),
    }
    if scaling is not None:
        result["scaling"] = scaling
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
