#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE criterion: throughput
scaling efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the round brief the same
job runs at two parallelism levels — ``local[8]`` vs ``local[32]`` — on
identical input (fixed 128-chunk layout, same seed), each in a fresh JVM
via ``bench.py --job pipeline``.  Efficiency = rate(4N) / (4 * rate(N)).

Writes the evidence table into BENCH.md.

    python scripts/scaling_bench.py [--convs 160000] [--n 8] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, convs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_CONVS"] = str(convs)
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{max(8, cpus)}g"
    # pin the WHOLE process tree (JVM task threads + Python UDF workers)
    # to exactly `cpus` cores: without affinity, a local[8] run's Python
    # workers spill onto the machine's idle cores and inflate the small-N
    # rate, understating scaling efficiency vs a real 8-core executor set
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        sys.executable, os.path.join(REPO, "bench.py"), "--job", "pipeline",
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=160000)
    ap.add_argument("--n", type=int, default=4, help="small size N (big is 4N)")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    # co-tenant noise on this box makes single runs vary up to 3x; the two
    # configs are INTERLEAVED and each keeps its best run, so both sample
    # the quiet windows and best-case throughputs are comparable
    results: dict[int, dict] = {}
    for i in range(args.repeats):
        for cpus in (args.n, args.n * 4):
            r = run_once(cpus, args.convs)
            print(f"  trial {i}: local[{cpus}] {r['pipeline_turns_per_sec']} turns/s "
                  f"({r['queries']['transcript_pipeline']} s)")
            best = results.get(cpus)
            if best is None or r["pipeline_turns_per_sec"] > best["pipeline_turns_per_sec"]:
                results[cpus] = r
    for cpus in (args.n, args.n * 4):
        best = results[cpus]
        print(f"local[{cpus}]: {best['pipeline_turns_per_sec']} turns/s "
              f"({best['queries']['transcript_pipeline']} s, {best['pipeline_turns']} turns)")

    small, big = results[args.n], results[args.n * 4]
    eff = big["pipeline_turns_per_sec"] / (4 * small["pipeline_turns_per_sec"])
    print(f"scaling efficiency N->4N: {eff:.3f}")

    section = f"""## Scaling evidence: N vs 4N parallelism (quality-filter pipeline)

Same job, identical input ({small['pipeline_turns']} turns, fixed 128-chunk
layout, seed 42), fresh JVM per run, configs interleaved and best of
{args.repeats} trials each (this box has heavy co-tenant noise — up to 3x
run-to-run variance — so best-of-interleaved is the comparable statistic);
measured via `bench.py --job pipeline` (steady-state: warm-up excluded).
Each run is pinned with `taskset` to exactly its core budget so local[N]
simulates an N-core executor set honestly (JVM + Python UDF workers share
the budget).

| parallelism | wall (s) | turns/sec |
| --- | --- | --- |
| local[{args.n}]  (N)  | {small['queries']['transcript_pipeline']} | {small['pipeline_turns_per_sec']} |
| local[{args.n * 4}] (4N) | {big['queries']['transcript_pipeline']} | {big['pipeline_turns_per_sec']} |

**Scaling efficiency N→4N: {eff:.3f}** (criterion: ≥ 0.8).
"""
    bench_md = os.path.join(REPO, "BENCH.md")
    existing = ""
    if os.path.exists(bench_md):
        existing = open(bench_md).read()
        # replace any prior scaling section
        marker = "## Scaling evidence:"
        if marker in existing:
            existing = existing.split(marker)[0].rstrip() + "\n\n"
    else:
        existing = "# BENCH — engine throughput evidence\n\n"
    open(bench_md, "w").write(existing + section)
    print(f"wrote {bench_md}")


if __name__ == "__main__":
    main()
