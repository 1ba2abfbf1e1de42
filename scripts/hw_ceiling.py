#!/usr/bin/env python
"""Hardware scaling-ceiling probe for the N-vs-4N evidence (BENCH.md).

Runs a fixed per-process kernel on P=4 and P=16 concurrently running
pinned processes and reports efficiency(4->16) = wall4 / wall16 (fixed
work per process: perfect resource scaling keeps wall constant as P
grows).  Two kernels bracket every real workload:

* ``cpu`` — integer ALU loop, ~zero memory traffic: measures how the
  box itself (hypervisor scheduling, turbo/frequency) scales pure
  compute.  Measured on this sandbox: ~0.93-0.94.
* ``mem`` — large out-of-cache array sweeps, DRAM-bandwidth-bound:
  measures the shared-memory-subsystem ceiling.  Measured on this
  sandbox: ~0.39-0.5 — four streams already saturate a large fraction
  of the (virtualized) memory controllers, so a workload that is pure
  DRAM streaming CANNOT scale past ~0.5 on this box no matter how it is
  written.

A single-box N-vs-4N comparison therefore under-states cluster scaling
for any workload with DRAM traffic: on a real 4N-executor cluster each
node brings its own memory controllers (the mem ceiling stays ~1.0),
while on one box all 4N cores share them.  The quality-filter pipeline
measures 0.77-0.88 here — near the cpu-kernel ceiling, i.e. the engine
adds little bandwidth overhead of its own.

Usage: python scripts/hw_ceiling.py [--quick]
Prints one JSON line: {"cpu": {...}, "mem": {...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _worker(kind: str, cpu_id: int, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {cpu_id})
    os.environ["OPENBLAS_NUM_THREADS"] = "1"
    if kind == "cpu":
        t0 = time.time()
        x = 1
        for i in range(1, 20_000_000):
            x = (x * 31 + i) & 0xFFFFFFFF
        q.put(time.time() - t0)
    else:
        import numpy as np

        a = np.ones(40_000_000)  # 320 MB, far out of any cache
        b = np.empty_like(a)
        t0 = time.time()
        for _ in range(6):
            np.add(a, 1.0, out=b)
            np.add(b, 1.0, out=a)
        q.put(time.time() - t0)


def run(kind: str, procs: int) -> float:
    q: "mp.Queue" = mp.Queue()
    ps = []
    for i in range(procs):
        p = mp.Process(target=_worker, args=(kind, i, q))
        p.start()
        ps.append(p)
    walls = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(walls) / len(walls)


def measure(n: int = 4, repeats: int = 2) -> dict:
    """Best-of-``repeats`` per kernel/width (same noise discipline as the
    pipeline scaling trials: a co-tenant wave can only slow a run)."""
    out: dict = {}
    for kind in ("cpu", "mem"):
        w_n = min(run(kind, n) for _ in range(repeats))
        w_4n = min(run(kind, n * 4) for _ in range(repeats))
        out[kind] = {
            f"wall_{n}": round(w_n, 2),
            f"wall_{n * 4}": round(w_4n, 2),
            "efficiency": round(w_n / w_4n, 3),
        }
    return out


if __name__ == "__main__":
    repeats = 1 if "--quick" in sys.argv else 2
    print(json.dumps(measure(repeats=repeats)))
