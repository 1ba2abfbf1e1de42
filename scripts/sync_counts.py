#!/usr/bin/env python
"""Single source of truth for catalog-count prose (VERDICT r4 item #8:
tally drift between COVERAGE/README/BASELINE and the artifacts).

Derives the counts from the catalog itself (``__spark_entry__``) and
rewrites every count-bearing phrase the docs use.  Run after adding or
removing queries:

    python scripts/sync_counts.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry

    n_q = len(entry.queries())
    n_o = len(entry.oracle_sql())

    fixes = {
        "COVERAGE.md": [
            (r"Oracle coverage: ALL \d+ catalog queries",
             f"Oracle coverage: ALL {n_o} catalog queries"),
        ],
        "README.md": [
            (r"catalog: \d+ operator queries",
             f"catalog: {n_q} operator queries"),
        ],
        "BENCH.md": [],
        "BASELINE.md": [],
    }
    # generic guard in every doc: "the catalog has since grown to **N**"
    generic = [
        (r"catalog has since grown to \*\*\d+\*\*",
         f"catalog has since grown to **{n_q}**"),
        (r"\*\*\d+ catalog queries, \d+ value-hash-exact oracles\*\*",
         f"**{n_q} catalog queries, {n_o} value-hash-exact oracles**"),
    ]
    changed = []
    for name, subs in fixes.items():
        p = os.path.join(REPO, name)
        if not os.path.exists(p):
            continue
        text = orig = open(p).read()
        for pat, rep in subs + generic:
            text = re.sub(pat, rep, text)
        if text != orig:
            open(p, "w").write(text)
            changed.append(name)
    print(
        f"catalog: {n_q} queries, {n_o} oracles; "
        f"rewrote: {', '.join(changed) or 'nothing (already in sync)'}"
    )


if __name__ == "__main__":
    main()
