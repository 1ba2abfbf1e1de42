"""The driver-facing bench line must stay parseable and small.

Round 4's artifact recorded ``parsed: null`` because the single printed
JSON line (per-trial logs + protocol prose) outgrew the driver's stdout
capture — the whole round's suite/pipeline/size_scaling numbers were
lost.  These tests pin the fix: verbose evidence goes to
``BENCH_DETAIL.json``; the printed line is scalars-only and bounded.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

import bench


@pytest.fixture(autouse=True)
def _redirect_detail_file(monkeypatch):
    # never clobber a real bench run's evidence file with test data
    monkeypatch.setattr(bench, "DETAIL_FILE", "BENCH_DETAIL_TEST.json")
    yield
    p = os.path.join(os.path.dirname(bench.__file__), "BENCH_DETAIL_TEST.json")
    if os.path.exists(p):
        os.remove(p)


def _full_result(n_queries: int = 29) -> dict:
    return {
        "metric": "headline_suite_sec",
        "value": 42.0,
        "unit": "sec",
        "queries": {f"some_longish_query_name_{i:02d}": 3.141 for i in range(n_queries)},
        "sf": 0.1,
        "cpus": 32,
        "pipeline_turns": 449607,
        "pipeline_turns_per_sec": 46832.1,
        "size_scaling": [
            {"convs": 60000, "turns": 449607, "sec": 9.6, "turns_per_sec": 46832.1},
            {"convs": 150000, "turns": 1124000, "sec": 15.2, "turns_per_sec": 73947.4},
            {"convs": 500000, "turns": 3750000, "sec": 36.9, "turns_per_sec": 101626.0},
        ],
        "scaling": {
            "protocol": "p" * 700,
            "cpus_n": 4,
            "cpus_4n": 16,
            "scaling_convs": 90000,
            "quiet_wait_s": 600.0,
            "turns_per_sec_n": 28712.4,
            "turns_per_sec_4n": 74648.9,
            "samples_n": [28712.4, 27111.0],
            "samples_4n": [74648.9, 71000.2, 69888.1],
            "trials": [
                {
                    "cpus": 4,
                    "turns_per_sec": 28712.4,
                    "sample_secs": [30.1] * 9,
                    "wall_s": 310.2,
                    "hw_mem_after": 0.44,
                    "hw_mem_wall_after": 9.1,
                    "hw_quiet_after": False,
                }
            ]
            * 6,
            "efficiency": 0.65,
            "hw_ceiling": {"alu": 0.93, "mem": 0.44, "mem_wall_n": 9.1},
            "hw_ceiling_before": {"alu": 0.93, "mem": 0.41, "mem_wall_n": 12.0},
            "hw_ceiling_after": {"alu": 0.93, "mem": 0.44, "mem_wall_n": 9.1},
            "window_saturated": True,
            "wide_quiet_seen": False,
        },
    }


def test_compact_line_bounded_and_parseable(tmp_path, monkeypatch):
    full = _full_result()
    compact = bench._compact_for_driver(full)
    line = json.dumps(compact)
    assert len(line) <= bench.MAX_DRIVER_LINE
    back = json.loads(line)
    # the criterion evidence MUST survive in the parsed driver artifact
    s = back["scaling"]
    assert s["efficiency"] == 0.65
    assert s["window_saturated"] is True
    assert s["wide_quiet_seen"] is False
    assert s["samples_n"] and s["samples_4n"]
    assert len(back["size_scaling"]) == 3
    assert back["queries"]  # per-query timings present
    # nothing verbose leaks into the line
    assert "trials" not in s and "protocol" not in s
    # the detail side file carries the full evidence
    detail_path = os.path.join(os.path.dirname(bench.__file__), bench.DETAIL_FILE)
    with open(detail_path) as f:
        detail = json.load(f)
    assert detail["scaling"]["trials"]
    assert detail["scaling"]["protocol"]
    assert s.get("detail") == bench.DETAIL_FILE


def test_compact_line_degrades_rather_than_overflows():
    # pathological: 120 queries with long names — the guard must trim,
    # never print an unparseable or oversized line
    full = _full_result(n_queries=120)
    compact = bench._compact_for_driver(full)
    line = json.dumps(compact)
    assert len(line) <= bench.MAX_DRIVER_LINE
    json.loads(line)


def test_no_scaling_block_still_compact():
    full = _full_result()
    del full["scaling"]
    del full["size_scaling"]
    compact = bench._compact_for_driver(full)
    line = json.dumps(compact)
    assert len(line) <= bench.MAX_DRIVER_LINE
    assert json.loads(line)["value"] == 42.0
