"""SnapshotTable: Iceberg read semantics (snapshot isolation, time
travel, metadata-last commit) over plain parquet."""

from __future__ import annotations

import json
import os

import pytest


def _table(spark, tmp_path):
    from data_caterer_spark.sources.snapshots import SnapshotTable

    return SnapshotTable(spark, str(tmp_path / "t"))


def test_append_accumulates_and_time_travels(spark, tmp_path):
    t = _table(spark, tmp_path)
    s1 = t.append(spark.range(0, 10))
    s2 = t.append(spark.range(10, 15))
    assert (s1, s2) == (1, 2)
    assert t.read(1).count() == 10
    assert t.read(2).count() == 15
    assert t.read().count() == 15  # current == latest


def test_overwrite_flips_current_but_keeps_history(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.append(spark.range(0, 10))
    t.overwrite(spark.range(100, 103))
    assert t.read().count() == 3
    assert sorted(r.id for r in t.read().collect()) == [100, 101, 102]
    # snapshot 1 still readable after the overwrite (time travel)
    assert t.read(1).count() == 10
    log = {r.snapshot_id: r.operation for r in t.snapshots().collect()}
    assert log == {1: "append", 2: "overwrite"}


def test_torn_metadata_is_invisible(spark, tmp_path):
    # a .tmp metadata file (simulated crash between data write and the
    # rename commit point) must not surface as a snapshot
    t = _table(spark, tmp_path)
    t.append(spark.range(5))
    tmp = os.path.join(t.path, "metadata", "snap-000002.json.tmp-dead")
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": 2, "operation": "append", "files": []}, f)
    assert t.current_snapshot_id() == 1
    assert t.snapshots().count() == 1
    # and the next commit takes id 2 cleanly
    assert t.append(spark.range(1)) == 2


def test_read_empty_table_raises(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="no snapshots"):
        t.read()


def test_concurrent_commit_conflict_detected(spark, tmp_path):
    # the commit point is an atomic link(2): a second writer claiming
    # the same snapshot id errors instead of silently clobbering
    t = _table(spark, tmp_path)
    t.append(spark.range(3))
    meta_dir = os.path.join(t.path, "metadata")
    # simulate a racing writer that already committed snapshot 2
    with open(os.path.join(meta_dir, "snap-000002.json"), "w") as f:
        json.dump(
            {"snapshot_id": 2, "operation": "append", "files": []}, f
        )
    # our writer computed parent=1 -> claims 2 -> must detect the race
    import re

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match=re.escape("concurrent")):
        # bypass current_snapshot_id seeing the racer by calling _commit
        # with a stale parent view: monkeypatch the id reader
        orig = t.current_snapshot_id
        t.current_snapshot_id = lambda: 1
        try:
            t.append(spark.range(2))
        finally:
            t.current_snapshot_id = orig
