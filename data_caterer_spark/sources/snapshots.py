"""Snapshot-log table layout: Iceberg's read semantics over plain parquet.

The production layer is the real Iceberg catalog (``sources/iceberg.py``,
jar-gated in this sandbox).  This module implements the part of the spec
the pipeline actually depends on — snapshot isolation and time travel —
with the same mechanism Iceberg uses: **immutable data files + an
append-only metadata log where every snapshot names its complete live
file set** (the manifest-list idea, collapsed to one JSON file per
snapshot).  Readers resolve a snapshot id to a file list and scan exactly
those files; a writer commits by writing data files first, metadata last,
so a crash mid-write leaves the previous snapshot intact and readers
never see a torn table.

Scale notes:
* a snapshot's metadata is O(#files), never O(rows) — the log is a few
  KB per commit at any table size;
* ``read`` hands Spark the explicit file list, so planning prunes to the
  snapshot's files with no directory listing of dead files;
* ``overwrite`` is a metadata-only flip (old files stay for time travel
  until an expire pass), exactly Iceberg's semantics.

Reference parity: the reference writes per-batch sinks with save modes
(``SinkFactory.scala``); snapshot commits are the new-build extension the
BASELINE north_rule's "Iceberg tables" requires.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Row, SparkSession

_LOG_DIR = "metadata"
_DATA_DIR = "data"


class SnapshotTable:
    """A parquet table with an Iceberg-style snapshot log."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, _LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)

    # -- metadata ----------------------------------------------------------

    def _snapshot_files(self) -> list[str]:
        d = os.path.join(self.path, _LOG_DIR)
        return sorted(
            f for f in os.listdir(d)
            if f.startswith("snap-") and f.endswith(".json")
        )

    def snapshots(self) -> DataFrame:
        """The snapshot log as a DataFrame (the ``table.snapshots``
        metadata-table analog)."""
        rows = []
        for name in self._snapshot_files():
            with open(os.path.join(self.path, _LOG_DIR, name)) as f:
                m = json.load(f)
            rows.append(
                Row(
                    snapshot_id=m["snapshot_id"],
                    operation=m["operation"],
                    n_files=len(m["files"]),
                )
            )
        return self.spark.createDataFrame(
            rows, "snapshot_id int, operation string, n_files int"
        )

    def current_snapshot_id(self) -> "int | None":
        names = self._snapshot_files()
        if not names:
            return None
        return int(names[-1].split("-")[1].split(".")[0])

    def _load(self, snapshot_id: int) -> dict:
        p = os.path.join(
            self.path, _LOG_DIR, f"snap-{snapshot_id:06d}.json"
        )
        with open(p) as f:
            return json.load(f)

    # -- commits -----------------------------------------------------------

    def _commit(self, df: DataFrame, operation: str) -> int:
        prev_id = self.current_snapshot_id()
        new_dir = os.path.join(
            self.path, _DATA_DIR, f"commit-{uuid.uuid4().hex[:12]}"
        )
        # data first, metadata last: the commit point is the metadata
        # file's atomic rename-into-place, so readers never observe a
        # half-written snapshot
        df.write.mode("error").parquet(new_dir)
        files = [new_dir]
        if operation == "append" and prev_id is not None:
            files = self._load(prev_id)["files"] + files
        new_id = (prev_id or 0) + 1
        meta = {
            "snapshot_id": new_id,
            "operation": operation,
            "parent_id": prev_id,
            "files": files,
        }
        final = os.path.join(self.path, _LOG_DIR, f"snap-{new_id:06d}.json")
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        try:
            # link(2) fails if the target exists — an atomic
            # compare-and-swap on the snapshot id, so two racing writers
            # cannot both claim snapshot N+1 (the loser raises instead
            # of silently clobbering; real Iceberg retries on a fresh
            # parent, callers here can do the same)
            os.link(tmp, final)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit: snapshot {new_id} already exists "
                f"at {self.path}"
            ) from None
        finally:
            os.unlink(tmp)
        return new_id

    def append(self, df: DataFrame) -> int:
        """Append commit: new snapshot = parent's files + the new ones."""
        return self._commit(df, "append")

    def overwrite(self, df: DataFrame) -> int:
        """Overwrite commit: a metadata-only flip to the new file set —
        previous snapshots (and their files) remain time-travel-readable
        until an expire pass."""
        return self._commit(df, "overwrite")

    # -- reads -------------------------------------------------------------

    def read(self, snapshot_id: "int | None" = None) -> DataFrame:
        """Scan the table as of ``snapshot_id`` (default: current).  The
        explicit file list IS the scan's input — dead files are invisible
        to planning, matching Iceberg's manifest-driven pruning."""
        sid = (
            snapshot_id
            if snapshot_id is not None
            else self.current_snapshot_id()
        )
        if sid is None:
            raise ValueError(f"table at {self.path} has no snapshots")
        files = self._load(sid)["files"]
        return self.spark.read.parquet(*files)
