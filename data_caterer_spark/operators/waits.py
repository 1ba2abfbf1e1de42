"""Pre-validation wait conditions — readiness gates before a batch run.

Reference surface: ``ValidationWaitImplicits.scala:21-95`` + the api
models (``PauseWaitCondition`` / ``FileExistsWaitCondition`` /
``DataExistsWaitCondition`` / ``WebhookWaitCondition``) with
``isRetryable`` / ``maxRetries`` / ``waitBeforeRetrySeconds`` retry
semantics.  Spark-first notes:

* the data-exists probe is ``read.format(...).options(...).load()
  .where(expr)`` + an emptiness check — expressed as ``limit(1)`` so the
  scan short-circuits after the first matching row (predicate pushdown
  makes this a metadata-cheap probe on parquet/Iceberg);
* file-exists consults the driver filesystem and, when available, the
  Hadoop FileSystem (so ``hdfs://``/``s3a://`` paths work on a cluster);
* everything is driver-side — wait conditions gate job submission, they
  are not distributed work.
"""

from __future__ import annotations

import os
import time
from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class WaitCondition:
    """Base: retry knobs mirror the reference model defaults
    (api PlanModels: maxRetries=10, waitBeforeRetrySeconds=2)."""

    is_retryable: bool = True
    max_retries: int = 10
    wait_before_retry_seconds: float = 2.0

    def check(self, spark: SparkSession) -> bool:  # pragma: no cover
        return True

    def wait(self, spark: SparkSession) -> bool:
        """Poll until the condition holds or retries run out; returns
        whether the condition was met (``waitForCondition`` semantics:
        non-retryable conditions check exactly once)."""
        if not self.is_retryable:
            return self.check(spark)
        for attempt in range(self.max_retries):
            if self.check(spark):
                return True
            time.sleep(self.wait_before_retry_seconds)
        return self.check(spark)


@dataclass
class PauseWaitCondition(WaitCondition):
    """Unconditional pause (non-retryable by definition)."""

    pause_in_seconds: float = 0.0
    is_retryable: bool = False

    def check(self, spark: SparkSession) -> bool:
        time.sleep(self.pause_in_seconds)
        return True


@dataclass
class FileExistsWaitCondition(WaitCondition):
    path: str = ""

    def check(self, spark: SparkSession) -> bool:
        if "://" in self.path:
            # hadoop fs for hdfs:// s3a:// etc (FileSystem.exists analog)
            jvm = spark.sparkContext._jvm
            conf = spark.sparkContext._jsc.hadoopConfiguration()
            p = jvm.org.apache.hadoop.fs.Path(self.path)
            return p.getFileSystem(conf).exists(p)
        return os.path.exists(self.path)


@dataclass
class DataExistsWaitCondition(WaitCondition):
    """Data-ready probe: at least one row matching ``expr`` exists in the
    source (short-circuited via limit(1), pushdown-friendly)."""

    fmt: str = "parquet"
    path: str | None = None
    table: str | None = None
    options: Mapping[str, str] = field(default_factory=dict)
    expr: str = "true"

    def check(self, spark: SparkSession) -> bool:
        from ..sources.io import read_source

        try:
            df = read_source(
                spark, self.fmt, path=self.path, table=self.table,
                options=dict(self.options) or None,
            )
        except Exception:
            # source not created yet counts as "data not there yet"
            return False
        return len(df.where(self.expr).limit(1).take(1)) > 0


@dataclass
class WebhookWaitCondition(WaitCondition):
    url: str = ""
    method: str = "GET"
    status_codes: tuple[int, ...] = (200,)
    headers: Mapping[str, str] = field(default_factory=dict)
    timeout_seconds: float = 10.0

    def check(self, spark: SparkSession) -> bool:
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            self.url, method=self.method, headers=dict(self.headers)
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_seconds) as resp:
                return resp.status in self.status_codes
        except urllib.error.HTTPError as e:
            return e.code in self.status_codes
        except (urllib.error.URLError, OSError):
            return False


def wait_for_all(
    conditions: list[WaitCondition], spark: SparkSession
) -> bool:
    """Gate on every condition in order; returns True iff all were met."""
    return all(c.wait(spark) for c in conditions)
