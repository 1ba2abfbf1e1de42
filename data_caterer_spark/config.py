"""SparkSession construction and engine-wide configuration.

The reference tunes Spark via a static conf map
(``api/src/main/scala/.../model/Constants.scala:184-196`` — AQE on, CBO on,
``shuffle.partitions=10``).  We keep the same philosophy — declare the plan,
let Catalyst/AQE pick physical strategy — but size defaults for a large
cluster and make everything overridable.

Iceberg is the primary production catalog (per BASELINE north_rule).  The
sandbox image has no Iceberg runtime jar, so :func:`iceberg_available` gates
it and the sources layer falls back to partitioned parquet plus an explicit
manifest sidecar (``sources/manifest.py``) that supplies the same
snapshot/resume semantics.
"""

from __future__ import annotations

import os
from typing import Mapping

from pyspark.sql import SparkSession

# Defaults chosen for scale, not for the 60k-row sandbox:
#  - AQE owns runtime shuffle-partition coalescing and skew-join splitting,
#    so a generous static shuffle.partitions is safe.
#  - Arrow must be on: every Python-side stage in this engine is a
#    pandas/Arrow UDF (no row-at-a-time Python anywhere).
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # parquet scans: vectorized reader + pushdown are defaults, pinned here
    # so a misconfigured cluster can't silently disable them.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # real-cluster form of the BLAS pin applied in get_spark (local-mode
    # workers inherit the driver env instead)
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
}


def iceberg_available() -> bool:
    """True when an Iceberg Spark runtime jar is on the classpath."""
    try:
        import pyspark

        jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return any("iceberg-spark-runtime" in j for j in os.listdir(jar_dir))
    except OSError:
        return False


def package_zip() -> str:
    """Zip this package into a temp file for shipping to Python workers.

    The production deployment is ``spark-submit --py-files dcs.zip`` (per
    the scale criteria); this builds the equivalent artifact at runtime so
    a bare ``get_spark()`` session is self-contained — pandas-UDF closures
    referencing the package deserialize on every worker regardless of how
    the driver found the package.  Cached per process.
    """
    global _PACKAGE_ZIP
    if _PACKAGE_ZIP is not None and os.path.exists(_PACKAGE_ZIP):
        return _PACKAGE_ZIP
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    fd, path = tempfile.mkstemp(prefix="dcs_pkg_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    _PACKAGE_ZIP = path
    return path


_PACKAGE_ZIP: str | None = None


def get_spark(
    app_name: str = "data-caterer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: Mapping[str, str] | None = None,
    iceberg_warehouse: str | None = None,
    ship_package: bool = True,
) -> SparkSession:
    """Build (or fetch) a session with the engine defaults applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` in the sandbox;
    on a real cluster leave it unset and let spark-submit decide.
    ``ship_package`` adds this package as a py-file so executor Python
    workers can import it no matter where the driver loaded it from.
    """
    # One BLAS/OpenMP thread per Python worker: Spark already runs one
    # worker per task slot, so the parallelism budget is spent.  Unpinned,
    # OpenBLAS spawns a thread per CORE in EVERY worker (32 threads x N
    # workers on this box) and the numpy kernels (langid/perplexity
    # matmuls, LSH/IVF assignment) thrash on context switches — measured
    # as ~20% extra core-time per turn at local[16].  Same practice as
    # setting OMP_NUM_THREADS=1 on real executors.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if iceberg_warehouse is not None and iceberg_available():
        conf.update(
            {
                "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
                "spark.sql.catalog.local.type": "hadoop",
                "spark.sql.catalog.local.warehouse": iceberg_warehouse,
                "spark.sql.extensions": (
                    "org.apache.iceberg.spark.extensions"
                    ".IcebergSparkSessionExtensions"
                ),
            }
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    session = builder.getOrCreate()
    if ship_package:
        session.sparkContext.addPyFile(package_zip())
    # default a RELIABLE checkpoint dir: iterative operators (connected
    # components) silently fell back to localCheckpoint without one, which
    # is not fault-tolerant — an executor loss mid-iteration kills the
    # whole run on a real cluster.  Honor an existing dir (spark-submit
    # config or a prior caller); derive a local one otherwise.  Cluster
    # deployments should point SPARK_GRAFT_CHECKPOINT_DIR at durable
    # storage (HDFS/S3) — a driver-local tmp dir is correct only for
    # local-mode (all executors share the filesystem).
    sc = session.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt = resolve_checkpoint_dir(
            sc.master or "", os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
        )
        if ckpt is not None:
            sc.setCheckpointDir(ckpt)
    return session


def resolve_checkpoint_dir(
    master: str, configured: "str | None"
) -> "str | None":
    """Pick the RELIABLE checkpoint dir for this deployment, or None.

    A driver-local tmp dir is reliable only when every executor shares
    the driver's filesystem — i.e. local mode.  Under a cluster master
    with no configured dir, defaulting a local path would make
    ``checkpoint()`` write to a non-shared path and lose data mid-job
    (Spark only logs a warning); return None instead so iterative
    operators keep their ``localCheckpoint`` fallback, and warn loudly.
    """
    if configured:
        return configured
    if master.startswith("local"):
        import tempfile

        return tempfile.mkdtemp(prefix="dcs_ckpt_")
    import warnings

    warnings.warn(
        "no checkpoint dir configured under cluster master "
        f"{master!r}; set SPARK_GRAFT_CHECKPOINT_DIR to durable shared "
        "storage (HDFS/S3) for fault-tolerant iterative operators — "
        "falling back to localCheckpoint otherwise",
        stacklevel=2,
    )
    return None
