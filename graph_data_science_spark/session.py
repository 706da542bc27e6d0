"""SparkSession builder tuned for the link-graph workload.

Defaults chosen for iterative graph jobs:
- AQE on (runtime coalescing + skew-join splitting),
- Arrow on (every kernel crosses the Python boundary in Arrow batches),
- shuffle partitions sized to cores locally; on a real cluster set
  ``spark.sql.shuffle.partitions`` ~ 2-3x total executor cores.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Equivalent to ``spark-submit --py-files gds_spark.zip`` (the deployment
    mode the engine targets on a real cluster): zips the package and
    ``addPyFile``s it so cloudpickled UDF closures resolve their module
    imports on workers regardless of the driver's sys.path.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def _local_dirs() -> str:
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if override:
        return override
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        return d
    return tempfile.gettempdir()


def get_spark(
    app_name: str = "graph-data-science-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Python workers fork from the JVM, which inherits this process' env:
    # pin glibc so workers don't munmap/refault ~100 MB of numpy
    # temporaries between tasks (measured: worker CPU inflates >2x under
    # high task concurrency without this).
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
    os.environ.setdefault("MALLOC_ARENA_MAX", "2")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # single-machine local mode: no rack/host locality to wait for
        .config("spark.locality.wait", "0s")
        # deterministic event-time semantics everywhere: window alignment
        # and epoch conversions must not depend on the host's timezone
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # iterative loops re-use mid-plan results; don't let broadcast
        # autodetection thrash on tiny intermediate frames
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # iterative loops orphan shuffle files every superstep; the
        # ContextCleaner only fires on driver GC, which a large mostly-
        # idle heap may not do for a long time — force a periodic sweep
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if master.startswith("local"):
        # shuffle files on tmpfs when available: a real cluster has one
        # local SSD per executor (shuffle bandwidth scales with N); a
        # single shared virtual disk does not — tmpfs restores that
        # scaling behavior in local mode. NEVER set this for a cluster
        # master: each worker's own SPARK_LOCAL_DIRS must win there (a
        # driver-local /dev/shm path would be meaningless on executors).
        b = b.config("spark.local.dir", _local_dirs())
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark
