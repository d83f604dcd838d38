"""SparkSession factory with scale-oriented defaults.

Tuned for the engine's workload: wide text rows through Arrow batches, AQE for
skew/coalescing, and shuffle partitioning sized for local[32] tests while the
same settings scale to multi-executor clusters (shuffle.partitions is the only
knob to raise at 100 TB).
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _shm_is_roomy(min_free_bytes: int = 32 * 1024**3) -> bool:
    """True when /dev/shm exists with plenty of free space for shuffles."""
    try:
        st = os.statvfs("/dev/shm")
        return st.f_bavail * st.f_frsize >= min_free_bytes
    except OSError:
        return False


def get_spark(
    app_name: str = "pdf-extractor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting (SURVEY.md §4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow: vectorized pandas-UDF transfer; batch size bounded because
        # payload rows can be hundreds of KB of text each.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Broadcast small dims automatically; AQE converts to broadcast at
        # runtime when post-filter sizes allow.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python Data Source API (sources/synthlog.py): let pushFilters
        # receive the query's predicates. Session-level so query builders
        # never have to mutate a shared session as a side effect.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Shuffle spill dir: this sandbox's /tmp sits on a slow virtio disk;
    # production executors write shuffle to fast local NVMe. tmpfs models
    # that here — but only when /dev/shm is actually large (a standard
    # Docker /dev/shm is 64 MB and would fail mid-shuffle), else Spark's
    # disk default stands.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and _shm_is_roomy():
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
