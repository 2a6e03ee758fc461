"""SparkSession factory with the pinned configuration for this
engine (SURVEY.md §4). One place so jobs, tests and bench agree."""

from __future__ import annotations

from pyspark.sql import SparkSession


def sweep_dead_spill_dirs(base: str) -> list[str]:
    """Remove per-PID tmpfs spill dirs whose owning process is gone
    (uncleanly-died JVMs leak them; on tmpfs the leak is RAM — see
    the SPARK_GRAFT_TMPFS note in get_spark). Returns the swept dir
    names; total on any filesystem state."""
    import os
    import shutil

    swept = []
    try:
        entries = os.listdir(base)
    except OSError:
        return swept
    for d in entries:
        if d.isdigit() and not os.path.exists(f"/proc/{d}"):
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)
            swept.append(d)
    return swept


def get_spark(
    master: str = "local[*]",
    app_name: str = "webtext-engine",
    shuffle_partitions: int | None = None,
    rocksdb_state: bool = False,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """rocksdb_state=True switches Structured Streaming state to the
    RocksDB provider: state lives off-heap/on-disk per executor instead
    of in the JVM heap, which is the only regime that survives the
    incremental near-dup index's state size at 10^12 docs (streaming
    jobs enable it; the default HDFSBackedStateStore is fine for tests
    and small stateful metrics). NOTE: stateStore.providerClass is read
    per STREAMING QUERY at start, so setting it on an already-running
    session (spark.conf.set) works too — this flag just pins it at
    session build for the job entrypoints."""
    import os

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local-mode JVM heap: default 1g OOMs on blob-heavy shuffles
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        # oracle comparison + determinism: duckdb timestamps are UTC-naive
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow at every Python boundary; blob-heavy rows need small batches
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        # amortize Python worker startup across tasks
        .config("spark.python.worker.reuse", "true")
        # AQE: runtime coalesce + skew backstop (SURVEY.md §4)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # idempotent per-partition overwrite (checkpoint/resume A12)
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # blob-heavy tables: 128MB default splits give too few map
        # tasks for the Python extraction stage (a 773MB corpus ->
        # ~6 tasks -> 10+ idle cores at local[16]); 16MB splits keep
        # every core fed while each task still carries ~1.5k docs.
        # At 10^12 rows the same knob bounds per-task payload bytes.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "1m")
    )
    # shuffle spill dir: tmpfs keeps shuffle I/O off this sandbox's one
    # shared virtual disk, but tmpfs spill = spill-to-RAM, which breaks
    # on hosts with a small /dev/shm. So: honor an explicit
    # SPARK_LOCAL_DIRS, opt into tmpfs only via SPARK_GRAFT_TMPFS=1
    # (bench harnesses set it), otherwise keep Spark's default.
    if os.environ.get("SPARK_LOCAL_DIRS"):
        b = b.config("spark.local.dir", os.environ["SPARK_LOCAL_DIRS"])
    elif os.environ.get("SPARK_GRAFT_TMPFS") == "1":
        # Per-PID dir + stale-sibling sweep (r5): tmpfs shuffle files
        # leak when a JVM dies uncleanly (OOM-kill, SIGKILL mid-run),
        # and because tmpfs IS RAM the leaks silently shrink the
        # memory every LATER run gets — observed at 97 GB of
        # accumulated dead-session spill during the r5 500k rehearsal
        # (the proximate cause of its first OOM). A dir is reclaimed
        # when its owning pid no longer exists.
        base = "/dev/shm/spark-local"
        sweep_dead_spill_dirs(base)
        b = b.config("spark.local.dir", f"{base}/{os.getpid()}")
    if rocksdb_state:
        b = b.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            # bound RocksDB native memory per executor (the point of
            # moving state off-heap is not to move the OOM off-heap)
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
            "true",
        )
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
