"""SparkSession factory tuned for the CDC/analytics engine.

Local mode is the sandbox proxy for a multi-executor cluster; every setting
here is also correct on a real cluster (AQE, Arrow, UTC, shuffle partitions
sized to parallelism). The engine itself never assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app_name: str = "datachain_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cpus: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to 2x cpus (small-data local tuning; a
    cluster deployment would size this to total cores via spark-submit conf).
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        ncores = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cpus}]"
        ncores = cpus
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * ncores)

    # Throughput GC: G1's concurrent phases compete with mutator threads
    # and anti-scale badly at high thread counts on throttled hosts —
    # measured on this box: the CDC replay at local[32] ran SLOWER than
    # local[8] under G1 (ratio 0.9x) and 2.1x faster under ParallelGC,
    # matching the host's granted-capacity probe. Batch/ETL engines want
    # max-throughput GC; a cluster deployment would set the same via
    # spark.executor.extraJavaOptions. Overridable through extra_conf.
    #
    # GC threads are capped at the SESSION's core count, not the host's:
    # the JVM sizes ParallelGCThreads from the physical CPU count (~23 on
    # this 32-core host), so a local[8] session would silently borrow 23
    # host threads for GC bursts — capacity a real 8-core executor JVM
    # does not have (and an unfair subsidy to the small level in N-vs-4N
    # scaling runs). Measured on the 3.9e6-event apply: local[32]
    # 3.47s -> 3.28s with the cap; local[8] 7.43s -> 7.84s (it loses its
    # borrowed GC threads) — i.e. the cap is also what a per-executor
    # deployment would see.
    java_opts = f"-XX:+UseParallelGC -XX:ParallelGCThreads={ncores}"
    if extra_conf and "spark.driver.extraJavaOptions" in extra_conf:
        java_opts = extra_conf["spark.driver.extraJavaOptions"]

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Spark 4.1's ChecksumCheckpointFileManager deadlocks committing
        # HDFSBackedStateStore deltas on local filesystems (awaitResult
        # hang observed in applyInPandasWithState) — checksums off
        .config("spark.sql.streaming.checkpointFileChecksum.enabled", "false")
        .config("spark.sql.streaming.stateStore.checksumEnabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (used between parallelism levels in bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
