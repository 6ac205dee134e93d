"""SparkSession factory tuned for the pipeline.

Scale notes (100 TB / 1000 executors): every knob here is either
cluster-size-relative (shuffle partitions ~ 2-3x total cores) or a
pure enable flag (AQE, skew join, Arrow) that is correct at any
scale. Nothing below hardcodes a data size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "logging-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build a session with the pipeline's standard configuration.

    - AQE + skew-join handling on: the router's repartition by
      hash(conv_id) can still skew on hot conversations; AQE splits
      oversized post-shuffle partitions at runtime.
    - Arrow on: the grok parser and embedding kernels are pandas UDFs.
    - UTC session timezone: required for oracle (DuckDB) comparison.
    - shuffle partitions default to 2x cores locally; on a real
      cluster set ~2-3x total executor cores via spark-submit --conf.
    """
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(cores * 2, 8)
    # Sandbox/local-mode tuning (harmless on a real cluster where
    # spark-submit --conf overrides): shuffle spill dirs on tmpfs when
    # available (the VM's virtio disk serializes concurrent writers),
    # and throughput-oriented GC — G1's concurrent phases contend
    # badly with 32 task threads on this hypervisor (40% sys time).
    local_dir = None
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # LAST_WIN = python-dict duplicate-key semantics inside
        # map_from_entries (first position, last value): lets the
        # parser skip its O(k^2) interpreted dedup fallback
        # (functions/parse.py) — measured ~2x parse-stage speedup
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # v2 commit: task outputs move to the destination at task
        # commit (parallel, on executors) instead of one serial
        # driver-side rename pass at job commit — measurably shorter
        # commit floor for many-partition sink writes. Idempotent
        # resume is unaffected: bucket overwrite replaces whole
        # partition dirs, so a torn job is rewritten either way
        # (tests/test_resume.py crash-mid-write case).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    # zstd sink files: ~3x smaller than snappy on log-like text, which
    # converts sink-write time from (serial) disk bandwidth into
    # (parallel) compression CPU — better wall time AND better scaling
    builder = builder.config("spark.sql.parquet.compression.codec", "zstd")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # NB: driver JVM options (e.g. -XX:+UseParallelGC) CANNOT be set
    # here — in client/local mode the driver JVM is already running by
    # the time builder confs apply. The GC choice only takes effect via
    # spark-submit --conf spark.driver.extraJavaOptions=... (bench.py
    # passes it; plain `python` runs keep the JVM default GC).
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
