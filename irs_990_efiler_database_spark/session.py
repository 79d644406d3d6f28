"""SparkSession factory tuned for both local correctness runs and
cluster-scale (100 TB) execution.

Every config here is scale-motivated:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  so the same logical plans survive a 1000-executor deployment.
- ``shuffle.partitions`` defaults to the local core count; on a real
  cluster AQE's coalescing makes the initial number far less critical.
- Arrow enabled so the Pandas-UDF slow path is batch-vectorized.
- UTC session timezone so timestamp semantics are deployment-independent
  (and comparable against external oracles).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return int(env)
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "irs-990-efiler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    In local mode one JVM hosts everything, so ``spark.driver.memory`` is
    the only memory knob; on a cluster the same configs apply per executor.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # partition values round-trip exactly as written (the 990 output
        # model is all-string; inference would read FISYR=2014 as int)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # RocksDB-backed streaming state: the default HDFS-backed store
        # keeps every key in executor heap, which bounds stateful
        # queries (sessions, stream-stream joins, dedup horizon) by
        # memory at 100x state; RocksDB spills to local disk and
        # checkpoints incrementally via changelogs
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # FileStreamSink logs a WARN + full FileNotFoundException stack
    # trace whenever a batch read uses a glob path (it probes for a
    # streaming _spark_metadata dir that legitimately isn't there).
    # That trace in a bench/job log reads like a real failure — raise
    # just that logger to ERROR.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.streaming.FileStreamSink",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:  # pragma: no cover - log4j API drift is cosmetic
        pass
    return spark
