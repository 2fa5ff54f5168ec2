"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config block
is what we would ship to a 1000-executor cluster: AQE on (runtime
coalescing + skew-join handling), Arrow for the few pandas-UDF paths,
UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting, dynamic broadcast conversion. Essential at 100 TB where
    # static partition counts are always wrong for somebody.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/param tables) broadcast instead of
    # shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow batches for the pandas-UDF boundary paths (multimodal decode,
    # ANN rerank) — 10-100x over row-at-a-time pickling.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics; matches the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: vectorized reader + filter pushdown are on by default;
    # keep partition file splits sized for executor memory.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # the events table stores TIMESTAMP(NANOS) which Spark rejects by
    # default; read as long and normalize in fmx.sources.load_table
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # parquet timestamps with isAdjustedToUTC=false would otherwise read
    # as TIMESTAMP_NTZ (Spark 3.4+ inference), which watermarks reject
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — read them as session-tz
    # TIMESTAMP; with the UTC session zone the wall times match the
    # DuckDB oracle either way
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def sql(spark: SparkSession, sf_dir: str, statement: str):
    """Run a SQL statement with every test table registered as a view —
    the spark.sql twin of the DataFrame query layer."""
    from fmx.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(statement)


def get_spark(
    app_name: str = "fmx",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with fmx defaults.

    ``shuffle_partitions`` defaults to the local core count; on a real
    cluster set it to 2-3x total executor cores (AQE coalesces down).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = os.cpu_count() or 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
