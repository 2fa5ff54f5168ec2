"""File sinks: partitioned/compressed parquet, CSV, JSON.

The reference has no writers at all (SURVEY §2.1); a 100 TB pipeline is
write-heavy, so the engine treats sinks as first-class: hive-style
partition layout for pruning, sorted-within-partition output for
row-group skipping, and explicit file-count control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet", mode: str = "overwrite",
                      files_per_partition: int | None = None,
                      sort_within: list[str] | None = None) -> None:
    """Hive-partitioned write.  ``files_per_partition`` repartitions by
    the partition columns first (avoids the classic
    tasks×partitions small-file explosion); ``sort_within`` orders rows
    inside each file so parquet min/max row-group stats prune reads."""
    out = df
    if files_per_partition:
        out = out.repartition(files_per_partition, *partition_cols)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (out.write.mode(mode).format(fmt)
     .partitionBy(*partition_cols).save(path))


def read_partitioned(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read a hive-partitioned dataset; filters on partition columns
    become PartitionFilters (directory pruning, no file IO)."""
    return spark.read.format(fmt).load(path)


def write_single_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Small-result CSV export (coalesced to one file — driver-adjacent
    sizes only; never for fact tables)."""
    (df.coalesce(1).write.mode("overwrite")
     .option("header", str(header).lower()).csv(path))
