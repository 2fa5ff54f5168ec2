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


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip",
                num_files: int | None = None) -> None:
    """JSON-lines sink (the interchange format most LLM-data tooling
    speaks).  Compressed and file-count-controlled; JSONL is 3-5x
    parquet's size, so it's an EXPORT format — keep the lake in
    parquet."""
    out = df.repartition(num_files) if num_files else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL scan; pass an explicit schema in pipelines (inference reads
    the data twice and is sample-dependent at scale)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_orc(df: DataFrame, path: str,
              partition_cols: list[str] | None = None) -> None:
    """ORC sink — same columnar/predicate-pushdown class as parquet for
    engines that prefer ORC readers."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
