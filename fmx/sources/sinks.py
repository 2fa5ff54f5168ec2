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


def compact_dataset(spark: SparkSession, path: str, fmt: str = "parquet",
                    target_mb: int = 128,
                    partition_cols: list[str] | None = None,
                    sort_within: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a dataset into ~``target_mb``
    files (the lakehouse OPTIMIZE step — streaming sinks and
    per-task writers leave thousands of KB-sized files whose open/seek
    overhead dominates scans long before data volume does).

    File count = ceil(current_bytes / target_mb), measured from the
    existing files; partitioned datasets keep their layout
    (``files_per_partition`` math applies per partition);
    ``sort_within`` restores row-group-stat pruning in the rewritten
    files.  Returns the file count written.  Rewrite is
    read-side-pruned and one shuffle (repartition) wide.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.format(fmt).load(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    if partition_cols:
        write_partitioned(df, tmp, partition_cols, fmt=fmt,
                          files_per_partition=n_files,
                          sort_within=sort_within)
    else:
        out = df.repartition(n_files)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        out.write.mode("overwrite").format(fmt).save(tmp)
    # atomic-ish swap (same filesystem): old data replaced only after
    # the rewrite fully succeeded
    import shutil
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
