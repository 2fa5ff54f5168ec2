"""File sinks: partitioned/compressed parquet, CSV, JSON.

The reference has no writers at all (SURVEY §2.1); a 100 TB pipeline is
write-heavy, so the engine treats sinks as first-class: hive-style
partition layout for pruning, sorted-within-partition output for
row-group skipping, and explicit file-count control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet", mode: str = "overwrite",
                      files_per_partition: int | None = None,
                      sort_within: list[str] | None = None) -> None:
    """Hive-partitioned write.  ``files_per_partition`` caps the file
    count per hive partition (avoids the classic tasks×partitions
    small-file explosion) via a deterministic row-content salt in the
    repartition key — repartitioning on the partition columns alone
    would collapse EVERY hive partition to one file regardless of the
    requested count, serializing fat partitions through single tasks;
    ``sort_within`` orders rows inside each file so parquet min/max
    row-group stats prune reads.

    Costs and caveats of ``files_per_partition``: (a) it runs one extra
    eager job at call time (a small distinct().count() bounded by the
    hive-partition cardinality) to size the repartition explicitly —
    AQE would otherwise coalesce the salted shuffle back down; (b) the
    salt mixes ``spark_partition_id()`` into the row-content hash so
    duplicate rows spread across input partitions still fan out
    (content alone would give identical rows identical salts and
    collapse a duplicate-heavy hive partition back toward one file)
    while staying deterministic under task retry — a re-executed task
    recomputes the same input partition, so the same rows land in the
    same output file both attempts.  Duplicates co-resident in ONE
    input partition still share a salt; at that point the input
    partitioning itself is the skew to fix (see fmx.core.skew)."""
    out = df
    if files_per_partition:
        salt = F.pmod(F.xxhash64(F.spark_partition_id(), *df.columns),
                      F.lit(int(files_per_partition)))
        # explicit numPartitions: without it AQE coalesces the salted
        # shuffle back into few partitions and the per-partition file
        # count silently collapses again; the distinct count is one
        # small agg bounded by the hive-partition cardinality
        n_parts = df.select(*partition_cols).distinct().count() or 1
        out = (out.withColumn("__fmx_salt", salt)
               .repartition(int(n_parts * files_per_partition),
                            *partition_cols, "__fmx_salt"))
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    if files_per_partition:
        out = out.drop("__fmx_salt")
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
    """ORC scan (predicate pushdown + column pruning, like parquet)."""
    return spark.read.orc(path)


def compact_dataset(spark: SparkSession, path: str, fmt: str = "parquet",
                    target_mb: int = 128,
                    partition_cols: list[str] | None = None,
                    sort_within: list[str] | None = None) -> int:
    """Small-file compaction: rewrite a dataset into ~``target_mb``
    files (the lakehouse OPTIMIZE step — streaming sinks and
    per-task writers leave thousands of KB-sized files whose open/seek
    overhead dominates scans long before data volume does).

    Unpartitioned: file count = ceil(current_bytes / target_mb),
    measured from the existing files.  Partitioned: file counts are
    computed PER HIVE PARTITION (ceil(partition_rows * avg_row_bytes /
    target_mb) — avg row width from the dataset totals, so heavily
    skewed per-partition row widths are approximated) and rows are
    salted within each partition, so a large or skewed partition gets
    multiple target-sized files instead of collapsing to one.
    ``sort_within`` restores row-group-stat pruning in the rewritten
    files.  Returns the file count written.  Rewrite is
    read-side-pruned and one shuffle (repartition) wide.

    Swap is crash-safe for readers-after-crash: the old directory is
    renamed aside first, the rewrite renamed into place, THEN the old
    copy deleted — a crash between steps leaves either the old or the
    new dataset at the published path (plus a recoverable
    ``._compact_old``).  Concurrent readers mid-swap can still catch a
    brief window with no directory at ``path``; the utility assumes
    exclusive write access.
    """
    import math
    import os
    import shutil

    if "://" in path:
        # the file math (os.walk) and the crash-safe swap (os.rename)
        # are local-filesystem operations; on a remote URI the sizes
        # would silently read as 0 and the swap would fail AFTER the
        # expensive rewrite
        raise ValueError(
            f"compact_dataset requires a local path, got {path!r} — "
            "for object stores, rewrite to a new prefix and flip the "
            "table location atomically in the catalog instead")

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    target_bytes = target_mb * 1024 * 1024
    # mergeSchema: a dataset appended under an EVOLVING schema has files
    # missing later columns — a single-file-schema read here would
    # silently DROP those columns from the rewrite (data loss, found by
    # test_read_parquet_evolved_unions_schemas).  The O(files) footer
    # scan is exactly what compaction amortizes away.
    df = (spark.read.option("mergeSchema", "true").format(fmt).load(path))
    tmp = path.rstrip("/") + "._compact_tmp"
    if partition_cols:
        # per-partition file math: rows per hive partition (one small
        # agg — bounded by the partition count, not data volume) times
        # the dataset-wide mean row width
        counts = df.groupBy(*partition_cols).count()
        n_rows = (counts.agg(F.sum("count")).collect()[0][0]) or 1
        row_bytes = total / n_rows
        # __fmx_-prefixed internals: a dataset legitimately carrying a
        # '_salt' or '_k' column must not have it overwritten/dropped
        # by the rewrite
        k = (counts.withColumn(
            "__fmx_k", F.greatest(
                F.lit(1),
                F.ceil(F.col("count") * F.lit(row_bytes)
                       / F.lit(target_bytes)).cast("int")))
            .drop("count"))
        # `or 1`: a dataset of only zero-row files (empty micro-batch
        # leftovers — exactly what compaction targets) sums to NULL
        n_files = k.agg(F.sum("__fmx_k")).collect()[0][0] or 1
        data_cols = [c for c in df.columns if c not in partition_cols]
        # deterministic within-partition salt in [0, k_p): spreads a fat
        # partition over k_p shuffle keys; the writer's partitionBy still
        # routes rows to their hive directory
        salted = (df.join(F.broadcast(k), partition_cols)
                  .withColumn("__fmx_salt",
                              F.pmod(F.xxhash64(*data_cols),
                                     F.col("__fmx_k")))
                  .drop("__fmx_k"))
        out = salted.repartition(int(n_files), *partition_cols,
                                 "__fmx_salt")
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        (out.drop("__fmx_salt").write.mode("overwrite").format(fmt)
         .partitionBy(*partition_cols).save(tmp))
    else:
        n_files = max(1, math.ceil(total / target_bytes))
        out = df.repartition(n_files)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        out.write.mode("overwrite").format(fmt).save(tmp)
    # crash-safe swap (same filesystem): old aside -> new in place ->
    # old deleted; a stale .old from a prior crash is cleared first
    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return int(n_files)


def read_parquet_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose files were written under EVOLVING
    schemas (columns added over time — every long-lived lake):
    ``mergeSchema`` unions the per-file schemas, and files missing a
    column yield NULLs for it.

    Schema merging reads every file footer up front — O(files) driver
    work, which is why it is NOT the default read path: use it at
    ingest boundaries (or after compaction, which rewrites to one
    schema), not in hot queries.
    """
    return (spark.read.option("mergeSchema", "true").parquet(path))
