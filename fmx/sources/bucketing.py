"""Bucketed-table helpers: pre-shuffle co-location for repeated joins.

At 100 TB, a fact-fact join (orders ⋈ lineitem on orderkey) shuffles
both sides every run.  Writing both tables bucketed by the join key
moves that shuffle to write time: every subsequent join is
Exchange-free (SortMergeJoin over pre-bucketed scans).  This is the
persistent-table twin of ``repartition``-based co-partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 8, sort: bool = True) -> None:
    """Save as a bucketed (and optionally sort-within-bucket) managed
    table — subsequent equi-joins/aggs on ``bucket_col`` skip the
    exchange (and the sort, when sorted)."""
    writer = (df.write.mode("overwrite")
              .bucketBy(num_buckets, bucket_col))
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans no Exchange on either side."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
