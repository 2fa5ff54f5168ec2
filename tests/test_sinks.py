"""Sink tests: partitioned writes round-trip and prune at the scan."""

from pyspark.sql import functions as F

from fmx.sources import load_table
from fmx.sources.sinks import read_partitioned, write_partitioned, write_single_csv


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderstatus"],
                      files_per_partition=2, sort_within=["o_orderkey"])

    back = read_partitioned(spark, path)
    assert back.count() == orders.count()

    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # partition filter must not appear as a data filter (directory-level
    # pruning, zero file IO for other statuses)
    want = orders.filter("o_orderstatus = 'F'").count()
    assert pruned.count() == want


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    from fmx.sources import read_csv

    nation = load_table(spark, sf_dir, "nation")
    csv_path = str(tmp_path / "nation_csv")
    write_single_csv(nation, csv_path)
    back = read_csv(spark, csv_path)
    assert sorted(back.columns) == sorted(nation.columns)
    assert back.count() == nation.count()
    a = {tuple(r) for r in nation.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    json_path = str(tmp_path / "nation_json")
    nation.write.mode("overwrite").json(json_path)
    jback = spark.read.json(json_path)
    assert jback.count() == nation.count()


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    from fmx.sources import load_table
    from fmx.sources.sinks import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, p, num_files=2)
    back = read_jsonl(spark, p, schema=docs.schema)
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from fmx.sources import load_table
    from fmx.sources.sinks import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_orc")
    write_orc(orders, p)
    back = read_orc(spark, p).filter("o_totalprice > 100000")
    want = orders.filter("o_totalprice > 100000").count()
    assert back.count() == want
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan


def test_compact_dataset_reduces_files_preserves_rows(spark, sf_dir,
                                                      tmp_path):
    """Compaction: a fragmented write (64 tiny files) rewrites into the
    byte-derived target count with identical row content."""
    import glob

    from fmx.sources import load_table
    from fmx.sources.sinks import compact_dataset

    path = str(tmp_path / "frag")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity")
    li.repartition(64).write.parquet(path)
    before = len(glob.glob(path + "/part-*"))
    assert before == 64
    n_rows = li.count()

    written = compact_dataset(spark, path, target_mb=128,
                              sort_within=["l_orderkey"])
    after = glob.glob(path + "/part-*")
    assert len(after) == written == 1  # sf test data << 128 MB
    assert spark.read.parquet(path).count() == n_rows


def test_compact_dataset_partitioned_per_partition_counts(spark, sf_dir,
                                                          tmp_path):
    """Partitioned compaction must honor target_mb PER hive partition:
    a fat partition splits into multiple files (via the within-partition
    salt) while a small one compacts to a single file — the global
    byte math may not collapse every partition to one file."""
    import glob

    from pyspark.sql import functions as F

    from fmx.sources.sinks import compact_dataset

    # ~4 MB fat partition vs a tiny one, fragmented into many files
    fat = spark.range(400_000).select(
        F.lit("a").alias("part"), F.col("id"),
        F.md5(F.col("id").cast("string")).alias("payload"))
    small = spark.range(100).select(
        F.lit("b").alias("part"), F.col("id"),
        F.md5(F.col("id").cast("string")).alias("payload"))
    path = str(tmp_path / "pds")
    (fat.unionAll(small).repartition(16)
     .write.partitionBy("part").parquet(path))
    n_rows = spark.read.parquet(path).count()

    written = compact_dataset(spark, path, target_mb=1,
                              partition_cols=["part"])
    fat_files = glob.glob(path + "/part=a/part-*")
    small_files = glob.glob(path + "/part=b/part-*")
    assert len(fat_files) >= 2, "fat partition collapsed to one file"
    assert len(small_files) == 1
    assert written >= 3
    assert spark.read.parquet(path).count() == n_rows


def test_compact_dataset_crash_leaves_recoverable_state(spark, sf_dir,
                                                        tmp_path):
    """The swap renames the old dataset aside BEFORE publishing the new
    one: at no point between the rewrite finishing and the swap
    completing is the data unrecoverable (old survives at ._compact_old
    until the new copy is in place)."""
    import os

    from fmx.sources import load_table
    from fmx.sources.sinks import compact_dataset

    path = str(tmp_path / "ds")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    li.repartition(4).write.parquet(path)
    n = li.count()
    # a stale .old from a previously crashed run must not break the swap
    os.makedirs(path + "._compact_old/junk")
    compact_dataset(spark, path, target_mb=128)
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")
    assert spark.read.parquet(path).count() == n


def test_read_parquet_evolved_unions_schemas(spark, tmp_path):
    """Files written before a column existed read back as NULL for it;
    the merged schema is the union, and compaction normalizes the
    dataset to one schema."""
    from fmx.sources.sinks import compact_dataset, read_parquet_evolved

    path = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, v string") \
        .write.mode("overwrite").parquet(path)
    spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double") \
        .write.mode("append").parquet(path)

    df = read_parquet_evolved(spark, path)
    assert set(df.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5

    # compaction rewrites to the merged schema: plain reads now see it
    compact_dataset(spark, path)
    plain = spark.read.parquet(path)
    assert set(plain.columns) == {"id", "v", "score"}
    assert plain.count() == 2


def test_write_partitioned_files_per_partition_splits(tmp_path, spark):
    """files_per_partition must actually yield multiple files per hive
    partition — repartitioning on the partition key alone collapses
    every partition to one file."""
    import glob

    from fmx.sources.sinks import write_partitioned

    df = spark.range(2000).withColumn("p", F.lit("a"))
    out = str(tmp_path / "fpp")
    write_partitioned(df, out, ["p"], files_per_partition=4)
    files = [f for f in glob.glob(f"{out}/p=a/*") if f.endswith(".parquet")]
    assert len(files) > 1
    back = spark.read.parquet(out)
    assert back.count() == 2000 and "__fmx_salt" not in back.columns


def test_compact_dataset_rejects_remote_uri(tmp_path, spark):
    import pytest as _pt

    from fmx.sources.sinks import compact_dataset

    with _pt.raises(ValueError, match="local path"):
        compact_dataset(spark, "s3a://bucket/events")
