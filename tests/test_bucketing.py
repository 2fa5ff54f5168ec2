"""Bucketed co-located join: correctness + the plan guarantee (no
shuffle Exchange on either side of the join)."""

import pytest
from pyspark.sql import functions as F

from fmx.sources import load_table
from fmx.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # disable broadcast so the join strategy genuinely tests bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "okey"), "b_orders", "okey", num_buckets=4)
    write_bucketed(load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "okey"), "b_lineitem", "okey", num_buckets=4)
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                   str(64 * 1024 * 1024))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    joined = bucketed_join(spark, "b_lineitem", "b_orders", on="okey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    joined = (bucketed_join(spark, "b_lineitem", "b_orders", on="okey")
              .groupBy("o_orderstatus")
              .agg(F.count("*").alias("cnt"),
                   F.round(F.sum("l_quantity"), 2).alias("qty")))
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderstatus")
             .agg(F.count("*").alias("cnt"),
                  F.round(F.sum("l_quantity"), 2).alias("qty")))
    a = {(r.o_orderstatus, r.cnt, r.qty) for r in joined.collect()}
    b = {(r.o_orderstatus, r.cnt, r.qty) for r in plain.collect()}
    assert a == b
