"""Salted join / salted aggregation equivalence tests."""

from pyspark.sql import functions as F

from fmx.core import skew


def test_salted_join_matches_plain_join(spark, sf_dir):
    from fmx.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    plain = (li.join(part, li.l_partkey == part.p_partkey)
             .groupBy("p_brand").agg(F.count("*").alias("cnt")))
    salted = (skew.salted_join(li.withColumnRenamed("l_partkey", "p_partkey"),
                               part, on="p_partkey", num_salts=8)
              .groupBy("p_brand").agg(F.count("*").alias("cnt")))
    a = {(r.p_brand, r.cnt) for r in plain.collect()}
    b = {(r.p_brand, r.cnt) for r in salted.collect()}
    assert a == b


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    from fmx.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"), F.count("*").alias("cnt"),
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
    salted = skew.salted_agg(
        li, ["l_returnflag"],
        {"qty": "sum(l_quantity)", "cnt": "count(*)",
         "lo": "min(l_extendedprice)", "hi": "max(l_extendedprice)"},
        num_salts=8)
    a = {(r.l_returnflag, round(r.qty, 6), r.cnt, r.lo, r.hi)
         for r in plain.collect()}
    b = {(r.l_returnflag, round(r.qty, 6), r.cnt, r.lo, r.hi)
         for r in salted.collect()}
    assert a == b


def test_salted_agg_count_col_skips_nulls(spark):
    """count(col) must skip NULLs while count(*) counts rows — the old
    partial mapped both to count(*) (VERDICT r02 minor #4)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)], "k string, v int")
    out = {r.k: (r.n_rows, r.n_v)
           for r in skew.salted_agg(df, ["k"],
                                    {"n_rows": "count(*)",
                                     "n_v": "count(v)"},
                                    num_salts=4).collect()}
    assert out == {"a": (3, 2), "b": (1, 0)}


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    with pytest.raises(ValueError):
        skew.salted_agg(spark.range(10), ["id"], {"m": "median(id)"})


def test_salted_join_rejects_outer_and_salt_is_deterministic(spark):
    import pytest as _pt

    from fmx.core.skew import salted_join, with_salt

    big = spark.range(100).withColumnRenamed("id", "k")
    small = spark.range(10).withColumnRenamed("id", "k")
    with _pt.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="full")
    # deterministic: same content -> same salt under any layout
    a = {r.k: r._salt for r in with_salt(big).collect()}
    b = {r.k: r._salt for r in with_salt(big.repartition(7)).collect()}
    assert a == b
