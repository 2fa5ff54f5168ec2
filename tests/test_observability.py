"""Observability: F.observe metrics ride along the dataflow without a
second job — how a 100TB pipeline watches row counts / null rates /
value ranges for free."""

from pyspark.sql import Observation
from pyspark.sql import functions as F

from fmx.sources import load_table


def test_observe_metrics_on_pipeline(spark, sf_dir):
    obs = Observation("li_metrics")
    li = load_table(spark, sf_dir, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("l_discount").isNull(), 1).otherwise(0))
         .alias("null_discounts"),
        F.max("l_quantity").alias("max_qty"))
    out = (observed.filter("l_quantity > 25")
           .groupBy("l_returnflag").count())
    out.collect()
    m = obs.get
    assert m["rows"] == li.count()
    assert m["null_discounts"] == 0
    assert m["max_qty"] > 25
