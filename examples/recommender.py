"""End-to-end FM recommender pipeline — the port of the reference's
MovieLens sample app (FactorizationMachinesSample.scala:16-135) onto the
driver test tables (lineitem as the ratings relation: customer = user,
part = item, quantity = implicit rating).

Feature scheme (reference udfCrateFeatureVec, Sample.scala:76-95):
  one-hot user  block [0, maxUser)
  one-hot item  block [maxUser, maxUser + maxItem)
  other-rated-items block [maxUser + maxItem, maxUser + 2*maxItem),
      each weighted 1/(n-1)

The Scala UDF becomes native array expressions: collect_set per user,
explode back, higher-order filter/transform — no Python in the feature
build.  Run: python examples/recommender.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import functions as F

import fmx
from fmx.fm import FMRegressorSGD
from fmx.sources import load_table


def ratings_to_features(ratings, max_user: int, max_item: int):
    """(user, item, label) -> (user, item, label, fmap) with the exact
    reference sparse layout (udfCrateFeatureVec, Sample.scala:76-95):

      index user                            -> 1.0   (one-hot user)
      index max_user + item                 -> 1.0   (one-hot item)
      index max_user + max_item + other     -> 1/(n-1) per *other* rated
                                               item (empty when n < 2)

    over dimension max_user + 2*max_item.  The Scala UDF becomes native
    array expressions — no Python in the feature build.
    """
    # per-user rated-item set (Sample.scala:109-112 collect_set), exploded
    # back to one row per rating (Sample.scala:113-117)
    per_user = ratings.groupBy("user").agg(
        F.collect_set("item").alias("items"),
        F.count("*").alias("n_items"))
    joined = ratings.join(per_user, "user")

    others = F.filter(F.col("items"), lambda it: it != F.col("item"))
    other_weight = 1.0 / (F.col("n_items") - 1)
    pairs = F.concat(
        F.array(F.struct(F.col("user").cast("int").alias("i"),
                         F.lit(1.0).alias("x"))),
        F.array(F.struct((F.col("item") + max_user).cast("int").alias("i"),
                         F.lit(1.0).alias("x"))),
        F.when(F.col("n_items") > 1,
               F.transform(others, lambda it: F.struct(
                   (it + max_user + max_item).cast("int").alias("i"),
                   other_weight.cast("double").alias("x"))))
        .otherwise(F.array()))
    return (joined.select("user", "item",
                          F.col("label").cast("double").alias("label"),
                          F.transform(pairs, lambda p: p["x"]).alias("_xs"),
                          F.transform(pairs, lambda p: p["i"]).alias("_is"))
            .select("user", "item", "label",
                    F.map_from_arrays("_is", "_xs").alias("fmap")))


def build_features(spark, sf_dir: str):
    """lineitem -> (features as (featureId, featureValue) pairs, label)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey"), F.col("l_partkey"), F.col("l_quantity"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    ratings = (li.join(orders, li.l_orderkey == orders.o_orderkey)
               .select(F.col("o_custkey").alias("user"),
                       F.col("l_partkey").alias("item"),
                       (F.col("l_quantity") / 50.0).alias("label"))
               .groupBy("user", "item").agg(F.max("label").alias("label")))

    bounds = ratings.agg(F.max("user").alias("mu"),
                         F.max("item").alias("mi")).first()
    max_user, max_item = int(bounds.mu) + 1, int(bounds.mi) + 1
    feats = ratings_to_features(ratings, max_user, max_item)
    return feats.select("label", "fmap"), max_user + 2 * max_item


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-recommender")
    spark.sparkContext.setLogLevel("ERROR")

    feats, dim = build_features(spark, sf_dir)
    # long-format features via map explode keeps the 2^31-dim headroom
    # promise (README.md:7): nothing dense is ever materialized
    from pyspark.ml.linalg import SparseVector, VectorUDT
    from pyspark.sql.types import DoubleType, StructField, StructType

    to_vec = F.udf(
        lambda m: SparseVector(dim, sorted(m.items())) if m else None,
        VectorUDT())
    data = feats.select(to_vec("fmap").alias("features"), "label").cache()
    train, test = data.randomSplit([0.9, 0.1], seed=42)

    lo_hi = train.agg(F.min("label"), F.max("label")).first()
    fm = (FMRegressorSGD(dimFactorization=8, maxIter=5, miniBatchFraction=0.2,
                         stepSize=1.0, initialSd=0.01, seed=1234)
          .setMinLabel(float(lo_hi[0])).setMaxLabel(float(lo_hi[1])))
    evaluator = RegressionEvaluator(metricName="mae")
    grid = ParamGridBuilder().addGrid(fm.regParam, [1e-6, 0.0]).build()
    cv = CrossValidator(estimator=fm, estimatorParamMaps=grid,
                        evaluator=evaluator, numFolds=2, seed=42)
    model = cv.fit(train)

    pred = model.transform(test)
    pred.select("label", "prediction").show(10)
    print(f"MAE on held-out split: {evaluator.evaluate(pred):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
