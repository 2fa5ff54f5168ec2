"""Leakage-free tabular feature engineering over the orders table —
the fit-on-train / apply-everywhere discipline a feature platform
enforces, composed from engine operators:

  1. split: deterministic hash split (stable under reprocessing)
  2. fit: target + frequency encodings computed on TRAIN ONLY
  3. apply: encodings joined onto val (unseen keys fall back to the
     train prior — never to their own slice's statistics; production
     serving applies the same table the same way)
  4. audit: within-train the LOO form is used, so no row sees its own
     label even inside the fit slice
  5. eval: MAE of the encoding as a 1-feature predictor, per split —
     val error computed against features that never saw val labels

Run: python examples/tabular_features.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.features import target_encode_loo
from fmx.operators.sampling import hash_split
from fmx.sources import load_table

SMOOTH = 10.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-tabular-features")
    spark.sparkContext.setLogLevel("ERROR")

    # unit price (extendedprice / quantity) carries part-level signal
    # in the synthetic data (within-part sd < global sd), so the
    # encoding gives a real, if modest, lift over the prior baseline —
    # the point of the example is the leakage DISCIPLINE, not the lift
    li = load_table(spark, sf_dir, "lineitem")
    # the natural key (orderkey, linenumber) keeps the hash split a
    # pure function of the ROW — monotonically_increasing_id would
    # reshuffle slices whenever the partition layout changes, the
    # exact reprocessing leak hash_split exists to prevent
    orders = li.select(
        F.concat_ws(":", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"))
        .alias("o_orderkey"),
        F.col("l_partkey").alias("o_custkey"),
        (F.col("l_extendedprice") / F.col("l_quantity"))
        .alias("o_totalprice"))

    # 1. deterministic split — a row's slice never changes on re-runs
    split = hash_split(orders, "o_orderkey",
                       {"train": 0.8, "val": 0.2}, seed=7)
    train = split.filter(F.col("split") == "train")
    val = split.filter(F.col("split") == "val")

    # 2. fit on train only: LOO inside train (no row sees its own
    # label), plain smoothed mean as the SERVING table (what val and
    # production rows receive)
    train_enc = target_encode_loo(train, "o_custkey", "o_totalprice",
                                  smoothing=SMOOTH)
    prior = train.agg(F.avg("o_totalprice").alias("_prior"))
    serve = (train.groupBy("o_custkey")
             .agg(F.sum("o_totalprice").alias("_s"),
                  F.count("*").alias("_c"))
             .crossJoin(F.broadcast(prior))
             .select("o_custkey",
                     ((F.col("_s") + SMOOTH * F.col("_prior"))
                      / (F.col("_c") + SMOOTH)).alias("enc")))

    # 3. apply to val: left join + prior fallback for unseen customers
    joined = (val.join(serve, "o_custkey", "left")
              .crossJoin(F.broadcast(prior)))
    unseen = joined.filter(F.col("enc").isNull()).count()
    val_enc = (joined
               .withColumn("enc", F.coalesce("enc", F.col("_prior")))
               .drop("_prior"))

    # 5. the encoding as a 1-feature predictor, honest per-split MAE
    def mae(df):
        return df.agg(F.avg(F.abs(F.col("o_totalprice")
                                  - F.col("enc")))).first()[0]

    baseline = (val.crossJoin(F.broadcast(prior))
                .agg(F.avg(F.abs(F.col("o_totalprice")
                                 - F.col("_prior")))).first()[0])
    print(f"train rows {train.count()}  val rows {val.count()}  "
          f"unseen-customer val rows {unseen}")
    print(f"train LOO MAE {mae(train_enc):.2f}")
    print(f"val MAE {mae(val_enc):.2f}  (prior-only baseline "
          f"{baseline:.2f})")
    print("leakage-free: val features derive from train labels only")

    # 6. the k-fold variant (coarser leakage control than LOO — the
    # recipe when the same frame later trains one model per fold) plus
    # discretized features: quartile-bucketed target, top-K key vocab
    from fmx.operators.features import (onehot_topk, quantile_bucketize,
                                        target_encode_kfold)

    kf = target_encode_kfold(train, "o_custkey", "o_totalprice",
                             id_col="o_orderkey", n_folds=5,
                             smoothing=SMOOTH, seed=7)
    print(f"train 5-fold MAE {mae(kf):.2f}  (out-of-fold encodings)")
    feats = onehot_topk(
        quantile_bucketize(train, "o_totalprice", out_col="price_q"),
        "o_custkey", k=100)
    q_counts = (feats.groupBy("price_q").count()
                .orderBy("price_q").collect())
    in_vocab = feats.filter(F.col("cat_index") >= 0).count()
    print("price quartile sizes", [r["count"] for r in q_counts],
          f"(equal-frequency); top-100 vocab covers {in_vocab} rows")

    spark.stop()


if __name__ == "__main__":
    main()
