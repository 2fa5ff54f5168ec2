"""End-to-end entity-resolution workflow — the full linkage family
composed the way a production dedup/linkage job runs it:

  1. block + match: multi-pass blocked fuzzy join of corrupted part
     names against the catalog (union of prefix and suffix passes,
     canonicalize-then-match, bounded blocks)
  2. agreement vectors: per-candidate field agreement flags over the
     customer corpus (composite blocking key)
  3. unsupervised fit: Fellegi-Sunter EM estimates the match prior
     and per-field m/u probabilities with NO labels (Winkler 1988 —
     the Splink loop)
  4. supervised reference: the labeled FS weights on the same
     candidates, as calibration for the EM posteriors
  5. decision: patterns above a posterior threshold become links;
     report precision/recall against the planted ground truth (the
     corruption is key-derived, so truth is known)

Run: python examples/entity_resolution.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.linkage import (
    blocked_fuzzy_join_multipass,
    fellegi_sunter_em,
    fellegi_sunter_weights,
)
from fmx.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-entity-resolution")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. multi-pass blocked fuzzy join: dirty part names -> catalog
    part = load_table(spark, sf_dir, "part")
    probes = part.select(
        F.col("p_partkey").alias("probe_id"),
        F.concat(
            F.expr("substring(p_name, 1, 1 + (p_partkey % 4))"),
            F.expr("substring(p_name, CAST(3 + (p_partkey % 4) AS INT), "
                   "length(p_name))")).alias("probe_name"))
    matches = blocked_fuzzy_join_multipass(
        probes, part.select(F.col("p_partkey").alias("part_id"), "p_name"),
        "probe_id", "part_id", "probe_name", "p_name", max_dist=3)
    n_match = matches.count()
    n_right = matches.filter(F.col("probe_id") == F.col("part_id")).count()
    print(f"fuzzy: {n_match} probes matched, {n_right} to the true part")

    # 2. agreement vectors over the blocked customer candidates
    cust = load_table(spark, sf_dir, "customer")
    tail = F.expr("substring(c_name, length(c_name)-1, 2)")
    dirty = cust.select(
        F.col("c_custkey").alias("probe_id"),
        ((F.col("c_nationkey")
          + F.when(F.col("c_custkey") % 5 == 0, 1).otherwise(0)) % 25)
        .alias("nation_p"),
        F.when(F.col("c_custkey") % 7 == 0, F.reverse("c_mktsegment"))
        .otherwise(F.col("c_mktsegment")).alias("seg_p"),
        (F.floor(F.col("c_acctbal") / 500.0).cast("bigint")
         + F.when(F.col("c_custkey") % 3 == 0, 1).otherwise(0))
        .alias("band_p"),
        F.when(F.col("c_custkey") % 11 == 0, F.reverse(tail))
        .otherwise(tail).alias("tail_p"))
    clean = cust.select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 500.0).cast("bigint").alias("band"),
        tail.alias("tail"))
    cands = (dirty.join(clean,
                        (dirty["nation_p"] == clean["c_nationkey"])
                        & (dirty["tail_p"] == clean["tail"]))
             .select("probe_id", "c_custkey",
                     (F.col("seg_p") == F.col("c_mktsegment"))
                     .cast("int").alias("a_seg"),
                     (F.col("band_p") == F.col("band"))
                     .cast("int").alias("a_band"),
                     (F.col("tail_p") == F.col("tail"))
                     .cast("int").alias("a_tail"),
                     (F.col("probe_id") == F.col("c_custkey"))
                     .cast("int").alias("lbl")))

    # 3. unsupervised EM fit (no labels used)
    em = fellegi_sunter_em(cands, ["a_seg", "a_band", "a_tail"], iters=2)
    print("EM pattern posteriors (no labels):")
    for r in em.orderBy("pattern").collect():
        print(f"  pattern={r.pattern} n={r.n_pairs} "
              f"posterior={r.posterior_match:.4f} "
              f"lambda={r.lambda_hat:.4f}")

    # 4. supervised reference weights on the SAME candidates
    sup = fellegi_sunter_weights(cands, ["a_seg", "a_band", "a_tail"],
                                 "lbl")
    print("supervised log2 LR weights (calibration reference):")
    for r in sup.orderBy("pattern").collect():
        print(f"  pattern={r.pattern} n={r.n_pairs} "
              f"weight={r.weight:+.3f}")

    # 5. decision at posterior >= 0.5, scored against the planted truth
    dec = (cands.join(em.select("a_seg", "a_band", "a_tail",
                                "posterior_match"),
                      ["a_seg", "a_band", "a_tail"])
           .withColumn("link", (F.col("posterior_match") >= 0.5)
                       .cast("int")))
    m = dec.agg(
        F.sum(F.col("link") * F.col("lbl")).alias("tp"),
        F.sum(F.col("link") * (1 - F.col("lbl"))).alias("fp"),
        F.sum((1 - F.col("link")) * F.col("lbl")).alias("fn")).first()
    prec = m.tp / (m.tp + m.fp) if (m.tp + m.fp) else 0.0
    rec = m.tp / (m.tp + m.fn) if (m.tp + m.fn) else 0.0
    print(f"decision@0.5: tp={m.tp} fp={m.fp} fn={m.fn} "
          f"precision={prec:.3f} recall={rec:.3f}")
    assert m.tp > 0 and prec > 0.5

    spark.stop()


if __name__ == "__main__":
    main()
