"""Offline experimentation workflow over the event log — the analysis
loop every product/data team runs, composed from engine operators:

  1. pre-flight: join-cardinality estimate before the user join
  2. assignment: deterministic md5 hash -> control / treatment
  3. readout: per-arm mean + SE (one scan)
  4. uncertainty: Poisson-bootstrap CI of the overall mean in ONE
     scan (16 replicates as extra aggregate columns, no resampling
     loop)
  5. guardrail: D1/D7 cohort retention unchanged across arms

Run: python examples/experimentation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.profiling import bootstrap_mean_ci
from fmx.operators.sampling import hash_uniform01
from fmx.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-experimentation")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")
    buys = ev.filter(F.col("event_type") == "purchase")

    # 1. pre-flight: estimate the purchases x users self-join size from
    # two #keys aggregates (cheap) before running anything expensive
    ca = buys.groupBy("user_id").agg(F.count("*").alias("ca"))
    est = (ca.agg(F.sum(F.col("ca") * F.col("ca")).alias("est"))
           .first().est)
    print(f"pre-flight: user self-join would produce ~{est} rows")

    # 2.+3. assignment + readout
    u = hash_uniform01("user_id", "exp1", 42)
    arms = (buys.withColumn("arm", F.when(u < 0.5, F.lit("control"))
                            .otherwise(F.lit("treatment")))
            .groupBy("arm")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("value"), 4).alias("mean_value"),
                 F.round(F.stddev_samp("value")
                         / F.sqrt(F.count("*")), 4).alias("se")))
    for r in arms.orderBy("arm").collect():
        print(f"arm={r.arm}: n={r.n} mean={r.mean_value} se={r.se}")

    # 4. bootstrap CI of the overall mean purchase value
    ci = bootstrap_mean_ci(buys.select("event_id", "value"),
                           "event_id", "value").first()
    print(f"overall mean {ci.mean} in [{ci.ci_lo}, {ci.ci_hi}] "
          f"(poisson bootstrap, 16 replicates, one scan)")

    # 5. guardrail: D1 retention by arm (cohort join + distinct counts)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"))
    act = (ev.join(firsts, "user_id")
           .select("user_id",
                   F.datediff(F.date_trunc("day", "ts"), "d0")
                   .alias("day_n")))
    ret = (act.withColumn("arm", F.when(
        hash_uniform01("user_id", "exp1", 42) < 0.5,
        F.lit("control")).otherwise(F.lit("treatment")))
        .groupBy("arm")
        .agg(F.countDistinct("user_id").alias("users"),
             F.countDistinct(F.when(F.col("day_n") == 1,
                                    F.col("user_id"))).alias("d1")))
    for r in ret.orderBy("arm").collect():
        print(f"guardrail arm={r.arm}: users={r.users} "
              f"d1_retained={r.d1} ({r.d1 / r.users:.3f})")

    spark.stop()


if __name__ == "__main__":
    main()
