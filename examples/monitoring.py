"""Pipeline-observability workflow — the daily monitoring pass a data
platform runs over a production table, composed from engine operators:

  1. validity: A/B sample-ratio-mismatch guardrail (chi2 vs 50/50)
  2. drift: two-sample KS between yesterday-like and today-like halves
  3. changepoint: CUSUM localization of the largest mean shift
  4. reconciliation: bucket-register table diff vs a mutated replica,
     then drill-down to the exact changed keys
  5. contract: key-multiplicity profile before declaring a join key
  6. freshness: per-source staleness vs the dataset's newest event
  7. schema health: per-column null-rate drift between the window's
     early and late half
  8. contiguity: did the exporter drop an id chunk (bucket registers)

Every stage is a DataFrame plan with a DuckDB-checkable twin in the
registry; at scale each is one or two scans plus bounded-row windows.

Run: python examples/monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.dq import table_diff, table_diff_drilldown
from fmx.operators.sampling import hash_uniform01
from fmx.queries import all_queries
from fmx.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-monitoring")
    spark.sparkContext.setLogLevel("ERROR")
    Q = all_queries()

    # 1. SRM guardrail — a triggered SRM voids any experiment readout
    srm = Q["eval_ab_srm"].fn(spark, sf_dir).first()
    print(f"srm: control {srm.n_control} treatment {srm.n_treatment} "
          f"chi2 {srm.chi2:.3f} detected {bool(srm.srm_detected)}")

    # 2. split drift — binned KS between the two hash halves
    ks = Q["eval_ks_split_drift"].fn(spark, sf_dir).first()
    print(f"ks drift: n_a {ks.n_a} n_b {ks.n_b} ks {ks.ks_stat:.4f}")

    # 3. changepoint — where did the daily rate shift the most
    cp = (Q["ts_cusum_changepoint"].fn(spark, sf_dir)
          .filter(F.col("is_changepoint") == 1).first())
    print(f"changepoint: {cp.day} (cusum dev {cp.cusum_dev:.1f})")

    # 4. reconciliation — registers find WHERE, drill-down finds WHAT
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    u = hash_uniform01("o_orderkey", "mut", 42)
    replica = o.withColumn(
        "o_totalprice",
        F.when(u < 0.01, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice")))
    sig = F.concat_ws(
        ":", F.col("o_orderkey").cast("string"), F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        .cast("string"))
    diff = table_diff(o, replica, "o_orderkey", sig, num_buckets=256)
    n_buckets = diff.count()
    changed = table_diff_drilldown(o, replica, "o_orderkey", sig, diff,
                                  num_buckets=256).count()
    print(f"reconcile: {n_buckets}/256 buckets differ -> "
          f"{changed} changed keys (drill-down read ~"
          f"{n_buckets * 100 // 256}% of the table)")

    # 5. join-contract check — is the claimed key actually unique
    ku = Q["dq_key_uniqueness"].fn(spark, sf_dir).first()
    print(f"key profile: {ku.n_keys} keys, {ku.n_dup_keys} duplicated, "
          f"worst multiplicity {ku.max_multiplicity}")

    # 6. freshness — did any source stop delivering (lag vs global max;
    # the register is max-mergeable, so yesterday's snapshot folds in)
    from fmx.operators.dq import freshness_lag

    ev = load_table(spark, sf_dir, "events")
    stale = (freshness_lag(ev, "event_type", "ts", warn_lag_hours=24.0)
             .filter(F.col("stale")).count())
    print(f"freshness: {stale} stale sources (>24h behind)")

    # 7. schema health — did a column start going NULL mid-window
    from fmx.operators.dq import null_rate_drift

    drift = null_rate_drift(ev, ["value", "props"], "ts")
    worst = drift.orderBy(F.desc_nulls_last("drift")).first()
    print(f"null drift: worst column {worst.col} "
          f"({worst.rate_early} -> {worst.rate_late})")

    # 8. contiguity — the id line itself (registers are mergeable, so
    # the streaming twin accumulates the same state; one shared fold)
    from fmx.operators.dq import id_gaps

    gaps = id_gaps(ev, "event_id", bucket=4096).first()
    print(f"id gaps: {gaps.n_ids} ids in [{gaps.id_min}, {gaps.id_max}], "
          f"{gaps.n_missing} missing ({gaps.n_gap_buckets} gap buckets)")

    print("monitoring pass complete")
    spark.stop()


if __name__ == "__main__":
    main()
