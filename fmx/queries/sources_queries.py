"""Source-operator queries (SURVEY §2.1): in-memory literal relations
(S2), libsvm-style text parsing (S3), and approximate aggregates
(engine capabilities, rows-only checks — HLL/quantile sketches are
engine-specific by design).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T
from fmx.sources import read_libsvm_text

_LIBSVM_FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "data", "sample_libsvm.txt")


@query(
    "s2_inline_relation",
    oracle="""
    SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', -0.5), (3, 'c', 0.0))
        AS t(id, tag, x)
    """)
def s2_inline_relation(spark, sf):
    """In-memory literal relation (ref S2, Suite:34-53 toDF fixtures)."""
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -0.5), (3, "c", 0.0)],
        "id bigint, tag string, x double")


@query(
    "s3_libsvm_parse",
    oracle=f"""
    WITH raw AS (SELECT column0 AS line FROM
                 read_csv('{_LIBSVM_FIXTURE}', delim=NULL, header=false)),
    toks AS (SELECT string_split(trim(line), ' ') AS t FROM raw),
    pairs AS (SELECT CAST(t[1] AS DOUBLE) AS label, unnest(t[2:]) AS pair
              FROM toks)
    SELECT label,
           CAST(CAST(string_split(pair, ':')[1] AS INTEGER) - 1 AS BIGINT)
               AS featureId,
           CAST(string_split(pair, ':')[2] AS DOUBLE) AS featureValue
    FROM pairs
    """)
def s3_libsvm_parse(spark, sf):
    """1-indexed ``label idx:val`` text parsing to 0-indexed long format
    (ref S3, data/sample.txt:1-6) — native split/explode, no UDF."""
    out = read_libsvm_text(spark, _LIBSVM_FIXTURE)
    return out.select("label", F.col("featureId").cast("bigint")
                      .alias("featureId"), "featureValue")


@query("approx_distinct")  # sketch-based: engine-specific, rows-only
def approx_distinct(spark, sf):
    """HyperLogLog++ approximate distinct counts (engine capability;
    sketches are engine-specific so no cross-engine oracle)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", rsd=0.02)
                 .alias("approx_parts")))


@query("approx_quantiles")  # sketch-based: engine-specific, rows-only
def approx_quantiles(spark, sf):
    """Greenwald-Khanna approximate percentiles (engine capability)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", F.lit(0.5), 1000)
                 .alias("approx_median")))


def _hll_oracle() -> str:
    from fmx.operators.sketches import hll_sql
    return ("WITH src AS (SELECT event_type, user_id FROM events),\n"
            + hll_sql("event_type", "user_id", "src", tag="hll"))


@query("approx_distinct_hll", oracle=_hll_oracle())
def approx_distinct_hll(spark, sf):
    """Engine-portable HyperLogLog distinct users per event type: the
    md5-derived register construction and textbook estimator run
    identically on any engine, so unlike approx_count_distinct's
    HLL++ this sketch IS hash-verified cross-engine.  One (group,
    register) hash-agg with map-side combine + a 64-row-per-group
    fold; register state merges by max across partitions/batches."""
    from fmx.operators.sketches import hll_distinct

    return hll_distinct(T(spark, sf, "events"), "event_type", "user_id")
