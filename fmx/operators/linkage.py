"""Record linkage / entity resolution: blocked fuzzy matching.

The reference engine (soonraah/fm_spark) has no linkage surface; this
is the engine-capability family a training-data pipeline needs when
two corpora must be joined on dirty keys (user tables from different
systems, scraped titles vs catalog titles, author name variants).

The non-negotiable scale rule is the same as every similarity family
in this repo: candidates MUST meet through an equi-join on a blocking
key, never an all-pairs comparison.  Edit distance runs only inside a
block, and blocks are bounded by construction (choose blocking keys
whose fan-out is capped — prefix + length band here; add more keys to
tighten).  At 100 TB the blocked join is an ordinary shuffle hash
join on the block key; a cartesian would be 10^18 pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_join"]


def blocked_fuzzy_join(left: DataFrame, right: DataFrame,
                       left_id: str, right_id: str,
                       left_name: str, right_name: str,
                       block_prefix: int = 4, length_band: int = 4,
                       max_dist: int = 3) -> DataFrame:
    """Best fuzzy match per left row: block on (name prefix, length
    band), compute Levenshtein distance inside each block, keep the
    minimum-distance right candidate (ties broken by right id) within
    ``max_dist``.

    Returns (left_id, right_id, left_name, right_name, dist, n_cands)
    — one row per left record that found a match; n_cands is the
    number of in-block candidates actually compared, the knob to
    watch when tuning blocking selectivity.

    Shapes — CANONICALIZE-THEN-MATCH (the round-9 upgrade): both sides
    first collapse to their DISTINCT (block, name) grain, Levenshtein
    runs once per distinct name pair inside a block, and the verdicts
    fan back to rows through plain equi-joins.  On mostly-unique names
    this costs one extra hash-agg and changes nothing; on
    low-cardinality dirty keys (the common case for titles, vendor
    strings, product names — this repo's 10x experiment measured a
    >60-minute row-grain straggler collapsing to seconds) the distance
    work scales with DISTINCT-name pairs instead of row pairs.  The
    output contract is unchanged row for row: ``n_cands`` still counts
    candidate ROWS (reconstructed exactly from per-name multiplicities)
    and ties still resolve to the smallest right id (the per-name min
    id stands in for its rows — the same global minimum).  Recall is
    bounded by blocking: a typo inside the first ``block_prefix`` chars
    or a length change past ``length_band`` escapes the block (the
    standard multi-pass fix is a union of independent blocking passes,
    each an equi-join).
    """
    lb = left.select(
        F.col(left_id).alias("_lid"), F.col(left_name).alias("_lname"),
        F.substring(left_name, 1, block_prefix).alias("_bp"),
        F.floor(F.length(left_name) / length_band).alias("_bb"))
    rb = right.select(
        F.col(right_id).alias("_rid"), F.col(right_name).alias("_rname"),
        F.substring(right_name, 1, block_prefix).alias("_bp"),
        F.floor(F.length(right_name) / length_band).alias("_bb"))
    ld = lb.select("_bp", "_bb", "_lname").distinct()
    rd = (rb.groupBy("_bp", "_bb", "_rname")
          .agg(F.min("_rid").alias("_rid"), F.count("*").alias("_rcnt")))
    cand = (ld.join(rd, ["_bp", "_bb"])
            .withColumn("dist", F.levenshtein("_lname", "_rname")))
    w = Window.partitionBy("_bp", "_bb", "_lname")
    wr = (Window.partitionBy("_bp", "_bb", "_lname")
          .orderBy("dist", "_rid"))
    best = (cand.withColumn("n_cands", F.sum("_rcnt").over(w))
            .withColumn("_rn", F.row_number().over(wr))
            .filter((F.col("_rn") == 1) & (F.col("dist") <= int(max_dist)))
            .select("_bp", "_bb", "_lname", "_rid", "_rname", "dist",
                    "n_cands"))
    return (lb.join(best, ["_bp", "_bb", "_lname"])
            .select(F.col("_lid").alias(left_id),
                    F.col("_rid").alias(right_id),
                    F.col("_lname").alias(left_name),
                    F.col("_rname").alias(right_name),
                    F.col("dist").cast("bigint").alias("dist"),
                    F.col("n_cands").cast("bigint").alias("n_cands")))
