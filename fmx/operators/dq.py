"""Data-quality expectation operators — the validation gate a pipeline
runs before promoting a batch (Deequ/Great-Expectations shape, as pure
DataFrame ops).

``check_expectations`` turns a dict of named boolean rules into ONE
aggregation pass: each rule becomes a conditional count, so validating
50 rules on 100 TB costs a single scan with partial aggregation — never
one job per rule.  ``failing_rows`` returns the violating rows
themselves (bounded by a per-rule limit) for debugging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations", "failing_rows"]


def check_expectations(df: DataFrame,
                       rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, pass_rate).
    A rule is a boolean Column that should be TRUE for every row;
    nulls count as violations (unknown is not acceptable).  An empty
    batch reports 0 violations and pass_rate 1.0 (vacuously clean —
    gate on n_rows separately if empty means broken)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = []
    for name, cond in rules.items():
        # coalesce: sum over zero rows is NULL, and a promotion gate
        # comparing NULL == 0 silently misbehaves
        bad = F.coalesce(F.sum(F.when(cond, 0).otherwise(1)), F.lit(0))
        aggs.append(bad.alias(f"_v_{name}"))
    totals = df.agg(F.count("*").alias("_n"), *aggs)
    pairs = F.array(*[
        # backtick-quoted: a dotted rule name ('price.positive') must
        # resolve as one column, not nested-field access
        F.struct(F.lit(name).alias("rule"),
                 F.col(f"`_v_{name}`").cast("bigint").alias("n_violations"))
        for name in rules])
    rate = F.when(F.col("_n") == 0, F.lit(1.0)).otherwise(
        F.round(1.0 - F.col("p.n_violations") / F.col("_n"), 6))
    return (totals
            .select(F.col("_n"), F.explode(pairs).alias("p"))
            .select(F.col("p.rule").alias("rule"),
                    F.col("_n").cast("bigint").alias("n_rows"),
                    F.col("p.n_violations").alias("n_violations"),
                    rate.alias("pass_rate")))


def failing_rows(df: DataFrame, rules: dict[str, Column],
                 limit_per_rule: int = 100) -> DataFrame:
    """The violating rows, tagged by rule, capped per rule (debugging
    output stays bounded no matter how broken the batch is)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    parts = []
    for name, cond in rules.items():
        parts.append(df.filter(~F.coalesce(cond, F.lit(False)))
                     .limit(limit_per_rule)
                     .withColumn("_rule", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
