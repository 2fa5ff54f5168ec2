"""Engine-portable sketches.

The usual objection to oracling sketch queries is that sketch internals
(register layout, hash function) are engine-private — Spark's
`approx_count_distinct` HLL++ can never hash-match DuckDB's.  This
module removes the excuse for HyperLogLog: the hash is the repo's
standard md5-derived 60-bit integer, the register math is plain integer
arithmetic (`conv(x, 10, 2)` length == DuckDB `length(bin(x))`), and
the estimator is the textbook Flajolet HLL formula — so two engines
computing independently produce IDENTICAL estimates, and the driver's
hash-compare verifies the sketch end-to-end.

At 100 TB this is the mergeable-state cardinality path: the per-group
state is m=2^b max-rank registers (64 small ints here), built by one
hash-agg with map-side combine; a second tiny agg folds registers into
the estimate.  Register state unions across partitions/days by max —
the same property the streaming and incremental layers rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_distinct", "hll_registers", "hll_fold",
           "HLL_B", "HLL_M", "HLL_ALPHA"]

HLL_B = 6                 # register index bits
HLL_M = 1 << HLL_B        # 64 registers
HLL_ALPHA = 0.709         # alpha_64 (Flajolet et al. for m=64)
_WBITS = 60 - HLL_B       # rank domain: remaining hash bits


def hll_registers(df: DataFrame, group_col: str, value_col: str,
                  tag: str = "hll") -> DataFrame:
    """HLL register state per group: (group, _j, m) — the low ``HLL_B``
    hash bits pick register ``_j``, ``m`` is the max leading-zero rank
    seen.  One hash-agg with map-side combine; this is the MERGEABLE
    state (union two register tables by group-wise max) that batch,
    incremental, and streaming cardinality all share."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{tag}:"),
                       F.col(value_col).cast("string"))), 1, 15),
        16, 10).cast("bigint")
    j = F.pmod(h, F.lit(HLL_M))
    w = F.shiftright(h, HLL_B)
    # length of the binary representation: floor(log2(w)) + 1, computed
    # exactly in integers (conv -> base-2 string); '0' has length 1, so
    # w == 0 folds into rank _WBITS via the same expression both engines
    # use — no float log2 whose 1-ulp differences could flip a register
    rank = F.lit(_WBITS + 1) - F.length(F.conv(w, 10, 2))
    return (df.select(F.col(group_col), j.alias("_j"), rank.alias("_r"))
            .groupBy(group_col, "_j").agg(F.max("_r").alias("m")))


def hll_fold(regs: DataFrame, group_col: str) -> DataFrame:
    """Fold register state into the cardinality estimate:
    (group, approx_distinct) — harmonic mean over registers with the
    small-range linear-counting correction.  64 rows per group in, one
    row out; stateless given the registers."""
    per = (regs.groupBy(group_col)
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_s"),
                F.count("*").alias("_n")))
    zeros = F.lit(HLL_M) - F.col("_n")
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (F.col("_s") + zeros)
    est = F.when((raw <= 2.5 * HLL_M) & (zeros > 0),
                 F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros)) \
           .otherwise(raw)
    return per.select(F.col(group_col),
                      F.round(est).cast("bigint").alias("approx_distinct"))


def hll_distinct(df: DataFrame, group_col: str, value_col: str,
                 tag: str = "hll") -> DataFrame:
    """Per-group approximate distinct count: (group, approx_distinct).

    ``hll_registers`` then ``hll_fold`` — see those for the state/merge
    story.  Deterministic: same input, same estimate, on any engine and
    any partitioning.
    """
    return hll_fold(hll_registers(df, group_col, value_col, tag),
                    group_col)


def hll_sql(group_col: str, value_col: str, table: str,
            tag: str = "hll") -> str:
    """The identical HLL as DuckDB SQL (oracle side)."""
    return f"""
    hashed AS (SELECT {group_col},
                      CAST(concat('0x', substring(md5(concat('{tag}:',
                          CAST({value_col} AS VARCHAR))), 1, 15)) AS BIGINT)
                          AS h
               FROM {table}),
    regs AS (SELECT {group_col}, h % {HLL_M} AS j,
                    max({_WBITS + 1} - length(bin(h >> {HLL_B}))) AS m
             FROM hashed GROUP BY {group_col}, j),
    folded AS (SELECT {group_col}, sum(power(2.0, -m)) AS s,
                      count(*) AS n
               FROM regs GROUP BY {group_col})
    SELECT {group_col},
           CAST(round(CASE WHEN {HLL_ALPHA * HLL_M * HLL_M}
                                / (s + ({HLL_M} - n)) <= {2.5 * HLL_M}
                            AND {HLL_M} - n > 0
                       THEN {float(HLL_M)} * ln({float(HLL_M)}
                                                / ({HLL_M} - n))
                       ELSE {HLL_ALPHA * HLL_M * HLL_M}
                            / (s + ({HLL_M} - n)) END) AS BIGINT)
               AS approx_distinct
    FROM folded
    """
