"""Feature-engineering operators for tabular ML pipelines: target
encoding and frequency encoding of high-cardinality categoricals.

Both are pure DataFrame -> DataFrame plans (one hash-agg on the key +
one equi-join back) so they run unchanged at any scale; all arithmetic
is replayable in ANSI SQL for the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["target_encode_loo", "frequency_encode"]


def target_encode_loo(df: DataFrame, key_col: str, target_col: str,
                      smoothing: float = 10.0,
                      out_col: str = "enc",
                      broadcast_keys: bool = False) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward
    the global prior: each row gets (sum_key - target_row + m * prior)
    / (cnt_key - 1 + m), i.e. the mean target of its key computed
    WITHOUT the row itself, shrunk toward the global mean by ``m``
    pseudo-observations.  NULL keys form their own group (SQL GROUP BY
    semantics — the join back is null-safe, so no row is dropped).

    The LOO exclusion of the row's own target is what keeps the encoding
    usable as a TRAINING feature (plain mean encoding leaks the label
    into itself — the classic target-leakage bug); smoothing ``m`` pulls
    rare keys toward the global mean so singleton categories don't
    memorize their one label.

    Scale shape: one (key) hash-agg with map-side combine + one 1-row
    global-prior broadcast + one equi-join back on the key — never a
    per-key window over row grain, so a hot key costs the same as any
    other post-aggregation.  Deterministic given (df, key, target, m).

    ``broadcast_keys=True`` pins a BroadcastHashJoin for the join back
    when the caller KNOWS the key cardinality is broadcast-sized (a
    categorical with thousands of levels) — without the hint AQE
    decides from runtime stats, which is right for genuinely
    high-cardinality keys but leaves small-dim plans shuffle-shaped
    until stats materialize."""
    m = float(smoothing)
    grp = (df.groupBy(F.col(key_col).alias("_k"))
           .agg(F.sum(target_col).alias("_s"),
                F.count("*").alias("_c")))
    if broadcast_keys:
        grp = F.broadcast(grp)
    prior = df.agg(F.avg(target_col).alias("_prior"))
    enc = ((F.col("_s") - F.col(target_col) + m * F.col("_prior"))
           / (F.col("_c") - 1 + m))
    return (df.join(grp, F.col(key_col).eqNullSafe(F.col("_k")))
            .crossJoin(F.broadcast(prior))
            .withColumn(out_col, enc)
            .drop("_k", "_s", "_c", "_prior"))


def frequency_encode(df: DataFrame, key_col: str,
                     out_col: str = "freq",
                     broadcast_keys: bool = False) -> DataFrame:
    """Frequency encoding: each row gains its key's share of the table
    (cnt_key / n_total) — the cheapest useful encoding of a
    high-cardinality categorical.  One key hash-agg + a 1-row total
    broadcast + a null-safe equi-join back (NULL keys are a group, not
    dropped); same skew-safety argument and ``broadcast_keys`` contract
    as :func:`target_encode_loo`."""
    grp = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count("*").alias("_c"))
    if broadcast_keys:
        grp = F.broadcast(grp)
    tot = df.agg(F.count("*").alias("_n"))
    return (df.join(grp, F.col(key_col).eqNullSafe(F.col("_k")))
            .crossJoin(F.broadcast(tot))
            .withColumn(out_col, F.col("_c") / F.col("_n"))
            .drop("_k", "_c", "_n"))
