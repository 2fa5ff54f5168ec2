"""Skew-mitigation utilities: salted joins and two-phase salted
aggregation.

AQE's skew-join splitting (on in fmx.session) handles sort-merge skew at
runtime; these explicit variants cover the cases AQE can't: hot-key
*aggregations* (a single group key receiving a large share of rows —
e.g. a Zipfian featureId in FM one-hot data, SURVEY §4.2) and
broadcast-ineligible dimension joins with power-law fact keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Attach a uniform salt in [0, num_salts) — a DETERMINISTIC hash
    of the row content, never ``monotonically_increasing_id``: a
    nondeterministic expression used as a shuffle key means a retried
    map task can re-salt rows differently after reducers already
    fetched its output (the SPARK-23207 correctness hazard).  Content
    hashing keeps retries stable; exact-duplicate rows share a salt,
    which only matters if a single hot key is ALSO mostly duplicate
    rows."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*df.columns), F.lit(num_salts)).cast("int"))


def replicate_with_salts(df: DataFrame, num_salts: int = 16,
                         salt_col: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (the build side of a
    salted join) — size cost num_salts×, paid only on the small side."""
    salts = F.array(*[F.lit(i) for i in range(num_salts)])
    return df.withColumn(salt_col, F.explode(salts))


def salted_join(big: DataFrame, small: DataFrame, on: str | list[str],
                num_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``big`` has power-law keys: salt the big side,
    replicate the small side, join on (key..., salt).  One hot key now
    lands on num_salts reducers instead of one.

    Only ``inner`` and ``left`` are supported: under right/full outer,
    an unmatched small-side row would surface once PER SALT REPLICA —
    num_salts duplicate null-extended rows."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r}: unmatched "
            "replicated small-side rows would duplicate num_salts times")
    keys = [on] if isinstance(on, str) else list(on)
    b = with_salt(big, num_salts)
    s = replicate_with_salts(small, num_salts)
    out = b.join(s, keys + ["_salt"], how)
    return out.drop("_salt")


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, str],
               num_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for hot group keys: partial agg on
    (keys..., salt), final agg on keys.  Supports the decomposable
    aggregates (sum, count, min, max).

    ``aggs``: {output_col: "fn(input_col)"} with fn in sum/count/min/max.
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        fn = fn.strip().lower()
        if fn not in _MERGE:
            raise ValueError(f"non-decomposable aggregate: {fn}")
        if fn == "count":
            # count(col) must skip NULLs; only count(*) counts rows
            partial = F.count("*") if col in ("*", "") else F.count(col)
        else:
            partial = getattr(F, fn)(col)
        partial_exprs.append(partial.alias(f"_p_{out}"))
        final_exprs.append(_MERGE[fn](f"_p_{out}").alias(out))
    salted = with_salt(df, num_salts)
    return (salted.groupBy(*keys, "_salt").agg(*partial_exprs)
            .groupBy(*keys).agg(*final_exprs))
