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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hist_quantiles", "hist_quantiles_sql",
           "hist_fixed_registers", "hist_fixed_fold", "psi_from_registers",
           "hll_distinct", "hll_registers", "hll_fold", "hll_overlap",
           "hll_hash_sql", "hll_rank_sql", "hll_est_sql",
           "HLL_B", "HLL_M", "HLL_ALPHA",
           "cms_state", "cms_estimate", "CMS_D", "CMS_W",
           "bloom_bits", "bloom_probe", "BLOOM_M", "BLOOM_K",
           "kmv_intersection", "kmv_state", "kmv_merge", "KMV_K", "KMV_M"]

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


CMS_D = 4                 # depth: independent hash rows
CMS_W = 256               # width: counters per row

def _md5_long(expr, salt: str):
    """The repo-standard 60-bit non-negative integer hash (15 hex chars
    of md5) — identical arithmetic on Spark (`conv`) and DuckDB
    (`CAST(concat('0x',...) AS BIGINT)`)."""
    return F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), expr.cast("string"))), 1, 15),
        16, 10).cast("bigint")


def cms_state(df: DataFrame, value_col: str, tag: str = "cms",
              d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Count-min sketch state: (_d, _col, c) — ``d`` independent
    md5-salted hash rows of ``w`` counters, built in ONE hash-agg.

    The posexplode fans each input row out to ``d`` cells *before* the
    shuffle, but the aggregation key space is at most ``d*w`` cells, so
    map-side combine collapses each task's contribution to <= d*w rows
    regardless of input size — this is the fixed-memory frequency state
    for 100 TB streams.  Two state tables MERGE by per-cell sum, the
    property the incremental/streaming twins rely on.
    """
    cells = F.array(*[F.pmod(_md5_long(F.col(value_col), f"{tag}{i}:"),
                             F.lit(w)) for i in range(d)])
    return (df.select(F.posexplode(cells).alias("_d", "_col"))
            .groupBy("_d", "_col").agg(F.count("*").alias("c")))


def cms_estimate(state: DataFrame, probes: DataFrame, value_col: str,
                 tag: str = "cms", d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """Point-frequency estimates for the probe keys:
    (value_col, est_count) with ``est = min over rows of cell count``
    (classic CM upper bound; cells never probed stay 0 via the left
    join).  The state is <= d*w rows — always broadcast, so probing is
    a map-side join however large the probe set is."""
    pcells = probes.select(
        F.col(value_col),
        F.posexplode(F.array(*[
            F.pmod(_md5_long(F.col(value_col), f"{tag}{i}:"), F.lit(w))
            for i in range(d)])).alias("_d", "_col"))
    joined = pcells.join(F.broadcast(state), ["_d", "_col"], "left") \
                   .na.fill({"c": 0})
    return joined.groupBy(value_col).agg(F.min("c").alias("est_count"))


def cms_sql(value_col: str, src: str, probes: str, tag: str = "cms",
            d: int = CMS_D, w: int = CMS_W) -> str:
    """The identical count-min sketch as DuckDB CTEs (oracle side).
    ``src``/``probes`` are CTE names providing ``value_col``."""
    return f"""
    cms_cells AS (
        SELECT g.i AS d,
               CAST(concat('0x', substring(md5(concat('{tag}', g.i, ':',
                   CAST({value_col} AS VARCHAR))), 1, 15)) AS BIGINT)
                   % {w} AS col
        FROM {src}, generate_series(0, {d - 1}) AS g(i)),
    cms_state AS (SELECT d, col, count(*) AS c
                  FROM cms_cells GROUP BY d, col),
    cms_pcells AS (
        SELECT {value_col}, g.i AS d,
               CAST(concat('0x', substring(md5(concat('{tag}', g.i, ':',
                   CAST({value_col} AS VARCHAR))), 1, 15)) AS BIGINT)
                   % {w} AS col
        FROM {probes}, generate_series(0, {d - 1}) AS g(i)),
    cms_est AS (
        SELECT p.{value_col}, min(coalesce(s.c, 0)) AS est_count
        FROM cms_pcells p LEFT JOIN cms_state s
          ON p.d = s.d AND p.col = s.col
        GROUP BY p.{value_col})
    """


BLOOM_M = 8192            # bit positions
BLOOM_K = 5               # hashes per key


def bloom_bits(df: DataFrame, value_col: str, tag: str = "bloom",
               m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Bloom filter as a relation: the DISTINCT set bit positions
    (pos).  At most ``m`` rows whatever the build side's size — the
    broadcastable membership state.  Two filters union by
    ``UNION DISTINCT``; build is one explode + distinct-agg."""
    pos = F.array(*[F.pmod(_md5_long(F.col(value_col), f"{tag}{i}:"),
                           F.lit(m)) for i in range(k)])
    return df.select(F.explode(pos).alias("pos")).distinct()


def bloom_probe(df: DataFrame, bits: DataFrame, value_col: str,
                tag: str = "bloom", m: int = BLOOM_M,
                k: int = BLOOM_K) -> DataFrame:
    """Membership probe: input columns + ``maybe_present`` (true iff
    all ``k`` positions are set — no false negatives, tunable false
    positives).  The bits table (<= m rows) is broadcast, so the probe
    adds no shuffle to the probed stream.  Rows of ``df`` are treated
    with set semantics (the hit-count regroup keys on all columns);
    probe relations should carry a unique key."""
    pcells = df.withColumn(
        "_pos", F.explode(F.array(*[
            F.pmod(_md5_long(F.col(value_col), f"{tag}{i}:"), F.lit(m))
            for i in range(k)])))
    hit = F.broadcast(bits.withColumnRenamed("pos", "_pos")
                      .withColumn("_hit", F.lit(1)))
    return (pcells.join(hit, "_pos", "left")
            .groupBy(*df.columns)
            .agg((F.count("_hit") == k).alias("maybe_present")))


def bloom_sql(value_col: str, build: str, probe: str, key_cols: str,
              tag: str = "bloom", m: int = BLOOM_M,
              k: int = BLOOM_K) -> str:
    """The identical Bloom build+probe as DuckDB CTEs (oracle side).
    ``build``/``probe`` are CTE names; ``key_cols`` is the probe's
    comma-separated output key list.  Exposes ``bloom_flags`` with
    (key_cols, maybe_present)."""
    def cells(src: str) -> str:
        return (f"SELECT *, CAST(concat('0x', substring(md5(concat("
                f"'{tag}', g.i, ':', CAST({value_col} AS VARCHAR))), "
                f"1, 15)) AS BIGINT) % {m} AS pos\n"
                f"        FROM {src}, generate_series(0, {k - 1}) AS g(i)")
    return f"""
    bloom_bits AS (SELECT DISTINCT pos FROM ({cells(build)})),
    bloom_pcells AS ({cells(probe)}),
    bloom_flags AS (
        SELECT {key_cols},
               count(b.pos) = {k} AS maybe_present
        FROM bloom_pcells p LEFT JOIN bloom_bits b ON p.pos = b.pos
        GROUP BY {key_cols})
    """




def hll_hash_sql(value_col: str, tag: str = "hll") -> str:
    """The engine-portable 60-bit md5 hash as DuckDB SQL — single
    source for every HLL oracle (hll_sql here plus the analytics
    register readouts); change the tag format or hash slice HERE."""
    return (f"CAST(concat('0x', substring(md5(concat('{tag}:', "
            f"CAST({value_col} AS VARCHAR))), 1, 15)) AS BIGINT)")


def hll_rank_sql(h: str = "h") -> str:
    """The register max-rank expression as DuckDB SQL (mirrors
    hll_registers' conv/length trick)."""
    return f"{_WBITS + 1} - length(bin({h} >> {HLL_B}))"


def hll_est_sql(s: str = "s", n: str = "n") -> str:
    """The register-fold cardinality estimate CASE as DuckDB SQL
    (small-range linear-counting correction included) — mirrors
    hll_fold exactly."""
    return (f"CASE WHEN {HLL_ALPHA * HLL_M * HLL_M}"
            f" / ({s} + ({HLL_M} - {n})) <= {2.5 * HLL_M}"
            f" AND {HLL_M} - {n} > 0"
            f" THEN {float(HLL_M)} * ln({float(HLL_M)}"
            f" / ({HLL_M} - {n}))"
            f" ELSE {HLL_ALPHA * HLL_M * HLL_M}"
            f" / ({s} + ({HLL_M} - {n})) END")


def hll_sql(group_col: str, value_col: str, table: str,
            tag: str = "hll") -> str:
    """The identical HLL as DuckDB SQL (oracle side), assembled from
    the shared fragment helpers above."""
    return f"""
    hashed AS (SELECT {group_col}, {hll_hash_sql(value_col, tag)} AS h
               FROM {table}),
    regs AS (SELECT {group_col}, h % {HLL_M} AS j,
                    max({hll_rank_sql()}) AS m
             FROM hashed GROUP BY {group_col}, j),
    folded AS (SELECT {group_col}, sum(power(2.0, -m)) AS s,
                      count(*) AS n
               FROM regs GROUP BY {group_col})
    SELECT {group_col},
           CAST(round({hll_est_sql()}) AS BIGINT) AS approx_distinct
    FROM folded
    """


def hist_quantiles(df: DataFrame, group_col: str, value_col: str,
                   qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                   buckets: int = 100) -> DataFrame:
    """Engine-portable approximate quantiles from a fixed equal-width
    histogram: bucket counts are a plain hash-agg (mergeable — the sum
    of per-partition histograms IS the histogram, the property sketches
    need and exact percentile lacks), and each quantile is read off the
    cumulative counts with linear interpolation inside its bucket.
    Error is bounded by bucket width (range/buckets) — the classic
    histogram-sketch trade (vs GK/KLL's rank guarantee) but 100%
    deterministic and replayable in any engine.

    One pass for per-group [min, max] (group-sized, broadcast back),
    one (group, bucket) hash-agg, one small window over
    groups x buckets.  Output: (group, q, est)."""
    b = (df.groupBy(group_col)
         .agg(F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi"),
              F.count("*").alias("_n")))
    binned = (df.join(F.broadcast(b), group_col)
              .select(group_col, "_lo", "_hi", "_n",
                      F.least(F.lit(buckets - 1),
                              F.floor((F.col(value_col) - F.col("_lo"))
                                      / (F.col("_hi") - F.col("_lo"))
                                      * buckets)).cast("int").alias("_b")))
    hist = (binned.groupBy(group_col, "_b")
            .agg(F.min("_lo").alias("_lo"), F.min("_hi").alias("_hi"),
                 F.min("_n").alias("_n"), F.count("*").alias("_c")))
    w = (Window.partitionBy(group_col).orderBy("_b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = hist.withColumn("_cum", F.sum("_c").over(w))
    width = (F.col("_hi") - F.col("_lo")) / buckets
    out = None
    for q in qs:
        # target rank; the quantile lives in the first bucket whose
        # cumulative count reaches it
        target = F.col("_n") * F.lit(q)
        hit = (cum.filter(F.col("_cum") >= target)
               .withColumn("_rn", F.row_number().over(
                   Window.partitionBy(group_col).orderBy("_b")))
               .filter(F.col("_rn") == 1)
               .select(group_col, F.lit(q).alias("q"),
                       F.round(F.col("_lo") + width
                               * (F.col("_b")
                                  + (target - (F.col("_cum") - F.col("_c")))
                                  / F.col("_c")), 6).alias("est")))
        out = hit if out is None else out.unionByName(hit)
    return out


def hist_quantiles_sql(group_col: str, value_col: str, src: str,
                       qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                       buckets: int = 100) -> str:
    """DuckDB replay of hist_quantiles over CTE ``src``."""
    q_rows = ", ".join(f"({q})" for q in qs)
    return f"""
    b AS (SELECT {group_col}, min({value_col}) AS lo,
                 max({value_col}) AS hi, count(*) AS n
          FROM {src} GROUP BY {group_col}),
    binned AS (SELECT s.{group_col}, b.lo, b.hi, b.n,
                      CAST(least({buckets - 1},
                                 floor((s.{value_col} - b.lo)
                                       / (b.hi - b.lo) * {buckets}))
                           AS INT) AS bk
               FROM {src} s JOIN b USING ({group_col})),
    hist AS (SELECT {group_col}, bk, min(lo) AS lo, min(hi) AS hi,
                    min(n) AS n, count(*) AS c
             FROM binned GROUP BY {group_col}, bk),
    cum AS (SELECT *, sum(c) OVER (PARTITION BY {group_col} ORDER BY bk
                                   ROWS UNBOUNDED PRECEDING) AS cm
            FROM hist),
    qs(q) AS (VALUES {q_rows}),
    hit AS (SELECT {group_col}, q, bk, lo, hi, n, c, cm,
                   row_number() OVER (PARTITION BY {group_col}, q
                                      ORDER BY bk) AS rn
            FROM cum, qs WHERE cm >= n * q)
    SELECT {group_col}, q,
           round(lo + (hi - lo) / {buckets}
                 * (bk + (n * q - (cm - c)) * 1.0 / c), 6) AS est
    FROM hit WHERE rn = 1
    """


def hist_fixed_registers(df: DataFrame, group_col: str, value_col: str,
                         lo: float, hi: float,
                         buckets: int = 100) -> DataFrame:
    """Fixed-edge histogram registers: (group, bucket, c).  Bucket
    edges are given a priori (unlike hist_quantiles' data-dependent
    range), so the register table is additive — per-partition, per-
    batch, per-day histograms merge by plain sum, which makes this the
    STREAMABLE quantile sketch (one streaming groupBy-count, state =
    groups x buckets rows, bounded forever).  Out-of-range values clamp
    into the edge buckets."""
    width = (hi - lo) / buckets
    b = F.least(F.lit(buckets - 1),
                F.greatest(F.lit(0),
                           F.floor((F.col(value_col) - F.lit(lo))
                                   / F.lit(width)))).cast("int")
    return (df.groupBy(F.col(group_col), b.alias("bucket"))
            .agg(F.count("*").alias("c")))


def hist_fixed_fold(regs: DataFrame, group_col: str, lo: float, hi: float,
                    buckets: int = 100,
                    qs: tuple[float, ...] = (0.5,)) -> DataFrame:
    """Fold fixed-edge histogram registers into quantile estimates:
    (group, q, est) — cumulative counts + linear interpolation inside
    the hit bucket.  Stateless and tiny (groups x buckets rows): run it
    wherever the registers are consumed."""
    w = (Window.partitionBy(group_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy(group_col)
    cum = (regs.withColumn("_cum", F.sum("c").over(w))
           .withColumn("_n", F.sum("c").over(wn)))
    width = (hi - lo) / buckets
    out = None
    for q in qs:
        target = F.col("_n") * F.lit(q)
        hit = (cum.filter(F.col("_cum") >= target)
               .withColumn("_rn", F.row_number().over(
                   Window.partitionBy(group_col).orderBy("bucket")))
               .filter(F.col("_rn") == 1)
               .select(F.col(group_col), F.lit(q).alias("q"),
                       F.round(F.lit(lo) + F.lit(width)
                               * (F.col("bucket")
                                  + (target - (F.col("_cum") - F.col("c")))
                                  / F.col("c")), 6).alias("est")))
        out = hit if out is None else out.unionByName(hit)
    return out


def psi_from_registers(a: DataFrame, b: DataFrame, group_col: str,
                       buckets: int = 100) -> DataFrame:
    """Population stability index between two fixed-edge histogram
    register tables (same ``lo/hi/buckets``): (group, n_a, n_b, psi).
    Because registers are mergeable state, this compares ANY two
    accumulations — yesterday vs today, stream vs baseline — without
    revisiting raw rows.  Cells are densified over the full bucket
    range (missing = 0) and +0.5-smoothed so empty cells stay finite.
    Work is groups x buckets rows — trivial at any data scale."""
    ga = a.select(F.col(group_col), F.col("bucket"), F.col("c").alias("ca"))
    gb = b.select(F.col(group_col), F.col("bucket"), F.col("c").alias("cb"))
    groups = (ga.select(group_col).union(gb.select(group_col)).distinct()
              .select(group_col,
                      F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
                      .alias("bucket")))
    dense = (groups.join(ga, [group_col, "bucket"], "left")
             .join(gb, [group_col, "bucket"], "left")
             .select(group_col, "bucket",
                     F.coalesce("ca", F.lit(0)).alias("ca"),
                     F.coalesce("cb", F.lit(0)).alias("cb")))
    w = Window.partitionBy(group_col)
    sm = (dense.withColumn("ta", F.sum("ca").over(w))
          .withColumn("tb", F.sum("cb").over(w))
          .withColumn("sa", (F.col("ca") + 0.5)
                      / (F.col("ta") + 0.5 * buckets))
          .withColumn("sb", (F.col("cb") + 0.5)
                      / (F.col("tb") + 0.5 * buckets)))
    return (sm.groupBy(group_col)
            .agg(F.sum("ca").cast("bigint").alias("n_a"),
                 F.sum("cb").cast("bigint").alias("n_b"),
                 F.round(F.sum((F.col("sa") - F.col("sb"))
                               * F.log(F.col("sa") / F.col("sb"))), 6)
                 .alias("psi")))


def _hll_est(s, n):
    """Flajolet estimate from (sum 2^-m, register count) — the exact
    expression hll_fold uses, exposed for multi-set folds."""
    zeros = F.lit(HLL_M) - n
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (s + zeros)
    return F.when((raw <= 2.5 * HLL_M) & (zeros > 0),
                  F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros)) \
            .otherwise(raw)


def hll_overlap(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Approximate set overlap from two HLL register tables (_j, m):
    one row (n_a, n_b, n_union, n_intersect, jaccard).

    The union sketch is the register-wise MAX (exact HLL property —
    the union's registers are what a single pass over A ∪ B would have
    produced); the intersection is inclusion-exclusion over the three
    estimates, floored at 0.  This is how audience-overlap / cross-day
    retention is answered at 100 TB: register tables are tiny (64
    rows), persistable, and mergeable — the raw sets never co-shuffle.
    Registers are md5-deterministic, so both engines produce IDENTICAL
    estimates (oracle-checkable, unlike native approx_count_distinct).

    Estimation error: each HLL carries ~1.04/sqrt(64) = 13% relative
    error and inclusion-exclusion compounds it, so `n_intersect` of
    small overlaps is noisy — the standard HLL-overlap caveat (MinHash
    jaccard is the high-precision alternative when pairs are few).
    """
    a = regs_a.select("_j", F.col("m").alias("_ma"))
    b = regs_b.select("_j", F.col("m").alias("_mb"))
    # m >= 1 always (rank of a 54-bit value), so 0 is a safe
    # absent-sentinel under greatest() — identical semantics both engines
    u = (a.join(b, "_j", "full_outer")
         .select("_ma", "_mb",
                 F.greatest(F.coalesce(F.col("_ma"), F.lit(0)),
                            F.coalesce(F.col("_mb"), F.lit(0))).alias("_mu")))
    # coalesce the sums: with an EMPTY side (e.g. zero purchase events
    # in a slice) sum() over no rows is NULL, which would propagate
    # NULL through every estimate instead of the correct n=0 /
    # union=other-side reading (linear counting handles s=0, n=0)
    agg = u.agg(
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("_ma"))),
                   F.lit(0.0)).alias("_sa"),
        F.count("_ma").alias("_na"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("_mb"))),
                   F.lit(0.0)).alias("_sb"),
        F.count("_mb").alias("_nb"),
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("_mu"))),
                   F.lit(0.0)).alias("_su"),
        F.count("*").alias("_nu"))
    ea = _hll_est(F.col("_sa"), F.col("_na"))
    eb = _hll_est(F.col("_sb"), F.col("_nb"))
    eu = _hll_est(F.col("_su"), F.col("_nu"))
    inter = F.greatest(F.lit(0.0), ea + eb - eu)
    return agg.select(
        F.round(ea).cast("bigint").alias("n_a"),
        F.round(eb).cast("bigint").alias("n_b"),
        F.round(eu).cast("bigint").alias("n_union"),
        F.round(inter).cast("bigint").alias("n_intersect"),
        F.round(F.round(inter) / F.round(eu), 6).alias("jaccard"))


KMV_K = 32                       # sketch size (k minimum values)
KMV_M = float(1 << 60)           # hash domain: 15 hex chars = 60 bits


def kmv_intersection(a: DataFrame, b: DataFrame, value_col: str,
                     k: int = KMV_K, tag: str = "kmv") -> DataFrame:
    """Theta-sketch-style INTERSECTION cardinality from two KMV
    (k-minimum-values) sketches (Beyer et al., SIGMOD'07; the
    DataSketches theta family): each side keeps its ``k`` smallest
    distinct 60-bit md5 hashes, theta = min of the two per-side
    thresholds (a side's k-th minimum when saturated, else the full
    hash domain M), and

        |A intersect B|  ~=  |{h in S_A ^ S_B : h < theta}| * M / theta

    — the direct common-hash count that ``hll_overlap``'s
    inclusion-exclusion cannot match for small intersections of large
    sets (HLL subtracts two big noisy estimates; KMV counts shared
    evidence).  When NEITHER side saturates, theta = M and the
    estimate is exactly the true intersection — the sketch degrades to
    the exact set, a property the oracle exercises at small SF.

    Returns one row: (n_a, n_b, exact_common, kmv_estimate,
    theta_saturated).  exact_common is the eval readout (same contract
    as dedup_minhash_estimate_error: at 100 TB you ship only the
    sketch path — per-side top-k runs as per-partition k-row heaps
    (TakeOrderedAndProject), the state is k numbers per side, and
    sketches merge by keeping the k smallest of the union).
    Deterministic: md5 arithmetic replayed identically by any engine.
    """
    k = int(k)
    da = (a.select(F.col(value_col).alias("_v"))
          .filter(F.col("_v").isNotNull()).distinct())
    db = (b.select(F.col(value_col).alias("_v"))
          .filter(F.col("_v").isNotNull()).distinct())
    # the sketches ARE kmv_state of each side — one definition of
    # "the KMV sketch of a set" (state, merge, and intersection agree)
    sa = kmv_state(da, "_v", k=k, tag=tag)
    sb = kmv_state(db, "_v", k=k, tag=tag)
    tha = sa.agg(
        F.when(F.count("*") >= k, F.max("h").cast("double"))
        .otherwise(F.lit(KMV_M)).alias("_tha"))
    thb = sb.agg(
        F.when(F.count("*") >= k, F.max("h").cast("double"))
        .otherwise(F.lit(KMV_M)).alias("_thb"))
    th = (tha.crossJoin(F.broadcast(thb))
          .select(F.least("_tha", "_thb").alias("_theta")))
    common = (sa.join(sb, "h")
              .crossJoin(F.broadcast(th))
              .filter(F.col("h") < F.col("_theta"))
              .agg(F.count("*").alias("_c")))   # count-only: an empty
    # intersection must not null out theta, which re-enters below
    na = da.agg(F.count("*").cast("bigint").alias("n_a"))
    nb = db.agg(F.count("*").cast("bigint").alias("n_b"))
    exact = (da.join(db, "_v")
             .agg(F.count("*").cast("bigint").alias("exact_common")))
    est = F.round(F.col("_c") * F.lit(KMV_M) / F.col("_theta")) \
           .cast("bigint")
    return (na.crossJoin(F.broadcast(nb))
            .crossJoin(F.broadcast(exact))
            .crossJoin(F.broadcast(common))
            .crossJoin(F.broadcast(th))
            .select("n_a", "n_b", "exact_common",
                    est.alias("kmv_estimate"),
                    F.when(F.col("_theta") < F.lit(KMV_M), 1).otherwise(0)
                    .cast("int").alias("theta_saturated")))


def kmv_state(df: DataFrame, value_col: str, k: int = KMV_K,
              tag: str = "kmv") -> DataFrame:
    """The KMV sketch STATE for one set: its ``k`` smallest distinct
    60-bit hashes, as a k-row relation (h) — the persistable,
    MERGEABLE artifact behind :func:`kmv_intersection`.  Merge rule:
    the sketch of a union is the k smallest of the union of sketches
    (``kmv_merge``), so per-partition / per-day / per-batch states
    fold without revisiting raw data — the same register discipline as
    hll_registers/cms_state/bloom_bits.  NULL values carry no identity
    and are excluded (a NULL hash would otherwise sort FIRST and
    permanently occupy a sketch slot — the md5 coin family rule)."""
    return (df.filter(F.col(value_col).isNotNull())
            .select(_md5_long(F.col(value_col), f"{tag}:").alias("h"))
            .distinct().orderBy("h").limit(int(k)))


def kmv_merge(states: DataFrame, k: int = KMV_K) -> DataFrame:
    """Fold any number of unioned KMV states into one: distinct
    (duplicate hashes across states collapse — they ARE the same
    element), then the k smallest again.  Associative and commutative;
    kmv_merge(kmv_state(A) U kmv_state(B)) == kmv_state(A U B)."""
    return (states.select("h").filter(F.col("h").isNotNull())
            .distinct().orderBy("h").limit(int(k)))
