"""Distribution profiling operators — the diagnostics a pipeline runs
BEFORE committing to a join/aggregation strategy at scale.

``key_skew_profile`` answers "will this key melt a shuffle?" (hot-key
share, uniformity ratio) so the caller can pick salting
(`fmx.core.skew`) or AQE skew-join ahead of time instead of discovering
a straggler task at hour three.  ``zscore_outliers`` is the classic
per-group anomaly gate over a numeric column.

Both are pure column expressions replayable in ANSI SQL, so they carry
DuckDB oracles like every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["key_skew_profile", "zscore_outliers", "mad_outliers",
           "robust_scale", "chi2_independence", "winsorized_mean",
           "bootstrap_mean_ci", "POISSON1_CDF", "corr_matrix",
           "value_ranges", "safe_corr", "categorical_entropy"]


def key_skew_profile(df: DataFrame, key_col: str,
                     topk: int = 10) -> DataFrame:
    """Top-k hottest keys with global skew context:
    (key, cnt, share, rank, n_keys, skew_ratio).

    ``share`` = key's fraction of all rows; ``skew_ratio`` =
    max_cnt * n_keys / total_rows (1.0 for a perfectly uniform key,
    >>1 for a melt-the-shuffle key).  Shapes: ONE hash-agg over the
    key (map-side combine bounds task output at the distinct-key
    count), a 1-row global roll-up of that agg's output, then a
    broadcast of the 1-row summary and TakeOrderedAndProject for the
    top-k — no full sort, nothing driver-side.  Profiling a 100 TB
    fact costs one scan + one key-sized shuffle.
    """
    counts = df.groupBy(F.col(key_col).alias("key")) \
               .agg(F.count("*").alias("cnt"))
    summary = counts.agg(F.sum("cnt").alias("_total"),
                         F.count("*").alias("_nk"),
                         F.max("cnt").alias("_mx"))
    ranked = (counts.crossJoin(F.broadcast(summary))
              .select(F.col("key").cast("string").alias("key"),
                      F.col("cnt").cast("bigint").alias("cnt"),
                      F.round(F.col("cnt") / F.col("_total"), 6)
                      .alias("share"),
                      F.col("_nk").cast("bigint").alias("n_keys"),
                      F.round(F.col("_mx") * F.col("_nk") / F.col("_total"),
                              4).alias("skew_ratio")))
    # rank is computed over the k survivors only — the global window
    # touches topk rows, never the full key space
    return (ranked.orderBy(F.desc("cnt"), "key").limit(topk)
            .select("key", "cnt", "share",
                    F.row_number()
                    .over(Window.orderBy(F.desc("cnt"), "key"))
                    .cast("bigint").alias("rank"),
                    "n_keys", "skew_ratio"))


def zscore_outliers(df: DataFrame, group_col: str, value_col: str,
                    z_threshold: float = 2.5) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``z_threshold``
    population standard deviations from their group's mean: all input
    columns + (group_mean, group_std, z).

    Two-pass shape that stays two passes at any scale: one hash-agg
    for per-group (mean, stddev_pop) — output is group-count-bounded,
    hence broadcastable — then a broadcast join + filter over the
    fact, so the outlier scan itself never shuffles.  Degenerate
    groups (std = 0) produce no outliers by definition.
    """
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sd"))
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sd")
    return (df.join(F.broadcast(stats), group_col)
            .filter((F.col("_sd") > 0)
                    & (F.abs(z) > F.lit(z_threshold)))
            .select(*[df[c] for c in df.columns],
                    F.round("_mu", 4).alias("group_mean"),
                    F.round("_sd", 4).alias("group_std"),
                    F.round(z, 4).alias("z")))


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: float = 3.0) -> DataFrame:
    """Robust outlier profile per group via median absolute deviation:
    med = median(x), mad = median(|x - med|), outlier when
    |x - med| > k * 1.4826 * mad (1.4826 scales MAD to sigma under
    normality — the robust twin of zscore_outliers, immune to the
    outliers it hunts).

    Two aggregation passes (median is holistic, so the group medians
    join back broadcast — group cardinality is tiny by construction),
    then one conditional-count agg.  Exact percentile keeps the result
    engine-portable; at extreme group counts swap in approx_percentile
    without touching the plan shape.  Degenerate groups (mad = 0: the
    median value holds a majority) produce no outliers, mirroring
    zscore_outliers' sd = 0 rule — without the guard every row that
    differs at all from the median would be flagged."""
    med = (df.groupBy(group_col)
           .agg(F.percentile(value_col, F.lit(0.5)).alias("_med")))
    dev = (df.join(F.broadcast(med), group_col)
           .withColumn("_adev", F.abs(F.col(value_col) - F.col("_med"))))
    mad = (dev.groupBy(group_col)
           .agg(F.first("_med").alias("_med"),
                F.percentile("_adev", F.lit(0.5)).alias("_mad")))
    flagged = (dev.drop("_med")
               .join(F.broadcast(mad), group_col)
               .withColumn("_out",
                           (F.col("_mad") > 0)
                           & (F.col("_adev")
                              > F.lit(k * 1.4826) * F.col("_mad"))))
    return (flagged.groupBy(group_col)
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.first("_med"), 6).alias("median"),
                 F.round(F.first("_mad"), 6).alias("mad"),
                 F.sum(F.col("_out").cast("int")).cast("bigint")
                 .alias("n_outliers"))
            .withColumn("outlier_ratio",
                        F.round(F.col("n_outliers") / F.col("n"), 6)))


def robust_scale(df: DataFrame, group_col: str, value_col: str,
                 out_col: str = "robust_z") -> DataFrame:
    """Median/IQR feature scaling per group: (x - median) / (q3 - q1)
    — the outlier-immune standardizer (sklearn's RobustScaler), the
    right normalization for heavy-tailed telemetry before model
    features or drift thresholds.

    Same two-pass shape as mad_outliers: one holistic-percentile agg
    whose output is group-count-bounded (broadcast join back), so the
    scaling scan itself never shuffles.  Exact linear-interpolation
    percentiles keep it engine-portable.  Zero-IQR groups (constant
    bulk) yield NULL — no defined scale.  A row-preserving scaler:
    rows whose group key is NULL pass through with NULL stats (left
    join — an inner join would silently shrink the output).
    """
    stats = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med"),
        F.percentile(value_col, F.lit(0.25)).alias("_q1"),
        F.percentile(value_col, F.lit(0.75)).alias("_q3"))
    iqr = F.col("_q3") - F.col("_q1")
    z = (F.col(value_col) - F.col("_med")) / F.nullif(iqr, F.lit(0.0))
    return (df.join(F.broadcast(stats), [group_col], "left")
            .select(*[df[c] for c in df.columns],
                    F.round("_med", 4).alias("group_median"),
                    F.round(iqr, 4).alias("group_iqr"),
                    F.round(z, 4).alias(out_col)))


def chi2_independence(df: DataFrame, a_col: str, b_col: str,
                      max_categories: int = 1000) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: one row (chi2, dof, n) — the "is the label mix skewed by
    source" gate of corpus audits.

    One (a, b) hash-agg builds the contingency table; everything after
    runs on aggregates of that |a|x|b|-row relation (marginal
    cross-join, broadcast total), so the corpus is scanned once and
    nothing wide shuffles twice.  The marginal cross-join DENSIFIES
    the table — unobserved (a, b) cells contribute their full expected
    count to the statistic, which a groupBy alone would silently drop
    (underestimating chi2 exactly when association is strongest).

    ``max_categories`` bounds the densifying cross (the ``max_df``
    convention): the cross materializes |a|·|b| cells, so an unguarded
    call on two genuinely high-cardinality columns (user ids, urls)
    would silently build a quadratic relation.  The guard is IN-PLAN
    (no driver action at construction): execution raises if either
    marginal exceeds the bound — bucket or top-K the column first, or
    raise the bound explicitly.

    Rows with a NULL in either column are EXCLUDED up front (the
    standard complete-case convention): a NULL category would survive
    the groupBy but fall out of the non-null-safe densifying join,
    counting its observations as pure misses while inflating the
    marginals — corrupting both chi2 and dof.
    """
    df = df.na.drop(subset=[a_col, b_col])
    cc = df.groupBy(a_col, b_col).agg(F.count("*").alias("_c"))
    da = cc.groupBy(a_col).agg(F.sum("_c").alias("_ma"))
    db = cc.groupBy(b_col).agg(F.sum("_c").alias("_mb"))
    tot = da.agg(F.sum("_ma").alias("_n"))
    lim = F.lit(int(max_categories))
    err = F.concat(
        F.lit("chi2_independence: marginal cardinalities "),
        F.col("_ka").cast("string"), F.lit(" x "),
        F.col("_kb").cast("string"),
        F.lit(f" exceed max_categories={int(max_categories)} — bucket "
              "or top-K the column first, or raise the bound explicitly"))
    guard = (da.agg(F.count("*").alias("_ka"))
             .crossJoin(db.agg(F.count("*").alias("_kb")))
             # filter (not an unused column) so pruning can't drop it
             .filter(F.when((F.col("_ka") <= lim) & (F.col("_kb") <= lim),
                            F.lit(True)).otherwise(F.raise_error(err)))
             .select(F.lit(1).alias("_guard")))
    dense = (da.crossJoin(db)
             .join(cc, [a_col, b_col], "left")
             .na.fill({"_c": 0})
             .crossJoin(F.broadcast(tot))
             .crossJoin(F.broadcast(guard)))
    e = (F.col("_ma") * F.col("_mb")) / F.col("_n")
    per = dense.select(a_col, b_col,
                       ((F.col("_c") - e) ** 2 / e).alias("_x"),
                       F.col("_n"))
    return per.groupBy().agg(
        F.round(F.sum("_x"), 4).alias("chi2"),
        ((F.count_distinct(a_col) - 1)
         * (F.count_distinct(b_col) - 1)).cast("bigint").alias("dof"),
        F.first("_n").cast("bigint").alias("n"))


def winsorized_mean(df: DataFrame, group_col: str, value_col: str,
                    lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Winsorized mean per group: values are CLAMPED to the group's
    [p_lo, p_hi] quantiles before averaging — the outlier-robust mean
    that, unlike trimming, keeps every row's vote (telemetry SLO
    reporting, label aggregation over noisy raters).

    Returns (group, n, p_lo, p_hi, winsorized_mean, raw_mean).  Same
    two-pass shape as robust_scale: one holistic-percentile agg
    (group-count-bounded, broadcast back) + one clamped-mean agg over
    the fact — the scan never shuffles.
    """
    stats = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(float(lo))).alias("_plo"),
        F.percentile(value_col, F.lit(float(hi))).alias("_phi"))
    clamped = F.least(F.greatest(F.col(value_col), F.col("_plo")),
                      F.col("_phi"))
    return (df.join(F.broadcast(stats), group_col)
            .groupBy(group_col)
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.round(F.first("_plo"), 4).alias("p_lo"),
                 F.round(F.first("_phi"), 4).alias("p_hi"),
                 F.round(F.avg(clamped), 4).alias("winsorized_mean"),
                 F.round(F.avg(value_col), 4).alias("raw_mean")))


# Poisson(1) CDF as FIXED literals (not computed exp() — both engines
# must compare u against bit-identical constants): P(X <= k) for
# k = 0..4; draws above 4 clamp to 5 (P > 0.9994, negligible)
POISSON1_CDF = [0.3678794412, 0.7357588823, 0.9196986029,
                0.9810118431, 0.9963401532]


def bootstrap_mean_ci(df: DataFrame, id_col: str, value_col: str,
                      replicates: int = 16, seed: int = 42,
                      z: float = 1.96) -> DataFrame:
    """Poisson-bootstrap confidence interval for a mean, one row:
    (n, mean, boot_sd, ci_lo, ci_hi) — the error bar every eval
    metric needs, as ONE corpus scan instead of a resampling loop.

    Classic bootstrap resampling is impossible at scale (it needs n
    draws WITH replacement per replicate = a shuffle per replicate);
    the Poisson approximation gives each row an independent
    Poisson(1) weight per replicate, so all ``replicates`` resampled
    means reduce in a single pass: per replicate one (sum w*x, sum w)
    pair, weights derived from the md5 coin of (replicate, seed, id)
    via the inverse CDF over FIXED literal thresholds —
    engine-replayable, layout-independent, append-stable.  ci =
    mean ± z * sd(replicate means).

    Rows with a NULL value or NULL id are excluded up front: a NULL
    value would inflate sum(w) but not sum(w*x) (biasing every
    replicate mean low), and a NULL id hashes to NULL so the weight
    CASE would bottom out at a constant 5 — a 5x-weighted row with
    zero resampling variance.
    """
    from fmx.operators.sampling import hash_uniform01

    x = F.col(value_col).cast("double")
    df = df.filter(F.col(value_col).isNotNull()
                   & F.col(id_col).isNotNull())
    aggs = [F.count("*").cast("bigint").alias("n"),
            F.avg(x).alias("_mean")]
    for r in range(replicates):
        u = hash_uniform01(id_col, f"boot:{r}", seed)
        w = F.lit(5)
        for k in range(len(POISSON1_CDF) - 1, -1, -1):
            w = F.when(u < POISSON1_CDF[k], F.lit(k)).otherwise(w)
        aggs.append(F.sum(w * x).alias(f"_sx{r}"))
        aggs.append(F.sum(w).alias(f"_sw{r}"))
    one = df.agg(*aggs)
    # a replicate whose weights all drew 0 has no sample: center it on
    # the overall mean (zero variance contribution) instead of
    # dividing by zero (ANSI error in Spark, inf in DuckDB) — only
    # reachable on tiny inputs, where the bootstrap is degenerate
    # anyway
    means = F.array(*[
        F.when(F.col(f"_sw{r}") > 0,
               F.col(f"_sx{r}") / F.col(f"_sw{r}"))
        .otherwise(F.col("_mean"))
        for r in range(replicates)])
    mu = F.aggregate(means, F.lit(0.0), lambda a, v: a + v) / replicates
    var = (F.aggregate(means, F.lit(0.0),
                       lambda a, v: a + (v - mu) * (v - mu))
           / (replicates - 1))
    sd = F.sqrt(var)
    return one.select(
        "n", F.round("_mean", 6).alias("mean"),
        F.round(sd, 6).alias("boot_sd"),
        F.round(F.col("_mean") - z * sd, 6).alias("ci_lo"),
        F.round(F.col("_mean") + z * sd, 6).alias("ci_hi"))


def safe_corr(a, b) -> F.Column:
    """Pearson correlation that yields NULL (not ARITHMETIC error) on
    zero-variance inputs: ANSI-mode Spark's native ``corr`` throws
    DIVIDE_BY_ZERO when either column is constant, while every other
    engine (and the DuckDB oracles) returns NULL.

    Both columns are masked to PAIRWISE-COMPLETE rows first (corr's
    semantics): without the mask, covar_samp sees only complete pairs
    while each stddev_samp sees its own column's non-null rows, and
    the n-1 factors stop cancelling — on columns with different null
    patterns the unmasked form returns a value that is not a
    correlation at all.  With the mask, covar_samp / (sd_a * sd_b) is
    algebraically identical to corr wherever corr is defined."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    both = ca.isNotNull() & cb.isNotNull()
    ma, mb = F.when(both, ca), F.when(both, cb)
    denom = F.nullif(F.stddev_samp(ma) * F.stddev_samp(mb), F.lit(0.0))
    return F.covar_samp(ma, mb) / denom


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix of numeric columns in ONE
    aggregation pass: (col_a, col_b, corr) for every a < b pair — the
    dataset-card redundancy/multicollinearity readout.

    All k(k-1)/2 corr aggregates run in a single scan with map-side
    partial aggregation (never one job per pair); the long-format
    explode happens on the 1-row aggregate.  Keep k modest (pairs grow
    quadratically in the AGGREGATE list, not in data passes)."""
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    if not pairs:
        raise ValueError("corr_matrix needs at least two columns")
    aggs = [safe_corr(a, b).alias(f"_c_{i}")
            for i, (a, b) in enumerate(pairs)]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                 F.col(f"_c_{i}").alias("corr"))
        for i, (a, b) in enumerate(pairs)])
    return (one.select(F.explode(rows).alias("r"))
            .select("r.col_a", "r.col_b", "r.corr"))


def value_ranges(df: DataFrame, cols: list[str],
                 quantiles: tuple[float, ...] = (0.01, 0.5, 0.99)
                 ) -> DataFrame:
    """Numeric dataset-card profile in ONE scan: per column
    (col, n, n_null, min, max, p01, p50, p99) — the value-range
    contract a promotion gate checks against the previous snapshot
    (complements profile_column_cardinalities' distinct-count view).

    All min/max/percentile aggregates for every column run in a single
    aggregation pass (exact percentiles are the one holistic piece —
    swap approx_percentile at extreme scale, same contract); the
    long-format explode happens on the 1-row aggregate."""
    qs = [float(q) for q in quantiles]

    def _pname(q: float) -> str:
        pct = q * 100.0
        if float(pct).is_integer():
            return f"p{int(pct):02d}"
        # non-integer percents keep their decimals ('.' -> '_'):
        # 0.125 -> p12_5 — int(round()) would mislabel or collide
        return "p" + (f"{pct:g}").replace(".", "_")

    names = [_pname(q) for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile names {names}")
    aggs = []
    for i, c in enumerate(cols):
        aggs += [F.count("*").alias(f"_n_{i}"),
                 F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{i}"),
                 F.min(c).alias(f"_mn_{i}"), F.max(c).alias(f"_mx_{i}"),
                 F.percentile(c, F.lit(qs)).alias(f"_q_{i}")]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"_n_{i}").cast("bigint").alias("n"),
            F.col(f"_nn_{i}").cast("bigint").alias("n_null"),
            F.round(F.col(f"_mn_{i}").cast("double"), 6).alias("min"),
            F.round(F.col(f"_mx_{i}").cast("double"), 6).alias("max"),
            *[F.round(F.col(f"_q_{i}")[j], 4).alias(names[j])
              for j in range(len(qs))])
        for i, c in enumerate(cols)])
    return (one.select(F.explode(rows).alias("r")).select("r.*"))


def categorical_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy profile of categorical columns in one scan:
    per column (col, n, n_distinct, entropy_bits, norm_entropy) —
    the dataset-card diversity readout (is `source` one giant bucket?
    did `lang` collapse after a filter change?) that complements
    value_ranges' numeric view.

    NULL is a category (a null-heavy column IS low-entropy evidence).
    All columns unpivot into (col, val) pairs on the scan (array of
    structs + explode — stack() with a single shuffle on the
    (col, val) hash-agg, map-side combinable), then a col-grain agg
    computes H = log2(n) - sum(c*log2(c))/n — the transform keeps
    every c integer so the only float summation is over the bounded
    per-column distinct set.  norm_entropy = H / log2(n_distinct)
    (0.0 for single-valued columns).  At 100TB the pair relation is
    |cols| x rows but combines to |cols| x |distinct| before the
    exchange; high-cardinality id columns belong in
    profile_column_cardinalities (HLL), not here."""
    pairs = (df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.col(c).cast("string").alias("val"))
        for c in cols])).alias("r")).select("r.*"))
    counts = pairs.groupBy("col", "val").agg(F.count("*").alias("c"))
    per = counts.groupBy("col").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("k"),
        F.sum(F.col("c") * F.log2("c")).alias("_slc"))
    h = F.log2("n") - F.col("_slc") / F.col("n")
    return per.select(
        "col", F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("n_distinct"),
        F.round(h, 6).alias("entropy_bits"),
        F.round(F.when(F.col("k") > 1, h / F.log2("k"))
                .otherwise(F.lit(0.0)), 6).alias("norm_entropy"))
