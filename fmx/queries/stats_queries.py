"""Round-10 statistical-inference queries: classical k-group tests and
inequality/robust-location statistics over the events stream.

Engine discipline (the ts_ewma / eval_mann_whitney lessons): every
statistic is assembled from EXACT INTEGER moments — events.value is
exactly 2-decimal, so rows collapse to integer cents, and sums / sums
of squares / rank sums ride DECIMAL(38,0) accumulators — then the
final statistic is ONE double formula over those integers, written
identically in Spark and DuckDB.  Rank machinery runs at the VALUE
GRAIN (bounded by the price domain, ~2^16 distinct cents, not the row
count), so the single global cumulative window is over a relation
whose size is data-independent at scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"
DEC = "decimal(38,0)"

# shared cents-grain relation: (event_type, cent)
_SC = """
    sc AS (SELECT event_type AS et,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent,
                  event_id
           FROM events WHERE value IS NOT NULL)
"""


def _sc(spark, sf):
    return (T(spark, sf, "events")
            .filter(F.col("value").isNotNull())
            .select(F.col("event_type").alias("et"),
                    F.floor(F.col("value") * 100 + 0.5).cast(BIG)
                    .alias("cent"), "event_id"))


@query(
    "eval_anova_f",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent)
                      AS DECIMAL(38,0)) AS q
          FROM sc GROUP BY et),
    -- exact rational handling of S_g^2/n_g: DECIMAL divmod splits the
    -- term into an exact integer quotient (sums ride DECIMAL(38,0))
    -- and a small fraction r/n in [0,1) computed as ONE double from
    -- SMALL exact integers, 9dp-rounded INTO a DECIMAL(38,9) so the
    -- cross-group sum is exact and order-independent.  A plain double
    -- sum of the raw terms (magnitude ~1e14 at sf0.1, ulp 0.03)
    -- flipped ss_between's 4dp rounding between sessions with
    -- different partition counts — the r11 vanilla-rehearsal catch.
    -- exact floor division at 1e29 scale: DuckDB's DECIMAL "/" and
    -- "//" route through DOUBLE past 2^53 (measured: wrong by 2.6e7
    -- at 27 digits) — HUGEINT division is the exact path here; the
    -- Spark twin's DECIMAL (s2x - s2x %% n)/n is exact natively
    t AS (SELECT g.*,
                 CAST(CAST(s * s AS DECIMAL(38,0)) * 1000000000
                      AS HUGEINT) AS s2x
          FROM g),
    e AS (SELECT n, s, q,
                 CAST(s2x // CAST(n AS HUGEINT) AS DECIMAL(38,0)) AS dx
          FROM t),
    m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(s) AS DECIMAL(38,0)) AS s,
                 CAST(sum(q) AS DECIMAL(38,0)) AS q,
                 CAST(sum(dx) AS DECIMAL(38,0)) AS sbx
          FROM e),
    gr AS (SELECT m.*,
                  CAST(CAST(s * s AS DECIMAL(38,0)) * 1000000000
                       AS HUGEINT) AS gs2x
           FROM m),
    fin AS (SELECT k, n, q, sbx,
                   CAST(gs2x // CAST(n AS HUGEINT) AS DECIMAL(38,0))
                       AS gdx
            FROM gr)
    SELECT k, n,
           CAST(sbx - gdx AS DOUBLE) / 1e9 AS ss_between,
           CAST(q * 1000000000 - sbx AS DOUBLE) / 1e9 AS ss_within,
           round((CAST(sbx - gdx AS DOUBLE) / 1e9 / (k - 1))
                 / (CAST(q * 1000000000 - sbx AS DOUBLE) / 1e9
                    / (n - k)), 6) AS f_stat
    FROM fin
    """)
def eval_anova_f(spark, sf):
    """One-way ANOVA F over the five event_type value distributions.
    Sum-of-squares identity form: SSW = Q - sum_g(S_g^2/n_g) and
    SSB = sum_g(S_g^2/n_g) - S^2/N need only the per-group integer
    moments (n, S=sum cents, Q=sum cents^2) — one groupBy + one 5-row
    agg, no second pass over the data for deviations.  Exact INTEGER
    handling of S_g^2/n_g (the r11 vanilla-rehearsal lesson): a plain
    double sum of the raw terms — magnitude ~1e14 at sf0.1, ulp 0.03 —
    flipped ss_between's 4dp rounding between sessions with different
    partition counts, and even a 9dp round-into-decimal of the r/n
    fractions disagreed at decimal midpoints between engines.  So the
    term is computed at a FIXED 1e9 integer scale with exact DECIMAL
    floor division ((x - x %% n)/n — bit-identical divmod in both
    engines, verified), every cross-group sum rides DECIMAL(38,0),
    and the only doubles are the final cast of identical exact
    integers and one division by 1e9 — identical IEEE ops on
    identical inputs.  SS values are therefore 1e-9-floor-quantized
    truths; F is one double formula over them.

    Magnitude headroom at SCALE = 1e9 (r11 advice): s2x = (sum of
    cents)^2 * 1e9 must fit DECIMAL(38,0)/HUGEINT, i.e. |sum of
    cents| < ~10^14.5 per group (~3e12 dollars) — comfortable for the
    declared envelope's per-group sums but NOT unconditionally 100 TB
    safe for unbounded value domains.  Past it, DuckDB fails LOUDLY
    (Overflow in multiplication — verified empirically) while Spark's
    non-ANSI decimal overflow yields silent NULLs, so the engines
    diverge in failure mode before they diverge in values.  If a
    deployment's group sums approach 10^14 cents, derive the scale
    from n (SCALE = 10^(29 - ceil(2*log10(max|s|)))) or pre-center the
    values; the fixed constant is kept here because the oracle must
    replay the identical literal."""
    g = _sc(spark, sf).groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("cent")).cast(DEC)
        .alias("q"))
    SCALE = 1_000_000_000

    def fdiv_scaled(src, out):
        s2x = ((F.col("s") * F.col("s")).cast(DEC)
               * F.lit(SCALE)).cast(DEC)
        return src.withColumn(
            out, ((s2x - s2x % F.col("n")) / F.col("n")).cast(DEC))

    e = fdiv_scaled(g, "dx")
    m = e.agg(
        F.count("*").cast(BIG).alias("k"),
        F.sum("n").cast(BIG).alias("n"),
        F.sum("s").cast(DEC).alias("s"),
        F.sum("q").cast(DEC).alias("q"),
        F.sum("dx").cast(DEC).alias("sbx"))
    fin = fdiv_scaled(m, "gdx")
    k, n = F.col("k"), F.col("n")
    ssb = (F.col("sbx") - F.col("gdx")).cast("double") / 1e9
    ssw = ((F.col("q") * F.lit(SCALE)).cast(DEC)
           - F.col("sbx")).cast("double") / 1e9
    return fin.select(
        "k", "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"))


@query(
    "eval_kruskal_wallis",
    oracle=f"""
    WITH {_SC},
    vg AS (SELECT cent, et, CAST(count(*) AS BIGINT) AS c
           FROM sc GROUP BY 1, 2),
    tg AS (SELECT cent, CAST(sum(c) AS BIGINT) AS t FROM vg GROUP BY 1),
    cum AS (SELECT cent, t,
                   coalesce(sum(t) OVER (ORDER BY cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS bl
            FROM tg),
    rk AS (SELECT vg.et, vg.c, 2 * cum.bl + cum.t + 1 AS r2
           FROM vg JOIN cum USING (cent)),
    grp AS (SELECT et, CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(CAST(c AS DECIMAL(38,0)) * r2)
                        AS DECIMAL(38,0)) AS r2sum
            FROM rk GROUP BY et),
    ties AS (SELECT CAST(sum(CAST(t AS DECIMAL(38,0)) * t * t - t)
                         AS DECIMAL(38,0)) AS s3,
                    CAST(sum(t) AS BIGINT) AS n
             FROM tg),
    m AS (SELECT CAST(count(*) AS BIGINT) AS k, ties.n AS n, ties.s3,
                 sum(CAST(r2sum AS DOUBLE) * CAST(r2sum AS DOUBLE)
                     / (4.0 * grp.n)) AS rr
          FROM grp CROSS JOIN ties
          GROUP BY ties.n, ties.s3)
    SELECT k, n,
           round(12.0 * rr / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1),
                 6) AS h_stat,
           round((12.0 * rr / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                 / (1.0 - CAST(s3 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n)), 6)
               AS h_tie_corrected
    FROM m
    """)
def eval_kruskal_wallis(spark, sf):
    """Kruskal-Wallis rank-sum test across all five event_type groups —
    the k-group generalization of eval_mann_whitney_u, closing the
    one-way nonparametric slot.  Midranks stay integer by carrying
    2*rank (2*bl + t + 1) so per-group rank sums are exact
    DECIMAL(38,0); H and its tie correction 1 - sum(t^3-t)/(N^3-N) are
    one double formula each.  The only window is the cumulative count
    over DISTINCT cents — value grain, bounded by the price domain."""
    vg = _sc(spark, sf).groupBy("cent", "et").agg(
        F.count("*").cast(BIG).alias("c"))
    tg = vg.groupBy("cent").agg(F.sum("c").cast(BIG).alias("t"))
    wprev = (Window.orderBy("cent")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum = tg.select(
        "cent", "t",
        F.coalesce(F.sum("t").over(wprev), F.lit(0)).alias("bl"))
    rk = vg.join(cum, "cent").select(
        "et", "c", (2 * F.col("bl") + F.col("t") + 1).alias("r2"))
    grp = rk.groupBy("et").agg(
        F.sum("c").cast(BIG).alias("n"),
        F.sum(F.col("c").cast(DEC) * F.col("r2")).cast(DEC).alias("r2sum"))
    ties = tg.agg(
        F.sum(F.col("t").cast(DEC) * F.col("t") * F.col("t")
              - F.col("t")).cast(DEC).alias("s3"),
        F.sum("t").cast(BIG).alias("n_total"))
    m = (grp.crossJoin(F.broadcast(ties))
         .groupBy("n_total", "s3")
         .agg(F.count("*").cast(BIG).alias("k"),
              F.sum(F.col("r2sum").cast("double")
                    * F.col("r2sum").cast("double")
                    / (4.0 * F.col("n"))).alias("rr"))
         .withColumnRenamed("n_total", "n"))
    n, rr, s3 = F.col("n"), F.col("rr"), F.col("s3").cast("double")
    h = 12.0 * rr / (n.cast("double") * (n + 1)) - 3.0 * (n + 1)
    return m.select(
        "k", "n",
        F.round(h, 6).alias("h_stat"),
        F.round(h / (1.0 - s3 / (n.cast("double") * n * n - n)), 6)
        .alias("h_tie_corrected"))


@query(
    "eval_cochran_q",
    oracle="""
    WITH flags AS (
      SELECT doc_id,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS r1,
             CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END AS r2,
             CASE WHEN len(list_filter(string_split(text, ' '),
                                       x -> x <> '')) >= 40
                  THEN 1 ELSE 0 END AS r3
      FROM documents),
    rows_ AS (SELECT doc_id, r1 + r2 + r3 AS ri FROM flags),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(r1) AS BIGINT) AS c1,
                 CAST(sum(r2) AS BIGINT) AS c2,
                 CAST(sum(r3) AS BIGINT) AS c3,
                 CAST(sum(ri) AS BIGINT) AS nn,
                 CAST(sum(ri * ri) AS BIGINT) AS rsq
          FROM flags JOIN rows_ USING (doc_id))
    SELECT n_docs, c1, c2, c3,
           round(2.0 * (3.0 * (CAST(c1 AS DOUBLE) * c1
                               + CAST(c2 AS DOUBLE) * c2
                               + CAST(c3 AS DOUBLE) * c3)
                        - CAST(nn AS DOUBLE) * nn)
                 / nullif(3.0 * nn - rsq, 0.0), 6) AS q_stat,
           CAST(2 AS BIGINT) AS dof
    FROM m
    """)
def eval_cochran_q(spark, sf):
    """Cochran's Q: do k=3 binary document-quality rules (length >=
    200 chars, contains ' the ', >= 40 tokens) fire at the same rate
    on the same docs?  The k-treatment generalization of
    eval_mcnemar (and the binary sibling of eval_fleiss_kappa).
    Q = (k-1)(k*sum(C_j^2) - N^2) / (k*N - sum(R_i^2)) over integer
    row/column totals — one scan, one scalar agg, one double
    division."""
    d = T(spark, sf, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    flags = d.select(
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("r1"),
        F.when(F.col("text").contains(" the "), 1).otherwise(0).alias("r2"),
        F.when(F.size(toks) >= 40, 1).otherwise(0).alias("r3"))
    flags = flags.withColumn("ri", F.col("r1") + F.col("r2") + F.col("r3"))
    m = flags.agg(
        F.count("*").cast(BIG).alias("n_docs"),
        F.sum("r1").cast(BIG).alias("c1"),
        F.sum("r2").cast(BIG).alias("c2"),
        F.sum("r3").cast(BIG).alias("c3"),
        F.sum("ri").cast(BIG).alias("nn"),
        F.sum(F.col("ri") * F.col("ri")).cast(BIG).alias("rsq"))
    c1, c2, c3 = (F.col(c).cast("double") for c in ("c1", "c2", "c3"))
    nn, rsq = F.col("nn").cast("double"), F.col("rsq")
    return m.select(
        "n_docs", "c1", "c2", "c3",
        F.round(2.0 * (3.0 * (c1 * c1 + c2 * c2 + c3 * c3) - nn * nn)
                / F.nullif(3.0 * nn - rsq, F.lit(0.0)), 6).alias("q_stat"),
        F.lit(2).cast(BIG).alias("dof"))


@query(
    "stats_theil_index",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s
          FROM sc GROUP BY et),
    terms AS (SELECT sc.et,
                     (cent * CAST(g.n AS DOUBLE) / CAST(g.s AS DOUBLE))
                       * ln(cent * CAST(g.n AS DOUBLE)
                            / CAST(g.s AS DOUBLE)) AS txy,
                     ln(CAST(g.s AS DOUBLE) / (CAST(g.n AS DOUBLE) * cent))
                         AS lxy
              FROM sc JOIN g USING (et))
    SELECT et, g.n AS n,
           round(sum(txy) / g.n, 6) AS theil_t,
           round(sum(lxy) / g.n, 6) AS theil_l
    FROM terms JOIN g USING (et)
    GROUP BY et, g.n ORDER BY et
    """)
def stats_theil_index(spark, sf):
    """Theil inequality indices per event_type: T = mean((x/mu)
    ln(x/mu)) and L = mean(ln(mu/x)) (mean log deviation) over integer
    cents.  x/mu is computed as cent*n/S — a single division of exact
    integers — so both engines feed ln() the identical double; the
    residual risk is ln()'s last-ulp noise summed over the group
    (the text_pmi/entropy precedent), absorbed by round 6."""
    g = _sc(spark, sf).groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"))
    sc2 = _sc(spark, sf).join(F.broadcast(g), "et")
    ratio = (F.col("cent") * F.col("n").cast("double")
             / F.col("s").cast("double"))
    inv = (F.col("s").cast("double")
           / (F.col("n").cast("double") * F.col("cent")))
    return (sc2.select("et", "n", (ratio * F.log(ratio)).alias("txy"),
                       F.log(inv).alias("lxy"))
            .groupBy("et", "n")
            .agg(F.round(F.sum("txy") / F.col("n"), 6).alias("theil_t"),
                 F.round(F.sum("lxy") / F.col("n"), 6).alias("theil_l"))
            .select("et", "n", "theil_t", "theil_l"))


@query(
    "stats_trimmed_mean",
    oracle=f"""
    WITH {_SC},
    rk AS (SELECT et, cent,
                  row_number() OVER (PARTITION BY et
                                     ORDER BY cent, event_id) AS rn,
                  count(*) OVER (PARTITION BY et) AS n
           FROM sc),
    kept AS (SELECT et, cent, n FROM rk
             WHERE rn > n // 10 AND rn <= n - n // 10)
    SELECT et, CAST(any_value(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_used,
           round(CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DOUBLE)
                 / (count(*) * 100.0), 6) AS trimmed_mean
    FROM kept GROUP BY et ORDER BY et
    """)
def stats_trimmed_mean(spark, sf):
    """10%-trimmed mean per event_type: drop the lowest and highest
    floor(n/10) observations by (cent, event_id) rank — the robust
    DROP complement to profile_winsorized_mean's CLAMP.  One
    partitioned rank window, then exact integer cents summed and
    divided once; ties cut deterministically by the unique event id."""
    w = Window.partitionBy("et").orderBy("cent", "event_id")
    wn = Window.partitionBy("et")
    rk = _sc(spark, sf).select(
        "et", "cent",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"))
    kept = rk.filter((F.col("rn") > F.floor(F.col("n") / 10))
                     & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 10)))
    return (kept.groupBy("et")
            .agg(F.any_value("n").cast(BIG).alias("n_total"),
                 F.count("*").cast(BIG).alias("n_used"),
                 F.round(F.sum(F.col("cent").cast(DEC)).cast("double")
                         / (F.count("*") * 100.0), 6).alias("trimmed_mean")))


_PT_B = 32           # randomization-test replicates
_PT_U = ("(CAST(concat('0x', substring(md5(concat('permtest:42:', "
         "CAST(concat(event_id, ':', b) AS VARCHAR))), 1, 15)) AS BIGINT)"
         " / 1152921504606846976.0)")


@query(
    "eval_permutation_test",
    oracle=f"""
    WITH {_SC},
    ab AS (SELECT et, cent, event_id FROM sc
           WHERE et IN ('view', 'click')),
    obs AS (SELECT CAST(sum(CASE WHEN et = 'view' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(sum(CASE WHEN et = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b,
                   CAST(sum(CASE WHEN et = 'view' THEN cent ELSE 0 END)
                        AS DECIMAL(38,0)) AS s_a,
                   CAST(sum(CASE WHEN et = 'click' THEN cent ELSE 0 END)
                        AS DECIMAL(38,0)) AS s_b
            FROM ab),
    reps AS (SELECT unnest(generate_series(0, {_PT_B - 1})) AS b),
    flips AS (SELECT b,
                     CASE WHEN {_PT_U} < 0.5 THEN 'A' ELSE 'B' END AS g,
                     cent
              FROM ab CROSS JOIN reps),
    rmeans AS (SELECT b,
                      CAST(sum(CASE WHEN g = 'A' THEN cent ELSE 0 END)
                           AS DOUBLE)
                      / nullif(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END),
                               0)
                      - CAST(sum(CASE WHEN g = 'B' THEN cent ELSE 0 END)
                             AS DOUBLE)
                        / nullif(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END),
                                 0) AS diff
               FROM flips GROUP BY b)
    SELECT n_a, n_b,
           round((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
                 / 100.0, 6) AS obs_diff,
           CAST({_PT_B} AS BIGINT) AS n_replicates,
           CAST(sum(CASE WHEN abs(diff) >=
                         abs(CAST(s_a AS DOUBLE) / n_a
                             - CAST(s_b AS DOUBLE) / n_b)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round((sum(CASE WHEN abs(diff) >=
                           abs(CAST(s_a AS DOUBLE) / n_a
                               - CAST(s_b AS DOUBLE) / n_b)
                           THEN 1 ELSE 0 END) + 1.0) / ({_PT_B} + 1.0),
                 6) AS p_value
    FROM rmeans CROSS JOIN obs
    GROUP BY n_a, n_b, s_a, s_b
    """)
def eval_permutation_test(spark, sf):
    """Randomization test for the view-vs-click mean-value difference:
    B=32 md5-coin label reshuffles, each replicate's group-mean
    difference compared against the observed one; p = (extreme+1)/
    (B+1) — the distribution-free complement to eval_mann_whitney_u
    (tests the MEAN, assumes nothing about shape).  Every replicate
    mean is an exact-integer division (cents / count), so the
    |diff| >= |obs| comparison is bit-deterministic cross-engine; the
    replicate fan-out is one map-side array explode, one groupBy(b) —
    no per-replicate pass."""
    from fmx.operators.sampling import hash_uniform01

    ab = (_sc(spark, sf)
          .filter(F.col("et").isin("view", "click")))
    obs = ab.agg(
        F.sum(F.when(F.col("et") == "view", 1).otherwise(0)).cast(BIG)
        .alias("n_a"),
        F.sum(F.when(F.col("et") == "click", 1).otherwise(0)).cast(BIG)
        .alias("n_b"),
        F.sum(F.when(F.col("et") == "view", F.col("cent")).otherwise(0))
        .cast(DEC).alias("s_a"),
        F.sum(F.when(F.col("et") == "click", F.col("cent")).otherwise(0))
        .cast(DEC).alias("s_b"))
    flips = (ab.withColumn("b", F.explode(F.sequence(
                 F.lit(0), F.lit(_PT_B - 1))))
             .withColumn("u", hash_uniform01(
                 F.concat(F.col("event_id").cast("string"), F.lit(":"),
                          F.col("b").cast("string")), "permtest", 42))
             .select("b", F.when(F.col("u") < 0.5, "A").otherwise("B")
                     .alias("g"), "cent"))
    rmeans = flips.groupBy("b").agg(
        (F.sum(F.when(F.col("g") == "A", F.col("cent")).otherwise(0))
         .cast("double")
         / F.nullif(F.sum(F.when(F.col("g") == "A", 1).otherwise(0)),
                    F.lit(0))
         - F.sum(F.when(F.col("g") == "B", F.col("cent")).otherwise(0))
         .cast("double")
         / F.nullif(F.sum(F.when(F.col("g") == "B", 1).otherwise(0)),
                    F.lit(0))).alias("diff"))
    d0 = (F.col("s_a").cast("double") / F.col("n_a")
          - F.col("s_b").cast("double") / F.col("n_b"))
    ext = F.sum(F.when(F.abs(F.col("diff")) >= F.abs(d0), 1)
                .otherwise(0))
    return (rmeans.crossJoin(F.broadcast(obs))
            .groupBy("n_a", "n_b", "s_a", "s_b")
            .agg(ext.cast(BIG).alias("n_extreme"))
            .select("n_a", "n_b",
                    F.round(d0 / 100.0, 6).alias("obs_diff"),
                    F.lit(_PT_B).cast(BIG).alias("n_replicates"),
                    "n_extreme",
                    F.round((F.col("n_extreme") + 1.0) / (_PT_B + 1.0), 6)
                    .alias("p_value")))


@query(
    "eval_proportions_ztest",
    oracle="""
    WITH u AS (SELECT user_id,
                      max(CASE WHEN event_type = 'click' THEN 1
                               ELSE 0 END) AS clicked,
                      max(CASE WHEN event_type = 'purchase' THEN 1
                               ELSE 0 END) AS purchased
               FROM events GROUP BY user_id, date_trunc('day', ts)),
    m AS (SELECT CAST(sum(clicked) AS BIGINT) AS n1,
                 CAST(sum(clicked * purchased) AS BIGINT) AS x1,
                 CAST(sum(1 - clicked) AS BIGINT) AS n2,
                 CAST(sum((1 - clicked) * purchased) AS BIGINT) AS x2
          FROM u)
    SELECT n1, x1, n2, x2,
           round(CAST(x1 AS DOUBLE) / nullif(n1, 0), 6) AS p1,
           round(CAST(x2 AS DOUBLE) / nullif(n2, 0), 6) AS p2,
           round((CAST(x1 AS DOUBLE) / nullif(n1, 0)
                  - CAST(x2 AS DOUBLE) / nullif(n2, 0))
                 / nullif(sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                        * (1.0 / nullif(n1, 0) + 1.0 / nullif(n2, 0))),
                          0.0), 6) AS z_stat
    FROM m
    """)
def eval_proportions_ztest(spark, sf):
    """Two-proportion z-test at the (user, day) grain: do user-days
    with a click convert to purchase at a different rate than
    click-free user-days?  The TEST that eval_power_analysis sizes
    for — pooled-variance z over four exact integers (one unit-grain
    agg, one scalar agg, one double formula).  Unit = user-day, not
    user, because at ~66 events/user EVERY user eventually clicks
    (the degenerate-control lesson: pick the experiment unit where
    the control arm exists)."""
    ev = T(spark, sf, "events")
    u = ev.groupBy("user_id", F.date_trunc("day", "ts")).agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .alias("clicked"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .alias("purchased"))
    m = u.agg(
        F.sum("clicked").cast(BIG).alias("n1"),
        F.sum(F.col("clicked") * F.col("purchased")).cast(BIG).alias("x1"),
        F.sum(1 - F.col("clicked")).cast(BIG).alias("n2"),
        F.sum((1 - F.col("clicked")) * F.col("purchased")).cast(BIG)
        .alias("x2"))
    n1, x1 = F.col("n1"), F.col("x1")
    n2, x2 = F.col("n2"), F.col("x2")
    p1 = x1.cast("double") / F.nullif(n1, F.lit(0))
    p2 = x2.cast("double") / F.nullif(n2, F.lit(0))
    pp = (x1 + x2).cast("double") / (n1 + n2)
    return m.select(
        "n1", "x1", "n2", "x2",
        F.round(p1, 6).alias("p1"), F.round(p2, 6).alias("p2"),
        F.round((p1 - p2) / F.nullif(
            F.sqrt(pp * (1.0 - pp)
                   * (1.0 / F.nullif(n1, F.lit(0))
                      + 1.0 / F.nullif(n2, F.lit(0)))), F.lit(0.0)), 6)
        .alias("z_stat"))


@query(
    "stats_grubbs_test",
    oracle=f"""
    WITH {_SC},
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent)
                      AS DECIMAL(38,0)) AS q,
                 CAST(max(cent) AS BIGINT) AS mx,
                 CAST(min(cent) AS BIGINT) AS mn
          FROM sc GROUP BY et)
    SELECT et AS event_type, n,
           round((mx - CAST(s AS DOUBLE) / n)
                 / sqrt((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                        / (n - 1)), 6) AS g_max,
           round((CAST(s AS DOUBLE) / n - mn)
                 / sqrt((CAST(q AS DOUBLE)
                         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                        / (n - 1)), 6) AS g_min
    FROM m ORDER BY event_type
    """)
def stats_grubbs_test(spark, sf):
    """Grubbs' outlier statistic per event_type: G = (extreme - mean)
    / s for both tails — the single-most-extreme-value test that
    complements profile_zscore_outliers' per-row flags with the
    one-number 'is the worst point statistically surprising' readout.
    One groupBy collecting five integer moments; G is one double
    formula."""
    m = _sc(spark, sf).groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("cent")).cast(DEC)
        .alias("q"),
        F.max("cent").cast(BIG).alias("mx"),
        F.min("cent").cast(BIG).alias("mn"))
    n = F.col("n")
    s, q = F.col("s").cast("double"), F.col("q").cast("double")
    sd = F.sqrt((q - s * s / n) / (n - 1))
    return (m.select(F.col("et").alias("event_type"), "n",
                     F.round((F.col("mx") - s / n) / sd, 6).alias("g_max"),
                     F.round((s / n - F.col("mn")) / sd, 6).alias("g_min")))


@query(
    "stats_jarque_bera",
    oracle=f"""
    WITH {_SC},
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent)
                      AS DECIMAL(38,0)) AS q,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent * cent)
                      AS DECIMAL(38,0)) AS c3,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent * cent
                          * cent) AS DECIMAL(38,0)) AS c4
          FROM sc GROUP BY et),
    mom AS (SELECT et, n,
                   CAST(s AS DOUBLE) / n AS mu,
                   CAST(q AS DOUBLE) / n AS r2,
                   CAST(c3 AS DOUBLE) / n AS r3,
                   CAST(c4 AS DOUBLE) / n AS r4
            FROM m),
    cm AS (SELECT et, n,
                  r2 - mu * mu AS m2,
                  r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                  r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                     - 3.0 * mu * mu * mu * mu AS m4
           FROM mom)
    SELECT et AS event_type, n,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2), 6) AS kurtosis,
           round(n / 6.0 * ((m3 / (m2 * sqrt(m2)))
                            * (m3 / (m2 * sqrt(m2)))
                            + (m4 / (m2 * m2) - 3.0)
                              * (m4 / (m2 * m2) - 3.0) / 4.0), 6)
               AS jb_stat
    FROM cm ORDER BY event_type
    """)
def stats_jarque_bera(spark, sf):
    """Jarque-Bera normality test per event_type: skewness and excess
    kurtosis from raw integer power sums (cents^1..^4 ride
    DECIMAL(38,0) — cent^4 overflows BIGINT at ~2k rows), converted to
    central moments by the standard expansion written IDENTICALLY in
    both engines, then JB = n/6 (S^2 + (K-3)^2/4).  One scan, one
    5-accumulator agg per group, three double formulas — the
    distribution-shape gate a value column crosses before z-score
    thresholds mean anything."""
    cd = F.col("cent").cast(DEC)
    m = _sc(spark, sf).groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(cd).cast(DEC).alias("s"),
        F.sum(cd * F.col("cent")).cast(DEC).alias("q"),
        F.sum(cd * F.col("cent") * F.col("cent")).cast(DEC).alias("c3"),
        F.sum(cd * F.col("cent") * F.col("cent") * F.col("cent"))
        .cast(DEC).alias("c4"))
    n = F.col("n")
    mu = F.col("s").cast("double") / n
    r2 = F.col("q").cast("double") / n
    r3 = F.col("c3").cast("double") / n
    r4 = F.col("c4").cast("double") / n
    mom = m.select("et", "n", mu.alias("mu"), r2.alias("r2"),
                   r3.alias("r3"), r4.alias("r4"))
    mu, r2 = F.col("mu"), F.col("r2")
    r3, r4 = F.col("r3"), F.col("r4")
    cm = mom.select(
        "et", "n",
        (r2 - mu * mu).alias("m2"),
        (r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu).alias("m3"),
        (r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
         - 3.0 * mu * mu * mu * mu).alias("m4"))
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2)
    return (cm.select(F.col("et").alias("event_type"), "n",
                      F.round(skew, 6).alias("skewness"),
                      F.round(kurt, 6).alias("kurtosis"),
                      F.round(F.col("n") / 6.0
                              * (skew * skew
                                 + (kurt - 3.0) * (kurt - 3.0) / 4.0), 6)
                      .alias("jb_stat")))


def _abs_tail_sql(z: str) -> str:
    """THE Abramowitz-Stegun 26.2.17 normal-tail fragment
    P(Z > |z|), |err| < 7.5e-8, written with only *, +, abs, exp and
    decimal literals so the IDENTICAL expression string parses and
    evaluates in Spark SQL and DuckDB — the closed-form normal tail
    neither engine ships as a builtin.  0.3989422804014327 is
    1/sqrt(2*pi).  Single source for every p-value family here
    (two-sided: BH; one-sided: TOST) — the five polynomial constants
    exist in exactly one place."""
    a = f"abs({z})"
    k = f"(1.0 / (1.0 + 0.2316419 * {a}))"
    poly = (f"({k} * (0.31938153 + {k} * (-0.356563782 + {k} * "
            f"(1.781477937 + {k} * (-1.821255978 + {k} * 1.330274429)))))")
    pdf = f"(0.3989422804014327 * exp(-0.5 * {a} * {a}))"
    return f"({pdf} * {poly})"


def _two_sided_p_sql(z: str) -> str:
    """Two-sided normal p-value 2*(1 - Phi(|z|)) from the shared
    Abramowitz-Stegun tail fragment (_abs_tail_sql)."""
    return f"least(1.0, 2.0 * {_abs_tail_sql(z)})"


_BH_CELLS = """
    cents AS (SELECT event_type AS et, dayofweek(ts) + 1 AS dow,
                     CAST(round(value * 100) AS BIGINT) AS cent
              FROM events WHERE value IS NOT NULL),
    cell AS (SELECT et, dow, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(cent) AS DECIMAL(38,0)) AS s1,
                    CAST(sum(cent * cent) AS DECIMAL(38,0)) AS s2
             FROM cents GROUP BY 1, 2),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(sum(s1) AS DECIMAL(38,0)) AS ts1,
                   CAST(sum(s2) AS DECIMAL(38,0)) AS ts2,
                   CAST(count(*) AS BIGINT) AS m
            FROM cell),
    zed AS (SELECT et, dow, n, m,
                   round((CAST(s1 AS DOUBLE) / n
                          - CAST(ts1 AS DOUBLE) / tn)
                         / sqrt((CAST(ts2 AS DOUBLE) / tn
                                 - (CAST(ts1 AS DOUBLE) / tn)
                                   * (CAST(ts1 AS DOUBLE) / tn)) / n),
                         6) AS z
            FROM cell, tot),
    pv AS (SELECT et, dow, n, m, z, round({P}, 9) AS p FROM zed),
    ranked AS (SELECT *, CAST(row_number() OVER
                                (ORDER BY p, et, dow) AS BIGINT) AS rk
               FROM pv),
    adj AS (SELECT *, round(least(min(p * m / rk) OVER
                                    (ORDER BY rk DESC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 1.0), 9) AS p_adj
            FROM ranked)
"""


@query(
    "stats_benjamini_hochberg",
    oracle=f"""
    WITH {_BH_CELLS.replace("{P}", _two_sided_p_sql("z"))}
    SELECT et AS event_type, CAST(dow AS BIGINT) AS dow, n,
           z, p, rk AS p_rank, p_adj,
           CAST(CASE WHEN p_adj <= 0.1 THEN 1 ELSE 0 END AS INT)
             AS rejected
    FROM adj
    """)
def stats_benjamini_hochberg(spark, sf):
    """Benjamini-Hochberg FDR correction over a 35-test battery (every
    event_type x weekday cell's mean-vs-global z-test): the multiple-
    testing step every experimentation platform runs before declaring
    winners, here with p-values from the shared Abramowitz-Stegun
    normal-tail fragment (_two_sided_p_sql — the SAME expression
    string evaluates in both engines) and the step-up adjustment
    p_adj_i = min_{{j>=i}} p_j * m / j as a reverse running min.
    Engine-exactness: z is one double formula over exact integer-cent
    moments, rounded BEFORE the p transform; BH ranks on the rounded p
    with a total (p, et, dow) order.  The two global windows run over
    the CELL grain (35 = 5 types x 7 weekdays rows, data-independent
    at scale) — the battery relation, not the event stream."""
    events = T(spark, sf, "events")
    cents = (events.filter(F.col("value").isNotNull())
             .select(F.col("event_type").alias("et"),
                     F.dayofweek("ts").alias("dow"),
                     F.round(F.col("value") * 100)
                     .cast("bigint").alias("cent")))
    cell = (cents.groupBy("et", "dow")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum("cent").cast("decimal(38,0)").alias("s1"),
                 F.sum(F.col("cent") * F.col("cent"))
                 .cast("decimal(38,0)").alias("s2")))
    tot = cell.agg(F.sum("n").cast("bigint").alias("tn"),
                   F.sum("s1").cast("decimal(38,0)").alias("ts1"),
                   F.sum("s2").cast("decimal(38,0)").alias("ts2"),
                   F.count("*").cast("bigint").alias("m"))
    zed = (cell.crossJoin(F.broadcast(tot))
           .select("et", "dow", "n", "m",
                   F.round((F.col("s1").cast("double") / F.col("n")
                            - F.col("ts1").cast("double") / F.col("tn"))
                           / F.sqrt((F.col("ts2").cast("double")
                                     / F.col("tn")
                                     - (F.col("ts1").cast("double")
                                        / F.col("tn"))
                                     * (F.col("ts1").cast("double")
                                        / F.col("tn"))) / F.col("n")),
                           6).alias("z")))
    pv = zed.withColumn("p", F.round(F.expr(_two_sided_p_sql("z")), 9))
    ranked = pv.withColumn(
        "rk", F.row_number().over(Window.orderBy("p", "et", "dow"))
        .cast("bigint"))
    wrev = (Window.orderBy(F.desc("rk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    adj = ranked.withColumn(
        "p_adj",
        F.round(F.least(F.min(F.col("p") * F.col("m") / F.col("rk"))
                        .over(wrev), F.lit(1.0)), 9))
    return adj.select(F.col("et").alias("event_type"),
                      F.col("dow").cast("bigint").alias("dow"), "n",
                      "z", "p", F.col("rk").alias("p_rank"), "p_adj",
                      F.when(F.col("p_adj") <= 0.1, 1).otherwise(0)
                      .cast("int").alias("rejected"))


MSPRT_TAU2 = 0.0001      # mixture prior variance (tau = 0.01)


@query(
    "eval_msprt_always_valid",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(user_id % 2 AS INT) AS v,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    cum AS (SELECT day, v,
                   sum(n) OVER (PARTITION BY v ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cn,
                   sum(x) OVER (PARTITION BY v ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cx
            FROM daily),
    wide AS (SELECT a.day,
                    CAST(a.cn AS BIGINT) AS n1, CAST(a.cx AS BIGINT) AS x1,
                    CAST(b.cn AS BIGINT) AS n2, CAST(b.cx AS BIGINT) AS x2
             FROM cum a JOIN cum b ON a.day = b.day
             WHERE a.v = 1 AND b.v = 0),
    lr AS (SELECT day, n1, x1, n2, x2,
                  round(least(1.0, 1.0 / (
                    sqrt(((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                          * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                          * (1.0 / n1 + 1.0 / n2))
                         / (((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                             * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                             * (1.0 / n1 + 1.0 / n2)) + {MSPRT_TAU2}))
                    * exp((CAST(x1 AS DOUBLE) / n1
                           - CAST(x2 AS DOUBLE) / n2)
                          * (CAST(x1 AS DOUBLE) / n1
                             - CAST(x2 AS DOUBLE) / n2)
                          * {MSPRT_TAU2}
                          / (2.0 * ((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                                    * (1.0 - CAST(x1 + x2 AS DOUBLE)
                                             / (n1 + n2))
                                    * (1.0 / n1 + 1.0 / n2))
                             * (((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                                 * (1.0 - CAST(x1 + x2 AS DOUBLE)
                                          / (n1 + n2))
                                 * (1.0 / n1 + 1.0 / n2))
                                + {MSPRT_TAU2}))))), 9) AS p_inst
           FROM wide)
    SELECT strftime(day, '%Y-%m-%d') AS day, n1, x1, n2, x2, p_inst,
           round(min(p_inst) OVER (ORDER BY day
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW), 9) AS p_always,
           CAST(CASE WHEN min(p_inst) OVER (ORDER BY day
                                            ROWS BETWEEN UNBOUNDED
                                            PRECEDING AND CURRENT ROW)
                          <= 0.05
                     THEN 1 ELSE 0 END AS INT) AS significant
    FROM lr
    """)
def eval_msprt_always_valid(spark, sf):
    """Always-valid sequential A/B inference via the mixture SPRT
    (Johari et al., KDD'17 "Peeking at A/B Tests" — the math behind
    Optimizely's Stats Engine): user-parity variants, daily CUMULATIVE
    conversion counts, the normal-mixture likelihood ratio

        LR_t = sqrt(V/(V + tau^2)) * exp(theta^2 tau^2 / (2V(V + tau^2)))

    (theta = p1 - p2, V = pooled p(1-p)(1/n1 + 1/n2), tau^2 = 1e-4),
    and the always-valid p-value as the RUNNING MIN of 1/LR — the
    quantity that stays a valid p-value no matter how often the
    experimenter peeks, unlike the fixed-horizon z-test
    (eval_proportions_ztest) it complements.  Cumulative counts are
    exact-integer windows per variant; the LR is one double formula
    over them written identically in both engines, rounded to 9dp
    BEFORE the running min so the min ranks identical doubles.  The
    day-grain windows are calendar-bounded (the cusum discipline)."""
    events = T(spark, sf, "events")
    daily = (events.groupBy(F.col("ts").cast("date").alias("day"),
                            (F.col("user_id") % 2).cast("int").alias("v"))
             .agg(F.count("*").cast(BIG).alias("n"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast(BIG).alias("x")))
    wcum = (Window.partitionBy("v").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = daily.select("day", "v",
                       F.sum("n").over(wcum).alias("cn"),
                       F.sum("x").over(wcum).alias("cx"))
    a = (cum.filter(F.col("v") == 1)
         .select("day", F.col("cn").cast(BIG).alias("n1"),
                 F.col("cx").cast(BIG).alias("x1")))
    b = (cum.filter(F.col("v") == 0)
         .select("day", F.col("cn").cast(BIG).alias("n2"),
                 F.col("cx").cast(BIG).alias("x2")))
    wide = a.join(b, "day")
    pp = F.col("x1").cast("double") + F.col("x2")
    nn = F.col("n1") + F.col("n2")
    pbar = pp / nn
    v = pbar * (1.0 - pbar) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))
    theta = (F.col("x1").cast("double") / F.col("n1")
             - F.col("x2").cast("double") / F.col("n2"))
    tau2 = F.lit(MSPRT_TAU2)
    lr = (F.sqrt(v / (v + tau2))
          * F.exp(theta * theta * tau2 / (2.0 * v * (v + tau2))))
    inst = wide.select("day", "n1", "x1", "n2", "x2",
                       F.round(F.least(F.lit(1.0), 1.0 / lr), 9)
                       .alias("p_inst"))
    wrun = (Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = F.min("p_inst").over(wrun)
    return inst.select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                       "n1", "x1", "n2", "x2", "p_inst",
                       F.round(run, 9).alias("p_always"),
                       F.when(run <= 0.05, 1).otherwise(0)
                       .cast("int").alias("significant"))


@query(
    "stats_p_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(sum(x) AS BIGINT) AS tx FROM daily)
    SELECT strftime(day, '%Y-%m-%d') AS day, n, x,
           round(CAST(x AS DOUBLE) / n, 6) AS p,
           round(CAST(tx AS DOUBLE) / tn, 6) AS p_bar,
           round(CAST(tx AS DOUBLE) / tn
                 + 3.0 * sqrt((CAST(tx AS DOUBLE) / tn)
                              * (1.0 - CAST(tx AS DOUBLE) / tn) / n),
                 6) AS ucl,
           round(greatest(0.0, CAST(tx AS DOUBLE) / tn
                 - 3.0 * sqrt((CAST(tx AS DOUBLE) / tn)
                              * (1.0 - CAST(tx AS DOUBLE) / tn) / n)),
                 6) AS lcl,
           CAST(CASE WHEN CAST(x AS DOUBLE) / n
                          > CAST(tx AS DOUBLE) / tn
                            + 3.0 * sqrt((CAST(tx AS DOUBLE) / tn)
                                         * (1.0 - CAST(tx AS DOUBLE) / tn)
                                         / n)
                       OR CAST(x AS DOUBLE) / n
                          < CAST(tx AS DOUBLE) / tn
                            - 3.0 * sqrt((CAST(tx AS DOUBLE) / tn)
                                         * (1.0 - CAST(tx AS DOUBLE) / tn)
                                         / n)
                     THEN 1 ELSE 0 END AS INT) AS out_of_control
    FROM daily, tot
    """)
def stats_p_chart(spark, sf):
    """Shewhart p-chart of the daily purchase proportion — the SPC
    control chart a data-quality monitor runs over ingest streams:
    centerline p_bar from the full window, 3-sigma binomial limits
    per day (wider on thin days — the variable-n p-chart, not the
    fixed-limit np-chart), and an out_of_control flag per point.
    One day-grain hash agg + a 1-row totals broadcast; limits and
    flags are single double formulas over exact integer counts
    (flag comparisons run on UNROUNDED doubles built identically in
    both engines — rounding first would move points at the limit)."""
    events = T(spark, sf, "events")
    daily = (events.groupBy(F.col("ts").cast("date").alias("day"))
             .agg(F.count("*").cast(BIG).alias("n"),
                  F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).cast(BIG).alias("x")))
    tot = daily.agg(F.sum("n").cast(BIG).alias("tn"),
                    F.sum("x").cast(BIG).alias("tx"))
    pbar = F.col("tx").cast("double") / F.col("tn")
    sig = F.sqrt(pbar * (1.0 - pbar) / F.col("n"))
    p = F.col("x").cast("double") / F.col("n")
    return (daily.crossJoin(F.broadcast(tot))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n", "x",
                    F.round(p, 6).alias("p"),
                    F.round(pbar, 6).alias("p_bar"),
                    F.round(pbar + 3.0 * sig, 6).alias("ucl"),
                    F.round(F.greatest(F.lit(0.0), pbar - 3.0 * sig), 6)
                    .alias("lcl"),
                    F.when((p > pbar + 3.0 * sig)
                           | (p < pbar - 3.0 * sig), 1).otherwise(0)
                    .cast("int").alias("out_of_control")))


def _upper_tail_p_sql(z: str) -> str:
    """One-sided normal tail P(Z > z) for a SIGNED z, from the shared
    Abramowitz-Stegun fragment (_abs_tail_sql handles |z| only):
    reflect for negative z."""
    tail = _abs_tail_sql(z)
    return f"(CASE WHEN {z} >= 0.0 THEN {tail} ELSE 1.0 - {tail} END)"


TOST_MARGIN = 0.02       # equivalence margin on the rate difference


@query(
    "eval_tost_equivalence",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CAST(user_id % 2 AS INT) AS v,
             CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS hit
      FROM events WHERE value IS NOT NULL),
    agg AS (SELECT event_type,
                   CAST(sum(v) AS BIGINT) AS n1,
                   CAST(sum(v * hit) AS BIGINT) AS x1,
                   CAST(sum(1 - v) AS BIGINT) AS n2,
                   CAST(sum((1 - v) * hit) AS BIGINT) AS x2
            FROM base GROUP BY event_type),
    zs AS (SELECT event_type, n1, x1, n2, x2,
                  round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2
                         + {TOST_MARGIN})
                        / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                               * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                               * (1.0 / n1 + 1.0 / n2)), 6) AS z_lo,
                  round((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2
                         - {TOST_MARGIN})
                        / sqrt((CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                               * (1.0 - CAST(x1 + x2 AS DOUBLE) / (n1 + n2))
                               * (1.0 / n1 + 1.0 / n2)), 6) AS z_hi
           FROM agg),
    ps AS (SELECT event_type, n1, x1, n2, x2, z_lo, z_hi,
                  round({{P_LO}}, 9) AS p_lo,
                  round(1.0 - {{P_HI_LOWER}}, 9) AS p_hi
           FROM zs)
    SELECT event_type, n1, x1, n2, x2, z_lo, z_hi, p_lo, p_hi,
           round(greatest(p_lo, p_hi), 9) AS p_tost,
           CAST(CASE WHEN greatest(p_lo, p_hi) < 0.05
                     THEN 1 ELSE 0 END AS INT) AS equivalent
    FROM ps
    """.replace("{P_LO}", _upper_tail_p_sql("z_lo"))
       .replace("{P_HI_LOWER}", _upper_tail_p_sql("z_hi")))
def eval_tost_equivalence(spark, sf):
    """TOST equivalence test (two one-sided z-tests, Schuirmann 1987)
    per event type: is the user-parity variants' difference in
    P(value >= 50) inside +-0.02?  The NON-inferiority complement to
    the difference tests — a launch gate asks "provably no worse", not
    "not provably different" (an underpowered z-test passes the latter
    for free).  p_lo rejects theta <= -margin (upper tail at z_lo),
    p_hi rejects theta >= +margin (lower tail at z_hi), and
    p_tost = max of the two: equivalence at alpha=0.05 iff both reject.
    Counts are exact integers; z's round at 6dp before the shared
    Abramowitz-Stegun tail fragment (same parse in both engines)."""
    events = T(spark, sf, "events")
    base = (events.filter(F.col("value").isNotNull())
            .select("event_type",
                    (F.col("user_id") % 2).cast("int").alias("v"),
                    F.when(F.col("value") >= 50.0, 1).otherwise(0)
                    .alias("hit")))
    agg = (base.groupBy("event_type")
           .agg(F.sum("v").cast(BIG).alias("n1"),
                F.sum(F.col("v") * F.col("hit")).cast(BIG).alias("x1"),
                F.sum(1 - F.col("v")).cast(BIG).alias("n2"),
                F.sum((1 - F.col("v")) * F.col("hit")).cast(BIG)
                .alias("x2")))
    pp = F.col("x1").cast("double") + F.col("x2")
    nn = F.col("n1") + F.col("n2")
    pbar = pp / nn
    se = F.sqrt(pbar * (1.0 - pbar)
                * (1.0 / F.col("n1") + 1.0 / F.col("n2")))
    theta = (F.col("x1").cast("double") / F.col("n1")
             - F.col("x2").cast("double") / F.col("n2"))
    zs = agg.select("event_type", "n1", "x1", "n2", "x2",
                    F.round((theta + TOST_MARGIN) / se, 6).alias("z_lo"),
                    F.round((theta - TOST_MARGIN) / se, 6).alias("z_hi"))
    ps = zs.select("event_type", "n1", "x1", "n2", "x2", "z_lo", "z_hi",
                   F.round(F.expr(_upper_tail_p_sql("z_lo")), 9)
                   .alias("p_lo"),
                   F.round(1.0 - F.expr(_upper_tail_p_sql("z_hi")), 9)
                   .alias("p_hi"))
    return ps.select("event_type", "n1", "x1", "n2", "x2",
                     "z_lo", "z_hi", "p_lo", "p_hi",
                     F.round(F.greatest("p_lo", "p_hi"), 9)
                     .alias("p_tost"),
                     F.when(F.greatest("p_lo", "p_hi") < 0.05, 1)
                     .otherwise(0).cast("int").alias("equivalent"))


@query(
    "stats_brown_forsythe",
    oracle="""
    WITH cents AS (SELECT event_type AS et,
                          CAST(round(value * 100) AS BIGINT) AS cent
                   FROM events WHERE value IS NOT NULL),
    med AS (SELECT et, quantile_cont(cent, 0.5) AS m FROM cents
            GROUP BY et),
    dev AS (SELECT c.et, abs(c.cent - med.m) AS z
            FROM cents c JOIN med ON c.et = med.et),
    grp AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                   sum(z) AS sz, sum(z * z) AS szz
            FROM dev GROUP BY et),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(count(*) AS BIGINT) AS k,
                   sum(sz) AS tsz FROM grp),
    parts AS (SELECT
                sum(n * ((sz / n) - (tsz / tn)) * ((sz / n) - (tsz / tn)))
                  AS between_ss,
                sum(szz - (sz * sz) / n) AS within_ss
              FROM grp, tot)
    SELECT k AS n_groups, tn AS n_obs,
           round(((tn - k) * 1.0 / (k - 1))
                 * between_ss / within_ss, 6) AS w_stat,
           CAST(k - 1 AS BIGINT) AS df1, CAST(tn - k AS BIGINT) AS df2
    FROM parts, tot
    """)
def stats_brown_forsythe(spark, sf):
    """Brown-Forsythe test (Levene with MEDIAN centers — the robust
    default) for variance homogeneity across event types: the
    assumption check that gates ANOVA/t-tests (eval_anova_f assumes
    equal variances; this is the test that says whether it may).
    W = ((N-k)/(k-1)) * sum n_i (zbar_i - zbar)^2 / sum (z - zbar_i)^2
    over absolute deviations from per-group medians.  Engine
    exactness: values fold to integer cents; the median of integers
    interpolates to exact .5 halves in both engines, so every |x - m|
    is an exactly-representable half-integer and the group sums are
    exact doubles; W is one double formula over them, rounded 6dp.
    Two hash aggs + a per-group median (cents-grain percentile) + a
    1-row totals broadcast."""
    events = T(spark, sf, "events")
    cents = (events.filter(F.col("value").isNotNull())
             .select(F.col("event_type").alias("et"),
                     F.round(F.col("value") * 100)
                     .cast("bigint").alias("cent")))
    med = cents.groupBy("et").agg(
        F.percentile("cent", F.lit(0.5)).alias("m"))
    dev = (cents.join(med, "et")
           .select("et", F.abs(F.col("cent") - F.col("m")).alias("z")))
    grp = dev.groupBy("et").agg(F.count("*").cast(BIG).alias("n"),
                                F.sum("z").alias("sz"),
                                F.sum(F.col("z") * F.col("z"))
                                .alias("szz"))
    tot = grp.agg(F.sum("n").cast(BIG).alias("tn"),
                  F.count("*").cast(BIG).alias("k"),
                  F.sum("sz").alias("tsz"))
    j = grp.crossJoin(F.broadcast(tot))
    zbar_i = F.col("sz") / F.col("n")
    zbar = F.col("tsz") / F.col("tn")
    parts = j.agg(
        F.sum(F.col("n") * (zbar_i - zbar) * (zbar_i - zbar))
        .alias("between_ss"),
        F.sum(F.col("szz") - (F.col("sz") * F.col("sz")) / F.col("n"))
        .alias("within_ss"),
        F.min("k").alias("k"), F.min("tn").alias("tn"))
    return parts.select(
        F.col("k").alias("n_groups"), F.col("tn").alias("n_obs"),
        F.round(((F.col("tn") - F.col("k")) * 1.0 / (F.col("k") - 1))
                * F.col("between_ss") / F.col("within_ss"), 6)
        .alias("w_stat"),
        (F.col("k") - 1).cast(BIG).alias("df1"),
        (F.col("tn") - F.col("k")).cast(BIG).alias("df2"))


@query(
    "stats_friedman_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS et,
             sum(CAST(round(value * 100) AS BIGINT)) AS c,
             count(value) AS nv
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    full_blocks AS (SELECT day FROM daily GROUP BY day
                    HAVING count(*) = (SELECT count(DISTINCT event_type)
                                       FROM events)),
    m AS (SELECT d.day, d.et, d.c * 1.0 / (100.0 * d.nv) AS v
          FROM daily d JOIN full_blocks USING (day)),
    rk AS (SELECT day, et,
                  CAST(row_number() OVER (PARTITION BY day
                                          ORDER BY v, et) AS BIGINT) AS r
           FROM m),
    rs AS (SELECT et, CAST(sum(r) AS BIGINT) AS rsum,
                  CAST(count(*) AS BIGINT) AS n
           FROM rk GROUP BY et),
    dims AS (SELECT CAST(count(*) AS BIGINT) AS k,
                    CAST(min(n) AS BIGINT) AS nb FROM rs)
    SELECT et, rsum,
           round(CAST(rsum AS DOUBLE) / nb, 6) AS mean_rank,
           nb AS n_blocks, k AS n_treatments,
           round(12.0 / (nb * k * (k + 1))
                 * (SELECT sum(CAST(rsum AS DOUBLE) * rsum) FROM rs)
                 - 3.0 * nb * (k + 1), 6) AS chi2
    FROM rs, dims
    """)
def stats_friedman_test(spark, sf):
    """Friedman rank test — the repeated-measures complement to
    eval_kruskal_wallis: does any event type's daily mean value
    consistently outrank the others WITHIN each day (days are blocks,
    types are treatments — blocking removes day-level noise the
    independent-samples test would eat)?  chi2 = 12/(nk(k+1)) sum R_j^2
    - 3n(k+1) over within-day ranks.  Daily means use the integer-cent
    discipline; ranks order by (v, event_type) — v's are rationals
    computed identically in both engines, and the name tiebreak makes
    the rank total (exact ties between two types' daily means are
    possible in principle; the declared convention keeps both engines
    identical, and with 5 distinct types the statistic's distribution
    is unaffected at this grain).  Only COMPLETE blocks (all k types
    present that day) enter, per the classical design.  One day-grain
    agg + per-day windows (partitioned, never global)."""
    events = T(spark, sf, "events")
    k_types = events.select("event_type").distinct()
    daily = (events.filter(F.col("value").isNotNull())
             .groupBy(F.col("ts").cast("date").alias("day"),
                      F.col("event_type").alias("et"))
             .agg(F.sum(F.round(F.col("value") * 100)
                        .cast("bigint")).alias("c"),
                  F.count("value").alias("nv")))
    kcnt = k_types.agg(F.count("*").alias("_k"))
    full = (daily.groupBy("day").agg(F.count("*").alias("_c"))
            .crossJoin(F.broadcast(kcnt))
            .filter(F.col("_c") == F.col("_k")).select("day"))
    m = (daily.join(full, "day")
         .select("day", "et",
                 (F.col("c") * 1.0 / (100.0 * F.col("nv"))).alias("v")))
    from pyspark.sql import Window
    w = Window.partitionBy("day").orderBy("v", "et")
    rk = m.select("day", "et",
                  F.row_number().over(w).cast("bigint").alias("r"))
    rs = rk.groupBy("et").agg(F.sum("r").cast(BIG).alias("rsum"),
                              F.count("*").cast(BIG).alias("n"))
    dims = rs.agg(F.count("*").cast(BIG).alias("k"),
                  F.min("n").cast(BIG).alias("nb"))
    ssum = rs.agg(F.sum(F.col("rsum").cast("double") * F.col("rsum"))
                  .alias("_ss"))
    return (rs.crossJoin(F.broadcast(dims))
            .crossJoin(F.broadcast(ssum))
            .select("et", "rsum",
                    F.round(F.col("rsum").cast("double") / F.col("nb"), 6)
                    .alias("mean_rank"),
                    F.col("nb").alias("n_blocks"),
                    F.col("k").alias("n_treatments"),
                    F.round(12.0 / (F.col("nb") * F.col("k")
                                    * (F.col("k") + 1)) * F.col("_ss")
                            - 3.0 * F.col("nb") * (F.col("k") + 1), 6)
                    .alias("chi2")))


# ---------------------------------------------------------------------------
# Round-11 additions: two-sample parametric inference, median/runs
# nonparametrics, variance homogeneity (parametric twin), and effect-
# size/concordance readouts.  Same engine discipline as above: exact
# integer moments -> one double formula, shared A&S normal tail.
# ---------------------------------------------------------------------------


@query(
    "eval_welch_ttest",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent)
                      AS DECIMAL(38,0)) AS q
          FROM sc WHERE et IN ('view', 'click') GROUP BY et),
    ab AS (SELECT
             max(CASE WHEN et = 'view' THEN n END) AS n1,
             max(CASE WHEN et = 'click' THEN n END) AS n2,
             max(CASE WHEN et = 'view' THEN CAST(s AS DOUBLE) END) AS s1,
             max(CASE WHEN et = 'click' THEN CAST(s AS DOUBLE) END) AS s2,
             max(CASE WHEN et = 'view' THEN CAST(q AS DOUBLE) END) AS q1,
             max(CASE WHEN et = 'click' THEN CAST(q AS DOUBLE) END) AS q2
           FROM g),
    v AS (SELECT n1, n2,
                 s1 / n1 AS m1, s2 / n2 AS m2,
                 (q1 - s1 * s1 / n1) / (n1 - 1) / n1 AS se1,
                 (q2 - s2 * s2 / n2) / (n2 - 1) / n2 AS se2
          FROM ab),
    t AS (SELECT n1, n2,
                 round((m1 - m2) / sqrt(se1 + se2), 6) AS t_stat,
                 round((se1 + se2) * (se1 + se2)
                       / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)),
                       4) AS df
          FROM v)
    SELECT n1, n2, t_stat, df,
           round({_two_sided_p_sql("t_stat")}, 9) AS p_normal_approx
    FROM t
    """)
def eval_welch_ttest(spark, sf):
    """Welch's unequal-variance two-sample t (view vs click mean
    value): the parametric complement to eval_mann_whitney_u /
    eval_permutation_test on the same pairing.  Group moments (n, S,
    Q) are exact integers; means, standard-error terms se_i = v_i/n_i,
    t, and the Welch-Satterthwaite df are ONE double formula each,
    written identically in both engines.  The p-value is the
    large-sample normal approximation (df > 10^4 here, where t and z
    are indistinguishable far past 9dp) through the shared
    Abramowitz-Stegun tail — fed the ROUNDED t so both engines hash
    identical inputs.  One 2-row hash agg + a 1-row pivot; nothing
    scales with rows but the scan."""
    g = (_sc(spark, sf).filter(F.col("et").isin("view", "click"))
         .groupBy("et")
         .agg(F.count("*").cast(BIG).alias("n"),
              F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"),
              F.sum(F.col("cent").cast(DEC) * F.col("cent")).cast(DEC)
              .alias("q")))
    ab = g.agg(
        F.max(F.when(F.col("et") == "view", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("et") == "click", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("et") == "view",
                     F.col("s").cast("double"))).alias("s1"),
        F.max(F.when(F.col("et") == "click",
                     F.col("s").cast("double"))).alias("s2"),
        F.max(F.when(F.col("et") == "view",
                     F.col("q").cast("double"))).alias("q1"),
        F.max(F.when(F.col("et") == "click",
                     F.col("q").cast("double"))).alias("q2"))
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2, q1, q2 = (F.col(c) for c in ("s1", "s2", "q1", "q2"))
    v = ab.select(
        "n1", "n2",
        (s1 / n1).alias("m1"), (s2 / n2).alias("m2"),
        ((q1 - s1 * s1 / n1) / (n1 - 1) / n1).alias("se1"),
        ((q2 - s2 * s2 / n2) / (n2 - 1) / n2).alias("se2"))
    se1, se2 = F.col("se1"), F.col("se2")
    t = v.select(
        "n1", "n2",
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2), 6)
        .alias("t_stat"),
        F.round((se1 + se2) * (se1 + se2)
                / (se1 * se1 / (F.col("n1") - 1)
                   + se2 * se2 / (F.col("n2") - 1)), 4).alias("df"))
    return t.select(
        "n1", "n2", "t_stat", "df",
        F.round(F.expr(_two_sided_p_sql("t_stat")), 9)
        .alias("p_normal_approx"))


@query(
    "stats_mood_median_test",
    oracle=f"""
    WITH {_SC},
    tg AS (SELECT cent, CAST(count(*) AS BIGINT) AS t
           FROM sc GROUP BY cent),
    cum AS (SELECT cent,
                   sum(t) OVER (ORDER BY cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cr
            FROM tg),
    med AS (SELECT min(cent) AS gm FROM cum
            WHERE 2 * cr >= (SELECT count(*) FROM sc)),
    cnt AS (SELECT et,
                   CAST(sum(CASE WHEN cent > gm THEN 1 ELSE 0 END)
                        AS BIGINT) AS a,
                   CAST(sum(CASE WHEN cent < gm THEN 1 ELSE 0 END)
                        AS BIGINT) AS b
            FROM sc, med GROUP BY et),
    tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
                   CAST(sum(b) AS BIGINT) AS tb FROM cnt)
    SELECT et, a AS n_above, b AS n_below,
           round((CAST(a AS DOUBLE)
                  - CAST(a + b AS DOUBLE) * ta / (ta + tb))
                 * (CAST(a AS DOUBLE)
                    - CAST(a + b AS DOUBLE) * ta / (ta + tb))
                 / (CAST(a + b AS DOUBLE) * ta / (ta + tb))
               + (CAST(b AS DOUBLE)
                  - CAST(a + b AS DOUBLE) * tb / (ta + tb))
                 * (CAST(b AS DOUBLE)
                    - CAST(a + b AS DOUBLE) * tb / (ta + tb))
                 / (CAST(a + b AS DOUBLE) * tb / (ta + tb)), 6)
               AS chi2_contrib
    FROM cnt, tot
    """)
def stats_mood_median_test(spark, sf):
    """Mood's median test across the five event types: count each
    group's values strictly above / strictly below the GRAND median
    and score the k x 2 table's chi-square contributions (values equal
    to the median are excluded, the classical convention).  The grand
    median is the exact lower median picked from the VALUE-GRAIN
    cumulative (the eval_kruskal_wallis trick: the window runs over
    ~2^16 distinct cents, never over rows, so the one global window is
    data-independent at scale); above/below counts are pure integers
    and each group's chi-square contribution is one double formula.
    The robust, assumption-free sibling of eval_anova_f — sensitive
    only to median shifts."""
    sc = _sc(spark, sf)
    tg = sc.groupBy("cent").agg(F.count("*").cast(BIG).alias("t"))
    wcum = (Window.orderBy("cent")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    total = tg.agg(F.sum("t").alias("nn"))
    cum = tg.select("cent", F.sum("t").over(wcum).alias("cr"))
    med = (cum.crossJoin(F.broadcast(total))
           .filter(2 * F.col("cr") >= F.col("nn"))
           .agg(F.min("cent").alias("gm")))
    cnt = (sc.crossJoin(F.broadcast(med))
           .groupBy("et")
           .agg(F.sum(F.when(F.col("cent") > F.col("gm"), 1)
                      .otherwise(0)).cast(BIG).alias("a"),
                F.sum(F.when(F.col("cent") < F.col("gm"), 1)
                      .otherwise(0)).cast(BIG).alias("b")))
    tot = cnt.agg(F.sum("a").cast(BIG).alias("ta"),
                  F.sum("b").cast(BIG).alias("tb"))
    a, b = F.col("a").cast("double"), F.col("b").cast("double")
    ta, tb = F.col("ta"), F.col("tb")
    ea = (a + b) * ta / (ta + tb)
    eb = (a + b) * tb / (ta + tb)
    return (cnt.crossJoin(F.broadcast(tot))
            .select(F.col("et"), F.col("a").alias("n_above"),
                    F.col("b").alias("n_below"),
                    F.round((a - ea) * (a - ea) / ea
                            + (b - eb) * (b - eb) / eb, 6)
                    .alias("chi2_contrib")))


@query(
    "stats_runs_test",
    oracle=f"""
    WITH {_SC},
    vg AS (SELECT et, cent, CAST(count(*) AS BIGINT) AS c
           FROM sc GROUP BY 1, 2),
    cum AS (SELECT et, cent,
                   sum(c) OVER (PARTITION BY et ORDER BY cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cr,
                   sum(c) OVER (PARTITION BY et) AS n
            FROM vg),
    med AS (SELECT et, min(cent) AS gm FROM cum
            WHERE 2 * cr >= n GROUP BY et),
    sg AS (SELECT sc.et, event_id,
                  CASE WHEN cent > gm THEN 1 ELSE 0 END AS s
           FROM sc JOIN med ON sc.et = med.et
           WHERE cent <> gm),
    rn AS (SELECT et, s,
                  CASE WHEN lag(s) OVER (PARTITION BY et
                                         ORDER BY event_id) IS NULL
                            OR lag(s) OVER (PARTITION BY et
                                            ORDER BY event_id) <> s
                       THEN 1 ELSE 0 END AS brk
           FROM sg),
    agg AS (SELECT et,
                   CAST(sum(s) AS BIGINT) AS n1,
                   CAST(sum(1 - s) AS BIGINT) AS n2,
                   CAST(sum(brk) AS BIGINT) AS runs
            FROM rn GROUP BY et),
    z AS (SELECT et, n1, n2, runs,
                 round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                       / sqrt(2.0 * n1 * n2
                              * (2.0 * n1 * n2 - n1 - n2)
                              / (CAST(n1 + n2 AS DOUBLE)
                                 * (n1 + n2) * (n1 + n2 - 1))), 6)
                     AS z_stat
          FROM agg)
    SELECT et, n1, n2, runs, z_stat,
           round({_two_sided_p_sql("z_stat")}, 9) AS p_value
    FROM z
    """)
def stats_runs_test(spark, sf):
    """Wald-Wolfowitz runs test per event type: is the sequence of
    above-median / below-median values (in event_id order) random, or
    does it cluster/alternate?  The median is the per-group exact
    lower median from the value-grain cumulative (ties with the
    median excluded, classical convention); the run count is
    1 + #(sign changes) via a lag window PARTITIONED by group (never
    global); n1/n2/runs are exact integers and z is one double
    formula through the shared normal tail.  The distribution-free
    autocorrelation smoke test — the sequential complement to
    ts_pacf's linear ACF."""
    sc = _sc(spark, sf)
    vg = sc.groupBy("et", "cent").agg(F.count("*").cast(BIG).alias("c"))
    wc = (Window.partitionBy("et").orderBy("cent")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = Window.partitionBy("et")
    cum = vg.select("et", "cent", F.sum("c").over(wc).alias("cr"),
                    F.sum("c").over(wn).alias("n"))
    med = (cum.filter(2 * F.col("cr") >= F.col("n"))
           .groupBy("et").agg(F.min("cent").alias("gm")))
    sg = (sc.join(med, "et")
          .filter(F.col("cent") != F.col("gm"))
          .select("et", "event_id",
                  F.when(F.col("cent") > F.col("gm"), 1).otherwise(0)
                  .alias("s")))
    wl = Window.partitionBy("et").orderBy("event_id")
    rn = sg.select(
        "et", "s",
        F.when(F.lag("s").over(wl).isNull()
               | (F.lag("s").over(wl) != F.col("s")), 1).otherwise(0)
        .alias("brk"))
    agg = rn.groupBy("et").agg(
        F.sum("s").cast(BIG).alias("n1"),
        F.sum(1 - F.col("s")).cast(BIG).alias("n2"),
        F.sum("brk").cast(BIG).alias("runs"))
    n1, n2, runs = F.col("n1"), F.col("n2"), F.col("runs")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
           / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1)))
    z = agg.select("et", "n1", "n2", "runs",
                   F.round((runs - mu) / F.sqrt(var), 6).alias("z_stat"))
    return z.select("et", "n1", "n2", "runs", "z_stat",
                    F.round(F.expr(_two_sided_p_sql("z_stat")), 9)
                    .alias("p_value"))


@query(
    "stats_bartlett_test",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent)
                      AS DECIMAL(38,0)) AS q
          FROM sc GROUP BY et),
    v AS (SELECT et, n,
                 round(ln((CAST(q AS DOUBLE)
                           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                          / (n - 1)), 9) AS lnv,
                 (CAST(q AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / (n - 1) AS var
          FROM g),
    m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS nn,
                 sum((n - 1) * var) AS pooled_num,
                 sum((n - 1) * lnv) AS sum_lnv,
                 sum(1.0 / (n - 1)) AS sum_inv
          FROM v)
    SELECT k, nn AS n,
           round(((nn - k) * round(ln(pooled_num / (nn - k)), 9)
                  - sum_lnv)
                 / (1.0 + (sum_inv - 1.0 / (nn - k))
                          / (3.0 * (k - 1))), 6) AS bartlett_stat
    FROM m
    """)
def stats_bartlett_test(spark, sf):
    """Bartlett's variance-homogeneity test across the five event
    types — the PARAMETRIC twin of stats_brown_forsythe (more
    powerful under normality, famously fragile to heavy tails; a
    pipeline reports both and reads the disagreement as a
    non-normality flag).  Per-group variances come from exact integer
    moments; every transcendental (the per-group ln v_i and the
    pooled ln) is rounded to 9dp in BOTH engines before entering the
    statistic (the ts_ewma lesson — libm and DuckDB ln may disagree
    in the last ulp), and the Bartlett correction C is one double
    formula.  One 5-row hash agg + a 1-row combine."""
    g = _sc(spark, sf).groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("cent")).cast(DEC)
        .alias("q"))
    n = F.col("n")
    var = ((F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / n)
           / (n - 1))
    v = g.select("et", "n", F.round(F.log(var), 9).alias("lnv"),
                 var.alias("var"))
    m = v.agg(F.count("*").cast(BIG).alias("k"),
              F.sum("n").cast(BIG).alias("nn"),
              F.sum((n - 1) * F.col("var")).alias("pooled_num"),
              F.sum((n - 1) * F.col("lnv")).alias("sum_lnv"),
              F.sum(1.0 / (n - 1)).alias("sum_inv"))
    k, nn = F.col("k"), F.col("nn")
    lnp = F.round(F.log(F.col("pooled_num") / (nn - k)), 9)
    c = 1.0 + (F.col("sum_inv") - 1.0 / (nn - k)) / (3.0 * (k - 1))
    return m.select(
        "k", F.col("nn").alias("n"),
        F.round(((nn - k) * lnp - F.col("sum_lnv")) / c, 6)
        .alias("bartlett_stat"))


@query(
    "stats_kendall_w",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS et,
             sum(CAST(round(value * 100) AS BIGINT)) AS c,
             count(value) AS nv
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    full_blocks AS (SELECT day FROM daily GROUP BY day
                    HAVING count(*) = (SELECT count(DISTINCT event_type)
                                       FROM events)),
    m AS (SELECT d.day, d.et, d.c * 1.0 / (100.0 * d.nv) AS v
          FROM daily d JOIN full_blocks USING (day)),
    rk AS (SELECT day, et,
                  CAST(row_number() OVER (PARTITION BY day
                                          ORDER BY v, et) AS BIGINT) AS r
           FROM m),
    rs AS (SELECT et, CAST(sum(r) AS BIGINT) AS rsum,
                  CAST(count(*) AS BIGINT) AS n
           FROM rk GROUP BY et),
    dims AS (SELECT CAST(count(*) AS BIGINT) AS k,
                    CAST(min(n) AS BIGINT) AS nb,
                    CAST(sum(CAST(rsum AS DECIMAL(38,0)) * rsum)
                         AS DECIMAL(38,0)) AS ss
             FROM rs)
    SELECT nb AS n_blocks, k AS n_treatments,
           round((12.0 * CAST(ss AS DOUBLE)
                  - 3.0 * CAST(nb AS DOUBLE) * nb * k
                    * (k + 1.0) * (k + 1.0))
                 / (CAST(nb AS DOUBLE) * nb * k * (k * k - 1)), 6)
               AS w_raw,
           round((12.0 * CAST(ss AS DOUBLE)
                  / (CAST(nb AS DOUBLE) * nb * k * (k + 1))
                  - 3.0 * nb * (k + 1))
                 / (CAST(nb AS DOUBLE) * (k - 1)), 6) AS w
    FROM dims
    """)
def stats_kendall_w(spark, sf):
    """Kendall's coefficient of concordance W over the daily
    event-type rank blocks — the EFFECT SIZE companion to
    stats_friedman_test (chi2_F says "some type consistently
    outranks"; W = chi2_F / (n(k-1)) in [0,1] says how strongly, 1 =
    every day agrees on the full ordering).  Identical block/rank
    construction as the Friedman query (complete blocks only, (v, et)
    total order); rank sums are exact integers so W is one double
    formula from DECIMAL moments.  The w_raw column carries the
    classical direct form W = (12*sum R_j^2 - 3 n^2 k(k+1)^2) /
    (n^2 k(k^2-1)) — the same value derived WITHOUT going through
    chi2_F, a cross-check that the two algebraic routes agree."""
    events = T(spark, sf, "events")
    k_types = events.select("event_type").distinct()
    daily = (events.filter(F.col("value").isNotNull())
             .groupBy(F.col("ts").cast("date").alias("day"),
                      F.col("event_type").alias("et"))
             .agg(F.sum(F.round(F.col("value") * 100)
                        .cast("bigint")).alias("c"),
                  F.count("value").alias("nv")))
    kcnt = k_types.agg(F.count("*").alias("_k"))
    full = (daily.groupBy("day").agg(F.count("*").alias("_c"))
            .crossJoin(F.broadcast(kcnt))
            .filter(F.col("_c") == F.col("_k")).select("day"))
    m = (daily.join(full, "day")
         .select("day", "et",
                 (F.col("c") * 1.0 / (100.0 * F.col("nv"))).alias("v")))
    w_ = Window.partitionBy("day").orderBy("v", "et")
    rk = m.select("day", "et",
                  F.row_number().over(w_).cast("bigint").alias("r"))
    rs = rk.groupBy("et").agg(F.sum("r").cast(BIG).alias("rsum"),
                              F.count("*").cast(BIG).alias("n"))
    dims = rs.agg(F.count("*").cast(BIG).alias("k"),
                  F.min("n").cast(BIG).alias("nb"),
                  F.sum(F.col("rsum").cast(DEC) * F.col("rsum"))
                  .cast(DEC).alias("ss"))
    k, nb = F.col("k"), F.col("nb")
    ss = F.col("ss").cast("double")
    nbd = nb.cast("double")
    w_raw = ((12.0 * ss - 3.0 * nbd * nb * k * (k + 1.0) * (k + 1.0))
             / (nbd * nb * k * (k * k - 1)))
    w_main = ((12.0 * ss / (nbd * nb * k * (k + 1)) - 3.0 * nb * (k + 1))
              / (nbd * (k - 1)))
    return dims.select(F.col("nb").alias("n_blocks"),
                       F.col("k").alias("n_treatments"),
                       F.round(w_raw, 6).alias("w_raw"),
                       F.round(w_main, 6).alias("w"))


@query(
    "eval_chisq_gof_dow",
    oracle="""
    WITH d AS (SELECT event_type AS et, dayofweek(ts) + 1 AS dow
               FROM events),
    c AS (SELECT et, dow, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1, 2),
    t AS (SELECT et, CAST(sum(n) AS BIGINT) AS tn,
                 CAST(count(*) AS BIGINT) AS k
          FROM c GROUP BY et)
    SELECT c.et AS event_type, t.tn AS n, t.k AS n_cells,
           round(sum((n - CAST(tn AS DOUBLE) / k)
                     * (n - CAST(tn AS DOUBLE) / k)
                     / (CAST(tn AS DOUBLE) / k)), 6) AS chi2_gof
    FROM c JOIN t ON c.et = t.et
    GROUP BY c.et, t.tn, t.k
    """)
def eval_chisq_gof_dow(spark, sf):
    """Chi-square goodness-of-fit of each event type's day-of-week
    distribution against uniform — the classic 'is traffic flat
    across the week' gate (the categorical complement to
    ts_periodogram_dow's spectral readout and the one-sample twin of
    profile_chi2_lang_source's independence test).  Observed counts
    are exact integers, the expected value n/k is one division, and
    the statistic is a single double formula over the <= 7 cells per
    type — two hash aggs, nothing else.  dow convention: Spark
    dayofweek = DuckDB dayofweek + 1 (exactness notes)."""
    d = (T(spark, sf, "events")
         .select(F.col("event_type").alias("et"),
                 F.dayofweek("ts").alias("dow")))
    c = d.groupBy("et", "dow").agg(F.count("*").cast(BIG).alias("n"))
    t = c.groupBy("et").agg(F.sum("n").cast(BIG).alias("tn"),
                            F.count("*").cast(BIG).alias("k"))
    e = F.col("tn").cast("double") / F.col("k")
    return (c.join(t, "et")
            .groupBy(F.col("et").alias("event_type"), "tn", "k")
            .agg(F.round(F.sum((F.col("n") - e) * (F.col("n") - e) / e),
                         6).alias("chi2_gof"))
            .select("event_type", F.col("tn").alias("n"),
                    F.col("k").alias("n_cells"), "chi2_gof"))


@query(
    "eval_cohens_d",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0))) AS DECIMAL(38,0))
                     AS s,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent)
                      AS DECIMAL(38,0)) AS q
          FROM sc WHERE et IN ('view', 'click') GROUP BY et),
    ab AS (SELECT
             max(CASE WHEN et = 'view' THEN n END) AS n1,
             max(CASE WHEN et = 'click' THEN n END) AS n2,
             max(CASE WHEN et = 'view' THEN CAST(s AS DOUBLE) END) AS s1,
             max(CASE WHEN et = 'click' THEN CAST(s AS DOUBLE) END) AS s2,
             max(CASE WHEN et = 'view' THEN CAST(q AS DOUBLE) END) AS q1,
             max(CASE WHEN et = 'click' THEN CAST(q AS DOUBLE) END) AS q2
           FROM g),
    d AS (SELECT n1, n2,
                 round((s1 / n1 - s2 / n2)
                       / sqrt(((q1 - s1 * s1 / n1)
                               + (q2 - s2 * s2 / n2))
                              / (n1 + n2 - 2)), 6) AS cohens_d
          FROM ab)
    SELECT n1, n2, cohens_d,
           round(cohens_d * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6)
               AS hedges_g
    FROM d
    """)
def eval_cohens_d(spark, sf):
    """Cohen's d standardized effect size for the view-vs-click mean
    value difference (pooled-SD form) plus the Hedges' g small-sample
    correction d*(1 - 3/(4N-9)) — the magnitude readout the
    significance tests (eval_welch_ttest, eval_mann_whitney_u) don't
    give: at these row counts everything is 'significant', d says
    whether it matters.  Same integer moments as the Welch query;
    pooled variance ((Q1-S1^2/n1)+(Q2-S2^2/n2))/(n1+n2-2) and both
    ratios are single double formulas; d is rounded to 6dp before the
    g correction so both engines scale identical doubles."""
    g = (_sc(spark, sf).filter(F.col("et").isin("view", "click"))
         .groupBy("et")
         .agg(F.count("*").cast(BIG).alias("n"),
              F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"),
              F.sum(F.col("cent").cast(DEC) * F.col("cent")).cast(DEC)
              .alias("q")))
    ab = g.agg(
        F.max(F.when(F.col("et") == "view", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("et") == "click", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("et") == "view",
                     F.col("s").cast("double"))).alias("s1"),
        F.max(F.when(F.col("et") == "click",
                     F.col("s").cast("double"))).alias("s2"),
        F.max(F.when(F.col("et") == "view",
                     F.col("q").cast("double"))).alias("q1"),
        F.max(F.when(F.col("et") == "click",
                     F.col("q").cast("double"))).alias("q2"))
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2, q1, q2 = (F.col(c) for c in ("s1", "s2", "q1", "q2"))
    d = ab.select(
        "n1", "n2",
        F.round((s1 / n1 - s2 / n2)
                / F.sqrt(((q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2))
                         / (n1 + n2 - 2)), 6).alias("cohens_d"))
    return d.select(
        "n1", "n2", "cohens_d",
        F.round(F.col("cohens_d")
                * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)), 6)
        .alias("hedges_g"))


@query(
    "stats_gini_exact",
    oracle=f"""
    WITH {_SC},
    vg AS (SELECT et, cent, CAST(count(*) AS BIGINT) AS t
           FROM sc GROUP BY 1, 2),
    cum AS (SELECT et, cent, t,
                   coalesce(sum(t) OVER (PARTITION BY et ORDER BY cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS bl
            FROM vg),
    g AS (SELECT et,
                 CAST(sum(t) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * t)
                      AS DECIMAL(38,0)) AS s,
                 -- sum of rank*x over the tie run: ranks bl+1..bl+t
                 -- sum to t*(2*bl + t + 1)/2 — exact integers
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * t
                          * (2 * bl + t + 1)) AS DECIMAL(38,0)) AS rs2
          FROM cum GROUP BY et)
    SELECT et AS event_type, n,
           round(CAST(s AS DOUBLE) / (100.0 * n), 6) AS mean_value,
           round((CAST(rs2 AS DOUBLE) - (CAST(n AS DOUBLE) + 1)
                  * CAST(s AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
    FROM g
    """)
def stats_gini_exact(spark, sf):
    """EXACT Gini coefficient of each event type's value distribution
    — the unbinned twin of profile_gini_binned (256 fixed bins
    approximate; this is the rank formula G = (2 sum i*x_(i) -
    (n+1) sum x) / (n sum x) computed exactly): concentration of
    spend the way economists define it, no binning error.  The rank
    sums come from the VALUE-GRAIN cumulative (the
    eval_kruskal_wallis trick — the window runs over the bounded
    cents domain, never rows; tied values contribute rank-run sums
    t*(2*bl+t+1)/2 in closed form, and 2*sum(i*x) rides a
    DECIMAL(38,0) as cent*t*(2bl+t+1)).  One value-grain agg + one
    bounded window + a 5-row agg; two double divisions at the end."""
    sc = _sc(spark, sf)
    vg = sc.groupBy("et", "cent").agg(F.count("*").cast(BIG).alias("t"))
    wcum = (Window.partitionBy("et").orderBy("cent")
            .rowsBetween(Window.unboundedPreceding, -1))
    cum = vg.select("et", "cent", "t",
                    F.coalesce(F.sum("t").over(wcum), F.lit(0))
                    .alias("bl"))
    g = cum.groupBy("et").agg(
        F.sum("t").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC) * F.col("t")).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("t")
              * (2 * F.col("bl") + F.col("t") + 1)).cast(DEC)
        .alias("rs2"))
    n = F.col("n")
    s, rs2 = F.col("s").cast("double"), F.col("rs2").cast("double")
    return g.select(
        F.col("et").alias("event_type"), "n",
        F.round(s / (100.0 * n), 6).alias("mean_value"),
        F.round((rs2 - (n.cast("double") + 1) * s)
                / (n.cast("double") * s), 6).alias("gini"))


@query(
    "eval_auc_delong",
    oracle=f"""
    WITH sc AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent,
                       CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END AS y
                FROM events WHERE value IS NOT NULL),
    vg AS (SELECT cent,
                  CAST(sum(y) AS BIGINT) AS t1,
                  CAST(sum(1 - y) AS BIGINT) AS t0
           FROM sc GROUP BY cent),
    cum AS (SELECT cent, t1, t0,
                   coalesce(sum(t0) OVER (ORDER BY cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS bl0,
                   coalesce(sum(t1) OVER (ORDER BY cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS bl1,
                   sum(t1) OVER () AS tn1
            FROM vg),
    m AS (SELECT CAST(sum(t1) AS BIGINT) AS n1,
                 CAST(sum(t0) AS BIGINT) AS n0,
                 -- positive placements: u_i = 2*negs_below + negs_tied
                 CAST(sum(CAST(t1 AS DECIMAL(38,0)) * (2 * bl0 + t0))
                      AS DECIMAL(38,0)) AS su,
                 CAST(sum(CAST(t1 AS DECIMAL(38,0)) * (2 * bl0 + t0)
                          * (2 * bl0 + t0)) AS DECIMAL(38,0)) AS su2,
                 -- negative placements: v_j = 2*pos_above + pos_tied
                 CAST(sum(CAST(t0 AS DECIMAL(38,0))
                          * (2 * (tn1 - bl1 - t1) + t1))
                      AS DECIMAL(38,0)) AS sv,
                 CAST(sum(CAST(t0 AS DECIMAL(38,0))
                          * (2 * (tn1 - bl1 - t1) + t1)
                          * (2 * (tn1 - bl1 - t1) + t1))
                      AS DECIMAL(38,0)) AS sv2
          FROM cum),
    a AS (SELECT n1, n0,
                 round(CAST(su AS DOUBLE) / (2.0 * n1 * n0), 9) AS auc,
                 round(sqrt(
                   ((CAST(su2 AS DOUBLE) / (4.0 * n0 * n0)
                     - n1 * (CAST(su AS DOUBLE) / (2.0 * n1 * n0))
                          * (CAST(su AS DOUBLE) / (2.0 * n1 * n0)))
                    / (n1 - 1)) / n1
                   + ((CAST(sv2 AS DOUBLE) / (4.0 * n1 * n1)
                       - n0 * (CAST(sv AS DOUBLE) / (2.0 * n1 * n0))
                            * (CAST(sv AS DOUBLE) / (2.0 * n1 * n0)))
                      / (n0 - 1)) / n0), 9) AS se
          FROM m),
    z AS (SELECT n1, n0, round(auc, 6) AS auc, round(se, 6) AS se_delong,
                 round((auc - 0.5) / se, 6) AS z_vs_chance
          FROM a)
    SELECT n1 AS n_pos, n0 AS n_neg, auc, se_delong, z_vs_chance,
           round({_two_sided_p_sql("z_vs_chance")}, 9) AS p_value
    FROM z
    """)
def eval_auc_delong(spark, sf):
    """AUC of value-as-purchase-score WITH its DeLong (1988) standard
    error — the uncertainty readout eval_rank_auc's point estimate
    lacks (two models' AUCs can't be compared without it).  Var(AUC)
    = S10/n1 + S01/n0 from per-observation placement values; both
    placement families reduce to exact integers at the VALUE GRAIN
    (positive i: u_i = 2*negs_below + negs_tied, mean u/(2n0) = AUC;
    negative j mirrored from above), so their sums and sums of
    squares ride DECIMAL(38,0) through one bounded cents-domain
    window, and AUC/SE/z are three double formulas.  AUC and SE round
    to 9dp before z (round-before-reuse), z to 6dp before the shared
    normal tail."""
    sc = (T(spark, sf, "events")
          .filter(F.col("value").isNotNull())
          .select(F.floor(F.col("value") * 100 + 0.5).cast(BIG)
                  .alias("cent"),
                  F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0).alias("y")))
    vg = sc.groupBy("cent").agg(F.sum("y").cast(BIG).alias("t1"),
                                F.sum(1 - F.col("y")).cast(BIG)
                                .alias("t0"))
    wb = (Window.orderBy("cent")
          .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy()
    cum = vg.select(
        "cent", "t1", "t0",
        F.coalesce(F.sum("t0").over(wb), F.lit(0)).alias("bl0"),
        F.coalesce(F.sum("t1").over(wb), F.lit(0)).alias("bl1"),
        F.sum("t1").over(wall).alias("tn1"))
    u = 2 * F.col("bl0") + F.col("t0")
    v = 2 * (F.col("tn1") - F.col("bl1") - F.col("t1")) + F.col("t1")
    m = cum.agg(
        F.sum("t1").cast(BIG).alias("n1"),
        F.sum("t0").cast(BIG).alias("n0"),
        F.sum(F.col("t1").cast(DEC) * u).cast(DEC).alias("su"),
        F.sum(F.col("t1").cast(DEC) * u * u).cast(DEC).alias("su2"),
        F.sum(F.col("t0").cast(DEC) * v).cast(DEC).alias("sv"),
        F.sum(F.col("t0").cast(DEC) * v * v).cast(DEC).alias("sv2"))
    n1, n0 = F.col("n1"), F.col("n0")
    su, su2 = F.col("su").cast("double"), F.col("su2").cast("double")
    sv, sv2 = F.col("sv").cast("double"), F.col("sv2").cast("double")
    auc = su / (2.0 * n1 * n0)
    aucv = sv / (2.0 * n1 * n0)
    s10 = (su2 / (4.0 * n0 * n0) - n1 * auc * auc) / (n1 - 1)
    s01 = (sv2 / (4.0 * n1 * n1) - n0 * aucv * aucv) / (n0 - 1)
    a = m.select("n1", "n0",
                 F.round(auc, 9).alias("auc"),
                 F.round(F.sqrt(s10 / n1 + s01 / n0), 9).alias("se"))
    z = a.select("n1", "n0",
                 F.round(F.col("auc"), 6).alias("auc"),
                 F.round(F.col("se"), 6).alias("se_delong"),
                 F.round((F.col("auc") - 0.5) / F.col("se"), 6)
                 .alias("z_vs_chance"))
    return z.select(F.col("n1").alias("n_pos"),
                    F.col("n0").alias("n_neg"),
                    "auc", "se_delong", "z_vs_chance",
                    F.round(F.expr(_two_sided_p_sql("z_vs_chance")), 9)
                    .alias("p_value"))


@query(
    "stats_quade_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type AS et,
             sum(CAST(round(value * 100) AS BIGINT)) AS c,
             count(value) AS nv
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    full_blocks AS (SELECT day FROM daily GROUP BY day
                    HAVING count(*) = (SELECT count(DISTINCT event_type)
                                       FROM events)),
    m AS (SELECT d.day, d.et, d.c * 1.0 / (100.0 * d.nv) AS v
          FROM daily d JOIN full_blocks USING (day)),
    rk AS (SELECT day, et,
                  CAST(row_number() OVER (PARTITION BY day
                                          ORDER BY v, et) AS BIGINT) AS r
           FROM m),
    rng AS (SELECT day, max(v) - min(v) AS range FROM m GROUP BY day),
    qw AS (SELECT day,
                  CAST(row_number() OVER (ORDER BY range, day)
                       AS BIGINT) AS q
           FROM rng),
    dims AS (SELECT CAST(count(*) AS BIGINT) AS nb,
                    CAST((SELECT count(DISTINCT et) FROM rk) AS BIGINT)
                        AS k
             FROM qw),
    s AS (SELECT rk.et,
                 CAST(q AS DOUBLE)
                   * (r - (CAST(k AS DOUBLE) + 1) / 2) AS sij
          FROM rk JOIN qw USING (day) CROSS JOIN dims),
    per AS (SELECT et, sum(sij) AS si, sum(sij * sij) AS a_part
            FROM s GROUP BY et),
    tot AS (SELECT sum(a_part) AS a,
                   sum(si * si) AS bsum,
                   CAST(count(*) AS BIGINT) AS k
            FROM per)
    SELECT per.et AS event_type,
           round(per.si, 6) AS s_i,
           dims.nb AS n_blocks,
           round((CAST(dims.nb AS DOUBLE) - 1)
                 * (tot.bsum / dims.nb)
                 / (tot.a - tot.bsum / dims.nb), 6) AS quade_f
    FROM per, tot, dims
    """)
def stats_quade_test(spark, sf):
    """Quade test — the WEIGHTED repeated-measures rank test (Quade
    1979), completing the within-block family (stats_friedman_test
    treats every day equally; Quade weights each day by the rank of
    its value RANGE, so days where treatments actually differ count
    more — strictly more powerful at small k).  Blocks/ranks are the
    Friedman construction verbatim; block weights Q_j rank the
    within-day range with the (range, day) total order; S_ij =
    Q_j*(r_ij - (k+1)/2) and the statistic F = (n-1)*B/(A-B) with
    B = sum_i S_i^2/n, A = sum S_ij^2.  Ranks and weights are exact
    integers; range is a same-formula double both engines derive
    identically; per-type S_i and the F readout are single double
    formulas.  The day-grain windows are calendar-bounded."""
    events = T(spark, sf, "events")
    k_types = events.select("event_type").distinct()
    daily = (events.filter(F.col("value").isNotNull())
             .groupBy(F.col("ts").cast("date").alias("day"),
                      F.col("event_type").alias("et"))
             .agg(F.sum(F.round(F.col("value") * 100)
                        .cast("bigint")).alias("c"),
                  F.count("value").alias("nv")))
    kcnt = k_types.agg(F.count("*").alias("_k"))
    full = (daily.groupBy("day").agg(F.count("*").alias("_c"))
            .crossJoin(F.broadcast(kcnt))
            .filter(F.col("_c") == F.col("_k")).select("day"))
    m = (daily.join(full, "day")
         .select("day", "et",
                 (F.col("c") * 1.0 / (100.0 * F.col("nv"))).alias("v")))
    wr = Window.partitionBy("day").orderBy("v", "et")
    rk = m.select("day", "et",
                  F.row_number().over(wr).cast(BIG).alias("r"))
    rng = m.groupBy("day").agg((F.max("v") - F.min("v")).alias("range"))
    wq = Window.orderBy("range", "day")
    qw = rng.select("day", F.row_number().over(wq).cast(BIG).alias("q"))
    dims = qw.agg(F.count("*").cast(BIG).alias("nb")).crossJoin(
        F.broadcast(rk.agg(F.countDistinct("et").cast(BIG).alias("k"))))
    s = (rk.join(qw, "day").crossJoin(F.broadcast(dims))
         .select("et",
                 (F.col("q").cast("double")
                  * (F.col("r") - (F.col("k").cast("double") + 1) / 2))
                 .alias("sij")))
    per = s.groupBy("et").agg(F.sum("sij").alias("si"),
                              F.sum(F.col("sij") * F.col("sij"))
                              .alias("a_part"))
    tot = per.agg(F.sum("a_part").alias("a"),
                  F.sum(F.col("si") * F.col("si")).alias("bsum"))
    nb = F.col("nb")
    return (per.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(dims))
            .select(F.col("et").alias("event_type"),
                    F.round(F.col("si"), 6).alias("s_i"),
                    F.col("nb").alias("n_blocks"),
                    F.round((nb.cast("double") - 1)
                            * (F.col("bsum") / nb)
                            / (F.col("a") - F.col("bsum") / nb), 6)
                    .alias("quade_f")))


@query(
    "eval_spiegelhalter_z",
    oracle=f"""
    WITH sc AS (SELECT least(greatest(CAST(floor(value * 100 + 0.5)
                                           AS BIGINT), 0), 50000) AS pc,
                       CASE WHEN event_type = 'purchase' THEN 1
                            ELSE 0 END AS y
                FROM events WHERE value IS NOT NULL),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(y * 50000 - pc AS DECIMAL(38,0))
                          * (50000 - 2 * pc)) AS DECIMAL(38,0)) AS x,
                 CAST(sum(CAST(50000 - 2 * pc AS DECIMAL(38,0))
                          * (50000 - 2 * pc) * pc * (50000 - pc))
                      AS DECIMAL(38,0)) AS v
          FROM sc),
    zz AS (SELECT n,
                  round(CAST(x AS DOUBLE)
                        / nullif(sqrt(CAST(v AS DOUBLE)), 0.0), 6) AS z
           FROM m)
    SELECT n, z, round(least(1.0, 2.0 * {{TAIL}}), 9) AS p_two_sided
    FROM zz
    """.replace("{TAIL}", _abs_tail_sql("z")))
def eval_spiegelhalter_z(spark, sf):
    """Spiegelhalter's calibration z-test over the same forecast
    construction as eval_hosmer_lemeshow (probability = clipped
    value-cents / 50000, outcome = purchase): Z = sum((y-p)(1-2p)) /
    sqrt(sum((1-2p)^2 p(1-p))) — the UNBINNED companion to the HL
    chi-square (HL localizes miscalibration to bins; this is the
    single-number 'is the forecaster calibrated at all' test, and it
    is immune to the bin-boundary sensitivity HL is criticized for).

    Exactness: with p = pc/S (S = 50000), numerator and variance
    scale to PURE INTEGER sums — X = sum((y*S - pc)(S - 2pc)) and
    V = sum((S-2pc)^2 pc (S-pc)) — so Z = X / sqrt(V) with the S
    powers cancelling; both sums ride DECIMAL(38,0) (per-row |term|
    <= 2.5e19, 38 digits holds past 1e12 rows) and the only doubles
    are the final division and the shared Abramowitz-Stegun tail.
    One hash agg over the corpus, one 1-row formula."""
    S = 50000
    ev = (T(spark, sf, "events")
          .filter(F.col("value").isNotNull())
          .select(F.least(F.greatest(F.floor(F.col("value") * 100 + 0.5)
                                     .cast(BIG), F.lit(0)),
                          F.lit(S)).alias("pc"),
                  F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0).alias("y")))
    m = ev.agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum((F.col("y") * S - F.col("pc")).cast(DEC)
              * (S - 2 * F.col("pc"))).cast(DEC).alias("x"),
        F.sum((S - 2 * F.col("pc")).cast(DEC)
              * (S - 2 * F.col("pc")) * F.col("pc")
              * (S - F.col("pc"))).cast(DEC).alias("v"))
    zz = m.select(
        "n",
        F.round(F.col("x").cast("double")
                / F.nullif(F.sqrt(F.col("v").cast("double")),
                           F.lit(0.0)), 6).alias("z"))
    return zz.select(
        "n", "z",
        F.round(F.expr(_two_sided_p_sql("z")), 9).alias("p_two_sided"))


@query(
    "stats_cusum_chart",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY date_trunc('day', ts))
                  AS BIGINT) AS rn
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    kr AS (SELECT et, CAST(sum(x) AS BIGINT) // count(*) AS k
           FROM daily GROUP BY et),
    c AS (
      SELECT d.et, d.rn, d.day, d.x, kr.k,
             greatest(CAST(0 AS BIGINT), d.x - kr.k) AS cu
      FROM daily d JOIN kr USING (et) WHERE d.rn = 1
      UNION ALL
      SELECT d.et, d.rn, d.day, d.x, kr.k,
             greatest(CAST(0 AS BIGINT), c.cu + d.x - kr.k)
      FROM c JOIN daily d ON d.et = c.et AND d.rn = c.rn + 1
             JOIN kr ON kr.et = d.et)
    SELECT et AS event_type, strftime(day, '%Y-%m-%d') AS day, x,
           k AS k_ref, cu AS cusum_hi
    FROM c ORDER BY event_type, day
    """)
def stats_cusum_chart(spark, sf):
    """One-sided upper CUSUM control chart on each event type's daily
    value total: C_0 = 0, C_t = max(0, C_{t-1} + x_t - k) with the
    reference k = floor(mean daily total) — the classical
    change-detection chart that accumulates small persistent shifts a
    Shewhart chart (stats_p_chart) misses; the full per-day path is
    emitted so the alarm threshold stays the consumer's choice
    (ts_cusum_changepoint is the complementary readout: single global
    changepoint LOCALIZATION on the count series; this is the
    per-type monitoring chart against a reference value).

    Exactness: x and k are exact integer cents; k is a true FLOOR
    division on both sides (Spark pmod-adjusted DIV = DuckDB //), so
    the convention is sign-safe — negative mean daily totals floor
    identically in both engines — and totals stay < 2^53 far beyond
    the bench envelope.  The recursion is INTEGER arithmetic
    end-to-end — no float
    state to drift.  The sequential fold is per-type over the bounded
    day series: Spark replays it as an in-row array fold over the
    sorted (day, x) structs (the ts_holt_linear pattern — state is a
    running array, bounded by the calendar); the oracle replays it as
    a row_number-keyed RECURSIVE CTE (single-state recursions would
    also be list_reduce-safe, but the CTE matches the multi-CTE
    convention).  One groupBy day, one groupBy type, one explode."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    g = (daily.groupBy("et")
         .agg(F.sort_array(F.collect_list(F.struct("day", "x")))
              .alias("sx"),
              # FLOOR division (pmod makes the numerator exactly
              # divisible, so truncating DIV equals floor for either
              # sign) — Spark's bare DIV truncates toward zero while
              # the DuckDB oracle's // floors, and the two diverge
              # whenever a type's mean daily total is negative
              F.expr("CAST((sum(x) - pmod(sum(x), count(*)))"
                     " DIV count(*) AS BIGINT)")
              .cast(BIG).alias("k")))
    cus = F.expr(
        "slice(aggregate(transform(sx, s -> s.x),"
        " array(CAST(0 AS BIGINT)),"
        " (acc, x) -> concat(acc, array(greatest(CAST(0 AS BIGINT),"
        " element_at(acc, -1) + x - k)))), 2, size(sx))")
    z = (g.select("et", "k",
                  F.arrays_zip(F.col("sx"), cus.alias("cu")).alias("zz"))
         .select("et", "k", F.explode("zz").alias("r")))
    return (z.select(F.col("et").alias("event_type"),
                     F.date_format(F.col("r.sx.day"), "yyyy-MM-dd")
                     .alias("day"),
                     F.col("r.sx.x").alias("x"),
                     F.col("k").alias("k_ref"),
                     F.col("r.cu").alias("cusum_hi")))


@query(
    "stats_anderson_darling",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, cent, CAST(count(*) AS BIGINT) AS c
          FROM sc GROUP BY 1, 2),
    st AS (SELECT et, CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(CAST(cent AS DECIMAL(38,0)) * c)
                       AS DECIMAL(38,0)) AS s,
                  CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent * c)
                       AS DECIMAL(38,0)) AS q
           FROM g GROUP BY et),
    ms AS (SELECT et, n,
                  round(CAST(s AS DOUBLE) / n, 6) AS m,
                  round(sqrt((CAST(q AS DOUBLE)
                              - CAST(s AS DOUBLE) * s / n)
                             / (n - 1.0)), 6) AS sd
           FROM st),
    cum AS (SELECT g.et, g.cent, g.c, ms.n, ms.m, ms.sd,
                   coalesce(sum(g.c) OVER (PARTITION BY g.et
                        ORDER BY g.cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cb
            FROM g JOIN ms USING (et)),
    ph AS (SELECT et, c, n, cb,
                  least(greatest(CASE WHEN (cent - m) / sd >= 0.0
                       THEN 1.0 - {{TAIL}}
                       ELSE {{TAILNEG}} END, 1e-15),
                       1.0 - 1e-15) AS phi
           FROM cum),
    w AS (SELECT et, n,
                 CAST(c * (2 * cb + c) AS DECIMAL(38,0)) AS w1,
                 CAST(c * (2 * (n - cb) - c) AS DECIMAL(38,0)) AS w2,
                 CAST(round(ln(phi) * 1000000) AS BIGINT) AS l1,
                 CAST(round(ln(1.0 - phi) * 1000000) AS BIGINT) AS l2
          FROM ph),
    acc AS (SELECT et, n,
                   CAST(sum(w1 * l1 + w2 * l2)
                        AS DECIMAL(38,0)) AS t
            FROM w GROUP BY et, n)
    SELECT et AS event_type, n,
           round(-CAST(n AS DOUBLE)
                 - CAST(t AS DOUBLE) / (n * 1000000.0), 4) AS a2_stat
    FROM acc ORDER BY event_type
    """.replace("{TAIL}", _abs_tail_sql("((cent - m) / sd)"))
       .replace("{TAILNEG}", _abs_tail_sql("((cent - m) / sd)")))
def stats_anderson_darling(spark, sf):
    """Anderson-Darling normality statistic per event type:
    A^2 = -n - (1/n) * sum_i (2i-1)[ln F(z_(i)) + ln(1-F(z_(n+1-i)))]
    with F the normal CDF at the standardized sorted values — the
    tail-sensitive normality test (vs stats_jarque_bera's
    moment-based check, which is blind to tail shape at matched
    skew/kurtosis).

    Scale + exactness shape: everything runs on the VALUE-GRAIN
    relation (bounded by the price domain).  Tied blocks collapse in
    closed form — for a cent with cumulative count cb before it and
    multiplicity c, sum(2i-1) over its ranks is (cb+c)^2 - cb^2 and
    the reverse-rank weight is (n-cb)^2 - (n-cb-c)^2 — so no per-row
    ranking ever materializes (per-type cumulative window over
    distinct cents only, the Mann-Whitney pattern).  The squared
    differences are computed FACTORED — w1 = c*(2*cb + c), w2 =
    c*(2*(n-cb) - c) — with the product taken in DECIMAL(38,0) on
    both engines: the unfactored (cb+c)^2 intermediate reaches n^2,
    which wraps Spark's non-ANSI BIGINT at n ≳ 3e9 rows per type
    while DuckDB's HUGEINT window sums stay exact (silent engine
    divergence); the factored DECIMAL form is exact past 1e12 rows
    on both sides (the eval_mann_whitney_u convention).  mean/sd are
    6dp-rounded doubles from exact integer moments (both engines then
    standardize identical doubles); F comes from the shared
    Abramowitz-Stegun fragment clamped to [1e-15, 1-1e-15] (ln(0)
    guard); and each ln term is 6dp-rounded into an exact integer
    (x1e6, BIGINT) BEFORE the weighted DECIMAL(38,0) sum — raw
    w*ln(F) products reach ~1e12 where double ulp (1e-4) exceeds any
    rounding quantum, the partition-order trap (the eval_anova_f
    lesson), while the integer-scaled sum is order-independent.  A^2
    is one final double formula."""
    g = (_sc(spark, sf).groupBy("et", "cent")
         .agg(F.count("*").cast(BIG).alias("c")))
    st = g.groupBy("et").agg(
        F.sum("c").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC) * F.col("c")).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("cent") * F.col("c"))
        .cast(DEC).alias("q"))
    ms = st.select(
        "et", "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("m"),
        F.round(F.sqrt((F.col("q").cast("double")
                        - F.col("s").cast("double") * F.col("s")
                        / F.col("n")) / (F.col("n") - 1.0)), 6)
        .alias("sd"))
    wprev = (Window.partitionBy("et").orderBy("cent")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum = (g.join(ms, "et")
           .select("et", "cent", "c", "n", "m", "sd",
                   F.coalesce(F.sum("c").over(wprev), F.lit(0))
                   .alias("cb")))
    tail = _abs_tail_sql("((cent - m) / sd)")
    phi = F.least(
        F.greatest(
            F.expr(f"CASE WHEN (cent - m) / sd >= 0.0 "
                   f"THEN 1.0 - {tail} ELSE {tail} END"),
            F.lit(1e-15)),
        F.lit(1.0 - 1e-15))
    w = cum.select(
        "et", "n",
        (F.col("c").cast(DEC)
         * (F.col("cb") * 2 + F.col("c"))).cast(DEC).alias("w1"),
        (F.col("c").cast(DEC)
         * ((F.col("n") - F.col("cb")) * 2 - F.col("c"))).cast(DEC)
        .alias("w2"),
        F.round(F.log(phi) * 1000000).cast(BIG).alias("l1"),
        F.round(F.log(1.0 - phi) * 1000000).cast(BIG).alias("l2"))
    acc = w.groupBy("et", "n").agg(
        F.sum(F.col("w1") * F.col("l1")
              + F.col("w2") * F.col("l2")).cast(DEC)
        .alias("t"))
    return (acc.select(F.col("et").alias("event_type"), "n",
                       F.round(-F.col("n").cast("double")
                               - F.col("t").cast("double")
                               / (F.col("n") * 1000000.0), 4)
                       .alias("a2_stat")))


@query(
    "stats_atkinson_index",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, cent, CAST(count(*) AS BIGINT) AS c
          FROM sc WHERE cent > 0 GROUP BY 1, 2),
    terms AS (SELECT et, c, cent,
                     CAST(round(ln(cent) * 1000000000) AS BIGINT) AS li,
                     CAST(round(1e12 / cent) AS BIGINT) AS ri
              FROM g),
    m AS (SELECT et, CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CAST(cent AS DECIMAL(38,0)) * c)
                      AS DECIMAL(38,0)) AS s,
                 CAST(sum(CAST(li AS DECIMAL(38,0)) * c)
                      AS DECIMAL(38,0)) AS sl,
                 CAST(sum(CAST(ri AS DECIMAL(38,0)) * c)
                      AS DECIMAL(38,0)) AS sr
          FROM terms GROUP BY et)
    SELECT et AS event_type, n,
           round(1.0 - exp(CAST(sl AS DOUBLE) / (n * 1e9))
                       * n / CAST(s AS DOUBLE), 6) AS atkinson_1,
           round(1.0 - (CAST(n AS DOUBLE) * n * 1e12)
                       / (CAST(sr AS DOUBLE) * CAST(s AS DOUBLE)), 6)
               AS atkinson_2
    FROM m ORDER BY event_type
    """)
def stats_atkinson_index(spark, sf):
    """Atkinson inequality indices per event type at the two standard
    aversion levels: A(1) = 1 - geomean/mean and A(2) = 1 -
    harmonicmean/mean — the welfare-theoretic family member (how much
    total value could be given up for perfect equality at aversion
    epsilon) completing the inequality set next to [[stats_theil_index]]
    and stats_gini_exact; unlike Gini it is subgroup-decomposable.

    Exactness: runs on the VALUE-GRAIN relation (cent > 0 — zero
    values have no defined log/harmonic mean); ln(cent) and 1e12/cent
    are per-DISTINCT-cent doubles of exact integers, 9dp/integer-
    rounded into exact BIGINTs so every cross-group sum rides
    DECIMAL(38,0) (order-independent, the eval_anova_f lesson); the
    final A values are one double formula each (exp is the only
    transcendental, absorbed by round 6)."""
    g = (_sc(spark, sf).filter(F.col("cent") > 0)
         .groupBy("et", "cent").agg(F.count("*").cast(BIG).alias("c")))
    terms = g.select(
        "et", "c", "cent",
        F.round(F.log("cent") * 1000000000).cast(BIG).alias("li"),
        F.round(F.lit(1e12) / F.col("cent")).cast(BIG).alias("ri"))
    m = terms.groupBy("et").agg(
        F.sum("c").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC) * F.col("c")).cast(DEC).alias("s"),
        F.sum(F.col("li").cast(DEC) * F.col("c")).cast(DEC).alias("sl"),
        F.sum(F.col("ri").cast(DEC) * F.col("c")).cast(DEC).alias("sr"))
    n = F.col("n")
    return m.select(
        F.col("et").alias("event_type"), "n",
        F.round(1.0 - F.exp(F.col("sl").cast("double") / (n * 1e9))
                * n / F.col("s").cast("double"), 6).alias("atkinson_1"),
        F.round(1.0 - (n.cast("double") * n * 1e12)
                / (F.col("sr").cast("double")
                   * F.col("s").cast("double")), 6).alias("atkinson_2"))


@query(
    "ts_dickey_fuller",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    pairs AS (SELECT et, x AS u,
                     lead(x) OVER (PARTITION BY et ORDER BY day) - x
                         AS y
              FROM daily QUALIFY y IS NOT NULL),
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(u) AS DECIMAL(38,0)) AS su,
                 CAST(sum(y) AS DECIMAL(38,0)) AS sy,
                 CAST(sum(CAST(u AS DECIMAL(38,0)) * u)
                      AS DECIMAL(38,0)) AS suu,
                 CAST(sum(CAST(u AS DECIMAL(38,0)) * y)
                      AS DECIMAL(38,0)) AS suy,
                 CAST(sum(CAST(y AS DECIMAL(38,0)) * y)
                      AS DECIMAL(38,0)) AS syy
          FROM pairs GROUP BY et),
    f AS (SELECT et, n,
                 (n * CAST(suy AS DOUBLE) - CAST(su AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                     AS rho,
                 n * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)
                     AS dxx
          FROM m)
    SELECT f.et AS event_type, f.n AS n_pairs,
           round(rho, 6) AS rho_hat,
           round(rho / sqrt(((CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / f.n
                              - rho * rho * dxx / f.n) / (f.n - 2.0))
                            / (dxx / f.n)), 6) AS df_t_stat
    FROM f JOIN m ON f.et = m.et ORDER BY event_type
    """)
def ts_dickey_fuller(spark, sf):
    """Dickey-Fuller unit-root t-statistic (AR(1), with drift) on each
    event type's daily value total: regress delta-x on the lagged
    level, t = rho_hat / se(rho_hat) — strongly negative t rejects a
    unit root (the series mean-reverts), the stationarity screen that
    complements [[ts_mann_kendall]] (monotone trend) and
    ts_turning_points (oscillation).  The critical values are the DF
    distribution's, not normal, so the statistic is emitted without a
    p-value.

    Exactness: the day-grain pairs (u = x_{t-1}, y = delta-x) are
    exact integer cents; all five regression sums ride DECIMAL(38,0)
    (order-independent); rho and t are closed-form double formulas
    over those exact integers written identically in both engines
    (slope, RSS via syy - sy^2/n - rho^2 * Sxx, se from Sxx) — no
    iterative fitting, one lead window over the calendar-bounded
    series, one agg."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    w = Window.partitionBy("et").orderBy("day")
    pairs = (daily.select("et", F.col("x").alias("u"),
                          (F.lead("x").over(w) - F.col("x")).alias("y"))
             .filter(F.col("y").isNotNull()))
    m = pairs.groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum("u").cast(DEC).alias("su"),
        F.sum("y").cast(DEC).alias("sy"),
        F.sum(F.col("u").cast(DEC) * F.col("u")).cast(DEC).alias("suu"),
        F.sum(F.col("u").cast(DEC) * F.col("y")).cast(DEC).alias("suy"),
        F.sum(F.col("y").cast(DEC) * F.col("y")).cast(DEC).alias("syy"))
    n = F.col("n")
    rho = ((n * F.col("suy").cast("double")
            - F.col("su").cast("double") * F.col("sy").cast("double"))
           / (n * F.col("suu").cast("double")
              - F.col("su").cast("double") * F.col("su").cast("double")))
    dxx = (n * F.col("suu").cast("double")
           - F.col("su").cast("double") * F.col("su").cast("double"))
    rss = (F.col("syy").cast("double")
           - F.col("sy").cast("double") * F.col("sy").cast("double") / n
           - rho * rho * dxx / n)
    return m.select(
        F.col("et").alias("event_type"), F.col("n").alias("n_pairs"),
        F.round(rho, 6).alias("rho_hat"),
        F.round(rho / F.sqrt((rss / (n - 2.0)) / (dxx / n)), 6)
        .alias("df_t_stat"))


@query(
    "stats_page_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    ets AS (SELECT et, CAST(row_number() OVER (ORDER BY et) AS BIGINT)
                           AS j
            FROM (SELECT DISTINCT et FROM daily)),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ets),
    full_days AS (SELECT day FROM daily GROUP BY day
                  HAVING count(*) = (SELECT k FROM kk)),
    ranked AS (SELECT d.et, d.day,
                      CAST(row_number() OVER (PARTITION BY d.day
                                              ORDER BY d.x, d.et)
                           AS BIGINT) AS r
               FROM daily d JOIN full_days USING (day)),
    m AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS b,
                 CAST(sum(j * r) AS BIGINT) AS l
          FROM ranked JOIN ets USING (et))
    SELECT b AS b_days, k AS k_treatments, l AS l_stat,
           round((l - b * k * (k + 1.0) * (k + 1.0) / 4.0)
                 / sqrt(b * CAST(k AS DOUBLE) * k * (k + 1.0) * (k + 1.0)
                        * (k - 1.0) / 144.0), 6) AS z_stat
    FROM m CROSS JOIN kk
    """)
def stats_page_trend(spark, sf):
    """Page's L trend test for ordered alternatives across
    repeated-measures blocks: blocks = days, treatments = the event
    types in ALPHABETICAL order (the deterministic stand-in for a
    hypothesized ordering), L = sum over complete days of j * R_dj
    with within-day ranks — the directional sharpening of
    stats_friedman_test (Friedman asks 'do treatments differ at
    all'; Page asks 'do they increase in THIS order', with more power
    when an order is pre-specified; Page 1963).  Large positive z =
    daily value totals rise along the alphabetical treatment order.

    Determinism/exactness: only COMPLETE blocks (days where every
    type appears) enter, ranks break ties by (total, type) — a total
    order on exact integer cents, so L is an exact integer in both
    engines; E[L] = bk(k+1)^2/4 and Var[L] = bk^2(k+1)^2(k-1)/144
    give a one-double-formula z.  The treatment-index window runs
    over the k distinct types only; day ranks are per-day
    partitions."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    ets = (daily.select("et").distinct()
           .select("et", F.row_number().over(Window.orderBy("et"))
                   .cast(BIG).alias("j")))
    kk = ets.agg(F.count("*").cast(BIG).alias("k"))
    full_days = (daily.groupBy("day").agg(F.count("*").alias("_c"))
                 .join(F.broadcast(kk), F.col("_c") == F.col("k"))
                 .select("day"))
    wd = Window.partitionBy("day").orderBy("x", "et")
    ranked = (daily.join(full_days, "day")
              .select("et", "day",
                      F.row_number().over(wd).cast(BIG).alias("r")))
    m = (ranked.join(F.broadcast(ets), "et")
         .agg(F.countDistinct("day").cast(BIG).alias("b"),
              F.sum(F.col("j") * F.col("r")).cast(BIG).alias("l")))
    out = m.crossJoin(F.broadcast(kk))
    b, k, l = F.col("b"), F.col("k"), F.col("l")
    return out.select(
        b.alias("b_days"), k.alias("k_treatments"), l.alias("l_stat"),
        F.round((l - b * k * (k + 1.0) * (k + 1.0) / 4.0)
                / F.sqrt(b * k.cast("double") * k * (k + 1.0)
                         * (k + 1.0) * (k - 1.0) / 144.0), 6)
        .alias("z_stat"))


@query(
    "stats_ks_normal",
    oracle=f"""
    WITH {_SC},
    g AS (SELECT et, cent, CAST(count(*) AS BIGINT) AS c
          FROM sc GROUP BY 1, 2),
    st AS (SELECT et, CAST(sum(c) AS BIGINT) AS n,
                  CAST(sum(CAST(cent AS DECIMAL(38,0)) * c)
                       AS DECIMAL(38,0)) AS s,
                  CAST(sum(CAST(cent AS DECIMAL(38,0)) * cent * c)
                       AS DECIMAL(38,0)) AS q
           FROM g GROUP BY et),
    ms AS (SELECT et, n,
                  round(CAST(s AS DOUBLE) / n, 6) AS m,
                  round(sqrt((CAST(q AS DOUBLE)
                              - CAST(s AS DOUBLE) * s / n)
                             / (n - 1.0)), 6) AS sd
           FROM st),
    cum AS (SELECT g.et, g.cent, g.c, ms.n, ms.m, ms.sd,
                   coalesce(sum(g.c) OVER (PARTITION BY g.et
                        ORDER BY g.cent
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS cb
            FROM g JOIN ms USING (et)),
    dev AS (SELECT et, n,
                   greatest(
                     abs((cb + c) * 1.0 / n
                         - (CASE WHEN (cent - m) / sd >= 0.0
                            THEN 1.0 - {{TAIL}} ELSE {{TAIL}} END)),
                     abs(cb * 1.0 / n
                         - (CASE WHEN (cent - m) / sd >= 0.0
                            THEN 1.0 - {{TAIL}} ELSE {{TAIL}} END)))
                       AS dv
            FROM cum),
    d AS (SELECT et, n, round(max(dv), 6) AS d_stat
          FROM dev GROUP BY et, n),
    lam AS (SELECT et, n, d_stat,
                   (sqrt(CAST(n AS DOUBLE)) + 0.12
                    + 0.11 / sqrt(CAST(n AS DOUBLE))) * d_stat AS l
            FROM d)
    SELECT et AS event_type, n, d_stat,
           round(least(1.0, greatest(0.0,
               2.0 * (exp(-2.0 * l * l)
                      - exp(-8.0 * l * l)
                      + exp(-18.0 * l * l)
                      - exp(-32.0 * l * l)
                      + exp(-50.0 * l * l)))), 9) AS p_value
    FROM lam ORDER BY event_type
    """.replace("{TAIL}", _abs_tail_sql("((cent - m) / sd)")))
def stats_ks_normal(spark, sf):
    """One-sample Kolmogorov-Smirnov normality test per event type:
    D = sup over jump points of |F_emp - Phi((x-m)/sd)| (both the
    left and right limits of the empirical step, the standard
    two-sided sup), p from the asymptotic Kolmogorov series with the
    Stephens small-sample correction lambda = (sqrt(n) + 0.12 +
    0.11/sqrt(n)) * D.  The SUP-norm complement to
    [[stats_anderson_darling]]'s tail-weighted quadratic norm (KS is
    most sensitive near the median, AD in the tails) and the
    one-sample sibling of the two-sample eval_ks_split_drift.

    Exactness/scale: the identical value-grain machinery as AD — per
    distinct cent, the cumulative count window gives both empirical
    limits in closed form (no per-row ranking); mean/sd are
    6dp-rounded doubles of exact integer moments so both engines
    standardize identical doubles; Phi is the shared
    Abramowitz-Stegun fragment; D is a MAX (order-independent, unlike
    a sum — no integer-scaling needed) rounded at 6dp BEFORE the
    p-value series so both engines exponentiate the same double."""
    g = (_sc(spark, sf).groupBy("et", "cent")
         .agg(F.count("*").cast(BIG).alias("c")))
    st = g.groupBy("et").agg(
        F.sum("c").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC) * F.col("c")).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("cent") * F.col("c"))
        .cast(DEC).alias("q"))
    ms = st.select(
        "et", "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("m"),
        F.round(F.sqrt((F.col("q").cast("double")
                        - F.col("s").cast("double") * F.col("s")
                        / F.col("n")) / (F.col("n") - 1.0)), 6)
        .alias("sd"))
    wprev = (Window.partitionBy("et").orderBy("cent")
             .rowsBetween(Window.unboundedPreceding, -1))
    cum = (g.join(ms, "et")
           .select("et", "cent", "c", "n", "m", "sd",
                   F.coalesce(F.sum("c").over(wprev), F.lit(0))
                   .alias("cb")))
    tail = _abs_tail_sql("((cent - m) / sd)")
    phi = F.expr(f"CASE WHEN (cent - m) / sd >= 0.0 "
                 f"THEN 1.0 - {tail} ELSE {tail} END")
    dev = cum.select(
        "et", "n",
        F.greatest(
            F.abs((F.col("cb") + F.col("c")) * 1.0 / F.col("n") - phi),
            F.abs(F.col("cb") * 1.0 / F.col("n") - phi)).alias("dv"))
    d = dev.groupBy("et", "n").agg(F.round(F.max("dv"), 6)
                                   .alias("d_stat"))
    lam = ((F.sqrt(F.col("n").cast("double")) + 0.12
            + 0.11 / F.sqrt(F.col("n").cast("double")))
           * F.col("d_stat"))
    series = 2.0 * (F.exp(-2.0 * lam * lam)
                    - F.exp(-8.0 * lam * lam)
                    + F.exp(-18.0 * lam * lam)
                    - F.exp(-32.0 * lam * lam)
                    + F.exp(-50.0 * lam * lam))
    return d.select(
        F.col("et").alias("event_type"), "n", "d_stat",
        F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), series)), 9)
        .alias("p_value"))


_CONF_U = ("(CAST(concat('0x', substring(md5(concat('conf:42:', "
           "CAST(event_id AS VARCHAR))), 1, 15)) AS BIGINT)"
           " / 1152921504606846976.0)")


@query(
    "stats_conformal_coverage",
    oracle=f"""
    WITH {_SC},
    sp AS (SELECT et, cent,
                  CASE WHEN {_CONF_U} < 0.5 THEN 0 ELSE 1 END AS tst
           FROM sc),
    cs AS (SELECT et, CAST(count(*) AS BIGINT) AS nc,
                  CAST(sum(CAST(cent AS DECIMAL(38,0)))
                       AS DECIMAL(38,0)) AS s
           FROM sp WHERE tst = 0 GROUP BY et),
    -- nonconformity at a COMMON per-type integer scale: nc*|cent -
    -- calib mean| = |cent*nc - S|, exact DECIMAL (no rational mean)
    scd AS (SELECT sp.et, sp.tst,
                   abs(CAST(sp.cent AS DECIMAL(38,0)) * cs.nc - cs.s)
                       AS d
            FROM sp JOIN cs ON sp.et = cs.et),
    cg AS (SELECT et, d, CAST(count(*) AS BIGINT) AS c
           FROM scd WHERE tst = 0 GROUP BY et, d),
    cum AS (SELECT et, d, CAST(sum(c) OVER (PARTITION BY et ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cc
            FROM cg),
    -- split-conformal rank: ceil(0.9 * (nc + 1)) as exact int DIV
    qh AS (SELECT cum.et, min(cum.d) AS qhat
           FROM cum JOIN cs ON cum.et = cs.et
           WHERE cum.cc >= (9 * (cs.nc + 1) + 9) // 10
           GROUP BY cum.et),
    tg AS (SELECT scd.et,
                  CAST(count(*) AS BIGINT) AS nt,
                  CAST(sum(CASE WHEN scd.d <= qh.qhat THEN 1 ELSE 0 END)
                       AS BIGINT) AS cov
           FROM scd JOIN qh ON scd.et = qh.et
           WHERE scd.tst = 1 GROUP BY scd.et)
    SELECT cs.et AS event_type, cs.nc AS n_calib, tg.nt AS n_test,
           round(CAST(qh.qhat AS DOUBLE) / (cs.nc * 100.0), 6)
               AS qhat_value,
           round(CAST(tg.cov AS DOUBLE) / tg.nt, 6) AS coverage
    FROM cs JOIN qh ON cs.et = qh.et JOIN tg ON cs.et = tg.et
    ORDER BY event_type
    """)
def stats_conformal_coverage(spark, sf):
    """Split-conformal prediction interval check per event type at
    target coverage 90% (Vovk; Lei et al. 2018): a deterministic hash
    split (the [[sample_hash_split]] md5 convention, tag conf:42)
    divides each type into calibration/test halves; the nonconformity
    score is the absolute deviation from the calibration mean; qhat is
    the ceil(0.9*(n+1))-smallest calibration score; coverage is the
    test-half fraction within qhat.  Output coverage ~0.9 by the
    conformal guarantee REGARDLESS of the value distribution — the
    distribution-free calibration readout a forecaster's interval
    layer needs, complementing [[eval_isotonic_calibration]]
    (probability recalibration) with interval calibration.

    Exactness/scale: scores live at a COMMON per-type integer scale —
    nc*|cent - mean| = |cent*nc - S| in exact DECIMAL(38,0), so no
    rational mean ever rounds; the quantile rank is exact integer
    ceil-division ((9(n+1)+9) DIV 10, positive DIV = // in both
    engines); the rank lookup runs on the VALUE-GRAIN cumulative
    window (distinct scores <= distinct cents, bounded by the price
    domain).  qhat_value rescales to cents (/nc/100) only for
    display, one rounded double."""
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit("conf:42:"),
                       F.col("event_id").cast("string"))), 1, 15),
        16, 10).cast("double") / F.lit(1152921504606846976.0))
    sp = _sc(spark, sf).select(
        "et", "cent", F.when(u < 0.5, 0).otherwise(1).alias("tst"))
    cs = (sp.filter(F.col("tst") == 0).groupBy("et")
          .agg(F.count("*").cast(BIG).alias("nc"),
               F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s")))
    scd = (sp.join(F.broadcast(cs), "et")
           .select("et", "tst",
                   F.abs(F.col("cent").cast(DEC) * F.col("nc")
                         - F.col("s")).alias("d")))
    cg = (scd.filter(F.col("tst") == 0).groupBy("et", "d")
          .agg(F.count("*").cast(BIG).alias("c")))
    wcum = (Window.partitionBy("et").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0))
    cum = cg.select("et", "d", F.sum("c").over(wcum).cast(BIG).alias("cc"))
    qh = (cum.join(F.broadcast(cs.select("et", "nc")), "et")
          .filter(F.col("cc")
                  >= F.expr("(9 * (nc + 1) + 9) DIV 10"))
          .groupBy("et").agg(F.min("d").alias("qhat")))
    tg = (scd.filter(F.col("tst") == 1)
          .join(F.broadcast(qh), "et")
          .groupBy("et")
          .agg(F.count("*").cast(BIG).alias("nt"),
               F.sum(F.when(F.col("d") <= F.col("qhat"), 1).otherwise(0))
               .cast(BIG).alias("cov")))
    return (cs.join(qh, "et").join(tg, "et")
            .select(F.col("et").alias("event_type"),
                    F.col("nc").alias("n_calib"),
                    F.col("nt").alias("n_test"),
                    F.round(F.col("qhat").cast("double")
                            / (F.col("nc") * 100.0), 6)
                    .alias("qhat_value"),
                    F.round(F.col("cov").cast("double") / F.col("nt"), 6)
                    .alias("coverage")))
