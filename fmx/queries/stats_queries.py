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
    m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS BIGINT) AS n,
                 CAST(sum(s) AS DECIMAL(38,0)) AS s,
                 CAST(sum(q) AS DECIMAL(38,0)) AS q,
                 sum(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sb
          FROM g)
    SELECT k, n,
           round(sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 4)
               AS ss_between,
           round(CAST(q AS DOUBLE) - sb, 4) AS ss_within,
           round(((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                  / (k - 1))
                 / ((CAST(q AS DOUBLE) - sb) / (n - k)), 6) AS f_stat
    FROM m
    """)
def eval_anova_f(spark, sf):
    """One-way ANOVA F over the five event_type value distributions.
    Sum-of-squares identity form: SSW = Q - sum_g(S_g^2/n_g) and
    SSB = sum_g(S_g^2/n_g) - S^2/N need only the per-group integer
    moments (n, S=sum cents, Q=sum cents^2) — one groupBy + one 5-row
    agg, no second pass over the data for deviations.  S_g^2 rides a
    double (exact-integer operands, correctly-rounded division — the
    identical expression in both engines); F is one double formula."""
    g = _sc(spark, sf).groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(F.col("cent").cast(DEC)).cast(DEC).alias("s"),
        F.sum(F.col("cent").cast(DEC) * F.col("cent")).cast(DEC)
        .alias("q"))
    m = g.agg(
        F.count("*").cast(BIG).alias("k"),
        F.sum("n").cast(BIG).alias("n"),
        F.sum("s").cast(DEC).alias("s"),
        F.sum("q").cast(DEC).alias("q"),
        F.sum(F.col("s").cast("double") * F.col("s").cast("double")
              / F.col("n")).alias("sb"))
    k, n = F.col("k"), F.col("n")
    s, q, sb = F.col("s").cast("double"), F.col("q").cast("double"), F.col("sb")
    ssb = sb - s * s / n
    ssw = q - sb
    return m.select(
        "k", "n",
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
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
            .select("et", "n", "theil_t", "theil_l")
            .orderBy("et"))


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
                         / (F.count("*") * 100.0), 6).alias("trimmed_mean"))
            .orderBy("et"))
