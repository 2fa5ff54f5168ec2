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

__all__ = ["blocked_fuzzy_join", "blocked_fuzzy_join_multipass",
           "fellegi_sunter_weights", "fellegi_sunter_em"]


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

def blocked_fuzzy_join_multipass(left: DataFrame, right: DataFrame,
                                 left_id: str, right_id: str,
                                 left_name: str, right_name: str,
                                 passes=None, max_dist: int = 3
                                 ) -> DataFrame:
    """Multi-pass blocked fuzzy join: the standard recall fix for
    single-pass blocking (``blocked_fuzzy_join`` docstring) — a UNION
    of independent blocking passes, each an ordinary equi-join, with
    candidate pairs deduplicated before the (expensive) edit-distance
    step.  A record pair is compared iff at least one pass puts both
    records in the same block, so a corruption that escapes one
    blocking key (a typo inside the prefix, a length change across the
    band boundary) is recovered by any other pass that survives it.

    ``passes`` is a list of callables, each mapping a name Column to a
    single block-key Column (compose multi-part keys with
    ``F.concat_ws``).  Default: (first char + length band) — the
    single-pass key — plus a last-4-chars suffix block.

    Same canonicalize-then-match shape as the single-pass operator:
    both sides collapse to distinct-name grain (the block keys are
    functions of the name, so (block, name) grain IS name grain),
    each pass joins the distinct-name relations on its key, the union
    is deduplicated at (left name, right name) grain, Levenshtein runs
    once per surviving pair, and verdicts fan back to rows through an
    equi-join on the name.  ``n_cands`` counts candidate right ROWS
    (per-name multiplicities summed over the deduplicated candidate
    set — a right row reachable through BOTH passes counts once);
    ties resolve to the smallest right id.  At 100 TB this is P
    shuffle joins + one distinct instead of one join — recall is
    bought with a constant factor, never a cross product.
    """
    if passes is None:
        passes = [
            lambda c: F.concat_ws(
                "\x1f", F.substring(c, 1, 1),
                F.floor(F.length(c) / 4).cast("string")),
            lambda c: F.substring(c, F.length(c) - F.lit(3), F.lit(4)),
        ]
    ln = left.select(F.col(left_id).alias("_lid"),
                     F.col(left_name).alias("_lname"))
    rd = (right.select(F.col(right_id).alias("_rid"),
                       F.col(right_name).alias("_rname"))
          .groupBy("_rname")
          .agg(F.min("_rid").alias("_rid"), F.count("*").alias("_rcnt")))
    ld = ln.select("_lname").distinct()
    pairs = None
    for blk in passes:
        lp = ld.select("_lname", blk(F.col("_lname")).alias("_bk"))
        rp = rd.select("_rname", blk(F.col("_rname")).alias("_bk"))
        p = lp.join(rp, "_bk").select("_lname", "_rname")
        pairs = p if pairs is None else pairs.unionAll(p)
    pairs = pairs.distinct()
    cand = (pairs.join(rd, "_rname")
            .withColumn("dist", F.levenshtein("_lname", "_rname")))
    w = Window.partitionBy("_lname")
    wr = Window.partitionBy("_lname").orderBy("dist", "_rid")
    best = (cand.withColumn("n_cands", F.sum("_rcnt").over(w))
            .withColumn("_rn", F.row_number().over(wr))
            .filter((F.col("_rn") == 1) & (F.col("dist") <= int(max_dist)))
            .select("_lname", "_rid", "_rname", "dist", "n_cands"))
    return (ln.join(best, "_lname")
            .select(F.col("_lid").alias(left_id),
                    F.col("_rid").alias(right_id),
                    F.col("_lname").alias(left_name),
                    F.col("_rname").alias(right_name),
                    F.col("dist").cast("bigint").alias("dist"),
                    F.col("n_cands").cast("bigint").alias("n_cands")))


def fellegi_sunter_weights(cands: DataFrame, agree_cols: list[str],
                           label_col: str,
                           smoothing: float = 0.5) -> DataFrame:
    """Fellegi-Sunter probabilistic linkage weights (Fellegi & Sunter,
    JASA 1969 — the model behind Splink/RecordLinkage toolkits) over a
    labeled candidate-pair relation: estimate per-field agreement
    probabilities among matches (m_k) and non-matches (u_k), then score
    every agreement PATTERN with the log-likelihood-ratio weight
    sum_k log2(m_k/u_k | agree) / log2((1-m_k)/(1-u_k) | disagree).

    ``cands`` must already be BLOCKED (the linkage scale rule at the
    top of this module — candidates meet through an equi-join, never
    all-pairs) and carry 0/1 ``agree_cols`` plus a 0/1 ``label_col``
    (truth for supervised m/u estimation; unsupervised EM fits the
    same model when labels are unavailable).  Estimates are
    Laplace-smoothed ((c + smoothing)/(n + 2*smoothing)) so a field
    that is pure inside one class (e.g. a unique name tail that NEVER
    agrees between non-matches) cannot produce log2(0) infinities.

    Returns one row per observed agreement pattern: (pattern,
    <agree_cols...>, n_pairs, n_true, weight) — at most 2^k rows.

    Shapes: two hash aggs over the candidate relation (the 1-row m/u
    stats and the pattern counts) + a broadcast cross-join of the
    1-row stats onto the <=2^k pattern rows; per-pair scoring at
    serving time is the same broadcast join applied map-side, so 100
    TB of candidates never shuffles on anything but the block key that
    built them.
    """
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty — the FS weight "
                         "is a sum over agreement fields")
    lbl = F.col(label_col)
    stats = cands.agg(
        *[e for c in agree_cols for e in (
            ((F.sum(F.col(c) * lbl) + F.lit(smoothing))
             / (F.sum(lbl) + F.lit(2 * smoothing))).alias(f"_m_{c}"),
            ((F.sum(F.col(c) * (1 - lbl)) + F.lit(smoothing))
             / (F.sum(1 - lbl) + F.lit(2 * smoothing))).alias(f"_u_{c}"),
        )])
    patterns = (cands.groupBy(*agree_cols)
                .agg(F.count("*").alias("n_pairs"),
                     F.sum(lbl).alias("n_true")))
    weight = None
    for c in agree_cols:
        m, u = F.col(f"_m_{c}"), F.col(f"_u_{c}")
        term = F.when(F.col(c) == 1, F.log2(m / u)) \
                .otherwise(F.log2((1 - m) / (1 - u)))
        weight = term if weight is None else weight + term
    return (patterns.crossJoin(F.broadcast(stats))
            .select(F.concat_ws("", *[F.col(c).cast("string")
                                      for c in agree_cols]).alias("pattern"),
                    *agree_cols,
                    F.col("n_pairs").cast("bigint").alias("n_pairs"),
                    F.col("n_true").cast("bigint").alias("n_true"),
                    weight.alias("weight")))


def fellegi_sunter_em(cands: DataFrame, agree_cols: list[str],
                      iters: int = 2, init_lambda: float = 0.1,
                      init_m: float = 0.9, init_u: float = 0.1
                      ) -> DataFrame:
    """UNSUPERVISED Fellegi-Sunter parameter estimation via EM over
    agreement patterns (Winkler 1988; the fit loop behind Splink) —
    the estimator :func:`fellegi_sunter_weights` needs when no labeled
    pairs exist, which is the normal production case.

    The mixture model: a candidate pair is a match with prior
    ``lambda``; field k agrees with probability m_k among matches and
    u_k among non-matches (conditional independence).  E-step gives
    each agreement PATTERN its posterior match probability
    w(pat) = lambda*P(pat|M) / (lambda*P(pat|M) + (1-lambda)*P(pat|U))
    with P(pat|M) = prod_k m_k^a_k (1-m_k)^(1-a_k); M-step re-estimates
    lambda, m_k, u_k as w-weighted pattern-count averages.  ``iters``
    EM rounds are UNROLLED into the plan from literal inits — the
    whole recursion runs on the <= 2^k-row pattern relation, so each
    round is a tiny broadcast cross-join + one <= 2^k-row agg
    regardless of candidate volume; 100 TB of candidates costs ONE
    pattern-count shuffle, exactly like the supervised estimator.

    Returns one row per observed pattern: (pattern, agree_cols...,
    n_pairs, posterior_match [6dp], lambda_hat [6dp]).  Engine
    exactness: every per-round estimate (lambda, m_k, u_k) and every
    per-pattern posterior is rounded to 9dp before feeding the next
    round, so both engines iterate on identical doubles (the
    round-before-reuse rule); pattern counts are exact integers.
    """
    if not agree_cols:
        raise ValueError("agree_cols must be non-empty")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    pat = cands.groupBy(*agree_cols).agg(
        F.count("*").cast("bigint").alias("n_pairs"))

    def posterior(lam, ms, us):
        # lam is always a Column (F.lit / F.col) at both call sites
        pm, pu = lam, 1.0 - lam
        for c, m, u in zip(agree_cols, ms, us):
            a = F.col(c)
            pm = pm * F.when(a == 1, m).otherwise(1.0 - m)
            pu = pu * F.when(a == 1, u).otherwise(1.0 - u)
        return F.round(pm / (pm + pu), 9)

    lam = float(init_lambda)
    ms = [float(init_m)] * len(agree_cols)
    us = [float(init_u)] * len(agree_cols)
    cur = pat.withColumn("_w", posterior(F.lit(lam),
                                         [F.lit(x) for x in ms],
                                         [F.lit(x) for x in us]))
    for _ in range(int(iters) - 1):
        n, w = F.col("n_pairs").cast("double"), F.col("_w")
        aggs = [F.round(F.sum(n * w) / F.sum(n), 9).alias("_lam")]
        for c in agree_cols:
            a = F.col(c).cast("double")
            aggs.append(F.round(F.sum(n * w * a) / F.sum(n * w), 9)
                        .alias(f"_m_{c}"))
            aggs.append(F.round(F.sum(n * (1.0 - w) * a)
                                / F.sum(n * (1.0 - w)), 9)
                        .alias(f"_u_{c}"))
        st = cur.agg(*aggs)
        cur = (pat.crossJoin(F.broadcast(st))
               .withColumn("_w", posterior(
                   F.col("_lam"),
                   [F.col(f"_m_{c}") for c in agree_cols],
                   [F.col(f"_u_{c}") for c in agree_cols])))
    n, w = F.col("n_pairs").cast("double"), F.col("_w")
    lam_out = (cur.agg(F.round(F.sum(n * w) / F.sum(n), 6)
                       .alias("lambda_hat")))
    return (cur.crossJoin(F.broadcast(lam_out))
            .select(F.concat_ws("", *[F.col(c).cast("string")
                                      for c in agree_cols])
                    .alias("pattern"),
                    *agree_cols, "n_pairs",
                    F.round(F.col("_w"), 6).alias("posterior_match"),
                    "lambda_hat"))
