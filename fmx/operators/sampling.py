"""Training-data sampling & packing operators.

The ops a 100 TB pretraining pipeline runs between dedup and tokenize:
deterministic train/val/test splits, per-stratum downsampling, and
sequence packing.  Everything derives randomness from md5 (engine-
portable like fmx.operators.dedup.hash64 — DuckDB oracles replay the
identical arithmetic), so results are reproducible under any
partitioning and any engine.

Scale notes:

- splits/sampling are pure column expressions — scan-bound, zero
  shuffles, no ``rand()`` (whose per-task seeding makes resampling
  layout-dependent).
- packing partitions the corpus into hash buckets FIRST and packs within
  buckets: the prefix-sum window runs per bucket in parallel instead of
  one global ORDER BY (a single-reducer bottleneck at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_uniform01", "hash_split", "stratified_sample",
           "pack_sequences", "temperature_mixture", "per_group_cap",
           "weighted_sample_per_group", "negative_sample",
           "length_buckets", "pack_manifest", "token_budget_mix",
           "pareto_frontier", "matched_pairs", "dsir_weights",
           "time_split_embargo", "group_kfold", "negative_downsample"]

_TWO60 = float(2 ** 60)


def hash_uniform01(col, tag: str, seed: int) -> F.Column:
    """Deterministic uniform [0, 1) from (tag, seed, value): first 15 hex
    chars of md5 -> 60-bit int / 2^60.  DuckDB replay:
    ``CAST(concat('0x', substring(md5(...), 1, 15)) AS BIGINT) /
    1152921504606846976.0``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{tag}:{seed}:"), c.cast("string"))), 1, 15),
        16, 10).cast("double")
    return h / F.lit(_TWO60)


def hash_split(df: DataFrame, id_col: str,
               weights: dict[str, float] | None = None,
               seed: int = 42, out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment by stable id hash.

    Unlike ``randomSplit`` the assignment is a pure function of
    (id, seed): re-running on re-partitioned / appended data never
    reshuffles existing rows across splits — the property that keeps
    eval sets honest when the corpus grows.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = hash_uniform01(id_col, "split", seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(
        F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      id_col: str, seed: int = 42,
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff
    u(id) < fraction[stratum].  The per-class rebalancing step of a
    training-data mix (e.g. downweight boilerplate-heavy sources).

    No shuffle: the fraction lookup is a CASE expression, the coin is a
    hash of the id — sampling a 100 TB corpus is one scan.
    """
    u = hash_uniform01(id_col, "strat", seed)
    frac = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == k
        frac = F.when(cond, F.lit(float(v))) if frac is None else \
            frac.when(cond, F.lit(float(v)))
    frac = F.lit(float(default_fraction)) if frac is None else \
        frac.otherwise(F.lit(float(default_fraction)))
    return df.filter(u < frac)


def pack_sequences(df: DataFrame, id_col: str, tokens_col,
                   budget: int = 512, num_buckets: int = 32) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences:
    (id, tokens, bucket, bin) where each (bucket, bin) is one packed
    sequence.

    Contiguous greedy packing per hash bucket: docs are ordered by id
    within their bucket, bin = floor(exclusive-prefix-sum / budget) — a
    bin overruns the budget by at most its last document (standard
    streaming packing; no doc is split).  Bucketing first keeps the
    prefix-sum window parallel (one partition per bucket) instead of a
    global single-reducer ORDER BY; at 1000 executors set num_buckets to
    a small multiple of total cores.
    """
    return _packed_with_cum(df, id_col, tokens_col, budget,
                            num_buckets).drop("_cum")


def _packed_with_cum(df: DataFrame, id_col: str, tokens_col,
                     budget: int, num_buckets: int) -> DataFrame:
    """pack_sequences plus its internal exclusive prefix sum ``_cum`` —
    the ONE definition of the packing order, shared by pack_manifest so
    offsets can never silently desync from bin assignment."""
    toks = tokens_col if not isinstance(tokens_col, str) else F.col(tokens_col)
    base = df.select(
        F.col(id_col),
        toks.cast("bigint").alias("tokens"),
        F.pmod(F.conv(F.substring(
            F.md5(F.concat(F.lit("bucket:"),
                           F.col(id_col).cast("string"))), 1, 15),
            16, 10).cast("bigint"), F.lit(num_buckets)).alias("bucket"))
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    return (base
            .withColumn("_cum", F.coalesce(F.sum("tokens").over(w),
                                           F.lit(0)))
            .select(id_col, "tokens", "bucket",
                    F.floor(F.col("_cum") / budget).cast("bigint")
                    .alias("bin"),
                    "_cum"))


def temperature_mixture(df: DataFrame, source_col: str, id_col: str,
                        alpha: float = 0.5, largest_frac: float = 0.5,
                        seed: int = 42) -> DataFrame:
    """Temperature-flattened source mixture: keep probability per source
    p_s = min(1, largest_frac * (max_n / n_s)^(1-alpha)) — alpha=1 keeps
    natural proportions scaled by largest_frac, alpha→0 flattens toward
    uniform source sizes (the multilingual-pretraining resampling rule).

    Fully relational: per-source counts and the global max come from one
    hash-agg joined back (broadcast — #sources rows), the keep-coin is
    the usual md5 hash of the id.  One scan + one tiny join; no driver
    scalars, so the same plan runs on 10⁵ sources.
    """
    counts = df.groupBy(source_col).agg(F.count("*").alias("_n"))
    counts = counts.withColumn(
        "_p",
        F.least(F.lit(1.0),
                F.lit(float(largest_frac))
                * F.pow(F.max("_n").over(Window.partitionBy())
                        / F.col("_n"), F.lit(1.0 - float(alpha)))))
    u = hash_uniform01(id_col, "mix", seed)
    return (df.join(F.broadcast(counts.select(source_col, "_p")),
                    source_col)
            .filter(u < F.col("_p"))
            .drop("_p"))


def weighted_sample_per_group(df: DataFrame, group_col: str, id_col: str,
                              weight_col: str, k: int,
                              seed: int = 42) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group
    (Efraimidis-Spirakis A-ES): keep the k rows with the largest
    u^(1/w) — equivalently the largest ln(u)/w, which is what we rank on
    (one ln instead of a pow, and better float spread near 1).

    Inclusion probability is proportional to weight within each group —
    the principled way to oversample long/high-quality documents
    without replacement.  Rows with weight <= 0 are excluded (zero mass).

    Distributed shape: the sampling key is a pure column expression
    (md5-derived u, engine-replayable); selection is a ranking window
    per group that executes as WindowGroupLimit (per-partition top-k
    heaps) — one scan + one shuffle on the group key, no global sort.
    The key is rounded to 12 decimals on BOTH engines before ranking so
    cross-engine float jitter cannot flip ranks (ties then break on id).
    """
    u = hash_uniform01(id_col, "wsample", seed)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 12)
    w = Window.partitionBy(group_col).orderBy(F.col("_key").desc(),
                                              F.col(id_col))
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("_key", key)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .withColumnRenamed("_rn", "sample_rank")
            .drop("_key"))


def negative_sample(positives: DataFrame, user_col: str, item_col: str,
                    num_items, k: int = 4, seed: int = 42) -> DataFrame:
    """Deterministic negative sampling for implicit-feedback training:
    for every (user, item) positive, draw ``k`` pseudo-random candidate
    item ids uniformly from [0, num_items), then anti-join the
    positives so no sampled "negative" is actually a positive.

    ``num_items`` may be an int or a 1-row/1-col DataFrame (e.g.
    ``items.agg(count(*))``) — the latter keeps the plan free of driver
    scalars (broadcast 1-row cross join, same trick as TPC-H Q22's
    avg-balance).  Output: (user, item=negative, slot) — ~k rows per
    positive minus collisions; the standard corrector is to draw with
    k' > k and cap, which callers get via per_group_cap.

    md5-derived draws keyed on (user, positive item, slot, seed):
    reproducible under any partitioning, replayable in the oracle.
    The anti-join keys on (user, item) — uniform, broadcast-friendly
    when positives-per-user is bounded.
    """
    cand = positives.select(
        F.col(user_col), F.col(item_col).alias("_pos"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot"))
    draw_src = F.concat(F.lit(f"neg:{seed}:"),
                        F.col(user_col).cast("string"), F.lit(":"),
                        F.col("_pos").cast("string"), F.lit(":"),
                        F.col("slot").cast("string"))
    h = F.conv(F.substring(F.md5(draw_src), 1, 15), 16, 10).cast("bigint")
    if isinstance(num_items, int):
        item = F.pmod(h, F.lit(num_items))
        cand = cand.select(user_col, "slot", item.alias(item_col))
    else:
        n_col = num_items.columns[0]
        cand = (cand.crossJoin(F.broadcast(num_items))
                .select(user_col, "slot",
                        F.pmod(h, F.col(n_col)).alias(item_col)))
    return (cand.join(positives.select(user_col, item_col).distinct(),
                      [user_col, item_col], "left_anti")
            .select(user_col, item_col, "slot"))


def per_group_cap(df: DataFrame, group_col: str, id_col: str,
                  cap: int, seed: int = 42) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    hash order (the per-domain cap that stops one crawl domain from
    dominating a corpus).  Ranking window partitioned by group —
    executes as WindowGroupLimit (per-partition top-k heaps), never a
    full per-group sort spill."""
    u = hash_uniform01(id_col, "cap", seed)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))


def length_buckets(df: DataFrame, id_col: str, len_col,
                   edges: list[int]) -> DataFrame:
    """Length-bucketed batching prep: assign each row to the first
    bucket whose upper edge holds its length (rows beyond the last
    edge land in an overflow bucket), and report per-bucket padding
    efficiency — sum(len) / (count * bucket_max_len), the fraction of
    a padded batch that is real tokens.  The standard inference /
    training micro-batching step: batching within a length bucket
    instead of globally cuts padding waste to (1 - efficiency).

    One pass: the bucket id is a CASE expression over literal edges
    (codegen), the report one grain-sized hash-agg."""
    lc = F.col(len_col) if isinstance(len_col, str) else len_col
    b = F.lit(len(edges))
    for i in range(len(edges) - 1, -1, -1):
        b = F.when(lc <= edges[i], F.lit(i)).otherwise(b)
    tagged = df.select(F.col(id_col), lc.alias("_len"),
                       b.alias("bucket"))
    return (tagged.groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.sum("_len").cast("bigint").alias("total_len"),
                 F.max("_len").cast("bigint").alias("max_len"))
            .withColumn("pad_efficiency",
                        F.round(F.col("total_len")
                                / (F.col("n_rows") * F.col("max_len")), 6))
            .withColumn("bucket", F.col("bucket").cast("bigint")))


def pack_manifest(df: DataFrame, id_col: str, tokens_col,
                  budget: int = 512, num_buckets: int = 32) -> DataFrame:
    """One row PER PACKED SEQUENCE from ``pack_sequences``' assignment:
    (bucket, bin, n_docs, fill_tokens, fill_ratio, segments) — the
    loader-side manifest that says which documents compose each
    training sequence and at which token offset each begins (what an
    attention-mask/boundary-aware dataloader consumes).

    ``segments`` is a ';'-joined list of 'id:offset:len' entries
    (offset = cumulative tokens of earlier docs in the same bin,
    deterministically sorted).  Shapes: pack_sequences' bucketed
    prefix-sum window, one more window min per (bucket, bin) for the
    bin base, then a single hash-agg per sequence — no joins, and the
    manifest relation has one row per ~budget tokens, a
    corpus-size/budget reduction.
    """
    cum = _packed_with_cum(df, id_col, tokens_col, budget=budget,
                           num_buckets=num_buckets)
    base = F.min("_cum").over(Window.partitionBy("bucket", "bin"))
    seg = cum.withColumn("_off", F.col("_cum") - base)
    entry = F.concat_ws(":", F.col(id_col).cast("string"),
                        F.col("_off").cast("string"),
                        F.col("tokens").cast("string"))
    return (seg.groupBy("bucket", "bin")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum("tokens").cast("bigint").alias("fill_tokens"),
                 F.collect_list(entry).alias("_e"))
            .select("bucket", "bin", "n_docs", "fill_tokens",
                    F.round(F.col("fill_tokens") / budget, 4)
                    .alias("fill_ratio"),
                    F.array_join(F.array_sort("_e"), ";").alias("segments")))


def pareto_frontier(df: DataFrame, max_col: str, min_col: str,
                    id_col: str, num_buckets: int = 64) -> DataFrame:
    """2-D Pareto-frontier (skyline) selection: keep the rows not
    dominated on (``max_col`` higher-is-better, ``min_col``
    lower-is-better) — the data-selection step "give me the documents
    that are best-quality *for their cost*" (quality vs token count,
    score vs latency, ...).  A row is dominated if some other row is
    >= on the maximized axis and <= on the minimized one with at least
    one strict; among exact (max, min) ties the smallest ``id_col``
    survives.

    The textbook formulation is a running-min window over ONE global
    sort by (max desc, min asc) — which in Spark collapses to a
    single-partition window, the classic scale-killer.  This
    implementation decomposes it exactly:

    - bucket each row by a monotone fixed-width binning of ``max_col``
      (bounds enter as a broadcast 1-row join, no driver scalar);
    - the within-bucket running min is a window PARTITIONED by bucket
      (parallel across buckets);
    - the cross-bucket term — min of ``min_col`` over all strictly
      higher buckets — is a ``num_buckets``-row aggregate with its own
      tiny running-min window, broadcast-joined back.

    Because bucketing is monotone in ``max_col``, min(preceding in the
    global sort) == least(within-bucket running min, higher-bucket
    min), so the result is row-identical to the single-sort skyline an
    oracle engine can run — while the Spark plan has no unpartitioned
    window and scales linearly.  Output: the surviving rows with both
    axes materialized.
    """
    q = F.col(max_col).cast("double")
    t = F.col(min_col).cast("double")
    # a row with a null axis has no defined domination relation (and
    # engines disagree on null placement in DESC sorts) — exclude
    df = df.filter(q.isNotNull() & t.isNotNull())
    bounds = df.agg(F.min(q).alias("_qlo"), F.max(q).alias("_qhi"))
    span = F.col("_qhi") - F.col("_qlo")
    raw = F.floor((q - F.col("_qlo")) / span * num_buckets)
    bucket = F.coalesce(F.least(raw, F.lit(num_buckets - 1)), F.lit(0))
    base = (df.crossJoin(F.broadcast(bounds))
            .select(F.col(id_col), q.alias("_q"), t.alias("_t"),
                    bucket.alias("_bkt")))
    w_in = (Window.partitionBy("_bkt")
            .orderBy(F.col("_q").desc(), F.col("_t").asc(),
                     F.col(id_col).asc())
            .rowsBetween(Window.unboundedPreceding, -1))
    local = base.withColumn("_run_min", F.min("_t").over(w_in))
    w_hi = (Window.orderBy(F.col("_bkt").desc())
            .rowsBetween(Window.unboundedPreceding, -1))
    hi = (base.groupBy("_bkt").agg(F.min("_t").alias("_bmin"))
          .withColumn("_hi_min", F.min("_bmin").over(w_hi))
          .select("_bkt", "_hi_min"))
    inf = F.lit(float("inf"))
    dom = F.least(F.coalesce(F.col("_run_min"), inf),
                  F.coalesce(F.col("_hi_min"), inf))
    return (local.join(F.broadcast(hi), "_bkt")
            .filter(F.col("_t") < dom)
            .select(F.col(id_col),
                    F.col("_q").alias(max_col),
                    F.col("_t").alias(min_col)))


def matched_pairs(df: DataFrame, group_col: str, treat_value: str,
                  control_value: str, match_col, id_col: str,
                  bucket_width: int = 32, seed: int = 42) -> DataFrame:
    """One-to-one matched sampling: pair each row of the treatment
    group with a distinct control-group row of similar ``match_col``
    (e.g. length-matched A/B eval sets, so a quality comparison isn't
    confounded by document size).  Rows are coarsened into fixed-width
    ``match_col`` buckets; within each bucket both groups are ranked by
    a deterministic md5 shuffle and joined on rank, so each bucket
    yields min(n_treat, n_control) pairs and no row is reused.

    Shapes: one ranking window per (bucket, group) — WindowGroupLimit-
    friendly, parallel across buckets — and one equi-join on
    (bucket, rank) whose key space is uniform by construction (ranks),
    so no skew.  Deterministic given the seed; replayable in ANSI SQL.
    """
    mc = F.col(match_col) if isinstance(match_col, str) else match_col
    u = hash_uniform01(id_col, "match", seed)
    ranked = (df.filter(F.col(group_col).isin([treat_value,
                                               control_value]))
              .select(F.col(id_col), F.col(group_col),
                      mc.cast("double").alias("_m"),
                      F.floor(mc / bucket_width).cast("bigint")
                      .alias("_bkt"), u.alias("_u"))
              .withColumn("_rank", F.row_number().over(
                  Window.partitionBy("_bkt", group_col)
                  .orderBy(F.col("_u").asc(), F.col(id_col).asc()))))
    tr = (ranked.filter(F.col(group_col) == treat_value)
          .select(F.col("_bkt"), F.col("_rank"),
                  F.col(id_col).alias("treat_id"),
                  F.col("_m").alias("treat_m")))
    ct = (ranked.filter(F.col(group_col) == control_value)
          .select(F.col("_bkt"), F.col("_rank"),
                  F.col(id_col).alias("control_id"),
                  F.col("_m").alias("control_m")))
    return (tr.join(ct, ["_bkt", "_rank"])
            .select(F.col("_bkt").alias("bucket"), "treat_id",
                    "control_id",
                    F.col("treat_m").cast("bigint").alias("treat_len"),
                    F.col("control_m").cast("bigint")
                    .alias("control_len")))


def token_budget_mix(df: DataFrame, source_col: str, id_col: str,
                     tokens_col, budgets: dict[str, int],
                     default_budget: int = 0,
                     seed: int = 42) -> DataFrame:
    """Select documents per source up to a TOKEN budget (not a row
    count) — the data-mixing step that hits a target corpus composition
    by token mass ("x tokens of web, y of code, z of wiki"), which is
    how pretraining mixes are actually specified.

    Within each source documents are ordered by the md5 hash of their
    id (a deterministic, engine-replayable shuffle) and kept while the
    running token total — INCLUSIVE of the current document — stays
    within the source's budget; sources absent from ``budgets`` get
    ``default_budget`` (0 = excluded).  Greedy-by-hash means the
    selection is stable under corpus growth: adding documents never
    evicts an already-selected one unless its hash precedes theirs.

    One shuffle keyed on source; the running total is a cumulative-sum
    window over that partitioning, so cost is linear in corpus size
    with no joins and no driver state.  A source whose corpus is
    millions of docs is a single window partition — for extreme
    single-source skew, pre-bucket the source by hash range and give
    each bucket budget/n_buckets (same greedy semantics, bounded
    partitions).
    """
    tc = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    b = F.lit(int(default_budget))
    for s, amount in sorted(budgets.items()):
        b = F.when(F.col(source_col) == s, F.lit(int(amount))).otherwise(b)
    u = hash_uniform01(id_col, "mixtok", seed)
    w = (Window.partitionBy(source_col)
         .orderBy(u.asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_tok", tc)
            .withColumn("cum_tokens", F.sum("_tok").over(w))
            .filter(F.col("cum_tokens") <= b)
            .drop("_tok"))


def dsir_weights(df: DataFrame, id_col: str, text_col: str,
                 is_target, num_buckets: int = 256,
                 smoothing: float = 1.0) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) over hashed unigram features: score every document
    by how much more likely its tokens are under a TARGET slice of the
    corpus than under the corpus as a whole.

    ``is_target`` is a boolean Column marking the target distribution
    (e.g. ``F.col("lang") == "en"`` to up-select English-like text).
    Token counts are hashed into ``num_buckets`` buckets (the classic
    hashed n-gram trick — the feature space stays fixed no matter the
    vocabulary), add-``smoothing`` estimates give bucket probabilities
    for target vs corpus, and each document's weight is the MEAN
    log-likelihood ratio of its tokens (mean, not sum, so long
    documents aren't favored).  Sampling proportional to exp(weight)
    reproduces the DSIR selection; downstream callers usually just take
    the top slice.

    Returns (id, n_tokens, weight), weight rounded to 6dp.

    Scale shape: one token explode -> two bucket-grain conditional aggs
    (``num_buckets`` rows, always broadcastable) -> broadcast join back
    to the token stream -> per-doc mean.  No driver state, no global
    window; the bucket table is the only synchronized structure and it
    is O(num_buckets).  md5 bucketing keeps the oracle replayable in
    any engine (fmx.operators.dedup.hash64 arithmetic).
    """
    from fmx.operators.dedup import hash64

    toks = (df.select(F.col(id_col), is_target.alias("_tgt"),
                      F.explode(F.split(F.col(text_col), " "))
                      .alias("_w"))
            .filter(F.col("_w") != "")
            .withColumn("_b", F.pmod(hash64(F.col("_w")),
                                     F.lit(int(num_buckets)))))
    probs = (toks.groupBy("_b")
             .agg(F.count("*").alias("_na"),
                  F.sum(F.when(F.col("_tgt"), 1).otherwise(0))
                  .alias("_nt")))
    # add-k smoothed log ratio; the normalizers are sums OVER the
    # bucket table itself (an unpartitioned window, but over exactly
    # num_buckets rows — a scalar-subquery cross would recompute the
    # whole explode+agg subtree a second time, measured 12 -> 8
    # exchanges and one fewer corpus scan with the window form)
    k = float(smoothing)
    wall = Window.partitionBy()
    b_tbl = (probs
             .withColumn("_tot_all", F.sum("_na").over(wall))
             .withColumn("_tot_tgt", F.sum("_nt").over(wall))
             .select("_b",
                     (F.log((F.col("_nt") + k)
                            / (F.col("_tot_tgt") + k * num_buckets))
                      - F.log((F.col("_na") + k)
                              / (F.col("_tot_all") + k * num_buckets)))
                     .alias("_llr")))
    return (toks.join(F.broadcast(b_tbl), "_b")
            .groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_tokens"),
                 F.round(F.avg("_llr"), 6).alias("weight")))


def time_split_embargo(df: DataFrame, ts_col: str,
                       cut_quantile: float = 0.8,
                       embargo_hours: float = 24.0,
                       out_col: str = "split") -> DataFrame:
    """Temporal train/eval split with a purge gap: rows up to
    (cut - embargo) train, rows after the cut evaluate, and the
    embargo band between them is EXCLUDED from both — the time-series
    discipline that prevents look-ahead leakage through windowed
    features and near-boundary autocorrelation (the purged-split
    recipe from financial ML).

    The cut is the ``cut_quantile`` exact percentile of the epoch
    seconds — data-derived, so the same frame always splits the same
    (no wall clock), and integer-second inputs keep the interpolated
    cut engine-exact for the DuckDB oracle (see quantile_bucketize's
    portability note).

    Scale shape: ONE percentile agg (1 row, broadcast back) + a
    map-side CASE — no shuffle of the data.  Labels: 'train',
    'embargo', 'eval'.
    """
    epoch = F.col(ts_col).cast("double").cast("bigint")
    cut = df.agg(F.percentile(epoch, F.lit(float(cut_quantile)))
                 .alias("_cut"))
    gap = float(embargo_hours) * 3600.0
    # NULL timestamps label NULL, not 'embargo': an unparseable event
    # time is 'unlabelable', and the catch-all otherwise() would
    # silently absorb it into the purge band
    lab = (F.when(epoch.isNull(), F.lit(None).cast("string"))
           .when(epoch.cast("double") <= F.col("_cut") - gap,
                 F.lit("train"))
           .when(epoch.cast("double") > F.col("_cut"), F.lit("eval"))
           .otherwise(F.lit("embargo")))
    return (df.crossJoin(F.broadcast(cut))
            .withColumn(out_col, lab)
            .drop("_cut"))


def group_kfold(df: DataFrame, group_col: str, k: int = 5,
                tag: str = "gkf", seed: int = 7,
                out_col: str = "fold") -> DataFrame:
    """Group k-fold assignment: every row of a group lands in the SAME
    fold (fold = floor(U01(group) * k) from the md5 coin), so
    cross-validation never leaks a group across train/valid — the
    grouped sibling of hash_split, replayable in any engine via the
    documented `_U` SQL template.  Pure map (no shuffle, no state);
    fold balance is multinomial across groups, checked by the
    companion report query.  NULL groups carry no identity to keep
    together — they get a NULL fold; gate or sentinel them upstream."""
    u = hash_uniform01(group_col, tag, seed)
    return df.withColumn(out_col,
                         F.floor(u * int(k)).cast("bigint"))


def negative_downsample(df: DataFrame, label_col, rate: float = 0.1,
                        id_col: str = "id", tag: str = "negds",
                        seed: int = 11) -> DataFrame:
    """CTR-style negative downsampling with importance weights: keep
    every positive, keep negatives with probability ``rate`` (md5
    coin on the id — deterministic, replayable), and attach
    weight = 1 for positives / 1/rate for kept negatives so any
    weighted aggregate over the sample is an unbiased estimate of the
    full data (the standard trick that cuts a 1000:1 imbalanced
    training set to size without biasing the learned base rate —
    recalibrate the intercept or use the weights).

    Pure map: one coin + one filter, no shuffle, no state; rows with
    NULL labels are treated as negatives (they carry no positive
    evidence), and NULL-id negatives coalesce into a deterministic
    sentinel coin (like target_encode_kfold) rather than silently
    dropping — a NULL md5 coin would never satisfy ``u < rate`` and
    bias the 1/rate-weighted estimate.  Returns the kept rows plus a
    ``weight`` column."""
    rate = float(rate)
    if not (0.0 < rate <= 1.0):
        raise ValueError(f"negative_downsample: rate must be in (0, 1], "
                         f"got {rate}")
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    pos = F.coalesce(y.cast("boolean"), F.lit(False))
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    u = hash_uniform01(F.coalesce(idc.cast("string"), F.lit("__null__")),
                       tag, seed)
    kept = df.filter(pos | (u < rate))
    return kept.withColumn(
        "weight", F.when(pos, F.lit(1.0)).otherwise(F.lit(1.0 / rate)))
