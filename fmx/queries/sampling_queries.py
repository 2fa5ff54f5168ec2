"""Sampling/packing queries over documents & events — the
training-data-mix layer, each with a DuckDB oracle replaying the
identical md5-derived coins (see fmx.operators.sampling)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fmx.operators import sampling as SMP
from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"
DEC = "decimal(38,0)"

SEED = 42
_U = ("(CAST(concat('0x', substring(md5(concat('{tag}:{seed}:', "
      "CAST({col} AS VARCHAR))), 1, 15)) AS BIGINT)"
      " / 1152921504606846976.0)")


@query(
    "sample_hash_split",
    oracle=f"""
    WITH u AS (SELECT doc_id,
                      {_U.format(tag='split', seed=SEED, col='doc_id')} AS u
               FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CASE WHEN u < 0.9 THEN 'train'
                WHEN u < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM u
    """)
def sample_hash_split(spark, sf):
    """Deterministic 90/5/5 train/val/test assignment by doc_id hash —
    stable under repartition and corpus growth (unlike randomSplit)."""
    out = SMP.hash_split(T(spark, sf, "documents"), "doc_id",
                         {"train": 0.9, "val": 0.05, "test": 0.05},
                         seed=SEED)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "split")


@query(
    "sample_stratified",
    oracle=f"""
    WITH u AS (SELECT event_id, event_type,
                      {_U.format(tag='strat', seed=SEED, col='event_id')} AS u
               FROM events)
    SELECT CAST(event_id AS BIGINT) AS event_id, event_type
    FROM u
    WHERE u < CASE event_type WHEN 'view' THEN 0.1
                              WHEN 'click' THEN 0.5
                              ELSE 1.0 END
    """)
def sample_stratified(spark, sf):
    """Per-stratum deterministic downsampling (views 10%, clicks 50%,
    everything else kept) — the class-rebalancing scan; no shuffle."""
    out = SMP.stratified_sample(
        T(spark, sf, "events"), "event_type",
        {"view": 0.1, "click": 0.5}, "event_id", seed=SEED,
        default_fraction=1.0)
    return out.select(F.col("event_id").cast("bigint").alias("event_id"),
                      "event_type")


@query(
    "sample_pack_sequences",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             CAST(concat('0x', substring(md5(concat('bucket:',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8
                 AS bucket
      FROM documents),
    packed AS (
      SELECT doc_id, tokens, bucket,
             COALESCE(sum(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum
      FROM base)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, tokens,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(floor(cum / 256) AS BIGINT) AS bin
    FROM packed
    """)
def sample_pack_sequences(spark, sf):
    """Sequence packing: whitespace token counts, 8 hash buckets, 256-
    token bins via per-bucket exclusive prefix sums — the window runs one
    partition per bucket (parallel), never a global ORDER BY."""
    docs = T(spark, sf, "documents")
    out = SMP.pack_sequences(
        docs, "doc_id", F.size(F.split(F.col("text"), " ")),
        budget=256, num_buckets=8)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "tokens",
                      F.col("bucket").cast("bigint").alias("bucket"),
                      "bin")


@query(
    "pipeline_dataprep",
    headline=True,
    oracle=f"""
    WITH q AS (SELECT doc_id, text, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
               FROM documents
               WHERE len(string_split(text, ' ')) >= 5 AND n_chars >= 20),
    keep AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    kept AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
    s AS (SELECT kept.*,
                 CASE WHEN {_U.format(tag='split', seed=SEED, col='doc_id')}
                          < 0.9 THEN 'train'
                      WHEN {_U.format(tag='split', seed=SEED, col='doc_id')}
                          < 0.95 THEN 'val'
                      ELSE 'test' END AS split
          FROM kept)
    SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, lang
    """)
def pipeline_dataprep(spark, sf):
    """End-to-end training-data prep, composing three operator families
    in one plan: quality gate (token/char thresholds, pure column
    expressions on the scan) -> exact dedup -> deterministic hash split
    -> per-(split, lang) corpus stats.

    The dedup keep-min-id rule and the join-back are FUSED into one
    min-struct aggregation (r13 optimization, guide §2.4): grouping on
    md5(text) and taking min(struct(doc_id, lang, n_tokens)) picks
    exactly the row the former ``exact_dedup`` + left-semi join kept
    (struct order is decided by doc_id — the first field, unique per
    row), while carrying that survivor's payload columns through the
    same exchange.  That removes the second full corpus scan, the
    broadcast-exchange build job, and the join from the plan: scan ->
    agg(md5) -> hash-agg(split, lang), nothing else (jobs 4 -> 3).

    Honest trade, verified in the captured plan: min over a struct
    carrying a string is not hash-aggregable, so the md5 group runs as
    SortAggregate (sort by md5 on both sides of the exchange) where
    the unfused dedup used HashAggregate.  The sorted rows are the
    NARROW projection (hash + doc_id + lang + n_tokens, ~60 B — text
    is dropped before the exchange), while the removed work was a
    second full scan of the text column plus its re-tokenization and
    md5 recompute plus a join; at 100 TB the scan dwarfs a narrow
    sort, and locally the A/B measures the shapes within noise of
    each other.  Row-identical to the unfused shape (exactcheck
    sf0.001+sf0.01, byte-exact; the oracle SQL is unchanged)."""
    docs = T(spark, sf, "documents")
    q = (docs
         .withColumn("n_tokens",
                     F.size(F.split(F.col("text"), " ")).cast("bigint"))
         .filter((F.col("n_tokens") >= 5) & (F.col("n_chars") >= 20)))
    kept = (q.groupBy(F.md5(F.col("text")).alias("_h"))
            .agg(F.min(F.struct("doc_id", "lang", "n_tokens"))
                 .alias("_keep"))
            .select(F.col("_keep.doc_id").alias("doc_id"),
                    F.col("_keep.lang").alias("lang"),
                    F.col("_keep.n_tokens").alias("n_tokens")))
    s = SMP.hash_split(kept, "doc_id",
                       {"train": 0.9, "val": 0.05, "test": 0.05}, seed=SEED)
    return (s.groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("total_tokens")))


@query(
    "sample_temperature_mixture",
    oracle=f"""
    WITH counts AS (SELECT source, count(*) AS n FROM documents
                    GROUP BY source),
    p AS (SELECT source,
                 least(1.0, 0.5 * pow((SELECT max(n) FROM counts) * 1.0 / n,
                                      0.5)) AS p
          FROM counts)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source
    FROM documents d JOIN p USING (source)
    WHERE {_U.format(tag='mix', seed=SEED, col='d.doc_id')} < p.p
    """)
def sample_temperature_mixture(spark, sf):
    """Temperature-flattened source mixture (alpha=0.5, largest source
    kept at 50%): per-source keep probabilities from one broadcast-
    joined hash-agg, md5 keep-coins — no driver scalars."""
    out = SMP.temperature_mixture(T(spark, sf, "documents"), "source",
                                  "doc_id", alpha=0.5, largest_frac=0.5,
                                  seed=SEED)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "source")


@query(
    "sample_per_source_cap",
    oracle=f"""
    WITH u AS (SELECT doc_id, source,
                      {_U.format(tag='cap', seed=SEED, col='doc_id')} AS u
               FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source
    FROM u
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY u, doc_id) <= 20
    """)
def sample_per_source_cap(spark, sf):
    """Per-domain cap: at most 20 docs per source, chosen by
    deterministic hash order — WindowGroupLimit plan (per-partition
    heaps), the anti-domination guard for crawl-heavy corpora."""
    out = SMP.per_group_cap(T(spark, sf, "documents"), "source",
                            "doc_id", cap=20, seed=SEED)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "source")


@query(
    "sample_weighted_topk",
    oracle=f"""
    WITH keyed AS (SELECT source, doc_id, n_chars,
                          round(ln({_U.format(tag='wsample', seed=SEED,
                                              col='doc_id')})
                                / CAST(n_chars AS DOUBLE), 12) AS key
                   FROM documents WHERE n_chars > 0)
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY key DESC, doc_id) AS BIGINT)
               AS sample_rank
    FROM keyed
    QUALIFY sample_rank <= 10
    """)
def sample_weighted_topk(spark, sf):
    """Weighted sampling without replacement, 10 docs per source with
    inclusion probability ~ n_chars (Efraimidis-Spirakis exponential
    keys on md5-derived uniforms) — principled length-weighted
    oversampling; executes as WindowGroupLimit per source."""
    out = SMP.weighted_sample_per_group(
        T(spark, sf, "documents"), "source", "doc_id", "n_chars",
        k=10, seed=SEED)
    return out.select("source",
                      F.col("doc_id").cast("bigint").alias("doc_id"),
                      F.col("n_chars").cast("bigint").alias("n_chars"),
                      F.col("sample_rank").cast("bigint")
                      .alias("sample_rank"))


@query(
    "sample_negatives",
    oracle=f"""
    WITH pos AS (SELECT DISTINCT o.o_custkey AS user_id,
                        l.l_partkey AS item_id
                 FROM orders o JOIN lineitem l
                   ON o.o_orderkey = l.l_orderkey),
    n AS (SELECT count(*) AS n_items FROM part),
    cand AS (SELECT user_id, item_id AS pos_item, g.slot
             FROM pos, LATERAL (SELECT unnest(generate_series(0, 3))
                                AS slot) g),
    drawn AS (SELECT user_id, slot,
                     CAST(concat('0x', substring(md5(concat(
                         'neg:{SEED}:', CAST(user_id AS VARCHAR), ':',
                         CAST(pos_item AS VARCHAR), ':',
                         CAST(slot AS VARCHAR))), 1, 15)) AS BIGINT)
                     % (SELECT n_items FROM n) AS item_id
              FROM cand)
    SELECT CAST(d.user_id AS BIGINT) AS user_id,
           CAST(d.item_id AS BIGINT) AS item_id,
           CAST(d.slot AS BIGINT) AS slot
    FROM drawn d LEFT JOIN pos p
      ON d.user_id = p.user_id AND d.item_id = p.item_id
    WHERE p.user_id IS NULL
    """)
def sample_negatives(spark, sf):
    """Deterministic negative sampling over the purchase graph: 4
    md5-derived candidate items per (customer, purchased part),
    anti-joined against the positives — implicit-feedback training
    pairs, reproducible under any partitioning.  The item-count scalar
    enters as a broadcast 1-row join, never a driver collect."""
    orders = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    pos = (orders.join(li, orders.o_orderkey == li.l_orderkey)
           .select(F.col("o_custkey").alias("user_id"),
                   F.col("l_partkey").alias("item_id"))
           .distinct())
    n_items = T(spark, sf, "part").agg(F.count("*").alias("n_items"))
    out = SMP.negative_sample(pos, "user_id", "item_id", n_items,
                              k=4, seed=SEED)
    return out.select(F.col("user_id").cast("bigint").alias("user_id"),
                      F.col("item_id").cast("bigint").alias("item_id"),
                      F.col("slot").cast("bigint").alias("slot"))


LB_EDGES = [64, 128, 256, 512]


@query(
    "sample_length_buckets",
    oracle=f"""
    WITH lens AS (SELECT doc_id,
                         CAST(len(string_split(text, ' ')) AS BIGINT)
                             AS n_tok
                  FROM documents),
    tagged AS (SELECT doc_id, n_tok,
                      CASE WHEN n_tok <= 64 THEN 0
                           WHEN n_tok <= 128 THEN 1
                           WHEN n_tok <= 256 THEN 2
                           WHEN n_tok <= 512 THEN 3
                           ELSE 4 END AS bucket
               FROM lens)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_tok) AS BIGINT) AS total_len,
           CAST(max(n_tok) AS BIGINT) AS max_len,
           round(sum(n_tok) * 1.0 / (count(*) * max(n_tok)), 6)
               AS pad_efficiency
    FROM tagged GROUP BY bucket
    """)
def sample_length_buckets(spark, sf):
    """Length-bucketed batching report: documents assigned to token-
    length buckets (64/128/256/512/overflow) with per-bucket padding
    efficiency — the batch-shaping step that keeps padded-token waste
    bounded at inference/training time.  Bucket id is a literal CASE
    (codegen); the report is one grain-sized agg."""
    from fmx.operators.sampling import length_buckets

    d = T(spark, sf, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint")
        .alias("n_tok"))
    out = length_buckets(d, "doc_id", "n_tok", LB_EDGES)
    return out.select("bucket", "n_rows", "total_len", "max_len",
                      "pad_efficiency")


@query(
    "sample_pack_manifest",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
             CAST(concat('0x', substring(md5(concat('bucket:',
                 CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 8 AS bucket
      FROM documents),
    cum AS (
      SELECT doc_id, tokens, bucket,
             coalesce(sum(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
      FROM base),
    seg AS (
      SELECT doc_id, tokens, bucket, c // 512 AS bin,
             c - min(c) OVER (PARTITION BY bucket, c // 512) AS off
      FROM cum)
    SELECT CAST(bucket AS BIGINT) AS bucket, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS fill_tokens,
           round(sum(tokens) * 1.0 / 512, 4) AS fill_ratio,
           array_to_string(list(e ORDER BY e), ';') AS segments
    FROM (SELECT bucket, bin, tokens,
                 doc_id || ':' || off || ':' || tokens AS e
          FROM seg)
    GROUP BY bucket, bin
    """)
def sample_pack_manifest(spark, sf):
    """Packed-sequence manifests (512-token budget, 8 hash buckets):
    one row per training sequence with its 'id:offset:len' document
    segments — what a boundary-aware dataloader consumes.  Bucketed
    prefix-sum windows + one hash-agg; the output relation shrinks the
    corpus by ~budget x."""
    from fmx.operators.sampling import pack_manifest

    docs = T(spark, sf, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    return pack_manifest(docs.select("doc_id", toks.alias("ws_tokens")),
                         "doc_id", "ws_tokens", budget=512, num_buckets=8)


@query(
    "sample_interleaved_order",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
                 AS rn,
             dense_rank() OVER (ORDER BY source) - 1 AS si,
             count(DISTINCT source) OVER () AS ns
      FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(rn * ns + si AS BIGINT) AS interleave_rank
    FROM ranked
    """)
def sample_interleaved_order(spark, sf):
    """Deterministic round-robin interleave across sources:
    interleave_rank = round_within_source * n_sources + source_index —
    reading in rank order cycles one doc per source (the curriculum /
    mixing order that keeps every batch source-balanced without
    shuffling rows).  One shuffle on source for the within-source
    ranks; the source index comes from a ranking window over the
    DISTINCT-sources relation (#sources rows, then a broadcast join
    back — a dense_rank window directly over the doc relation would
    funnel the whole corpus through one task) and the source count is
    a broadcast 1-row join; no global sort is ever executed — the rank
    is a COLUMN, consumed by whatever ordered writer needs it."""
    from pyspark.sql import Window

    docs = T(spark, sf, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("doc_id")
    ns = docs.agg(F.countDistinct("source").alias("_ns"))
    srcs = (docs.select("source").distinct()
            .withColumn("si", F.row_number().over(
                Window.orderBy("source")) - 1))
    ranked = (docs
              .withColumn("rn", F.row_number().over(w) - 1)
              .join(F.broadcast(srcs), "source")
              .crossJoin(F.broadcast(ns)))
    return ranked.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source",
        (F.col("rn") * F.col("_ns") + F.col("si")).cast("bigint")
        .alias("interleave_rank"))


_BUDGETS = {f"src{i}": (1200 if i < 10 else 500) for i in range(20)}
_HI = ", ".join(f"'src{i}'" for i in range(10))


@query(
    "sample_token_budget_mix",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS toks,
             {_U.format(tag='mixtok', seed=SEED, col='doc_id')} AS u
      FROM documents),
    cum AS (
      SELECT doc_id, source, toks,
             sum(toks) OVER (PARTITION BY source ORDER BY u, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM tok)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum
    WHERE cum_tokens <= CASE WHEN source IN ({_HI}) THEN 1200 ELSE 500 END
    """)
def sample_token_budget_mix(spark, sf):
    """Token-budget data mixing: each source contributes documents (in
    deterministic md5-hash order) until its TOKEN budget is exhausted —
    corpus composition specified by token mass, the way pretraining
    mixes are actually written down.  One shuffle on source + one
    cumulative-sum window; linear in corpus size, no joins
    (fmx.operators.sampling.token_budget_mix)."""
    docs = T(spark, sf, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    out = SMP.token_budget_mix(docs, "source", "doc_id", toks,
                               budgets=_BUDGETS, default_budget=500,
                               seed=SEED)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "source",
                      F.col("cum_tokens").cast("bigint")
                      .alias("cum_tokens"))


@query(
    "sample_curriculum_ntile",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, n_chars,
             ntile(4) OVER (ORDER BY n_chars, doc_id) AS stage,
             {_U.format(tag='curr', seed=SEED, col='doc_id')} AS u
      FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(stage AS BIGINT) AS stage,
           CAST(row_number() OVER (PARTITION BY stage ORDER BY u, doc_id)
                AS BIGINT) AS stage_rank
    FROM staged
    """)
def sample_curriculum_ntile(spark, sf):
    """Curriculum staging: quartile documents by a difficulty proxy
    (length) into 4 stages, with a deterministic md5-shuffled order
    inside each stage — the easy-to-hard training schedule as two
    window columns.  The ntile is a global ORDER BY at sandbox scale;
    the documented scale path replaces it with approx-quantile edges
    (profile_quantiles) + a CASE bucket, turning the stage id into a
    map-only expression; the within-stage rank stays a per-stage
    window either way."""
    from pyspark.sql import Window

    docs = T(spark, sf, "documents").select("doc_id", "n_chars")
    u = SMP.hash_uniform01("doc_id", "curr", SEED)
    staged = docs.withColumn(
        "stage", F.ntile(4).over(Window.orderBy("n_chars", "doc_id")))
    return (staged
            .withColumn("stage_rank", F.row_number().over(
                Window.partitionBy("stage").orderBy(u.asc(),
                                                    F.col("doc_id"))))
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    F.col("stage").cast("bigint").alias("stage"),
                    F.col("stage_rank").cast("bigint").alias("stage_rank")))


@query(
    "sample_pareto_frontier",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) AS q,
             -CAST(len(string_split(text, ' ')) AS DOUBLE) AS t
      FROM documents),
    m AS (
      SELECT doc_id, q, t,
             min(t) OVER (ORDER BY q DESC, t ASC, doc_id ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS dm
      FROM base)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           ROUND(q, 6) AS lex_div,
           CAST(-t AS BIGINT) AS tokens
    FROM m
    WHERE dm IS NULL OR t < dm
    """)
def sample_pareto_frontier(spark, sf):
    """Pareto-frontier data selection: the documents not dominated on
    (lexical diversity ^, token count ^) — no other document is both
    more diverse AND longer, the "richest documents" selection curve.
    The oracle replays the textbook single-sort skyline; the Spark plan
    is the exact bucketed decomposition (per-bucket running min + a
    64-row cross-bucket min, no unpartitioned window —
    fmx.operators.sampling.pareto_frontier)."""
    docs = T(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks)).alias("lex_div"),
        (-F.size(toks).cast("double")).alias("neg_tokens"))
    out = SMP.pareto_frontier(base, "lex_div", "neg_tokens", "doc_id",
                              num_buckets=64)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      F.round("lex_div", 6).alias("lex_div"),
                      (-F.col("neg_tokens")).cast("bigint")
                      .alias("tokens"))


@query(
    "sample_matched_pairs",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             CAST(floor(n_chars / 128) AS BIGINT) AS bkt,
             row_number() OVER (
               PARTITION BY CAST(floor(n_chars / 128) AS BIGINT), lang
               ORDER BY {_U.format(tag='match', seed=SEED, col='doc_id')},
                        doc_id) AS rnk
      FROM documents WHERE lang IN ('en', 'de'))
    SELECT t.bkt AS bucket,
           CAST(t.doc_id AS BIGINT) AS treat_id,
           CAST(c.doc_id AS BIGINT) AS control_id,
           CAST(t.n_chars AS BIGINT) AS treat_len,
           CAST(c.n_chars AS BIGINT) AS control_len
    FROM ranked t JOIN ranked c
      ON t.bkt = c.bkt AND t.rnk = c.rnk
    WHERE t.lang = 'en' AND c.lang = 'de'
    """)
def sample_matched_pairs(spark, sf):
    """Length-matched one-to-one pairing of English vs German documents
    (128-char buckets, deterministic md5 shuffle within bucket) — the
    matched-control eval-set builder that removes length as a
    confounder.  Per-(bucket, group) ranking windows + one equi-join on
    (bucket, rank): uniform join keys, no skew, no global window
    (fmx.operators.sampling.matched_pairs)."""
    out = SMP.matched_pairs(T(spark, sf, "documents"), "lang", "en",
                            "de", "n_chars", "doc_id",
                            bucket_width=128, seed=SEED)
    return out.select(F.col("bucket").cast("bigint").alias("bucket"),
                      F.col("treat_id").cast("bigint").alias("treat_id"),
                      F.col("control_id").cast("bigint")
                      .alias("control_id"),
                      "treat_len", "control_len")


DSIR_BUCKETS = 256
DSIR_TOPK = 50
_H64 = "CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


@query(
    "select_importance_dsir",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang = 'en' AS tgt,
                         unnest(string_split(text, ' ')) AS w
                  FROM documents),
    tf AS (SELECT doc_id, tgt,
                  {_H64.format(expr='w')} % {DSIR_BUCKETS} AS b
           FROM toks WHERE w <> ''),
    probs AS (SELECT b, count(*) AS na,
                     sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS nt
              FROM tf GROUP BY b),
    tot AS (SELECT sum(na) AS n_all, sum(nt) AS n_tgt FROM probs),
    btbl AS (SELECT b, ln((nt + 1.0) / (n_tgt + {DSIR_BUCKETS}.0))
                       - ln((na + 1.0) / (n_all + {DSIR_BUCKETS}.0)) AS llr
             FROM probs, tot),
    doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   round(avg(llr), 6) AS weight
            FROM tf JOIN btbl USING (b) GROUP BY doc_id)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens, weight FROM doc
    QUALIFY row_number() OVER (ORDER BY weight DESC, doc_id) <= {DSIR_TOPK}
    """)
def select_importance_dsir(spark, sf):
    """DSIR data selection (hashed-unigram importance resampling,
    arXiv:2302.03169): score every document by the mean log-likelihood
    ratio of its tokens under the English slice vs the whole corpus,
    keep the top 50.  The scalable shape is one token explode + a
    256-row bucket table broadcast back — no vocabulary-sized state,
    no global window (the final top-k is a TakeOrdered over doc-grain
    scores)."""
    out = SMP.dsir_weights(T(spark, sf, "documents"), "doc_id", "text",
                           F.col("lang") == "en",
                           num_buckets=DSIR_BUCKETS)
    return (out.orderBy(F.col("weight").desc(), "doc_id")
            .limit(DSIR_TOPK)
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    "n_tokens", "weight"))


@query(
    "sample_group_split",
    oracle="""
    WITH src AS (SELECT DISTINCT source FROM documents),
    coin AS (SELECT source,
                    CAST(concat('0x', substring(md5(concat('split:11:',
                         source)), 1, 15)) AS BIGINT)
                    / 1152921504606846976.0 AS u
             FROM src),
    asg AS (SELECT source,
                   CASE WHEN u < 0.8 THEN 'train' ELSE 'val' END AS split
            FROM coin)
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents d JOIN asg ON d.source = asg.source
    GROUP BY split
    """)
def sample_group_split(spark, sf):
    """Group-aware train/val split (the GroupKFold discipline): the
    hash coin flips on the SOURCE, so every document of a source lands
    in the same slice — near-duplicates and style leakage within a
    source can never straddle the eval boundary, the failure mode a
    row-level split invites.  Assignment costs one distinct + a
    broadcastable join; per-slice stats prove the allocation.  Same
    deterministic md5 coin as hash_split — stable under reprocessing
    and corpus growth."""
    docs = T(spark, sf, "documents")
    src = docs.select("source").distinct()
    asg = SMP.hash_split(src, "source", {"train": 0.8, "val": 0.2},
                         seed=11)
    return (docs.join(F.broadcast(asg), "source")
            .groupBy("split")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.countDistinct("source").cast("bigint")
                 .alias("n_sources"),
                 F.sum("n_chars").cast("bigint").alias("total_chars")))


NEY_BUDGET = 1000


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH strata AS (SELECT source, count(*) AS n_h,
                           coalesce(stddev_samp(n_chars), 0.0) AS sd_h
                    FROM documents GROUP BY source),
    wt AS (SELECT source, n_h, sd_h, n_h * sd_h AS w FROM strata),
    tot AS (SELECT sum(w) AS tw FROM wt)
    SELECT source, CAST(n_h AS BIGINT) AS n_h,
           round(sd_h, 4) AS sd_h,
           round(w / tw, 6) AS share,
           CAST(CAST(floor({NEY_BUDGET} * w / tw) AS BIGINT)
                AS BIGINT) AS alloc
    FROM wt, tot
    """)
def sample_neyman_allocation(spark, sf):
    """Neyman (variance-optimal) sample allocation across source
    strata for a 1000-doc labeling/eval budget: each stratum
    gets budget * N_h*sd_h / sum(N*sd) — big AND internally varied
    sources get the labels, uniform ones don't waste them.  The
    minimum-variance allocation for stratified estimation of the mean;
    one stratum-grain agg + a 1-row total broadcast.  floor() keeps
    the per-stratum count integer (both engines floor identically on
    the same double)."""
    # singleton strata have undefined sample sd -> coalesce to 0:
    # they get zero Neyman budget (a defined allocation, not a NULL
    # that silently drops out of the denominator)
    strata = (T(spark, sf, "documents")
              .groupBy("source")
              .agg(F.count("*").alias("n_h"),
                   F.coalesce(F.stddev_samp("n_chars"), F.lit(0.0))
                   .alias("sd_h")))
    wt = strata.withColumn("w", F.col("n_h") * F.col("sd_h"))
    tot = wt.agg(F.sum("w").alias("tw"))
    return (wt.crossJoin(F.broadcast(tot))
            .select("source",
                    F.col("n_h").cast("bigint").alias("n_h"),
                    F.round("sd_h", 4).alias("sd_h"),
                    F.round(F.col("w") / F.col("tw"), 6).alias("share"),
                    F.floor(NEY_BUDGET * F.col("w") / F.col("tw"))
                    .cast("bigint").alias("alloc")))


@query(
    "sample_class_balance",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mn AS (SELECT min(n) AS m FROM c),
    r AS (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang
                     ORDER BY md5(concat('bal:7:',
                                  CAST(doc_id AS VARCHAR))), doc_id)
                     AS rn
          FROM documents),
    kept AS (SELECT r.lang FROM r, mn WHERE r.rn <= mn.m)
    SELECT c.lang, CAST(c.n AS BIGINT) AS n_before,
           CAST(k.n_after AS BIGINT) AS n_after
    FROM c JOIN (SELECT lang, count(*) AS n_after FROM kept
                 GROUP BY lang) k ON c.lang = k.lang
    """)
def sample_class_balance(spark, sf):
    """Class-balanced downsampling: every language capped at the
    MINORITY class size, members chosen by a deterministic md5 coin
    (stable under reprocessing — the same docs survive every run) —
    the class-rebalance step before training a classifier on skewed
    labels.  The min-count enters as a 1-row broadcast, never a
    driver scalar; the per-class ranking window is the same
    per-group-cap shape as web domain caps (partition = class)."""
    from pyspark.sql import Window

    docs = T(spark, sf, "documents")
    c = docs.groupBy("lang").agg(F.count("*").alias("n"))
    mn = c.agg(F.min("n").alias("m"))
    coin = F.md5(F.concat(F.lit("bal:7:"),
                          F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(coin, "doc_id")
    kept = (docs.withColumn("rn", F.row_number().over(w))
            .crossJoin(F.broadcast(mn))
            .filter(F.col("rn") <= F.col("m"))
            .groupBy("lang").agg(F.count("*").alias("n_after")))
    return (c.join(kept, "lang")
            .select("lang", F.col("n").cast("bigint").alias("n_before"),
                    F.col("n_after").cast("bigint").alias("n_after")))


@query(
    "sample_time_split_embargo",
    oracle="""
    WITH e AS (SELECT event_id,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ep
               FROM events),
    c AS (SELECT quantile_cont(ep, 0.8) AS cut FROM e)
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CASE WHEN ep IS NULL THEN NULL
                WHEN ep <= cut - 86400.0 THEN 'train'
                WHEN ep > cut THEN 'eval'
                ELSE 'embargo' END AS split
    FROM e, c
    """)
def sample_time_split_embargo(spark, sf):
    """Temporal split with a 24h purge gap (fmx.operators.sampling.
    time_split_embargo): train up to the p80 timestamp minus the
    embargo, eval strictly after the cut, the band between excluded
    from both — the purged time-series split that stops look-ahead
    leakage through windowed features.  One percentile agg (1-row
    broadcast) + a map-side CASE; the cut is data-derived (no wall
    clock) and integer epoch seconds keep it engine-exact."""
    from fmx.operators.sampling import time_split_embargo

    ev = T(spark, sf, "events").select("event_id", "ts")
    out = time_split_embargo(ev, "ts", cut_quantile=0.8,
                             embargo_hours=24.0)
    return out.select(F.col("event_id").cast("bigint").alias("event_id"),
                      "split")


_GKF_U = _U.format(tag="gkf", seed=7, col="user_id")


@query(
    "sample_group_kfold",
    oracle=f"""
    WITH f AS (SELECT user_id,
                      CASE WHEN user_id IS NULL THEN NULL
                           ELSE CAST(floor({_GKF_U} * 5) AS BIGINT)
                      END AS fold
               FROM events)
    SELECT fold, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_groups
    FROM f GROUP BY fold
    """)
def sample_group_kfold(spark, sf):
    """Group 5-fold assignment report over events
    (fmx.operators.sampling.group_kfold): every row of a user lands
    in the same fold (fold = floor(U01(user) * 5) from the md5 coin),
    so cross-validation never leaks a user across train/valid — the
    grouped sibling of sample_hash_split.  The assignment is a pure
    map; this report is one (fold) agg with a distinct-count (exact
    here; the documented 100TB swap is approx_count_distinct at the
    same contract)."""
    from fmx.operators.sampling import group_kfold

    ev = group_kfold(T(spark, sf, "events"), "user_id", k=5,
                     tag="gkf", seed=7)
    return (ev.groupBy("fold")
            .agg(F.count("*").cast("bigint").alias("n_rows"),
                 F.countDistinct("user_id").cast("bigint")
                 .alias("n_groups")))


# coalesce matches negative_downsample's NULL-id sentinel coin
_NDS_U = _U.format(tag="negds", seed=11,
                   col="coalesce(CAST(event_id AS VARCHAR), '__null__')")
NDS_RATE = 0.1


@query(
    "sample_negative_downsample",
    oracle=f"""
    WITH t AS (SELECT event_type,
                      CASE WHEN event_type = 'purchase' THEN TRUE
                           ELSE FALSE END AS pos,
                      {_NDS_U} AS u
               FROM events),
    k AS (SELECT event_type, pos FROM t
          WHERE pos OR u < {NDS_RATE})
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
           CAST(sum(CASE WHEN pos THEN 1.0 ELSE {1.0 / NDS_RATE} END)
                AS BIGINT) AS est_rows
    FROM k GROUP BY event_type
    """)
def sample_negative_downsample(spark, sf):
    """CTR-style negative downsampling report
    (fmx.operators.sampling.negative_downsample): keep every purchase
    (positive), keep 10% of other events by md5 coin, weight kept
    negatives 1/rate — per event_type the kept count and the
    weight-sum estimate of the ORIGINAL row count (unbiased: the
    est_rows column is what any weighted aggregate over the sample
    reconstructs).  Pure map + one agg; weights are exact decimals
    (1/0.1 = 10.0) so the weight sum is integer-valued and
    engine-exact."""
    from fmx.operators.sampling import negative_downsample

    ev = T(spark, sf, "events")
    kept = negative_downsample(
        ev, (F.col("event_type") == "purchase"), rate=NDS_RATE,
        id_col="event_id", tag="negds", seed=11)
    return (kept.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n_kept"),
                 F.sum((F.col("weight") == 1.0).cast("long"))
                 .cast("bigint").alias("n_pos"),
                 F.sum("weight").cast("bigint").alias("est_rows")))


@query(
    "sample_dup_aware_weights",
    oracle="""
    WITH h AS (SELECT doc_id, md5(text) AS ch FROM documents),
    grp AS (SELECT ch, CAST(count(*) AS BIGINT) AS n
            FROM h GROUP BY 1)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           n AS group_size,
           round(1.0 / n, 6) AS weight
    FROM h JOIN grp USING (ch)
    """)
def sample_dup_aware_weights(spark, sf):
    """Duplicate-aware training weights: every document in an exact-
    duplicate group (md5 content hash) gets weight 1/group_size, so a
    page crawled 40 times contributes ONE document's worth of
    gradient instead of 40 — the soft alternative to dropping
    duplicates outright (keeps provenance diversity, kills the
    memorization multiplier).  One hash-agg to group sizes + one
    equi-join back on the content hash; unique docs stay at exactly
    1.0, and the sum of weights equals the number of DISTINCT
    contents by construction.  Integer until the one division."""
    h = T(spark, sf, "documents").select(
        "doc_id", F.md5("text").alias("ch"))
    grp = h.groupBy("ch").agg(F.count("*").cast("bigint").alias("n"))
    return (h.join(grp, "ch")
            .select(F.col("doc_id").cast("bigint").alias("doc_id"),
                    F.col("n").alias("group_size"),
                    F.round(1.0 / F.col("n"), 6).alias("weight")))


PPS_DRAWS = 20


@query(
    "sample_pps_systematic",
    oracle=f"""
    WITH c AS (SELECT concat(coalesce(event_type, '__null__'), ':',
                      coalesce(json_extract_string(props, '$.k'),
                               '__null__')) AS cat,
                      count(*) AS n
               FROM events GROUP BY 1),
    cum AS (SELECT cat, CAST(n AS BIGINT) AS n,
                   CAST(sum(n) OVER (ORDER BY cat
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM c),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
    sel AS (SELECT cat, n, cum,
                   (cum * {PPS_DRAWS}) // nt
                   - ((cum - n) * {PPS_DRAWS}) // nt AS n_draws
            FROM cum CROSS JOIN tot)
    SELECT cat AS category, n AS n_rows,
           cum AS cum_rows,
           CAST(n_draws AS BIGINT) AS n_draws
    FROM sel WHERE n_draws >= 1
    """)
def sample_pps_systematic(spark, sf):
    """Systematic probability-proportional-to-size sampling of
    categories (PPS_DRAWS=20 over the event_type x props.k cross):
    walk the cumulative-size axis and take a draw every total/20
    rows, so a category's selection count is floor(cum*m/N) -
    floor(prev_cum*m/N) — inclusion probability exactly proportional
    to size, zero randomness, and categories larger than one stride
    legitimately draw multiple times (the classic PPS-with-certainty
    case, reported in n_draws).  The survey-sampling design primitive
    next to Neyman allocation (variance-based) and temperature
    mixture (power-law flattening).  INTEGER end to end: cum*m fits
    BIGINT at any corpus below 9e18/m rows, and both engines agree
    bit-for-bit.  One category-grain agg, a cumulative window over the
    bounded category relation, a 1-row total broadcast."""
    ev = T(spark, sf, "events").select(
        F.concat(F.coalesce("event_type", F.lit("__null__")), F.lit(":"),
                 F.coalesce(F.get_json_object("props", "$.k"),
                            F.lit("__null__"))).alias("cat"))
    c = ev.groupBy("cat").agg(F.count("*").alias("n"))
    from pyspark.sql import Window
    w = Window.orderBy("cat").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    cum = c.select("cat", F.col("n").cast("bigint").alias("n"),
                   F.sum("n").over(w).cast("bigint").alias("cum"))
    tot = c.agg(F.sum("n").cast("bigint").alias("nt"))
    sel = (cum.crossJoin(F.broadcast(tot))
           .select("cat", "n", "cum",
                   (F.expr(f"(cum * {PPS_DRAWS}) div nt")
                    - F.expr(f"((cum - n) * {PPS_DRAWS}) div nt"))
                   .cast("bigint").alias("n_draws")))
    return (sel.filter(F.col("n_draws") >= 1)
            .select(F.col("cat").alias("category"),
                    F.col("n").alias("n_rows"),
                    F.col("cum").alias("cum_rows"),
                    "n_draws"))


N_SKFOLDS = 5


@query(
    "sample_stratified_kfold",
    oracle=f"""
    WITH u AS (SELECT doc_id, lang,
                      {_U.format(tag='skf', seed=SEED, col='doc_id')} AS u
               FROM documents),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY u, doc_id) AS rn
          FROM u),
    f AS (SELECT lang, CAST((rn - 1) % {N_SKFOLDS} AS BIGINT) AS fold,
                 doc_id
          FROM r)
    SELECT lang, fold, CAST(count(*) AS BIGINT) AS n,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc
    FROM f GROUP BY 1, 2
    """)
def sample_stratified_kfold(spark, sf):
    """Stratified k-fold assignment (k={N_SKFOLDS}, strata = lang):
    documents are shuffled WITHIN their stratum by a seeded md5 coin
    and dealt round-robin, so every fold holds each language in
    proportion (class-balanced CV — plain hash-mod folds drift on
    small strata; sample_group_kfold prevents leakage, this prevents
    imbalance).  Emitted at (lang, fold) grain with id checksums so
    the oracle verifies the exact assignment, not just the counts.
    Scale note: the rank window is per-stratum; for strata too large
    to sort, swap in the hash-mod approximation — the curve of this
    query is the evidence for when that trade is safe."""
    docs = T(spark, sf, "documents")
    u = docs.select("doc_id", "lang",
                    SMP.hash_uniform01("doc_id", "skf", SEED).alias("u"))
    w = Window.partitionBy("lang").orderBy("u", "doc_id")
    f = u.select("lang", "doc_id",
                 ((F.row_number().over(w) - 1) % N_SKFOLDS).cast("bigint")
                 .alias("fold"))
    return (f.groupBy("lang", "fold")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.min("doc_id").cast("bigint").alias("min_doc"),
                 F.sum("doc_id").cast("bigint").alias("sum_doc")))


# Poisson(1) inverse-CDF thresholds as DECIMAL LITERALS: both engines
# parse the identical decimal string to the identical double, so the
# md5 coin comparison below can never disagree (computing exp(-1)/k!
# at runtime could differ by 1 ulp between libm and java.lang.Math).
_POIS = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
         0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
         0.999916758850712, 0.9999897508033253]
_PB_B = 16          # bootstrap replicates


@query(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(generate_series(0, {_PB_B - 1})) AS b),
    draws AS (
      SELECT event_type AS et, b,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent,
             {_U.format(tag='pboot', seed=SEED,
                        col="concat(event_id, ':', b)")} AS u
      FROM events CROSS JOIN reps
      WHERE value IS NOT NULL),
    wtd AS (SELECT et, b, cent,
                   CASE {' '.join(f"WHEN u < {t} THEN {k}"
                                  for k, t in enumerate(_POIS))}
                        ELSE 8 END AS w
            FROM draws),
    means AS (SELECT et, b,
                     CAST(sum(CAST(w AS DECIMAL(38,0)) * cent)
                          AS DOUBLE)
                     / (100.0 * sum(w)) AS m
              FROM wtd GROUP BY et, b
              HAVING sum(w) > 0)
    SELECT et AS event_type,
           CAST(count(*) AS BIGINT) AS n_replicates,
           round(avg(m), 6) AS boot_mean,
           round(sqrt(avg(m * m) - avg(m) * avg(m)), 6) AS boot_se,
           round(min(m), 6) AS boot_min,
           round(max(m), 6) AS boot_max
    FROM means GROUP BY et ORDER BY et
    """)
def sample_poisson_bootstrap(spark, sf):
    """Poisson bootstrap of each event type's mean value: the
    SCALABLE bootstrap — instead of resampling n rows B times
    (impossible distributed: needs global n and coordinated draws),
    every row independently receives a Poisson(1) replicate weight,
    which converges to multinomial resampling at corpus n.  Weights
    come from the md5 coin through LITERAL inverse-CDF thresholds (so
    DuckDB replays them bit-for-bit); every replicate mean is one
    exact-integer division (cents x integer weights); the B=16
    replicate spread gives the bootstrap mean/SE/range per group.
    One map-side explode of the replicate array + one groupBy — no
    per-replicate pass over the data."""
    ev = (T(spark, sf, "events")
          .filter(F.col("value").isNotNull())
          .select(F.col("event_type").alias("et"), "event_id",
                  F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                  .alias("cent")))
    draws = (ev.withColumn("b", F.explode(F.sequence(
                 F.lit(0), F.lit(_PB_B - 1))))
             .withColumn("u", SMP.hash_uniform01(
                 F.concat(F.col("event_id").cast("string"), F.lit(":"),
                          F.col("b").cast("string")), "pboot", SEED)))
    w = F.lit(8)
    for k, t in reversed(list(enumerate(_POIS))):
        w = F.when(F.col("u") < t, F.lit(k)).otherwise(w)
    DEC = "decimal(38,0)"
    means = (draws.withColumn("w", w)
             .groupBy("et", "b")
             .agg((F.sum(F.col("w").cast(DEC) * F.col("cent"))
                   .cast("double")
                   / (100.0 * F.sum("w"))).alias("m"),
                  F.sum("w").alias("_sw"))
             .filter(F.col("_sw") > 0))
    m = F.col("m")
    return (means.groupBy(F.col("et").alias("event_type"))
            .agg(F.count("*").cast("bigint").alias("n_replicates"),
                 F.round(F.avg(m), 6).alias("boot_mean"),
                 F.round(F.sqrt(F.avg(m * m) - F.avg(m) * F.avg(m)), 6)
                 .alias("boot_se"),
                 F.round(F.min(m), 6).alias("boot_min"),
                 F.round(F.max(m), 6).alias("boot_max")))


