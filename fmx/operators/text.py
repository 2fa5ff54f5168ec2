"""Text analysis operators for training-data pipelines: token statistics,
quality scoring, language ID, token counting, fingerprinting.

All formulas are pure column expressions (no UDFs) chosen to be
replayable in ANSI SQL so every operator carries a DuckDB oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "token_stats", "quality_score", "language_id", "token_counts",
    "fingerprint", "vocab_topk", "ngram_contamination",
    "repetition_stats", "chunk_tokens", "redact_text", "STOPWORDS",
    "tfidf_top_terms", "bigram_perplexity", "hashed_linear_score",
    "inverted_index", "char_entropy", "vocab_kl_by_group",
    "bm25_topk", "dirichlet_ql_topk", "cluster_terms",
    "boilerplate_strip", "bpe_pair_counts",
    "readability", "charset_profile", "pmi_bigrams", "gopher_filters",
    "passage_dedup", "mattr_diversity",
]

# small stopword lists per language for the n-gram/stopword heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "es": ["el", "la", "de", "y", "los", "que", "un"],
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

_PUNCT_RE = "[^a-zA-Z0-9 ]"
_DIGIT_RE = "[0-9]"


def _toks(text_col: str):
    return F.split(F.col(text_col), " ")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document stats: n_chars, n_tokens, avg_token_len,
    stopword_ratio (en), punct_ratio, digit_ratio."""
    t = _toks(text_col)
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(t), sw))
    # token-level stopword hits (with multiplicity), fully native:
    n_stop_tf = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        n_chars.cast("bigint").alias("n_chars"),
        n_tok.cast("bigint").alias("n_tokens"),
        F.round((n_chars - (n_tok - 1)) / n_tok, 6).alias("avg_token_len"),
        F.round(n_stop_tf / n_tok, 6).alias("stopword_ratio"),
        # nullif guards ANSI divide-by-zero on empty documents
        F.round(F.regexp_count(F.col(text_col), F.lit(_PUNCT_RE))
                / F.nullif(n_chars, F.lit(0)), 6).alias("punct_ratio"),
        F.round(F.regexp_count(F.col(text_col), F.lit(_DIGIT_RE))
                / F.nullif(n_chars, F.lit(0)), 6).alias("digit_ratio"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality in [0,1]: rewards length (log tokens) and
    stopword presence, penalizes punctuation/digit density — the
    C4/Gopher-style rule-based filter family, as one expression."""
    stats = token_stats(df, id_col, text_col)
    raw = (0.2 * F.log(F.col("n_tokens") + 1)
           + 2.0 * F.col("stopword_ratio")
           - 3.0 * F.col("punct_ratio")
           - 2.0 * F.col("digit_ratio"))
    return stats.select(
        id_col,
        F.round(F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw)), 6)
         .alias("quality"))


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language ID: score_lang = fraction of tokens in
    that language's stopword list; prediction = argmax with a fixed
    priority order (en, de, es, fr) on ties."""
    t = _toks(text_col)
    n_tok = F.size(t)
    scores = {}
    for lang, words in STOPWORDS.items():
        sw = F.array([F.lit(w) for w in words])
        scores[lang] = F.size(F.filter(t, lambda x: F.array_contains(sw, x))) / n_tok
    pred = (F.when((scores["en"] >= scores["de"])
                   & (scores["en"] >= scores["es"])
                   & (scores["en"] >= scores["fr"]), "en")
            .when((scores["de"] >= scores["es"])
                  & (scores["de"] >= scores["fr"]), "de")
            .when(scores["es"] >= scores["fr"], "es")
            .otherwise("fr"))
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        *[F.round(scores[lang], 6).alias(f"score_{lang}")
          for lang in sorted(STOPWORDS)],
        pred.alias("pred_lang"))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count (letter runs,
    digit runs, single symbols) — the 'how many tokens will the
    tokenizer see' estimator."""
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.size(_toks(text_col)).cast("bigint").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).cast("bigint")
         .alias("bpe_tokens"))


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased,
    whitespace-collapsed, trimmed text — the canonical key for
    fuzzy-exact dedup across formatting variants."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col).cast("bigint").alias(id_col),
                     F.md5(norm).alias("fingerprint"))


def vocab_topk(df: DataFrame, text_col: str, k: int = 100,
               min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: top-k whitespace tokens by frequency —
    (token, cnt, rank), rank ties broken on the token string so the
    result is deterministic.

    One explode + hash-agg (map-side combinable; token frequency is
    Zipfian but a count agg only ships one partial row per (partition,
    token), so the hot head is safe), then a global top-k which Spark
    executes as TakeOrderedAndProject — k rows to the driver, never a
    full sort."""
    toks = df.select(F.explode(_toks(text_col)).alias("token"))
    counts = (toks.filter(F.col("token") != "")
              .groupBy("token").agg(F.count("*").alias("cnt"))
              .filter(F.col("cnt") >= min_count))
    topk = counts.orderBy(F.col("cnt").desc(), "token").limit(k)
    # rank over the k surviving rows only (single tiny partition)
    w = Window.orderBy(F.col("cnt").desc(), "token")
    return topk.select("token", "cnt",
                       F.row_number().over(w).cast("bigint").alias("rank"))


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf:
    (id, token, tf, tfidf, term_rank).

    idf = ln(N / df_t) with the corpus size N entering as a broadcast
    1-row join (no driver scalar — the same plan runs at any corpus
    size).  Shapes: one explode + (doc, token) hash-agg for tf, one
    token hash-agg for document frequency, an equi-join on token
    (Zipfian head keys, but post-aggregation rows are one per
    (doc, token) — AQE skew-split absorbs stop-words), then a
    per-doc WindowGroupLimit for the top-k.  The ranking key is
    rounded to 9 decimals so engines replaying ln() cannot flip ranks.
    """
    toks = (df.select(F.col(id_col), F.explode(_toks(text_col))
                      .alias("token"))
            .filter(F.col("token") != ""))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("_df"))
    n = df.agg(F.count("*").alias("_n"))
    scored = (tf.join(dfreq, "token")
              .crossJoin(F.broadcast(n))
              .withColumn("_tfidf",
                          F.round(F.col("tf")
                                  * F.log(F.col("_n") / F.col("_df")), 9)))
    w = Window.partitionBy(id_col).orderBy(F.col("_tfidf").desc(), "token")
    return (scored.withColumn("term_rank", F.row_number().over(w))
            .filter(F.col("term_rank") <= k)
            .select(F.col(id_col).cast("bigint").alias(id_col), "token",
                    F.col("tf").cast("bigint").alias("tf"),
                    F.round("_tfidf", 6).alias("tfidf"),
                    F.col("term_rank").cast("bigint").alias("term_rank")))


def cluster_terms(df: DataFrame, group_col: str, text_col: str,
                  k: int = 5) -> DataFrame:
    """Top-k distinctive terms per document cluster by class-based
    tf-idf (the c-TF-IDF of BERTopic): treat each cluster (source,
    language, topic id, LSH bucket, ...) as one pseudo-document,
    score = tf_{t,c} * ln(1 + A / f_t) with A the mean token count per
    cluster and f_t the corpus-wide count of the term — the "what is
    this cluster about" readout used to label topic clusters and audit
    corpus composition.

    Shapes: one explode + (cluster, token) hash-agg (map-side combine
    collapses the explosion before the shuffle), one token-grain agg
    for f_t, the A scalar as a broadcast 1-row join, then a per-cluster
    WindowGroupLimit for the top-k — the scoring join is one row per
    (cluster, token), vocabulary-bounded, never corpus-bounded.  Score
    rounded to 9 decimals before ranking so ln() replay cannot flip
    ranks across engines.
    """
    toks = (df.select(F.col(group_col), F.explode(_toks(text_col))
                      .alias("token"))
            .filter(F.col("token") != ""))
    tf = toks.groupBy(group_col, "token").agg(
        F.count("*").alias("tf"))
    ft = tf.groupBy("token").agg(F.sum("tf").alias("_ft"))
    a = tf.agg((F.sum("tf")
                / F.countDistinct(group_col)).alias("_a"))
    scored = (tf.join(ft, "token")
              .crossJoin(F.broadcast(a))
              .withColumn("_s", F.round(
                  F.col("tf")
                  * F.log(F.lit(1.0) + F.col("_a") / F.col("_ft")), 9)))
    w = Window.partitionBy(group_col).orderBy(F.col("_s").desc(), "token")
    return (scored.withColumn("term_rank", F.row_number().over(w))
            .filter(F.col("term_rank") <= k)
            .select(F.col(group_col), "token",
                    F.col("tf").cast("bigint").alias("tf"),
                    F.round("_s", 6).alias("ctfidf"),
                    F.col("term_rank").cast("bigint").alias("term_rank")))


def bigram_perplexity(df: DataFrame, id_col: str, text_col: str,
                      k_smooth: float = 0.5) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram LM trained
    on the corpus itself: (id, n_bigrams, avg_logp, ppl).

    The standard quality filter for LLM training data ("drop documents
    the corpus LM finds surprising"), expressed entirely in relational
    ops:

    - bigram extraction is array slice+zip INSIDE each row — zero
      shuffle, no self-join on token position;
    - the model is two corpus-level hash-aggs (bigram counts, context
      counts) whose output is vocabulary-bounded, not corpus-bounded —
      at 100 TB the count tables are million-row, the corpus is
      trillion-row, so the scoring joins are broadcast-or-AQE cheap;
    - p(w2|w1) = (c(w1,w2)+k) / (c(w1)+k*V), V entering as a broadcast
      1-row join (no driver scalar);
    - ppl = exp(-mean ln p) per document.

    Documents with fewer than two tokens have no bigrams and are
    dropped (they carry no LM evidence).  Mirrors the reference's
    quality-scoring role (fm_spark has no LM scorer; extension scope).
    """
    t = _toks(text_col)
    pairs = F.arrays_zip(F.slice(t, 1, F.size(t) - 1),
                         F.slice(t, 2, F.size(t) - 1)).alias("_p")
    bigr = (df.select(F.col(id_col), F.explode(pairs).alias("_p"))
            .select(id_col, F.col("_p.0").alias("_w1"),
                    F.col("_p.1").alias("_w2")))
    big_c = bigr.groupBy("_w1", "_w2").agg(F.count("*").alias("_cb"))
    ctx_c = bigr.groupBy("_w1").agg(F.count("*").alias("_cc"))
    vocab = (df.select(F.explode(t).alias("_tok"))
             .agg(F.countDistinct("_tok").alias("_v")))
    logp = F.log((F.col("_cb") + F.lit(k_smooth))
                 / (F.col("_cc") + F.lit(k_smooth) * F.col("_v")))
    return (bigr.join(big_c, ["_w1", "_w2"]).join(ctx_c, "_w1")
            .crossJoin(F.broadcast(vocab))
            .groupBy(id_col)
            .agg(F.count("*").alias("_n"), F.sum(logp).alias("_s"))
            .select(F.col(id_col).cast("bigint").alias(id_col),
                    F.col("_n").cast("bigint").alias("n_bigrams"),
                    F.round(F.col("_s") / F.col("_n"), 6).alias("avg_logp"),
                    F.round(F.exp(-F.col("_s") / F.col("_n")), 4)
                    .alias("ppl")))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition filters per document: top_word_frac (most
    frequent token's share of all tokens), dup_word_frac (fraction of
    tokens that are repeats of an earlier token), top_bigram_frac (most
    frequent word bigram's share — null for single-token docs).  High
    values flag boilerplate / degenerate machine text.

    Relational, not per-row quadratic: unigram and bigram counting are
    explode -> two-level hash aggs (map-side combinable), so a 100 GB
    document costs its token count, never tokens².  Empty tokens are
    dropped before counting on both engines."""
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        .alias("_t"))
    uni = (toks.select(id_col, F.explode("_t").alias("tok"))
           .groupBy(id_col, "tok").agg(F.count("*").alias("_c")))
    u = uni.groupBy(id_col).agg(
        F.max("_c").alias("_top_c"),
        F.sum("_c").alias("_n_tok"),
        F.count("*").alias("_n_distinct"))
    bigrams = F.expr(
        "CASE WHEN size(_t) >= 2 THEN zip_with(slice(_t, 1, size(_t) - 1), "
        "slice(_t, 2, size(_t) - 1), (a, b) -> concat(a, ' ', b)) "
        "ELSE array() END")
    big = (toks.select(id_col, F.explode(bigrams).alias("w"))
           .groupBy(id_col, "w").agg(F.count("*").alias("_c")))
    b = big.groupBy(id_col).agg(F.max("_c").alias("_top_b"),
                                F.sum("_c").alias("_n_big"))
    return (u.join(b, id_col, "left")
            .select(F.col(id_col).cast("bigint").alias(id_col),
                    F.round(F.col("_top_c") / F.col("_n_tok"), 6)
                    .alias("top_word_frac"),
                    F.round((F.col("_n_tok") - F.col("_n_distinct"))
                            / F.col("_n_tok"), 6).alias("dup_word_frac"),
                    F.round(F.col("_top_b") / F.col("_n_big"), 6)
                    .alias("top_bigram_frac")))


def ngram_contamination(corpus: DataFrame, eval_set: DataFrame,
                        id_col: str, text_col: str, n: int = 8,
                        max_df: int | None = 1000) -> DataFrame:
    """Benchmark decontamination: for every (corpus doc, eval doc) pair
    sharing at least one word n-gram, report the number of shared
    n-grams and the fraction of the eval doc's n-grams covered —
    (corpus_id, eval_id, n_shared, eval_coverage).

    The standard pretraining hygiene step (strip training docs that
    leak eval data).  Distributed as a shingle equi-join keyed on the
    n-gram — never corpus × eval — with the same ``max_df`` hot-shingle
    guard as the dedup family; n=8 keeps shingles near-unique, so the
    join fan-out is tiny.
    """
    from fmx.operators.dedup import word_shingles

    c_sh = word_shingles(corpus, id_col, text_col, n=n, max_df=max_df)
    e_sh = word_shingles(eval_set, id_col, text_col, n=n, max_df=max_df)
    e_sizes = e_sh.groupBy(id_col).agg(F.count("*").alias("_n_ev"))
    c = c_sh.select(F.col(id_col).alias("corpus_id"), "shingle")
    e = e_sh.select(F.col(id_col).alias("eval_id"), "shingle")
    shared = (c.join(e, "shingle")
              .filter(F.col("corpus_id") != F.col("eval_id"))
              .groupBy("corpus_id", "eval_id")
              .agg(F.count("*").alias("n_shared")))
    ev = e_sizes.select(F.col(id_col).alias("eval_id"),
                        F.col("_n_ev"))
    return (shared.join(ev, "eval_id")
            .select(F.col("corpus_id").cast("bigint").alias("corpus_id"),
                    F.col("eval_id").cast("bigint").alias("eval_id"),
                    F.col("n_shared").cast("bigint").alias("n_shared"),
                    F.round(F.col("n_shared") / F.col("_n_ev"), 6)
                    .alias("eval_coverage")))


# context-window chunking -------------------------------------------------

def chunk_tokens(df: DataFrame, id_col: str, text_col: str,
                 chunk_size: int = 16, stride: int = 12) -> DataFrame:
    """Split each document into overlapping token windows (the
    tokenize-and-chunk step before sequence packing): one output row per
    (doc, chunk) with chunk_id, n_tokens, chunk_text.  The final chunk
    may be short; empty documents produce no chunks.

    One explode of a per-row integer sequence — linear in total tokens,
    no shuffle at all: chunking a 100 TB corpus is a map-only stage."""
    toks = (df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        .alias("_t"))
        .filter(F.size("_t") > 0))
    starts = F.explode(F.sequence(
        F.lit(0), F.size("_t") - 1, F.lit(int(stride)))).alias("_s")
    return (toks.select(id_col, "_t", starts)
            .select(F.col(id_col).cast("bigint").alias(id_col),
                    (F.col("_s") / stride).cast("bigint").alias("chunk_id"),
                    F.slice("_t", F.col("_s") + 1, chunk_size).alias("_c"))
            .select(id_col, "chunk_id",
                    F.size("_c").cast("bigint").alias("n_tokens"),
                    F.array_join("_c", " ").alias("chunk_text")))


# PII / boilerplate redaction --------------------------------------------

# RE2-and-Java-compatible patterns so DuckDB oracles replay them exactly
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
URL_RE = "https?://[^ ]+"
LONGNUM_RE = "[0-9]{9,}"


def redact_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Scrub emails, URLs, and long digit runs (phone/SSN-ish) from
    text, emitting the redacted text plus per-category match counts —
    the pre-training PII pass.  Pure regexp column expressions;
    patterns are RE2-compatible so the DuckDB oracle replays them.

    URLs are redacted before long-number runs so digits inside a URL
    don't double-count."""
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(EMAIL_RE))
    n_url = F.regexp_count(F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                           F.lit(URL_RE))
    red = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                         URL_RE, "<URL>"),
        LONGNUM_RE, "<NUM>")
    n_num = F.regexp_count(
        F.regexp_replace(F.regexp_replace(t, EMAIL_RE, "<EMAIL>"),
                         URL_RE, "<URL>"),
        F.lit(LONGNUM_RE))
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        red.alias("redacted"),
        n_email.cast("bigint").alias("n_emails"),
        n_url.cast("bigint").alias("n_urls"),
        n_num.cast("bigint").alias("n_longnums"))


def hashed_linear_score(df: DataFrame, id_col: str, text_col: str,
                        bias: float = 0.0,
                        len_coef: float = 0.1) -> DataFrame:
    """Fasttext-style hashed linear text classifier (inference): each
    token hashes to a weight (md5-derived uniform in [-1, 1) — the
    hashing trick with a weight table that is a pure FUNCTION of the
    token, so no weight table is shipped and any engine replays it; a
    trained table drops in as a broadcast join on the same hash key),
    margin = mean token weight * sqrt(n) + len_coef * ln(n) - bias,
    prob = sigmoid(margin).

    One explode + one hash-agg per document — all codegen, no UDF; at
    100 TB this is the shape of every quality-classifier sweep: linear
    scan, partial aggregation, output one row per doc."""
    toks = df.select(F.col(id_col),
                     F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    w = (F.conv(F.substring(F.md5(F.concat(F.lit("qw:"), F.col("tok"))),
                            1, 15), 16, 10).cast("double")
         / F.lit(float(2 ** 59)) - F.lit(1.0))
    agg = (toks.groupBy(id_col)
           .agg(F.sum(w).alias("_sw"), F.count("*").alias("n_tokens")))
    margin = (F.col("_sw") / F.sqrt(F.col("n_tokens"))
              + F.lit(len_coef) * F.log(F.col("n_tokens").cast("double"))
              - F.lit(bias))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return agg.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(margin, 6).alias("margin"),
        F.round(prob, 6).alias("prob"),
        (prob >= 0.5).alias("keep"))


def inverted_index(df: DataFrame, id_col: str, text_col: str,
                   min_df: int = 2, max_postings: int = 20) -> DataFrame:
    """Inverted index build: token -> (document frequency, posting list
    of the first ``max_postings`` doc ids).  Postings are CAPPED before
    collection via a ranking window (WindowGroupLimit per-partition
    heaps), so no token — however hot — ever materializes an unbounded
    list in aggregation state; the full df count rides the same shuffle.
    Singletons (df < min_df) are dropped as noise.

    Postings are emitted as a comma-joined STRING of sorted doc ids
    (engine-portable; the array form is one split away).  Plan: explode
    -> distinct (doc, token) -> two token-grain branches joined at
    token cardinality: the df count (partial-agg, sort-free,
    skew-immune) and the capped postings, whose ``rn <= k`` row filter
    right after row_number lets WindowGroupLimit truncate every map
    partition to k rows per token BEFORE the sort-shuffle — a hot
    token never sorts its full posting set anywhere."""
    toks = (df.select(F.col(id_col),
                      F.explode(F.split(F.col(text_col), " ")).alias("tok"))
            .distinct())
    dfreq = (toks.groupBy("tok").agg(F.count("*").alias("df"))
             .filter(F.col("df") >= min_df))
    w = Window.partitionBy("tok").orderBy(F.col(id_col))
    capped = (toks.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= max_postings)
              .groupBy("tok")
              .agg(F.array_join(F.sort_array(F.collect_list(
                  F.col(id_col).cast("bigint"))), ",").alias("postings")))
    return (dfreq.join(capped, "tok")
            .select(F.col("tok").alias("token"),
                    F.col("df").cast("bigint").alias("df"), "postings"))


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) plus
    distinct-char count — the cheap gibberish/binary-spill detector
    (low entropy = repeated filler, high = random bytes/base64; both
    tails are cut in C4/Gopher-style quality filters).

    Distributed shape: explode chars -> (id, char) count -> entropy
    fold.  The (id, char) aggregate is map-side combinable, so the
    shuffle carries at most |alphabet| rows per document per map task
    — NOT |text| rows; the second (id) aggregate is a rollup of that.
    No Python, no driver state, linear in corpus bytes.
    """
    cc = (df.select(F.col(id_col),
                    F.explode(F.split(F.col(text_col), "")).alias("_ch"))
          # split('') yields [''] for the empty string (both engines):
          # drop it so an empty document has no chars and no row,
          # instead of a phantom 1-char/0-entropy reading
          .filter(F.col("_ch") != "")
          .groupBy(id_col, "_ch").agg(F.count("*").alias("_c")))
    n = F.sum("_c")
    # H = log2(n) - sum(c*log2(c))/n  — single-pass form, avoids a
    # second join for per-doc totals
    h = F.log2(n) - F.sum(F.col("_c") * F.log2("_c")) / n
    return cc.groupBy(id_col).agg(
        n.cast("bigint").alias("n_chars"),
        F.count("*").cast("bigint").alias("n_distinct_chars"),
        F.round(h, 6).alias("char_entropy"))


def vocab_kl_by_group(df: DataFrame, group_col: str, text_col: str,
                      k: int = 200, alpha: float = 0.5) -> DataFrame:
    """Per-group vocabulary divergence: KL(group || rest-of-corpus)
    over the corpus' top-``k`` tokens, Laplace-smoothed — the "which
    source talks differently" corpus-mix diagnostic (a domain whose
    unigram distribution diverges needs its own mixture weight; one
    near zero is redundant with the rest).

    Returns (group, n_tokens, kl_vs_rest).  Shapes: one explode +
    token agg for the global vocab, TakeOrdered for the top-k, one
    (group, token) agg semi-joined to that top-k, then a
    groups x k densify (tiny cross of two broadcastable relations) so
    absent tokens still contribute smoothed mass.  Probabilities are
    restricted to the shared top-k support on BOTH sides, so P and Q
    are comparable by construction.
    """
    dense, p, q = _vocab_dense_pq(df, group_col, text_col, k, alpha)
    return (dense.groupBy(group_col)
            .agg(F.first("_ng").cast("bigint").alias("n_tokens"),
                 F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_rest")))


def _vocab_dense_pq(df: DataFrame, group_col: str, text_col: str,
                    k: int, alpha: float):
    """Shared builder for the per-group vs rest-of-corpus unigram
    comparison: the groups x top-k densified count relation plus the
    Laplace-smoothed (p, q) probability column expressions — single
    source for vocab_kl_by_group and vocab_js_by_group so the
    smoothing and support can never drift between the two
    divergences."""
    toks = (df.select(F.col(group_col), F.explode(_toks(text_col))
                      .alias("token"))
            .filter(F.col("token") != ""))
    allc = toks.groupBy("token").agg(F.count("*").alias("_ca"))
    topk = allc.orderBy(F.desc("_ca"), "token").limit(k)
    gc = (toks.join(F.broadcast(topk.select("token")), "token", "left_semi")
          .groupBy(group_col, "token").agg(F.count("*").alias("_c")))
    groups = df.select(group_col).distinct()
    dense = (groups.crossJoin(F.broadcast(topk))
             .join(gc, [group_col, "token"], "left")
             .na.fill({"_c": 0}))
    w = Window.partitionBy(group_col)
    wall = Window.partitionBy()
    dense = (dense
             .withColumn("_ng", F.sum("_c").over(w))
             .withColumn("_na", F.sum("_c").over(wall)))
    a = F.lit(float(alpha))
    ak = F.lit(float(alpha) * k)
    p = (F.col("_c") + a) / (F.col("_ng") + ak)
    q = (((F.col("_ca") - F.col("_c")) + a)
         / ((F.col("_na") - F.col("_ng")) + ak))
    return dense, p, q


def vocab_js_by_group(df: DataFrame, group_col: str, text_col: str,
                      k: int = 200, alpha: float = 0.5) -> DataFrame:
    """Per-group Jensen-Shannon divergence vs the rest of the corpus
    over the shared top-``k`` support — the SYMMETRIC, bounded
    ([0, ln 2]) twin of :func:`vocab_kl_by_group`: KL blows up where
    the group has mass the rest lacks (good for "who talks
    differently", bad as a distance); JSD(P||Q) = (KL(P||M) +
    KL(Q||M))/2 with M = (P+Q)/2 is finite, symmetric, and its square
    root is a metric — the form mixture-weight solvers and corpus-
    drift monitors want.  Returns (group, n_tokens, js_divergence,
    js_normalized [/ln 2]).  Identical dense relation and smoothing as
    the KL (single-sourced in _vocab_dense_pq); same shapes: explode,
    TakeOrdered top-k, one (group, token) agg, tiny densify."""
    dense, p, q = _vocab_dense_pq(df, group_col, text_col, k, alpha)
    m = (p + q) / 2.0
    jsd = F.sum(0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m))
    return (dense.groupBy(group_col)
            .agg(F.first("_ng").cast("bigint").alias("n_tokens"),
                 F.round(jsd, 6).alias("js_divergence"),
                 F.round(jsd / float(math.log(2.0)), 6)
                 .alias("js_normalized")))


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """BM25 keyword retrieval: the top-``k`` documents for a bag of
    query ``terms`` — the lexical-search complement to the ANN stack
    (and the first stage of every hybrid retrieval system).

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the Robertson-Sparck-Jones idf ln(1 + (N - df + .5)/(df + .5)).

    Fully relational, one corpus scan: per-doc lengths and per-(doc,
    term) tf come from the same explode, df/N/avgdl are a tiny
    broadcast (|terms| + 1 rows), and the final top-k executes as
    TakeOrderedAndProject (per-partition k-row heaps — no global
    sort).  At 100 TB the production variant reads tf from the
    persisted ``inverted_index`` postings instead of re-exploding the
    corpus; the scoring arithmetic is identical.
    """
    toks = (df.select(F.col(id_col), F.explode(_toks(text_col))
                      .alias("token"))
            .filter(F.col("token") != ""))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    tf = (toks.filter(F.col("token").isin(list(terms)))
          .groupBy(id_col, "token").agg(F.count("*").alias("_tf")))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("_df"))
    stats = dl.agg(F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl"))
    idf = F.log(F.lit(1.0) + (F.col("_n") - F.col("_df") + 0.5)
                / (F.col("_df") + 0.5))
    norm = F.col("_tf") + F.lit(float(k1)) * (
        F.lit(1.0 - float(b)) + F.lit(float(b)) * F.col("_dl") / F.col("_avgdl"))
    contrib = idf * F.col("_tf") * F.lit(float(k1) + 1.0) / norm
    scored = (tf.join(dl, id_col)
              .join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(stats))
              .groupBy(id_col)
              .agg(F.round(F.sum(contrib), 6).alias("score")))
    top = scored.orderBy(F.desc("score"), id_col).limit(k)
    w = Window.orderBy(F.desc("score"), id_col)
    return top.withColumn("rank", F.row_number().over(w))


def boilerplate_strip(df: DataFrame, id_col: str, text_col: str,
                      chunk_size: int = 8, min_df: int = 2) -> DataFrame:
    """Corpus-level boilerplate removal at chunk grain — the
    RefinedWeb / CCNet repeated-line filter, phrased over fixed
    ``chunk_size``-token chunks because this corpus is single-line:
    a chunk whose exact text occurs in >= ``min_df`` DISTINCT
    documents is boilerplate (nav bars, license headers, cookie
    banners) and is cut from every document; survivors are
    reassembled in order.

    Returns per document: n_chunks, n_kept, kept_tokens, and
    ``clean_hash`` = md5 of the reassembled text ('' when everything
    was boilerplate).

    Scale shape: chunking is a map-only explode (see chunk_tokens);
    the document-frequency relation is one (chunk-md5) hash-agg with
    map-side combine; flagging is an equi-join on the md5 (uniform
    key — it's a hash); reassembly is collect_list + array_sort at
    document grain, bounded by tokens-per-doc, never a corpus-wide
    window.  No driver state: the boilerplate 'set' stays a
    distributed relation, so a 100 TB corpus with billions of
    distinct chunks never funnels anywhere.
    """
    chunks = chunk_tokens(df, id_col, text_col,
                          chunk_size=chunk_size, stride=chunk_size)
    chunks = chunks.withColumn("_h", F.md5(F.col("chunk_text")))
    freq = (chunks.groupBy("_h")
            .agg(F.countDistinct(id_col).alias("_df")))
    flagged = (chunks.join(freq, "_h")
               .withColumn("_boiler",
                           (F.col("_df") >= int(min_df)).cast("int")))
    keep = F.when(F.col("_boiler") == 0,
                  F.struct(F.col("chunk_id"), F.col("chunk_text")))
    return (flagged.groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_chunks"),
                 F.sum(F.lit(1) - F.col("_boiler")).cast("bigint")
                 .alias("n_kept"),
                 F.sum(F.when(F.col("_boiler") == 0, F.col("n_tokens"))
                       .otherwise(F.lit(0))).cast("bigint")
                 .alias("kept_tokens"),
                 F.md5(F.array_join(
                     F.transform(F.array_sort(F.collect_list(keep)),
                                 lambda s: s.chunk_text),
                     " ")).alias("clean_hash")))


def bpe_pair_counts(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Corpus-weighted adjacent character-pair frequencies — the reduce
    step that dominates one BPE tokenizer-training merge round: count
    every adjacent symbol pair, weighted by word frequency, and emit
    the top-``k`` merge candidates (pair, cnt, rank; ties to the
    lexicographically smaller pair so ranking is total).

    Scale shape: the corpus collapses to the DISTINCT-WORD relation
    first (Zipf-bounded — orders of magnitude smaller than the token
    stream), pair expansion explodes word-length-minus-one positions
    over that small relation, the pair agg is map-side combinable, and
    the top-k executes as TakeOrderedAndProject (k rows, no global
    sort).  A full BPE trainer iterates this with a merged symbol
    table; one round is the portable, oracle-checkable unit.
    """
    words = (df.select(F.explode(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))
        .alias("word"))
        .groupBy("word").agg(F.count("*").alias("wc"))
        .filter(F.length("word") >= 2))
    pairs = (words.select(
        "wc", "word",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("p"))
        .select(F.substring(F.col("word"), F.col("p"), F.lit(2))
                .alias("pair"), "wc"))
    counts = (pairs.groupBy("pair")
              .agg(F.sum("wc").cast("bigint").alias("cnt")))
    top = counts.orderBy(F.col("cnt").desc(), "pair").limit(k)
    w = Window.orderBy(F.col("cnt").desc(), "pair")
    return top.select("pair", "cnt",
                      F.row_number().over(w).cast("bigint").alias("rank"))


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease profile per document: (id, n_sentences,
    n_words, n_syllables, flesch) with

        flesch = 206.835 - 1.015*(words/sentences)
                         - 84.6*(syllables/words)

    — the classic readability gate (C4/Gopher-style corpus filters
    keep prose in a target band; pathological machine-generated text
    scores far outside it).  Syllables use the standard regex proxy:
    one syllable per maximal vowel group (`[aeiouyAEIOUY]+`);
    sentences are maximal `[.!?]+` runs; words are the corpus-wide
    whitespace-token convention (token_stats).  Every count is an
    integer regexp_count/size over the row — no UDFs, no shuffle, a
    pure map over any corpus size — and the score arithmetic is three
    IEEE double ops on integer ratios, so any engine replays it
    bit-identically.  Empty/degenerate docs clamp both denominators
    to >= 1 rather than NULLing out (a 0-sentence fragment is still
    scoreable prose-or-not evidence)."""
    n_sent = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[.!?]+")), F.lit(1))
    n_words = F.greatest(F.size(_toks(text_col)), F.lit(1))
    n_syll = F.greatest(
        F.regexp_count(F.col(text_col), F.lit("[aeiouyAEIOUY]+")),
        F.lit(1))
    score = (F.lit(206.835)
             - F.lit(1.015) * (n_words / n_sent)
             - F.lit(84.6) * (n_syll / n_words))
    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        n_sent.cast("bigint").alias("n_sentences"),
        n_words.cast("bigint").alias("n_words"),
        n_syll.cast("bigint").alias("n_syllables"),
        F.round(score, 4).alias("flesch"))


def charset_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-class composition per document: (id, n_chars,
    ascii_ratio, nonascii_ratio, upper_ratio, space_ratio, alpha_ratio)
    — the encoding-health gate multilingual corpus curation runs
    before language ID (mojibake and binary-spill documents light up
    the non-ASCII ratio; ALL-CAPS spam lights up upper_ratio).
    Complements token_stats' punct/digit view at the raw-character
    grain.  Pure per-row regexp counts over explicit byte-range
    classes — map-only at any corpus size; ratios are integer counts
    over n_chars (NULL for empty docs), engine-exact."""
    nc = F.length(F.col(text_col))
    den = F.nullif(nc, F.lit(0))

    def _ratio(pattern: str):
        return F.round(F.regexp_count(F.col(text_col), F.lit(pattern))
                       / den, 6)

    return df.select(
        F.col(id_col).cast("bigint").alias(id_col),
        nc.cast("bigint").alias("n_chars"),
        _ratio("[\\x20-\\x7e]").alias("ascii_ratio"),
        _ratio("[^\\x00-\\x7f]").alias("nonascii_ratio"),
        _ratio("[A-Z]").alias("upper_ratio"),
        _ratio(" ").alias("space_ratio"),
        _ratio("[A-Za-z]").alias("alpha_ratio"))


def pmi_bigrams(df: DataFrame, text_col: str, k: int = 20,
                min_count: int = 5) -> DataFrame:
    """Top-k adjacent-token bigrams by frequency with pointwise mutual
    information: pmi = ln(p(a,b) / (p(a) p(b))) computed from
    integer-exact corpus counts (c_ab, c_a, c_b, total tokens T, total
    bigrams B) — the collocation detector ("new york" vs "the the")
    used to pick multiword vocabulary entries and to audit template
    artifacts that raw pair counts (bpe_pair_counts — character-level,
    frequency-only) cannot separate from genuinely associated pairs.

    Scale shapes: bigram expansion is a MAP-side array zip (slice +
    arrays_zip per document — no position self-join, no shuffle at
    token grain); the (a, b) agg and the unigram agg are map-side
    combinable; the two unigram joins run on the vocabulary-bounded
    bigram relation, never the corpus; top-k is
    TakeOrderedAndProject.  Everything entering ln() is an exact
    BIGINT, so the only cross-engine noise is the final libm ln —
    rounded to 6 decimals (the accepted residual; the sf0.1 sweep is
    the detector).
    """
    arr = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    toks = df.select(arr.alias("_t")).filter(F.size("_t") >= 2)
    big = (toks.select(F.explode(F.arrays_zip(
        F.slice("_t", 1, F.size("_t") - 1),
        F.slice("_t", 2, F.size("_t") - 1))).alias("_p"))
        .select(F.col("_p.0").alias("a"), F.col("_p.1").alias("b")))
    cab = big.groupBy("a", "b").agg(F.count("*").alias("cab"))
    uni = (df.select(F.explode(arr).alias("tok"))
           .groupBy("tok").agg(F.count("*").alias("c")))
    totals = uni.agg(F.sum("c").alias("_T")) \
        .crossJoin(F.broadcast(big.agg(F.count("*").alias("_B"))))
    scored = (cab.filter(F.col("cab") >= int(min_count))
              .join(uni.withColumnsRenamed({"tok": "a", "c": "ca"}), "a")
              .join(uni.withColumnsRenamed({"tok": "b", "c": "cb"}), "b")
              .crossJoin(F.broadcast(totals))
              .select("a", "b", F.col("cab").cast("bigint").alias("cab"),
                      F.round(F.log((F.col("cab").cast("double")
                                     * F.col("_T") * F.col("_T"))
                                    / (F.col("_B").cast("double")
                                       * F.col("ca") * F.col("cb"))), 6)
                      .alias("pmi")))
    top = scored.orderBy(F.col("cab").desc(), "a", "b").limit(int(k))
    w = Window.orderBy(F.col("cab").desc(), "a", "b")
    return top.select("a", "b", "cab", "pmi",
                      F.row_number().over(w).cast("bigint").alias("rank"))


def gopher_filters(df: DataFrame, id_col: str, text_col: str,
                   min_words: int = 20, max_words: int = 90,
                   min_mean_wl: float = 3.0, max_mean_wl: float = 10.0,
                   min_alpha_ratio: float = 0.8,
                   max_digit_ratio: float = 0.3,
                   min_stopwords: int = 2) -> DataFrame:
    """Gopher-style (Rae et al. 2021, MassiveText) rule-bundle quality
    filter: per-document boolean verdicts for the five classic
    repetition-free rules — word-count bounds, mean-word-length
    bounds, alphabetic-word ratio, digit-character ratio, and
    distinct-stopword presence — plus the conjunction ``passed``.
    Unlike quality_score (a continuous ranking signal), this is the
    hard gate stage of a pretraining pipeline: each rule is
    independently auditable and the pass-rate per rule is the
    corpus-health readout.

    ONE projection pass: every rule is a map-side expression over the
    split-token array (no explode, no shuffle, no UDF); thresholds
    compare doubles derived from exact integer counts.  Defaults are
    tuned to this corpus's 10-99-word synthetic documents; production
    MassiveText bounds are (50, 100000) words.
    """
    arr = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    nw = F.size(arr)
    # Zero-word / empty-text guards: every ratio goes NULL (not
    # NaN/Inf) on degenerate documents, matching DuckDB's
    # division-by-zero-yields-NULL semantics so the rule verdicts are
    # engine-portable; ``passed`` still resolves to false via the
    # always-false word-count rule (false AND NULL = false in both
    # engines' three-valued logic).
    mwl = F.when(nw > 0,
                 F.aggregate(arr, F.lit(0).cast("bigint"),
                             lambda a, x: a + F.length(x)).cast("double")
                 / nw)
    alpha = F.when(nw > 0,
                   F.size(F.filter(arr, lambda x: x.rlike("[a-zA-Z]")))
                   .cast("double") / nw)
    digits = (F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
              .cast("double")
              / F.nullif(F.length(text_col), F.lit(0)))
    stops = F.size(F.array_intersect(
        F.array_distinct(arr),
        F.array(*[F.lit(s) for s in STOPWORDS["en"]])))
    r_wc = (nw >= int(min_words)) & (nw <= int(max_words))
    r_mwl = (mwl >= float(min_mean_wl)) & (mwl <= float(max_mean_wl))
    r_alpha = alpha >= float(min_alpha_ratio)
    r_digit = digits < float(max_digit_ratio)
    r_stop = stops >= int(min_stopwords)
    return df.select(
        F.col(id_col), nw.cast("bigint").alias("n_words"),
        r_wc.alias("rule_word_count"), r_mwl.alias("rule_mean_word_len"),
        r_alpha.alias("rule_alpha_ratio"), r_digit.alias("rule_digit_ratio"),
        r_stop.alias("rule_stopwords"),
        (r_wc & r_mwl & r_alpha & r_digit & r_stop).alias("passed"))


def passage_dedup(df: DataFrame, id_col: str, text_col: str,
                  width: int = 10) -> DataFrame:
    """Intra-corpus passage-level exact dedup (the CCNet/C4 paragraph
    trick, over fixed ``width``-word passages since this corpus has no
    paragraph breaks): chunk every document into consecutive
    ``width``-word passages, hash each, and mark every passage whose
    hash already occurred EARLIER in the corpus (by (doc, offset)
    order) as a duplicate.  Returns one row per document:
    (id, n_passages, n_dup_passages, dup_ratio).

    Scale shape: passages are generated map-side (one
    explode(sequence) + slice per doc — never a token shuffle), the
    first-occurrence decision is ONE ranking window over the
    hash-grain (each hash group holds only the colliding passages),
    and the per-doc rollup is a hash agg.  At 100 TB the hash grain
    is the dedup index; nothing all-pairs anywhere."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = (df.select(F.col(id_col), toks.alias("_t"))
            .filter(F.size("_t") > 0)
            .select(id_col, "_t",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.ceil(F.size("_t") / width).cast("int") - 1))
                    .alias("idx")))
    pas = base.select(
        id_col, "idx",
        F.md5(F.array_join(F.slice("_t", F.col("idx") * width + 1,
                                   F.lit(width)), " ")).alias("h"))
    w = Window.partitionBy("h").orderBy(id_col, "idx")
    flagged = pas.withColumn(
        "_dup", (F.row_number().over(w) > 1).cast("int"))
    return (flagged.groupBy(id_col)
            .agg(F.count("*").cast("bigint").alias("n_passages"),
                 F.sum("_dup").cast("bigint").alias("n_dup_passages"))
            .withColumn("dup_ratio",
                        F.round(F.col("n_dup_passages") * 1.0
                                / F.col("n_passages"), 6)))


def mattr_diversity(df: DataFrame, id_col: str, text_col: str,
                    width: int = 10) -> DataFrame:
    """Moving-Average Type-Token Ratio (MATTR, Covington & McFall
    2010): lexical diversity as the mean distinct-token share over
    every sliding ``width``-token window — the length-robust
    replacement for plain TTR (which collapses as documents grow).

    The naive form materializes n_windows * width rows; this is the
    CLOSED FORM: a token occurrence at position p is distinct within
    window [s, s+w-1] iff its previous occurrence is before s, so p
    contributes to exactly
    max(0, min(p, n-w+1) - max(prev(p)+1, p-w+1, 1) + 1) windows —
    one lag window over (doc, token) occurrences and pure integer
    arithmetic replace the window explosion entirely.  MATTR is the
    single exact integer sum divided by w * n_windows; plain TTR
    rides along for the comparison.  Documents shorter than
    ``width`` are excluded (MATTR is undefined there)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    ex = (df.select(F.col(id_col), toks.alias("_t"))
          .filter(F.size("_t") >= int(width))
          .select(id_col, F.size("_t").alias("n"),
                  F.posexplode("_t").alias("p0", "tok"))
          .select(id_col, "n", "tok",
                  (F.col("p0") + 1).alias("p")))      # 1-based
    wlag = Window.partitionBy(id_col, "tok").orderBy("p")
    lagged = ex.withColumn("prev", F.coalesce(F.lag("p").over(wlag),
                                              F.lit(0)))
    lo = F.greatest(F.col("prev") + 1, F.col("p") - width + 1, F.lit(1))
    hi = F.least(F.col("p"), F.col("n") - width + 1)
    contrib = F.greatest(hi - lo + 1, F.lit(0))
    return (lagged.groupBy(id_col)
            .agg(F.max("n").cast("bigint").alias("n_tokens"),
                 (F.max("n") - width + 1).cast("bigint")
                 .alias("n_windows"),
                 F.sum(contrib).cast("bigint").alias("_dsum"),
                 F.countDistinct("tok").cast("bigint").alias("_types"))
            .select(id_col, "n_tokens", "n_windows",
                    F.round(F.col("_dsum") * 1.0
                            / (width * F.col("n_windows")), 6)
                    .alias("mattr"),
                    F.round(F.col("_types") * 1.0 / F.col("n_tokens"), 6)
                    .alias("ttr")))


def dirichlet_ql_topk(docs: DataFrame, id_col: str, text_col: str,
                      queries: DataFrame, qid_col: str = "qid",
                      qtoken_col: str = "token", qtf_col: str = "qtf",
                      mu: float = 100.0, k: int = 5) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty,
    SIGIR'01) — the language-model scoring function next to BM25's
    tf-idf one, and MULTI-QUERY: ``queries`` is a (qid, token, qtf)
    relation, so one plan scores every query at once instead of one
    job per query.

        score(q,d) = sum_t qtf_t * ln( (tf_td + mu*P(t|C)) / (dl_d + mu) )

    The dense formula ranges over ALL query terms including those
    ABSENT from d (tf = 0 still contributes the smoothing mass), which
    naively breaks sparse evaluation.  The standard decomposition
    restores it:

        score = sum_t qtf_t*ln(mu*P_t)                 [per-query const]
              + sum_{t in d AND q} qtf_t*(ln(tf + mu*P_t) - ln(mu*P_t))
              - (sum_t qtf_t) * ln(dl_d + mu)          [per-doc length]

    so the only per-(query, doc) work is the sparse postings equi-join
    — the same inverted-index shape as bm25_topk, and the candidate
    set (docs sharing >= 1 query term) is the usual retrieval
    contract.  Collection stats (cf_t, total tokens) are one corpus
    agg; every ln(...) summand is rounded to 9dp BEFORE summation (the
    weighted-jaccard discipline: both engines must sum identical
    doubles) and the final score to 6dp, ranked (score desc, doc id)
    with row_number <= k per query.  At 100 TB: postings join keyed on
    token, per-query windows (queries are the partition key — never
    global), collection stats broadcast.
    """
    mu = float(mu)
    toks = (docs.select(F.col(id_col), F.explode(_toks(text_col))
                        .alias("token"))
            .filter(F.col("token") != ""))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("_tf"))
    cf = toks.groupBy("token").agg(F.count("*").alias("_cf"))
    total = toks.agg(F.count("*").alias("_c"))
    q = (queries.select(F.col(qid_col).alias("_qid"),
                        F.col(qtoken_col).alias("token"),
                        F.col(qtf_col).alias("_qtf"))
         .join(F.broadcast(cf), "token", "inner")
         .crossJoin(F.broadcast(total)))
    # ln(mu * P_t): P_t = cf/C as one double expression, rounded 9dp
    lp = F.round(F.log(F.lit(mu) * F.col("_cf") / F.col("_c")), 9)
    qstats = (q.select("_qid", "token", "_qtf", lp.alias("_lp"))
              .groupBy("_qid")
              .agg(F.sum(F.col("_qtf") * F.col("_lp")).alias("_qconst"),
                   F.sum("_qtf").alias("_qlen")))
    qterms = q.select("_qid", "token", "_qtf",
                      (F.lit(mu) * F.col("_cf") / F.col("_c"))
                      .alias("_mup"), lp.alias("_lp"))
    delta = (qterms.join(tf, "token")
             .select("_qid", F.col(id_col),
                     (F.col("_qtf")
                      * F.round(F.log(F.col("_tf") + F.col("_mup"))
                                - F.col("_lp"), 9)).alias("_d"))
             .groupBy("_qid", id_col)
             .agg(F.sum("_d").alias("_dsum")))
    scored = (delta.join(dl, id_col)
              .join(F.broadcast(qstats), "_qid")
              .select("_qid", F.col(id_col),
                      F.round(F.col("_qconst") + F.col("_dsum")
                              - F.col("_qlen")
                              * F.round(F.log(F.col("_dl") + F.lit(mu)),
                                        9), 6).alias("score")))
    w = Window.partitionBy("_qid").orderBy(F.desc("score"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(k))
            .select(F.col("_qid").alias(qid_col), id_col, "score", "rank"))
