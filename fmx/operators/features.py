"""Feature-engineering operators for tabular ML pipelines: target /
frequency encoding of high-cardinality categoricals, k-fold
out-of-fold target encoding, quantile bucketizing, and top-K one-hot
vocabulary indexing.

All are pure DataFrame -> DataFrame plans (hash-aggs on the key +
equi-joins back, or 1-row stat broadcasts) so they run unchanged at
any scale; all arithmetic is replayable in ANSI SQL for the DuckDB
oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["target_encode_loo", "frequency_encode",
           "target_encode_kfold", "quantile_bucketize", "onehot_topk",
           "hashed_cross", "woe_encode"]


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


def target_encode_kfold(df: DataFrame, key_col: str, target_col: str,
                        id_col: str, n_folds: int = 5,
                        smoothing: float = 10.0, seed: int = 42,
                        out_col: str = "enc",
                        fold_col: str = "fold",
                        broadcast_keys: bool = False) -> DataFrame:
    """K-fold out-of-fold target encoding: rows are assigned a
    deterministic fold by md5 hash of ``id_col`` (stable under
    repartition and corpus growth, like hash_split), and each row's
    encoding is the smoothed mean target of its key computed over the
    OTHER k-1 folds only:

        enc = (sum_key - sum_key_fold + m * prior)
              / (cnt_key - cnt_key_fold + m)

    Sums and counts cover NON-NULL targets only (avg semantics): a
    NULL-target row neither contributes nor dilutes, and a fold whose
    targets are all NULL encodes as the other folds' smoothed mean.

    The out-of-fold exclusion generalizes LOO (``target_encode_loo`` is
    the n_folds = n limit): coarser folds leak less estimator variance
    per row into the feature while still never using the row's own fold,
    which is the standard competition/production recipe when the same
    frame later trains a model per fold.

    A key fully contained in one fold yields prior for its own fold's
    rows (numerator m*prior / denominator m) — defined, no division by
    zero.  NULL keys form their own group (null-safe join back), and a
    NULL ``id_col`` deterministically lands in fold 0 (the md5 coin is
    undefined on NULL; coalescing keeps the row-preserving contract of
    :func:`target_encode_loo` instead of silently dropping the row
    through a never-matching NULL-fold join).

    Scale shape: one (key, fold) hash-agg (k times the key cardinality,
    still dimension-sized); the key totals AND the global prior both
    re-aggregate FROM the partials (no second corpus scan); one 1-row
    prior broadcast; one (key, fold) equi-join back.
    ``broadcast_keys`` pins the join strategy as in
    :func:`target_encode_loo`.
    """
    from fmx.operators.sampling import hash_uniform01

    m = float(smoothing)
    k = int(n_folds)
    fold = F.coalesce(
        F.floor(hash_uniform01(id_col, "kfold", seed) * k).cast("int"),
        F.lit(0))
    with_fold = df.withColumn(fold_col, fold)
    per_kf = (with_fold.groupBy(F.col(key_col).alias("_k"),
                                F.col(fold_col).alias("_f"))
              .agg(F.sum(target_col).alias("_sf"),
                   # non-null target counts everywhere: NULL-target
                   # rows contribute neither to sums nor to counts
                   # (avg semantics) — an all-NULL fold must encode as
                   # the other folds' mean, not propagate NULL
                   F.count(target_col).alias("_ct")))
    # key totals from the partials: a window over the <= k rows of each
    # key in the (key, fold) relation — dimension-sized, never row grain
    wk = Window.partitionBy("_k")
    enc_tab = (per_kf
               .withColumn("_s", F.sum("_sf").over(wk))
               .withColumn("_c", F.sum("_ct").over(wk)))
    if broadcast_keys:
        enc_tab = F.broadcast(enc_tab)
    # global prior from the SAME partials — not a second corpus scan
    prior = per_kf.agg((F.sum("_sf") / F.sum("_ct")).alias("_prior"))
    # coalesce the NULL partials (an all-NULL-target fold has _sf NULL;
    # the window sum already skips NULL partials)
    enc = ((F.coalesce(F.col("_s"), F.lit(0.0))
            - F.coalesce(F.col("_sf"), F.lit(0.0))
            + m * F.col("_prior"))
           / (F.col("_c") - F.col("_ct") + m))
    return (with_fold.join(
                enc_tab,
                F.col(key_col).eqNullSafe(F.col("_k"))
                & (F.col(fold_col) == F.col("_f")))
            .crossJoin(F.broadcast(prior))
            .withColumn(out_col, enc)
            .drop("_k", "_f", "_sf", "_ct", "_s", "_c", "_prior"))


def quantile_bucketize(df: DataFrame, value_col: str,
                       quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
                       out_col: str = "bucket") -> DataFrame:
    """Equal-frequency bucketing: each row gains the index of its
    value's quantile bin (0 .. len(quantiles)), computed from the exact
    linear-interpolation percentiles of the column — the numeric
    discretizer for tree-model features, calibration bins, and
    monotonic-feature audits.

    bucket = #{cut : value >= cut} over the broadcast cutpoint array;
    NULL values get NULL buckets (preserved, not bucket 0).

    Engine-portability note (why the query layer feeds INTEGER values):
    interpolated cutpoints from integer-valued data are either exact
    order statistics (both engines produce the identical value, no
    arithmetic) or lie >= min-gap*frac away from every data value, so a
    1-ulp pow/interpolation difference between engines can never flip a
    >= comparison.  Feeding raw doubles is correct too but the bucket
    of a value within float-epsilon of a cut is then engine-dependent.

    Scale shape: ONE holistic-percentile agg (1 output row) broadcast
    back over the scan — no sort, no shuffle of the data; the exact
    percentile is the only non-sketch step and is itself one pass.  At
    extreme scale swap F.percentile for approx_percentile, same
    contract.
    """
    qs = [float(q) for q in quantiles]
    cuts = df.agg(F.percentile(value_col, F.lit(qs)).alias("_cuts"))
    bucket = F.aggregate(
        "_cuts", F.lit(0),
        lambda acc, c: acc + F.when(F.col(value_col) >= c, 1).otherwise(0))
    return (df.crossJoin(F.broadcast(cuts))
            .withColumn(out_col,
                        F.when(F.col(value_col).isNull(), F.lit(None))
                        .otherwise(bucket).cast("int"))
            .drop("_cuts"))


def onehot_topk(df: DataFrame, cat_col: str, k: int = 10,
                out_col: str = "cat_index") -> DataFrame:
    """Top-K vocabulary indexing of a categorical: the K most frequent
    categories get stable indices 0..K-1 (by count desc, value asc —
    fully deterministic), everything else (including NULL) maps to -1
    ("other") — the long-format core of one-hot/embedding-table
    encoding where the tail would otherwise explode the feature space.

    Scale shape: one (category) hash-agg with map-side combine; the
    top-K ranking runs over the aggregated category relation (bounded
    by category cardinality, never row grain) via a k-limited window;
    the vocabulary (<= k rows) broadcasts back.  A 10^5-category column
    on 100 TB costs one agg + a broadcast join.
    """
    counts = (df.na.drop(subset=[cat_col])
              .groupBy(F.col(cat_col).alias("_cat"))
              .agg(F.count("*").alias("_n")))
    wv = Window.orderBy(F.col("_n").desc(), F.col("_cat"))
    vocab = (counts.withColumn("_idx", F.row_number().over(wv))
             .filter(F.col("_idx") <= int(k))
             .select("_cat", (F.col("_idx") - 1).cast("int").alias("_idx")))
    return (df.join(F.broadcast(vocab),
                    F.col(cat_col) == F.col("_cat"), "left")
            .withColumn(out_col,
                        F.coalesce(F.col("_idx"), F.lit(-1)).cast("int"))
            .drop("_cat", "_idx"))


def hashed_cross(df: DataFrame, cols: list[str], num_buckets: int = 64,
                 out_col: str = "cross_bucket",
                 tag: str = "cross") -> DataFrame:
    """Hashed feature cross (the hashing-trick interaction feature):
    the tuple of categorical values maps to a stable bucket in
    [0, num_buckets) via the engine-portable md5 hash -- interaction
    terms for linear/FM models without materializing the cross
    vocabulary (|a|*|b| cells never exist anywhere).

    NULL components coalesce to a sentinel (a NULL anywhere would
    NULL the whole hash and silently drop the feature); components
    join with an unprintable separator so ("ab","c") and ("a","bc")
    cross to different buckets.  Map-only: one expression per row, no
    shuffle, no state."""
    from fmx.operators.dedup import hash64

    if len(cols) < 2:
        raise ValueError("hashed_cross needs at least two columns")
    if int(num_buckets) < 1:
        # pmod(x, 0) yields NULL, silently voiding the feature
        raise ValueError("num_buckets must be >= 1")
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\u0000null"))
             for c in cols]
    joined = F.concat_ws("\u0001", *parts)
    key = F.concat(F.lit(f"{tag}:"), joined)
    return df.withColumn(
        out_col, F.pmod(hash64(key), F.lit(int(num_buckets))).cast("int"))


def woe_encode(df: DataFrame, cat_col: str, label_col,
               smooth: float = 0.5) -> DataFrame:
    """Weight-of-evidence table for a categorical feature against a
    binary target: per category (cat, n, n_pos, woe, iv_term) with

        woe = ln( (pos_c + s)/(P + 2s) / ((neg_c + s)/(N + 2s)) )
        iv_term = (pos_c/P - neg_c/N) * woe

    — the scorecard-standard monotone encoding (and its information-
    value contribution, sum(iv_term) = IV) for credit-risk-style
    tabular models; smoothing ``s`` keeps single-class categories
    finite.  Rows with NULL label are excluded (no evidence);
    ``label_col`` may be a name or a boolean/0-1 Column expression.

    Shape: ONE hash-agg over the category (map-side combinable), the
    global pos/neg totals roll up from that bounded agg (never a
    second fact scan — the lift-deciles discipline) and broadcast
    back as a 1-row cross.  All counts are integers, so both engines
    reproduce the ratios and the single ln() bit-identically."""
    y = F.col(label_col) if isinstance(label_col, str) else label_col
    y = y.cast("int")
    per = (df.filter(y.isNotNull())
           .groupBy(F.col(cat_col).alias("cat"))
           .agg(F.count("*").alias("n"), F.sum(y).alias("n_pos")))
    tot = per.agg(F.sum("n_pos").alias("_P"),
                  F.sum(F.col("n") - F.col("n_pos")).alias("_N"))
    s = float(smooth)
    neg = F.col("n") - F.col("n_pos")
    woe = F.log(((F.col("n_pos") + s) / (F.col("_P") + 2 * s))
                / ((neg + s) / (F.col("_N") + 2 * s)))
    # IV uses the UNSMOOTHED class rates: a batch with a missing class
    # (P or N = 0) yields NULL iv_term rather than an ANSI
    # DIVIDE_BY_ZERO (woe itself is always finite via the smoothing)
    iv = (F.col("n_pos") / F.nullif(F.col("_P"), F.lit(0))
          - neg / F.nullif(F.col("_N"), F.lit(0))) * woe
    return (per.crossJoin(F.broadcast(tot))
            .select("cat", F.col("n").cast("bigint").alias("n"),
                    F.col("n_pos").cast("bigint").alias("n_pos"),
                    F.round(woe, 6).alias("woe"),
                    F.round(iv, 6).alias("iv_term")))
