"""Temporal join operators: as-of join and banded range join.

Neither exists as a Spark built-in (reference scope: the reference has
only single-key equi-joins, SURVEY.md §2.3); both are staples of
time-series / feature-store workloads, so they are implemented here as
compositions of DataFrame ops with scale-correct plan shapes:

- ``asof_join`` — the classic "latest right row at or before each left
  row" lookup.  The naive formulation is an inequality join (``r.ts <=
  l.ts``) which Spark can only execute as a broadcast-nested-loop or
  sort-merge-with-range — both blow up on skewed keys.  Instead both
  sides are union-tagged and a single ``last(ignorenulls)`` window
  carries right-side values forward onto left rows: ONE shuffle on the
  key, zero joins, linear in rows.  (Same plan shape Flink/QuestDB use
  for ASOF; DuckDB ships it natively as ``ASOF JOIN``.)
- ``range_join`` — point-in-interval join.  Naively a cross join with a
  between-filter (a ``BroadcastNestedLoopJoin`` — quadratic).  Banding
  makes it an equi-join: each interval explodes into the fixed-width
  buckets it covers, each point lands in exactly one bucket, the join
  key is the bucket id, and the exact bound check runs post-join.  Join
  fan-out is ``len(interval)/bucket_width`` rows per interval — bounded
  and tunable.  (The standard trick behind Databricks' range-join hint
  and interval trees in genomics engines.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "gap_fill", "sessionize",
           "interval_merge", "time_weighted_avg", "theilsen_trend", "ewma",
           "holt_linear"]


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              right_tiebreak: str | None = None,
              tolerance_sec: int | None = None,
              direction: str = "backward",
              suffix: str = "_asof") -> DataFrame:
    """As-of join: attach to every left row the nearest right row on the
    same key(s) — ``direction='backward'`` (default) takes the most
    recent right row with ``right_ts <= left_ts``; ``'forward'`` takes
    the earliest with ``right_ts >= left_ts``.

    Ties on ``right_ts`` are broken by ``right_tiebreak`` (largest wins
    backward, smallest forward), making the result a pure function of
    the data regardless of partitioning.  ``tolerance_sec`` nulls out
    matches farther than the window (pandas ``merge_asof`` semantics).
    Unmatched left rows are kept with nulls — left-outer semantics.

    Plan shape: unionByName -> one Exchange (hashpartitioning on key)
    -> running ``last(ignorenulls=True)`` -> filter.  No join operator
    at all, so there is nothing to skew: each key's rows sort once.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    fwd = direction == "forward"
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts]
    out_names = [f"{c}{suffix}" for c in right_cols]
    clash = ({*out_names, f"{right_ts}{suffix}", "_ts", "_side", "_rts",
              "_tie"} & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join output would collide with left columns {clash}; "
            f"rename them or pass a different suffix")

    r = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
        *([F.col(right_tiebreak).alias("_tie")] if right_tiebreak else []),
    )
    l = (left
         .withColumn("_ts", F.col(left_ts))
         .withColumn("_side", F.lit(1)))
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col("_ts").desc() if fwd else F.col("_ts").asc(),
             F.col("_side").asc()]
    if right_tiebreak:
        order.append(F.col("_tie").desc_nulls_last() if fwd
                     else F.col("_tie").asc_nulls_last())
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    carried = {n: F.last(F.col(n), ignorenulls=True).over(w)
               for n in out_names}
    carried["_match_ts"] = F.last(F.col("_rts"), ignorenulls=True).over(w)
    u = u.withColumns(carried)

    if tolerance_sec is not None:
        gap = (F.unix_timestamp("_match_ts") - F.unix_timestamp("_ts")
               if fwd else
               F.unix_timestamp("_ts") - F.unix_timestamp("_match_ts"))
        in_tol = gap <= F.lit(int(tolerance_sec))
        u = u.withColumns(
            {n: F.when(in_tol, F.col(n)) for n in out_names}
        ).withColumn("_match_ts", F.when(in_tol, F.col("_match_ts")))

    drop = ["_ts", "_side", "_rts"] + (["_tie"] if right_tiebreak else [])
    return (u.filter(F.col("_side") == 1)
            .withColumnRenamed("_match_ts", f"{right_ts}{suffix}")
            .drop(*drop))


def range_join(points: DataFrame, point_col: str,
               intervals: DataFrame, lo_col: str, hi_col: str,
               bucket_width: float,
               how: str = "inner") -> DataFrame:
    """Point-in-interval join: pair every point row with every interval
    row where ``lo <= point < hi``.  Intervals may overlap (a point can
    match many) and the two sides need no shared key.

    Banded equi-join: interval -> explode(sequence(floor(lo/w),
    floor(hi/w))) bucket rows; point -> floor(point/w); equi-join on
    bucket with the exact bound check as a join RESIDUAL condition (not
    a post-join filter — a post-join filter silently drops unmatched
    left rows under ``how='left'``, because their NULL bounds fail the
    predicate).  A (point, interval) pair can meet in at most one
    bucket (the point's), so no dedup is needed.  Pick ``bucket_width``
    near the median interval length: fan-out stays O(1) per interval
    and the residual check discards only edge buckets.

    ``how`` is restricted to ``inner``/``left``: right/full-outer are
    incompatible with banding (an unmatched interval would surface once
    per bucket row).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r} "
            "(right/full would duplicate unmatched intervals per bucket)")
    b = F.lit(float(bucket_width))
    iv = intervals.withColumn(
        "_ibucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / b).cast("long"),
            F.floor(F.col(hi_col) / b).cast("long"))))
    pt = points.withColumn(
        "_pbucket", F.floor(F.col(point_col) / b).cast("long"))
    cond = ((F.col("_pbucket") == F.col("_ibucket"))
            & (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col)))
    return pt.join(iv, cond, how).drop("_pbucket", "_ibucket")


def gap_fill(df: DataFrame, key_cols: list[str], bucket_col: str,
             value_cols: list[str], step: int,
             count_col: str | None = None) -> DataFrame:
    """Time-series gap fill: densify a sparse per-key bucketed series to
    a regular grid and carry values forward (the resample + ffill step
    of every monitoring / feature pipeline).

    ``df`` holds one row per (key, bucket) that HAS data; ``bucket_col``
    is numeric (e.g. epoch seconds already floored to the grid).  Each
    key's grid spans its own [min, max] bucket in ``step`` increments.
    Missing buckets appear with ``was_gap = true``, ``value_cols``
    forward-filled via a running ``last(ignorenulls)`` window, and
    ``count_col`` (if given) zero-filled.

    Plan shape: per-key bounds is one hash-agg; the grid is
    ``explode(sequence(...))`` — generated, never materialized on the
    driver; the fill is ONE window pass per key.  Grid rows per key =
    span/step, independent of input row count, so the densified side
    scales with (keys x time range), not data volume.  Keys partition
    the window — no global sort.
    """
    bounds = df.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx"))
    grid = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("_mn"), F.col("_mx"),
                             F.lit(int(step)))).alias(bucket_col))
    # tag real rows with a non-null marker BEFORE the join: probing a
    # value column for gap-ness would misflag a present row whose value
    # is legitimately NULL (and forward-fill past it)
    dense = grid.join(df.withColumn("_present", F.lit(True)),
                      [*key_cols, bucket_col], "left")
    w = (Window.partitionBy(*key_cols).orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (dense.withColumn("was_gap", F.col("_present").isNull())
           .drop("_present"))
    for c in value_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    if count_col is not None:
        out = out.withColumn(count_col,
                             F.coalesce(F.col(count_col), F.lit(0)))
    return out


def sessionize(df: DataFrame, key_cols: list[str] | str, ts_col: str,
               gap_seconds: int = 1800,
               tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Gap-based sessionization: assign each event a per-key
    ``session_n`` (0-based) that increments whenever the gap to the
    previous event exceeds ``gap_seconds`` — the batch twin of
    Structured Streaming's session window (fmx.streaming.ops), and the
    first step of every clickstream / user-journey pipeline.

    Plan shape: ONE shuffle on the key and ONE window pass — the
    session boundary is ``lag`` + a running ``sum`` over the same
    (partitionBy key, orderBy ts) window spec, so Spark plans a single
    Window operator with two frames, no join and no second sort.  The
    window partitions by user key — no global ordering — so it scales
    with the largest single key's history, not data volume (hot keys:
    cap or split upstream; a single user with 10⁸ events is a data
    bug, not a plan bug).

    ``tiebreak_cols`` breaks equal-timestamp ordering deterministically
    (required for a replayable oracle).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_sess = F.when(gap.isNull() | (gap > F.lit(float(gap_seconds))), 1) \
                .otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_n",
                         (F.sum(new_sess).over(wrun) - F.lit(1))
                         .cast("bigint"))


def interval_merge(df: DataFrame, key_cols: list[str] | str,
                   start_col: str, end_col: str) -> DataFrame:
    """Merge OVERLAPPING (or touching) intervals per key into maximal
    disjoint islands: one row per island with its span and how many
    input intervals it absorbed — the interval union behind "total
    watch time", "machine busy time", SLA coverage, and span-level
    text-annotation dedup (gaps-and-islands over typed intervals, not
    just point events).

    An island starts where an interval's start exceeds the running max
    of all earlier ends (per key, ordered by start) — one shuffle on
    the key and ONE window pass for the boundary flag + running island
    id, then one hash-agg per island.  Same scale envelope as
    ``sessionize``: bounded by the largest single key's history.
    Intervals with end < start are treated as zero-length at start
    (clamped via greatest).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    s = F.col(start_col).cast("double")
    e = F.greatest(F.col(end_col).cast("double"), s)
    w = Window.partitionBy(*keys).orderBy(s.asc(), e.asc())
    prev_max_end = F.max(e).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(prev_max_end.isNull() | (s > prev_max_end), 1) \
                  .otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = (df.withColumn("_s", s).withColumn("_e", e)
              .withColumn("island",
                          (F.sum(new_island).over(wrun) - F.lit(1))
                          .cast("bigint")))
    return (tagged.groupBy(*keys, "island")
            .agg(F.min("_s").alias("island_start"),
                 F.max("_e").alias("island_end"),
                 F.count("*").cast("bigint").alias("n_intervals"))
            .withColumn("covered",
                        F.round(F.col("island_end")
                                - F.col("island_start"), 6)))


def time_weighted_avg(df: DataFrame, key_cols: list[str], ts_col: str,
                      val_col: str, tiebreak: str | None = None,
                      out_col: str = "twap") -> DataFrame:
    """Time-weighted average per key (TWAP): each observation's value is
    weighted by how long it remained current — the correct mean for
    irregularly-sampled state (a price that held for an hour counts 60x
    one that held a minute; a plain avg() treats them equally).

    Weight = seconds until the key's NEXT observation (lead window);
    the final observation has no duration and drops out, so keys with a
    single observation are excluded.  One shuffle on the key; the lead
    window is per-key, never global.

    Returns key_cols + (n_obs, duration_sec, out_col), values rounded
    to 6dp.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    sec = F.col(ts_col).cast("double")
    dt = F.lead(sec).over(w) - sec
    return (df.filter(F.col(val_col).isNotNull())
            .withColumn("_dt", dt)
            .filter(F.col("_dt").isNotNull())
            .groupBy(*key_cols)
            .agg(F.count("*").cast("bigint").alias("n_obs"),
                 F.round(F.sum("_dt"), 6).alias("duration_sec"),
                 F.round(F.sum(F.col(val_col) * F.col("_dt"))
                         / F.sum("_dt"), 6).alias(out_col)))


def ewma(df: DataFrame, key_cols: list[str], ts_col: str,
         value_col: str, alpha: float = 0.3, span: int = 8,
         out_col: str = "ewma") -> DataFrame:
    """Exponentially weighted moving average over the trailing
    ``span`` rows of each key's ordered series:

        ewma_t = sum_i (1-a)^i * x_{t-i} / sum_i (1-a)^i   (i < span,
                                                            x non-null)

    — the smoother behind monitoring baselines and anomaly bands
    (reacts faster than a flat moving average, bounded memory unlike
    the infinite-history recurrence).  Truncating at ``span`` rows
    makes the operator a PURE windowed expression: one window pass
    per key emits an explicit lag chain, every weight is a Python
    float literal baked into the plan, and the additions associate
    left-to-right — so any engine (and the DuckDB oracle) replays the
    IEEE arithmetic bit-for-bit.  NULL values drop out of both
    numerator and weight mass (gaps don't decay the average toward
    0).  The window is per-key over ``span`` rows — no global sort,
    no unbounded state; for the infinite-memory recurrence use the
    streaming register stack instead."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    q = 1.0 - float(alpha)
    num = None
    den = None
    for i in range(int(span)):
        xi = F.col(value_col) if i == 0 else F.lag(value_col, i).over(w)
        wi = F.lit(q ** i)
        term = F.when(xi.isNotNull(), wi * xi).otherwise(F.lit(0.0))
        mass = F.when(xi.isNotNull(), wi).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = mass if den is None else den + mass
    return df.withColumn(out_col, num / F.nullif(den, F.lit(0.0)))


def theilsen_trend(df: DataFrame, ts_col: str, value_col) -> DataFrame:
    """Theil-Sen robust trend over a (time, value) series: one row
    (n_points, n_pairs, slope_per_day, intercept) where slope is the
    MEDIAN of all pairwise slopes and intercept the median of
    (y - slope*x) — the outlier-immune alternative to least squares
    (one bad export day drags an OLS fit; Theil-Sen tolerates ~29%
    contamination).

    Intended for BOUNDED series (day/hour grain after an upstream
    aggregation — calendar-bounded like the CUSUM/autocorrelation
    queries): the pairwise self-join is quadratic in the series
    length, which is exactly why the series must be grain-bounded
    first, never row-grain.  x is integer days from the series start
    and y integer-derived, so every pairwise slope is the same double
    in any engine and the exact median interpolation reproduces
    bit-identically — results ship UNROUNDED (the ts_ewma round()
    lesson)."""
    y = (F.col(value_col) if isinstance(value_col, str)
         else value_col).alias("y")
    pts = df.select(F.col(ts_col).alias("t"), y)
    base = pts.agg(F.min("t").alias("t0"))
    xy = (pts.crossJoin(F.broadcast(base))
          .select(F.datediff("t", "t0").cast("double").alias("x"),
                  F.col("y").cast("double").alias("y")))
    a = xy.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = xy.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = (a.join(b, F.col("xa") < F.col("xb"))
              .select(((F.col("yb") - F.col("ya"))
                       / (F.col("xb") - F.col("xa"))).alias("m")))
    med_m = slopes.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.percentile("m", F.lit(0.5)).alias("slope"))
    resid = (xy.crossJoin(F.broadcast(med_m))
             .select("n_pairs", "slope",
                     (F.col("y") - F.col("slope") * F.col("x"))
                     .alias("r")))
    return resid.groupBy("n_pairs", "slope").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.percentile("r", F.lit(0.5)).alias("intercept")
    ).select("n_points", "n_pairs", "slope", "intercept")


def holt_linear(df: DataFrame, key_cols: list[str], ts_col: str,
                value_col: str, alpha: float = 0.5,
                beta: float = 0.3) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key — the
    two-state recursion EWMA cannot express (level AND trend evolve
    together):

        l_t = a*x_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}

    with the classic init l_1 = x_1, b_1 = x_2 - x_1.  Returns one row
    per key: (keys..., n_points, level, trend, forecast_1 = level +
    trend) — the 1-step-ahead forecast that seeds capacity planning
    and anomaly bands on trending series.

    Shapes: one hash agg collects each key's series (collect_list of
    (ts, x) structs, array_sort — CALENDAR-BOUNDED by contract: feed
    this daily/hourly rollups, never raw events; the array is then
    days-per-key long, not rows-per-key), and the recursion runs as a
    single ``aggregate`` higher-order fold — whole-stage-codegen
    JVM arithmetic, no Python, no window, no shuffle beyond the one
    hash agg.  Every coefficient is a Python float literal baked into
    the plan and the fold associates left-to-right, so any engine
    (the DuckDB oracle replays it via a recursive CTE) reproduces the
    IEEE arithmetic bit-for-bit; keys with fewer than 2 points are
    dropped (the init needs two).
    """
    a, b = float(alpha), float(beta)
    oma, omb = 1.0 - a, 1.0 - b
    lnew = f"({a!r} * x + {oma!r} * (acc.l + acc.b))"
    fold = (
        "aggregate("
        "  slice(_vs, 3, greatest(size(_vs) - 2, 0)),"
        "  named_struct('l', CAST(element_at(_vs, 1) AS DOUBLE),"
        "               'b', CAST(element_at(_vs, 2)"
        "                         - element_at(_vs, 1) AS DOUBLE)),"
        "  (acc, x) -> named_struct("
        f"     'l', {lnew},"
        f"     'b', {b!r} * ({lnew} - acc.l) + {omb!r} * acc.b))")
    series = (df.groupBy(*key_cols)
              .agg(F.array_sort(
                       F.collect_list(F.struct(
                           F.col(ts_col).alias("t"),
                           F.col(value_col).cast("double").alias("x"))))
                   .alias("_arr"))
              .select(*key_cols,
                      F.expr("transform(_arr, s -> s.x)").alias("_vs"))
              .filter(F.size("_vs") >= 2))
    return (series
            .select(*key_cols,
                    F.size("_vs").cast("bigint").alias("n_points"),
                    F.expr(fold).alias("_hw"))
            .select(*key_cols, "n_points",
                    F.col("_hw.l").alias("level"),
                    F.col("_hw.b").alias("trend"),
                    (F.col("_hw.l") + F.col("_hw.b")).alias("forecast_1")))


def holt_winters_additive(df: DataFrame, key_cols: list[str],
                          ts_col: str, value_col: str, period: int = 7,
                          alpha: float = 0.5, beta: float = 0.3,
                          gamma: float = 0.2) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing per key —
    the seasonal extension of :func:`holt_linear` (level + trend +
    a length-``period`` seasonal register):

        l_t = a*(x_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}
        s_t = g*(x_t - l_t) + (1-g)*s_{t-m}

    Classic simple init over the first season: l_m = mean(x_1..x_m),
    b_m = 0, s_i = x_i - l_m; the fold starts at t = m+1.  Returns one
    row per key: (keys..., n_points, level, trend, season_next,
    forecast_1 = level + trend + season_next) — the 1-step forecast a
    trend-only Holt biases on day-of-week-seasonal series.

    Same shapes and engine discipline as holt_linear: one hash agg
    collects the CALENDAR-BOUNDED series, the recursion is a single
    ``aggregate`` higher-order fold whose accumulator carries the
    seasonal register as a rotating ARRAY field (head = s_{t-m},
    rotate-and-append each step — bounded at ``period`` doubles
    forever), every coefficient is a literal, and the level expression
    is textually repeated inside the trend/season updates exactly as
    the DuckDB recursive-CTE oracle repeats it (the list_reduce
    stale-struct trap is avoided on both sides).  Keys with fewer
    than period+1 points are dropped."""
    a, b, g = float(alpha), float(beta), float(gamma)
    m = int(period)
    oma, omb, omg = 1.0 - a, 1.0 - b, 1.0 - g
    lnew = (f"({a!r} * (x - element_at(acc.s, 1))"
            f" + {oma!r} * (acc.l + acc.b))")
    # explicit left-to-right parenthesization so both engines add the
    # first season in the identical IEEE order
    acc_sum = "element_at(_vs, 1)"
    for i in range(2, m + 1):
        acc_sum = f"({acc_sum} + element_at(_vs, {i}))"
    l0 = f"(CAST({acc_sum} AS DOUBLE) / {float(m)!r})"
    s0 = ("array(" + ", ".join(
        [f"CAST(element_at(_vs, {i}) AS DOUBLE) - _l0"
         for i in range(1, m + 1)]) + ")")
    fold = (
        "aggregate("
        f"  slice(_vs, {m + 1}, greatest(size(_vs) - {m}, 0)),"
        "  named_struct('l', _l0, 'b', CAST(0.0 AS DOUBLE),"
        f"               's', {s0}),"
        "  (acc, x) -> named_struct("
        f"     'l', {lnew},"
        f"     'b', {b!r} * ({lnew} - acc.l) + {omb!r} * acc.b,"
        f"     's', concat(slice(acc.s, 2, {m - 1}),"
        f"                 array({g!r} * (x - {lnew})"
        f"                       + {omg!r} * element_at(acc.s, 1)))))")
    series = (df.groupBy(*key_cols)
              .agg(F.array_sort(
                       F.collect_list(F.struct(
                           F.col(ts_col).alias("t"),
                           F.col(value_col).cast("double").alias("x"))))
                   .alias("_arr"))
              .select(*key_cols,
                      F.expr("transform(_arr, s -> s.x)").alias("_vs"))
              .filter(F.size("_vs") >= m + 1)
              .withColumn("_l0", F.expr(l0)))
    return (series
            .select(*key_cols,
                    F.size("_vs").cast("bigint").alias("n_points"),
                    F.expr(fold).alias("_hw"))
            .select(*key_cols, "n_points",
                    F.col("_hw.l").alias("level"),
                    F.col("_hw.b").alias("trend"),
                    F.expr("element_at(_hw.s, 1)").alias("season_next"),
                    (F.col("_hw.l") + F.col("_hw.b")
                     + F.expr("element_at(_hw.s, 1)"))
                    .alias("forecast_1")))
