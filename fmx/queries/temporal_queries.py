"""Temporal-join capability queries: as-of join, banded range join, and
a hypertable-style multi-resolution time rollup over the events table.

Engine extensions beyond the reference (whose only joins are single-key
equi-joins — SURVEY.md §2.3); the operators live in
fmx.operators.temporal with scale notes there."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fmx.operators.temporal import asof_join, range_join
from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"
DEC = "decimal(38,0)"

ASOF_TOL = 7200          # 2h attribution window
N_BANDS = 130            # price bands: [900+10i, 925+10i) — overlapping


@query(
    "asof_purchase_last_click",
    headline=True,
    oracle=f"""
    WITH c AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase'),
    m AS (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
             c.event_id AS click_id, c.ts AS c_ts,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT CAST(purchase_id AS BIGINT) AS purchase_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(CASE WHEN date_diff('second', c_ts, p_ts) <= {ASOF_TOL}
                     THEN click_id END AS BIGINT) AS click_id,
           CAST(CASE WHEN date_diff('second', c_ts, p_ts) <= {ASOF_TOL}
                     THEN date_diff('second', c_ts, p_ts) END AS BIGINT)
               AS lag_sec
    FROM m WHERE rn = 1
    """)
def asof_purchase_last_click(spark, sf):
    """As-of join: for every purchase, the user's most recent click at
    or before it (ties -> largest event_id), nulled beyond a 2 h
    tolerance.  Runs as union + carry-forward window — one shuffle on
    user_id, no join operator, unlike the O(clicks x purchases)
    inequality join the oracle spells out."""
    ev = T(spark, sf, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", "ts", "event_id"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         "user_id", "ts"))
    j = asof_join(purchases, clicks, on="user_id",
                  right_cols=["event_id"], right_tiebreak="event_id",
                  tolerance_sec=ASOF_TOL)
    return j.select(
        F.col("purchase_id").cast(BIG).alias("purchase_id"),
        F.col("user_id").cast(BIG).alias("user_id"),
        F.col("event_id_asof").cast(BIG).alias("click_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_asof"))
        .cast(BIG).alias("lag_sec"))


@query(
    "range_join_price_bands",
    oracle=f"""
    WITH bands AS (
      SELECT i AS band_id, 900.0 + 10 * i AS lo, 925.0 + 10 * i AS hi
      FROM (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS i))
    SELECT CAST(band_id AS BIGINT) AS band_id,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(avg(p_retailprice), 2) AS avg_price
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY band_id
    """)
def range_join_price_bands(spark, sf):
    """Banded range join: parts priced into overlapping width-25 bands
    (each part matches up to 3).  The oracle's inequality join becomes
    a bucket equi-join (width 10) + exact bound verify — no
    nested-loop, fan-out <= 4 bucket rows per interval."""
    bands = spark.range(N_BANDS).select(
        F.col("id").alias("band_id"),
        (900.0 + 10 * F.col("id")).alias("lo"),
        (925.0 + 10 * F.col("id")).alias("hi"))
    parts = T(spark, sf, "part").select("p_partkey", "p_retailprice")
    joined = range_join(parts, "p_retailprice", bands, "lo", "hi",
                        bucket_width=10.0)
    return (joined.groupBy("band_id")
            .agg(F.count("*").cast(BIG).alias("n_parts"),
                 F.round(F.avg("p_retailprice"), 2).alias("avg_price"))
            .select(F.col("band_id").cast(BIG).alias("band_id"),
                    "n_parts", "avg_price"))


@query(
    "hypertable_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY ROLLUP (day, hour)
    """)
def hypertable_rollup(spark, sf):
    """Hypertable-style continuous aggregate: one pass producing the
    hour grain, its day rollup, and the grand total (ROLLUP grouping
    sets) — the materialization step of a multi-resolution time-series
    store.  Partial aggregation keeps the shuffle at grain cardinality,
    not row count."""
    ev = T(spark, sf, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH")
        .alias("hour"),
        "value")
    return (ev.rollup("day", "hour")
            .agg(F.count("*").cast(BIG).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value")))


GF_STEP = 900            # 15-minute resample grid


@query(
    "ts_gap_fill",
    oracle=f"""
    WITH agg AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / {GF_STEP}) * {GF_STEP} AS BIGINT)
                 AS bucket_s,
             CAST(count(*) AS BIGINT) AS n_events,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT event_type, min(bucket_s) AS mn, max(bucket_s) AS mx
               FROM agg GROUP BY event_type),
    grid AS (SELECT event_type,
                    unnest(generate_series(mn, mx, {GF_STEP})) AS bucket_s
             FROM bounds),
    dense AS (SELECT g.event_type, g.bucket_s, a.n_events, a.avg_value
              FROM grid g LEFT JOIN agg a USING (event_type, bucket_s))
    SELECT event_type, CAST(bucket_s AS BIGINT) AS bucket_s,
           CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
           last_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bucket_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS avg_value,
           (n_events IS NULL) AS was_gap
    FROM dense
    """)
def ts_gap_fill(spark, sf):
    """Resample + forward-fill: events bucketed to a 15-minute grid per
    event_type, missing buckets densified (was_gap) with the last
    observed average carried forward.  Grid rows are generated via
    explode(sequence(...)) — sized by (keys x span), not data volume —
    and the fill is one window pass per key."""
    from fmx.operators.temporal import gap_fill
    ev = T(spark, sf, "events")
    agg = (ev.groupBy(
               "event_type",
               (F.floor(F.unix_timestamp("ts") / GF_STEP) * GF_STEP)
               .cast(BIG).alias("bucket_s"))
           .agg(F.count("*").cast(BIG).alias("n_events"),
                F.round(F.avg("value"), 6).alias("avg_value")))
    out = gap_fill(agg, ["event_type"], "bucket_s", ["avg_value"],
                   GF_STEP, count_col="n_events")
    return out.select("event_type", F.col("bucket_s").cast(BIG),
                      F.col("n_events").cast(BIG), "avg_value", "was_gap")


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_s,
             ts, event_id, value
      FROM events),
    rn AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, hour_s
                                ORDER BY ts, event_id) AS rf,
             row_number() OVER (PARTITION BY event_type, hour_s
                                ORDER BY ts DESC, event_id DESC) AS rl
      FROM base)
    SELECT event_type, hour_s,
           round(max(CASE WHEN rf = 1 THEN value END), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(CASE WHEN rl = 1 THEN value END), 6) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS volume
    FROM rn GROUP BY 1, 2
    """)
def ts_resample_ohlc(spark, sf):
    """OHLC bar resample: per (event_type, hour) the opening / high /
    low / closing value plus volume — the downsample step of a metrics
    store.  First/last are deterministic (ties broken on event_id) via
    two ranking windows over the same one shuffle; the bar agg itself
    is partial-aggregated at grain cardinality."""
    ev = T(spark, sf, "events").select(
        "event_type", "ts", "event_id", "value",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
        .cast(BIG).alias("hour_s"))
    wf = Window.partitionBy("event_type", "hour_s").orderBy("ts", "event_id")
    wl = Window.partitionBy("event_type", "hour_s").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (ev.withColumn("rf", F.row_number().over(wf))
            .withColumn("rl", F.row_number().over(wl))
            .groupBy("event_type", "hour_s")
            .agg(F.round(F.max(F.when(F.col("rf") == 1, F.col("value"))), 6)
                 .alias("open"),
                 F.round(F.max("value"), 6).alias("high"),
                 F.round(F.min("value"), 6).alias("low"),
                 F.round(F.max(F.when(F.col("rl") == 1, F.col("value"))), 6)
                 .alias("close"),
                 F.count("*").cast(BIG).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("volume")))


@query(
    "ts_moving_avg",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n, round(sum(value), 4) AS amount
      FROM events GROUP BY event_type, date_trunc('hour', ts))
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(n AS BIGINT) AS n,
           round(avg(n) OVER w, 4) AS ma7_n,
           round(avg(amount) OVER w, 4) AS ma7_amount
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """)
def ts_moving_avg(spark, sf):
    """Trailing 7-hour moving average of event rate and amount per
    type: ONE shuffle on (type, hour) builds the series, then a
    bounded-frame window over the aggregate — frame cost is O(7) per
    row and the windowed relation is data-volume-independent (hours x
    types), so the same plan holds at any event volume."""
    hourly = (T(spark, sf, "events")
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("_h"))
              .agg(F.count("*").alias("n"),
                   F.round(F.sum("value"), 4).alias("amount")))
    w = (Window.partitionBy("event_type").orderBy("_h")
         .rowsBetween(-6, Window.currentRow))
    return (hourly.select(
        "event_type",
        F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast(BIG).alias("n"),
        F.round(F.avg("n").over(w), 4).alias("ma7_n"),
        F.round(F.avg("amount").over(w), 4).alias("ma7_amount")))


@query(
    "ts_trailing_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    scored AS (
      SELECT event_type, h, n,
             avg(n) OVER w AS mu,
             stddev_pop(n) OVER w AS sd,
             count(*) OVER w AS m
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(n AS BIGINT) AS n,
           round((n - mu) / sd, 4) AS trailing_z
    FROM scored
    WHERE m >= 12 AND sd > 0
      AND abs(round((n - mu) / sd, 4)) > 3.0
    """)
def ts_trailing_anomaly(spark, sf):
    """Streaming-style anomaly gate: each hour's event count scored
    against the TRAILING 24 hours only (exclusive frame — no lookahead
    leakage, the form an online monitor can actually compute), flagged
    beyond 3 sigma once 12 history hours exist.  Same single-shuffle
    series + bounded-frame window shape as ts_moving_avg; the rounded
    z is thresholded identically in both engines."""
    hourly = (T(spark, sf, "events")
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("_h"))
              .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("_h")
         .rowsBetween(-24, -1))
    scored = hourly.select(
        "event_type", "_h", "n",
        F.avg("n").over(w).alias("_mu"),
        F.stddev_pop("n").over(w).alias("_sd"),
        F.count("*").over(w).alias("_m"))
    z = F.round((F.col("n") - F.col("_mu")) / F.col("_sd"), 4)
    return (scored.filter((F.col("_m") >= 12) & (F.col("_sd") > 0)
                          & (F.abs(z) > 3.0))
            .select("event_type",
                    F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                    F.col("n").cast(BIG).alias("n"),
                    z.alias("trailing_z")))


@query(
    "ts_dod_growth",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    cmp AS (
      SELECT event_type, h, n,
             lag(n, 24) OVER (PARTITION BY event_type ORDER BY h) AS prev
      FROM hourly)
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(n AS BIGINT) AS n, CAST(prev AS BIGINT) AS n_prev_day,
           round((n - prev) * 100.0 / prev, 4) AS growth_pct
    FROM cmp WHERE prev IS NOT NULL
    """)
def ts_dod_growth(spark, sf):
    """Day-over-day growth of the hourly event rate per type (lag 24
    ROWS on the observed series — exactly 24 hours when every hour has
    events, as here; densify with gap_fill first if hours can be
    missing): the same single-shuffle series as ts_moving_avg with one
    lag window — the daily-seasonality-aware 'is today normal'
    comparison (contrast ts_trailing_anomaly's trailing-mean form,
    which a daily cycle would constantly trip)."""
    hourly = (T(spark, sf, "events")
              .groupBy("event_type", F.date_trunc("hour", "ts").alias("_h"))
              .agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type").orderBy("_h")
    out = hourly.withColumn("_prev", F.lag("n", 24).over(w))
    return (out.filter(F.col("_prev").isNotNull())
            .select("event_type",
                    F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
                    F.col("n").cast(BIG).alias("n"),
                    F.col("_prev").cast(BIG).alias("n_prev_day"),
                    F.round((F.col("n") - F.col("_prev")) * 100.0
                            / F.col("_prev"), 4).alias("growth_pct")))


@query(
    "ts_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch(ts) AS s, epoch(ts) + value * 60 AS e
      FROM events),
    m AS (
      SELECT user_id, s, greatest(e, s) AS e2,
             max(greatest(e, s)) OVER (
               PARTITION BY user_id ORDER BY s, greatest(e, s)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM iv),
    isl AS (
      SELECT user_id, s, e2,
             sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s, e2
                     ROWS UNBOUNDED PRECEDING) - 1 AS island
      FROM m)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(island AS BIGINT) AS island,
           round(min(s), 6) AS island_start,
           round(max(e2), 6) AS island_end,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(max(e2) - min(s), 6) AS covered
    FROM isl GROUP BY user_id, island
    """)
def ts_interval_coverage(spark, sf):
    """Interval union per user: each event opens a [ts, ts + value
    minutes] activity span; overlapping spans merge into maximal
    islands with their covered duration — the "total busy time"
    interval-merge (gaps-and-islands over typed intervals, not point
    events).  One shuffle on the key, one window pass for the island
    boundary (running max of prior ends), one hash-agg per island
    (fmx.operators.temporal.interval_merge)."""
    from fmx.operators.temporal import interval_merge

    ev = T(spark, sf, "events").select(
        "user_id", F.col("ts").cast("double").alias("s"),
        (F.col("ts").cast("double") + F.col("value") * 60).alias("e"))
    out = interval_merge(ev, "user_id", "s", "e")
    return out.select(F.col("user_id").cast("bigint").alias("user_id"),
                      "island",
                      F.round("island_start", 6).alias("island_start"),
                      F.round("island_end", 6).alias("island_end"),
                      "n_intervals", "covered")


@query(
    "ts_time_weighted_avg",
    oracle="""
    WITH obs AS (
      SELECT user_id, epoch(ts) AS s, value,
             lead(epoch(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) - epoch(ts)
                 AS dt
      FROM events WHERE value IS NOT NULL)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_obs,
           round(sum(dt), 2) AS duration_sec,
           round(sum(value * dt) / sum(dt), 6) AS twap
    FROM obs WHERE dt IS NOT NULL
    GROUP BY user_id
    """)
def ts_time_weighted_avg(spark, sf):
    """Time-weighted average value per user (TWAP): each observation is
    weighted by how long it stayed current (seconds to the user's next
    event) — the correct mean for irregularly-sampled state, where a
    plain avg() overweights bursts.  One shuffle on the key; the lead
    window is per-key, never global."""
    from fmx.operators.temporal import time_weighted_avg

    out = time_weighted_avg(T(spark, sf, "events"), ["user_id"], "ts",
                            "value", tiebreak="event_id")
    return out.select(F.col("user_id").cast(BIG).alias("user_id"),
                      "n_obs",
                      F.round("duration_sec", 2).alias("duration_sec"),
                      "twap")


@query(
    "ts_seasonal_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    f AS (SELECT event_type, d, n,
                 lag(n, 7) OVER (PARTITION BY event_type ORDER BY d)
                     AS pred
          FROM daily)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(n - pred)), 4) AS mae,
           round(avg(abs(n - pred) * 100.0 / n), 4) AS mape_pct,
           round(avg(abs(n - pred) * 200.0 / (n + pred)), 4) AS smape_pct
    FROM f WHERE pred IS NOT NULL GROUP BY event_type
    """)
def ts_seasonal_backtest(spark, sf):
    """Seasonal-naive forecast backtest per event type: predict each
    day's event count with the count 7 observed days earlier, score
    MAE / MAPE / sMAPE over every evaluable day — the baseline every
    forecasting pipeline must beat, and the cheapest continuous
    'is the metric still forecastable' monitor.  The corpus collapses
    to the day-grain series first (one agg), so the lag window and
    error agg run over calendar-bounded rows at any event volume;
    as with ts_dod_growth, lag is 7 ROWS on the OBSERVED series —
    densify with gap_fill when days can be empty."""
    daily = (T(spark, sf, "events")
             .groupBy("event_type", F.to_date("ts").alias("_d"))
             .agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type").orderBy("_d")
    f = (daily.withColumn("pred", F.lag("n", 7).over(w))
         .filter(F.col("pred").isNotNull()))
    err = F.abs(F.col("n") - F.col("pred"))
    return (f.groupBy("event_type")
            .agg(F.count("*").cast(BIG).alias("n_days"),
                 F.round(F.avg(err), 4).alias("mae"),
                 F.round(F.avg(err * 100.0 / F.col("n")), 4)
                 .alias("mape_pct"),
                 F.round(F.avg(err * 200.0 / (F.col("n")
                                              + F.col("pred"))), 4)
                 .alias("smape_pct")))


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
                   FROM events GROUP BY CAST(ts AS DATE)),
    tot AS (SELECT count(*) AS k_all, sum(n) AS s_all FROM daily),
    cum AS (SELECT d, n,
                   sum(n) OVER (ORDER BY d) AS s,
                   row_number() OVER (ORDER BY d) AS k
            FROM daily)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n,
           round(abs(s - k * 1.0 * s_all / k_all), 4) AS cusum_dev,
           CAST(CASE WHEN abs(s - k * 1.0 * s_all / k_all) =
                     max(abs(s - k * 1.0 * s_all / k_all)) OVER ()
                THEN 1 ELSE 0 END AS BIGINT) AS is_changepoint
    FROM cum, tot
    """)
def ts_cusum_changepoint(spark, sf):
    """CUSUM mean-shift localization on the daily event-rate series:
    deviation of the cumulative sum from the global-rate line, maximal
    at the most likely changepoint — the standard 'when did the
    pipeline's behavior change' screen.  The corpus collapses to the
    day-grain series first, so the cumulative/argmax windows run over
    calendar-bounded rows at any event volume; the global rate enters
    as a 1-row broadcast."""
    daily = (T(spark, sf, "events")
             .groupBy(F.to_date("ts").alias("d"))
             .agg(F.count("*").alias("n")))
    tot = daily.agg(F.count("*").alias("k_all"),
                    F.sum("n").alias("s_all"))
    wc = Window.orderBy("d")
    wall = Window.partitionBy()
    cum = (daily.crossJoin(F.broadcast(tot))
           .select("d", "n",
                   F.sum("n").over(wc).alias("s"),
                   F.row_number().over(wc).alias("k"),
                   "k_all", "s_all"))
    dev = F.abs(F.col("s") - F.col("k") * F.col("s_all")
                / F.col("k_all"))
    return (cum.withColumn("_dev", dev)
            .withColumn("_mx", F.max("_dev").over(wall))
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    F.col("n").cast(BIG).alias("n"),
                    F.round("_dev", 4).alias("cusum_dev"),
                    F.when(F.col("_dev") == F.col("_mx"), 1)
                    .otherwise(0).cast(BIG).alias("is_changepoint")))


@query(
    "ts_concurrent_orders",
    oracle="""
    WITH ship AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS sd
                  FROM lineitem GROUP BY l_orderkey),
    iv AS (SELECT CAST(o.o_orderdate AS DATE) AS od, ship.sd
           FROM orders o JOIN ship ON o.o_orderkey = ship.l_orderkey),
    deltas AS (SELECT od AS d, 1 AS delta FROM iv
               UNION ALL SELECT sd + 1 AS d, -1 AS delta FROM iv),
    byday AS (SELECT d,
                     sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
                         AS opened,
                     sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END)
                         AS closed,
                     sum(delta) AS net
              FROM deltas GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(opened AS BIGINT) AS opened,
           CAST(closed AS BIGINT) AS closed,
           CAST(sum(net) OVER (ORDER BY d) AS BIGINT) AS open_orders
    FROM byday
    """)
def ts_concurrent_orders(spark, sf):
    """Concurrent open orders over time (placed but not fully
    shipped): the +1/-1 interval-counting pattern — every order emits
    an open delta at its order date and a close delta the day after
    its last shipment, deltas collapse to day grain, one cumulative
    sum walks the calendar.  The staffing/inventory sibling of
    interval_merge: row-grain work is two map-side deltas + one
    day-grain agg; the only window runs over calendar-bounded rows no
    matter how many orders exist."""
    ship = (T(spark, sf, "lineitem")
            .groupBy("l_orderkey")
            .agg(F.max(F.to_date("l_shipdate")).alias("sd")))
    iv = (T(spark, sf, "orders")
          .select(F.col("o_orderkey"),
                  F.to_date("o_orderdate").alias("od"))
          .join(ship, F.col("o_orderkey") == F.col("l_orderkey")))
    deltas = (iv.select(F.col("od").alias("d"), F.lit(1).alias("delta"))
              .unionByName(iv.select(F.date_add("sd", 1).alias("d"),
                                     F.lit(-1).alias("delta"))))
    byday = (deltas.groupBy("d")
             .agg(F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                  .alias("opened"),
                  F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
                  .alias("closed"),
                  F.sum("delta").alias("net")))
    w = Window.orderBy("d")
    return (byday.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("opened").cast(BIG).alias("opened"),
        F.col("closed").cast(BIG).alias("closed"),
        F.sum("net").over(w).cast(BIG).alias("open_orders")))


@query(
    "ts_autocorrelation",
    oracle="""
    WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
                   FROM events GROUP BY CAST(ts AS DATE)),
    x AS (SELECT n,
                 lag(n, 1) OVER (ORDER BY d) AS l1,
                 lag(n, 7) OVER (ORDER BY d) AS l7
          FROM daily),
    a AS (SELECT corr(n, l1) AS a1, corr(n, l7) AS a7 FROM x)
    SELECT CAST(1 AS BIGINT) AS lag, round(a1, 6) AS acf FROM a
    UNION ALL
    SELECT CAST(7 AS BIGINT) AS lag, round(a7, 6) AS acf FROM a
    """)
def ts_autocorrelation(spark, sf):
    """Lag-1 and lag-7 autocorrelation of the daily event-rate series
    — the two numbers that say whether yesterday predicts today and
    whether the series has weekly seasonality (and therefore which
    baseline ts_seasonal_backtest should use).  Day-grain collapse
    first; lag windows and Pearson corr over calendar-bounded rows;
    corr skips the lag-head NULL pairs identically in both engines."""
    daily = (T(spark, sf, "events")
             .groupBy(F.to_date("ts").alias("d"))
             .agg(F.count("*").alias("n")))
    w = Window.orderBy("d")
    x = daily.select("n",
                     F.lag("n", 1).over(w).alias("l1"),
                     F.lag("n", 7).over(w).alias("l7"))
    a = x.agg(F.corr("n", "l1").alias("a1"),
              F.corr("n", "l7").alias("a7"))
    rows = F.array(
        F.struct(F.lit(1).cast(BIG).alias("lag"),
                 F.round("a1", 6).alias("acf")),
        F.struct(F.lit(7).cast(BIG).alias("lag"),
                 F.round("a7", 6).alias("acf")))
    return (a.select(F.explode(rows).alias("r"))
            .select("r.lag", "r.acf"))


EWMA_ALPHA = 0.3
EWMA_SPAN = 8


def _ewma_oracle() -> str:
    """Lag-chain oracle mirroring fmx.operators.temporal.ewma term by
    term: python-float weight literals (repr round-trips to the exact
    same double in DuckDB) and left-associated additions over
    integer-exact hourly means, so both engines run identical IEEE
    ops end to end and NO output rounding is needed (round() itself
    diverges across engines on half-boundary decimals — the sf0.1
    sweep caught round(avg,6) flipping 43.4728125)."""
    q = 1.0 - EWMA_ALPHA
    num, den = [], []
    for i in range(EWMA_SPAN):
        x = "v" if i == 0 else f"lag(v, {i}) OVER w"
        # CAST AS DOUBLE is load-bearing: DuckDB parses a bare decimal
        # literal as DECIMAL, so without it the DENOMINATOR chain
        # (both CASE branches literal) sums in exact DECIMAL and casts
        # to double ONCE at the division — 1 ULP off the
        # left-associated IEEE double chain Spark runs (caught by the
        # r13 full byte-exact sweep: 868 sf0.001 / 3385 sf0.01 rows).
        # With the cast, every + runs on doubles and both engines
        # replay the identical fold.
        w = f"CAST({q ** i!r} AS DOUBLE)"
        num.append(f"CASE WHEN {x} IS NOT NULL THEN {w} * {x} ELSE 0.0 END")
        den.append(f"CASE WHEN {x} IS NOT NULL THEN {w} ELSE 0.0 END")
    return f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS c,
             count(value) AS nv
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    hv AS (SELECT event_type, h,
                  c / (100.0 * nullif(nv, 0)) AS v
           FROM hourly)
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           v AS hourly_avg,
           ({' + '.join(num)})
               / nullif({' + '.join(den)}, 0.0) AS ewma
    FROM hv
    WINDOW w AS (PARTITION BY event_type ORDER BY h)
    """


@query("ts_ewma", oracle=_ewma_oracle())
def ts_ewma(spark, sf):
    """Exponentially weighted moving average of the hourly mean event
    value per event type (fmx.operators.temporal.ewma, alpha=0.3 over
    the trailing 8 hours): the monitoring baseline that reacts faster
    than a flat moving average.  Engine-exactness design: values are
    2-decimal, so the hourly mean is computed as INTEGER cent sums
    over integer counts with ONE double division — bit-identical
    across engines with no intermediate rounding — and the lag-chain
    fold with python-float weight literals is identical IEEE
    arithmetic, so outputs ship UNROUNDED.  (The first cut rounded
    round(avg,6) and the sf0.1 sweep caught the half-boundary
    43.4728125 rounding differently in Spark's BigDecimal HALF_UP vs
    DuckDB's multiply-based round — the cohort_ltv_curve lesson,
    re-learned on a window query.)  One hourly hash-agg (map-side
    combinable) + one per-type window pass; all-NULL hours drop out
    of numerator and weight mass."""
    from fmx.operators.temporal import ewma

    hourly = (T(spark, sf, "events")
              .groupBy("event_type",
                       F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(F.round(F.col("value") * 100)
                         .cast("bigint")).alias("c"),
                   F.count("value").alias("nv")))
    hv = hourly.select(
        "event_type", "h",
        (F.col("c") / (100.0 * F.nullif(F.col("nv"), F.lit(0))))
        .alias("v"))
    out = ewma(hv, ["event_type"], "h", "v",
               alpha=EWMA_ALPHA, span=EWMA_SPAN, out_col="_ewma")
    return out.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v").alias("hourly_avg"),
        F.col("_ewma").alias("ewma"))


@query(
    "ts_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             sum(CAST(round(value * 100) AS BIGINT)) AS c,
             count(value) AS nv
      FROM events GROUP BY 1, 2 HAVING count(value) > 0),
    dv AS (SELECT event_type, c / (100.0 * nv) AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY d) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM daily),
    rec AS (
      SELECT a.event_type, 2 AS rn, a.n,
             a.v AS l, b.v - a.v AS b
      FROM dv a JOIN dv b ON b.event_type = a.event_type AND b.rn = 2
      WHERE a.rn = 1
      UNION ALL
      SELECT d.event_type, d.rn, r.n,
             0.5 * d.v + 0.5 * (r.l + r.b) AS l,
             0.3 * ((0.5 * d.v + 0.5 * (r.l + r.b)) - r.l)
               + 0.7 * r.b AS b
      FROM rec r JOIN dv d ON d.event_type = r.event_type
                          AND d.rn = r.rn + 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_points, l AS level,
           b AS trend, l + b AS forecast_1
    FROM rec WHERE rn = n
    """)
def ts_holt_linear(spark, sf):
    """Holt double exponential smoothing of daily mean event value per
    type (fmx.operators.temporal.holt_linear, alpha=0.5 beta=0.3):
    level AND trend evolve per the coupled recursion, yielding the
    1-step forecast a flat EWMA biases low on trending series.  The
    recursion is a single ``aggregate`` higher-order fold over the
    calendar-bounded daily series (collect_list at the days-per-type
    grain, never raw events) — no window, no Python, one hash agg.
    Engine-exactness: daily means use the integer-cent discipline
    (ts_ewma's lesson) and the fold is literal-coefficient IEEE
    arithmetic replayed by the oracle's recursive CTE, so outputs ship
    UNROUNDED.  (The oracle deliberately avoids DuckDB list_reduce:
    with a struct accumulator its second field evaluates against a
    stale copy of the first — the recursive CTE replays the coupled
    recursion unambiguously.)"""
    from fmx.operators.temporal import holt_linear

    daily = (T(spark, sf, "events")
             .groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100)
                        .cast("bigint")).alias("c"),
                  F.count("value").alias("nv"))
             .filter(F.col("nv") > 0))
    dv = daily.select("event_type", "d",
                      (F.col("c") / (100.0 * F.col("nv"))).alias("v"))
    return holt_linear(dv, ["event_type"], "d", "v", alpha=0.5, beta=0.3)


@query(
    "ts_theilsen_trend",
    oracle="""
    WITH daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n
                   FROM events GROUP BY 1),
    base AS (SELECT min(d) AS t0 FROM daily),
    xy AS (SELECT CAST(d - t0 AS DOUBLE) AS x, CAST(n AS DOUBLE) AS y
           FROM daily, base),
    sl AS (SELECT (b.y - a.y) / (b.x - a.x) AS m
           FROM xy a JOIN xy b ON a.x < b.x),
    med AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   quantile_cont(m, 0.5) AS slope FROM sl),
    res AS (SELECT n_pairs, slope, y - slope * x AS r FROM xy, med)
    SELECT CAST(count(*) AS BIGINT) AS n_points, n_pairs, slope,
           quantile_cont(r, 0.5) AS intercept
    FROM res GROUP BY n_pairs, slope
    """)
def ts_theilsen_trend(spark, sf):
    """Theil-Sen robust trend of daily event volume
    (fmx.operators.temporal.theilsen_trend): median of all pairwise
    slopes + median intercept — the outlier-immune growth estimate
    (one bad export day drags OLS; Theil-Sen tolerates ~29%
    contamination).  The quadratic pair join runs on the
    CALENDAR-BOUNDED daily relation (the CUSUM discipline), never row
    grain; integer day/count inputs make every slope the same double
    in both engines and the exact median interpolation bit-identical,
    so results ship UNROUNDED (the ts_ewma round() lesson)."""
    from fmx.operators.temporal import theilsen_trend

    daily = (T(spark, sf, "events")
             .groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("n")))
    return theilsen_trend(daily, "d", "n")


@query(
    "ts_asof_forward_tolerance",
    oracle=f"""
    WITH e AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'error'),
    p AS (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase'),
    m AS (
      SELECT e.event_id AS error_id, e.user_id, e.ts AS e_ts,
             p.event_id AS purchase_id, p.ts AS p_ts,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY p.ts ASC, p.event_id ASC) AS rn
      FROM e LEFT JOIN p ON p.user_id = e.user_id AND p.ts >= e.ts)
    SELECT CAST(error_id AS BIGINT) AS error_id,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(CASE WHEN date_diff('second', e_ts, p_ts) <= {ASOF_TOL}
                     THEN purchase_id END AS BIGINT) AS purchase_id,
           CAST(CASE WHEN date_diff('second', e_ts, p_ts) <= {ASOF_TOL}
                     THEN date_diff('second', e_ts, p_ts) END AS BIGINT)
               AS recovery_sec
    FROM m WHERE rn = 1
    """)
def ts_asof_forward_tolerance(spark, sf):
    """FORWARD as-of join with tolerance: for every error event, the
    same user's EARLIEST purchase at or after it (ties -> smallest
    event_id), nulled beyond the 2 h window — "did the user recover
    and convert?", the mirror image of last-click attribution and the
    other half of pandas merge_asof's direction contract.  Same
    scale shape as the backward query: union + carry-BACKWARD window,
    one shuffle on user_id, no join operator (the oracle spells out
    the O(errors x purchases) inequality join Spark never runs)."""
    ev = T(spark, sf, "events")
    errors = (ev.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"),
                      "user_id", "ts"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
    j = asof_join(errors, purchases, on="user_id",
                  right_cols=["event_id"], right_tiebreak="event_id",
                  tolerance_sec=ASOF_TOL, direction="forward")
    return j.select(
        F.col("error_id").cast(BIG).alias("error_id"),
        F.col("user_id").cast(BIG).alias("user_id"),
        F.col("event_id_asof").cast(BIG).alias("purchase_id"),
        (F.unix_timestamp("ts_asof") - F.unix_timestamp("ts"))
        .cast(BIG).alias("recovery_sec"))


# The SQL twin of _stl_parts — single-sourced so the anomaly scorer can
# never drift from the decomposition it cites.
_STL_CTES = """
    daily AS (SELECT CAST(ts AS DATE) AS d,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
    tr AS (SELECT d, n,
                  avg(n * 1.0) OVER (ORDER BY d
                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                      AS trend,
                  CAST(dayofweek(d) AS BIGINT) AS dow
           FROM daily),
    se AS (SELECT dow, avg(n - trend) AS seasonal
           FROM tr GROUP BY 1)
"""


def _stl_parts(spark, sf):
    """Shared classical-decomposition dataflow: the (tr, se) relations
    — day-grain counts with the centered 7-day trend and per-weekday
    seasonal means — used by ts_stl_decompose (readout) and
    ts_stl_anomaly (robust-z scorer)."""
    daily = (T(spark, sf, "events")
             .groupBy(F.to_date("ts").alias("d"))
             .agg(F.count("*").cast(BIG).alias("n")))
    wma = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "n", F.avg(F.col("n") * 1.0).over(wma).alias("trend"),
        F.dayofweek("d").cast(BIG).alias("dow"))
    se = (tr.groupBy("dow")
          .agg(F.avg(F.col("n") - F.col("trend")).alias("seasonal")))
    return tr, se



@query(
    "ts_stl_decompose",
    oracle=f"""
    WITH {_STL_CTES}
    SELECT strftime(d, '%Y-%m-%d') AS day, n,
           round(trend, 6) AS trend,
           round(seasonal, 6) AS seasonal,
           round(n - trend - seasonal, 6) AS residual
    FROM tr JOIN se USING (dow)
    """)
def ts_stl_decompose(spark, sf):
    """Additive trend/seasonal/residual decomposition of the daily
    event-count series (the classical-decomposition half of STL):
    trend = centered 7-day moving average, seasonal = mean detrended
    value per weekday, residual = the anomaly signal that's left —
    the decomposition behind seasonality-aware alerting
    (ts_trailing_anomaly flags deviations from a trailing mean; this
    separates "it's Saturday" from "something broke").  Scale shape:
    one day-grain agg bounds everything after by the calendar; the
    moving average is a bounded-frame window; the seasonal means are
    a 7-row agg.  Window edges use the partial-frame average (both
    engines define avg over the available frame)."""
    tr, se = _stl_parts(spark, sf)
    return (tr.join(se, "dow")
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "n",
                    F.round("trend", 6).alias("trend"),
                    F.round("seasonal", 6).alias("seasonal"),
                    F.round(F.col("n") - F.col("trend")
                            - F.col("seasonal"), 6).alias("residual")))


@query(
    "ts_stl_anomaly",
    oracle=f"""
    WITH {_STL_CTES},
    res AS (SELECT d, n, round(n - trend - seasonal, 6) AS resid
            FROM tr JOIN se USING (dow)),
    mad AS (SELECT median(abs(resid - (SELECT median(resid) FROM res)))
                AS m,
                   (SELECT median(resid) FROM res) AS med
            FROM res)
    SELECT strftime(d, '%Y-%m-%d') AS day, n, resid,
           round((resid - med) / nullif(1.4826 * m, 0.0), 6)
               AS robust_z,
           CAST(abs(resid - med) > 3 * 1.4826 * m AS BOOLEAN)
               AS is_anomaly
    FROM res CROSS JOIN mad
    """)
def ts_stl_anomaly(spark, sf):
    """Seasonality-aware anomaly flags: the ts_stl_decompose residual
    scored by robust z (median/MAD with the 1.4826 normal-consistency
    constant) — the alert stage the decomposition exists for,
    separating "it's Saturday" (seasonal), "traffic is growing"
    (trend), and "something broke" (|robust z| > 3).  All day-grain;
    the MAD is two exact medians over calendar-bounded rows
    (percentile on <= thousands of rows forever), broadcast back as
    one row."""
    tr, se = _stl_parts(spark, sf)
    res = (tr.join(se, "dow")
           .select("d", "n",
                   F.round(F.col("n") - F.col("trend")
                           - F.col("seasonal"), 6).alias("resid")))
    med = res.agg(F.expr("percentile(resid, 0.5)").alias("med"))
    mad = (res.crossJoin(F.broadcast(med))
           .select("med", F.abs(F.col("resid") - F.col("med"))
                   .alias("_ad"))
           .agg(F.expr("percentile(_ad, 0.5)").alias("m"),
                F.first("med").alias("med")))
    return (res.crossJoin(F.broadcast(mad))
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    "n", "resid",
                    F.round((F.col("resid") - F.col("med"))
                            / F.nullif(1.4826 * F.col("m"), F.lit(0.0)),
                            6).alias("robust_z"),
                    (F.abs(F.col("resid") - F.col("med"))
                     > 3 * 1.4826 * F.col("m")).alias("is_anomaly")))


@query(
    "ts_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    s AS (SELECT a.et,
                 CAST(sum(CASE WHEN b.x > a.x THEN 1
                               WHEN b.x < a.x THEN -1 ELSE 0 END)
                      AS BIGINT) AS s_stat
          FROM daily a JOIN daily b
            ON a.et = b.et AND a.day < b.day
          GROUP BY a.et),
    ties AS (SELECT et,
                    CAST(sum(CAST(t AS DECIMAL(38,0)) * (t - 1)
                             * (2 * t + 5)) AS DECIMAL(38,0)) AS tt
             FROM (SELECT et, x, count(*) AS t FROM daily GROUP BY 1, 2)
             GROUP BY et),
    n AS (SELECT et, CAST(count(*) AS BIGINT) AS nd FROM daily GROUP BY et)
    SELECT n.et AS event_type, nd AS n_days, s_stat,
           round((CAST(nd AS DOUBLE) * (nd - 1) * (2 * nd + 5)
                  - CAST(tt AS DOUBLE)) / 18.0, 6) AS var_s,
           round(CASE WHEN s_stat > 0 THEN (s_stat - 1.0) ELSE
                      CASE WHEN s_stat < 0 THEN (s_stat + 1.0)
                           ELSE 0.0 END END
                 / sqrt((CAST(nd AS DOUBLE) * (nd - 1) * (2 * nd + 5)
                         - CAST(tt AS DOUBLE)) / 18.0), 6) AS z_stat
    FROM n JOIN s USING (et) JOIN ties USING (et)
    ORDER BY event_type
    """)
def ts_mann_kendall(spark, sf):
    """Mann-Kendall trend test on each event type's DAILY value total:
    S = sum over day pairs of sign(x_j - x_i), tie-corrected variance,
    continuity-corrected z — the standard nonparametric 'is this
    series trending' test (vs ts_theilsen_trend's slope ESTIMATE; this
    is the significance half).  The pair join runs at the DAY grain
    (30 days -> 435 pairs per type, a constant at any SF — aggregate
    first, O(n^2) the bounded series, never the raw rows); totals are
    exact integer cents so sign() never sees double noise."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    a, b = daily.alias("a"), daily.alias("b")
    s = (a.join(b, (F.col("a.et") == F.col("b.et"))
                & (F.col("a.day") < F.col("b.day")))
         .groupBy(F.col("a.et").alias("et"))
         .agg(F.sum(F.when(F.col("b.x") > F.col("a.x"), 1)
                    .when(F.col("b.x") < F.col("a.x"), -1)
                    .otherwise(0)).cast(BIG).alias("s_stat")))
    DEC = "decimal(38,0)"
    ties = (daily.groupBy("et", "x").agg(F.count("*").alias("t"))
            .groupBy("et")
            .agg(F.sum(F.col("t").cast(DEC) * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).cast(DEC).alias("tt")))
    n = daily.groupBy("et").agg(F.count("*").cast(BIG).alias("nd"))
    m = n.join(s, "et").join(ties, "et")
    nd, s_, tt = (F.col("nd").cast("double"), F.col("s_stat"),
                  F.col("tt").cast("double"))
    var_s = (nd * (nd - 1) * (2 * nd + 5) - tt) / 18.0
    zraw = (F.when(s_ > 0, s_ - 1.0)
            .when(s_ < 0, s_ + 1.0).otherwise(0.0)) / F.sqrt(var_s)
    return (m.select(F.col("et").alias("event_type"),
                     F.col("nd").alias("n_days"), "s_stat",
                     F.round(var_s, 6).alias("var_s"),
                     F.round(zraw, 6).alias("z_stat")))


@query(
    "ts_pacf",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    lagd AS (SELECT et, x,
                    lag(x, 1) OVER (PARTITION BY et ORDER BY day) AS l1,
                    lag(x, 2) OVER (PARTITION BY et ORDER BY day) AS l2
             FROM daily),
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
                 CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
                     AS q,
                 CAST(sum(CASE WHEN l1 IS NOT NULL
                          THEN CAST(x AS DECIMAL(38,0)) * l1 ELSE 0 END)
                      AS DECIMAL(38,0)) AS p1,
                 CAST(sum(CASE WHEN l2 IS NOT NULL
                          THEN CAST(x AS DECIMAL(38,0)) * l2 ELSE 0 END)
                      AS DECIMAL(38,0)) AS p2,
                 CAST(sum(CASE WHEN l1 IS NOT NULL THEN l1 ELSE 0 END)
                      AS DECIMAL(38,0)) AS h1,
                 CAST(sum(CASE WHEN l1 IS NOT NULL THEN x ELSE 0 END)
                      AS DECIMAL(38,0)) AS t1,
                 CAST(sum(CASE WHEN l2 IS NOT NULL THEN l2 ELSE 0 END)
                      AS DECIMAL(38,0)) AS h2,
                 CAST(sum(CASE WHEN l2 IS NOT NULL THEN x ELSE 0 END)
                      AS DECIMAL(38,0)) AS t2
          FROM lagd GROUP BY et),
    r AS (SELECT et, n,
                 ((CAST(n AS DOUBLE) * n) * CAST(p1 AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                    * (CAST(h1 AS DOUBLE) + CAST(t1 AS DOUBLE))
                  + (CAST(n AS DOUBLE) - 1)
                    * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * n) * CAST(q AS DOUBLE)
                    - CAST(n AS DOUBLE)
                      * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS r1,
                 ((CAST(n AS DOUBLE) * n) * CAST(p2 AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                    * (CAST(h2 AS DOUBLE) + CAST(t2 AS DOUBLE))
                  + (CAST(n AS DOUBLE) - 2)
                    * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * n) * CAST(q AS DOUBLE)
                    - CAST(n AS DOUBLE)
                      * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS r2
          FROM m)
    SELECT et AS event_type, n AS n_days,
           round(r1, 6) AS pacf_1,
           round((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS pacf_2
    FROM r ORDER BY event_type
    """)
def ts_pacf(spark, sf):
    """Partial autocorrelation at lags 1 and 2 of each type's daily
    value series via the Durbin-Levinson closed form (phi_11 = r1,
    phi_22 = (r2 - r1^2)/(1 - r1^2)) — the AR-order diagnostic
    ts_autocorrelation (plain ACF) can't give: PACF cuts off at the
    true AR lag.  r_k is assembled from exact DECIMAL(38,0) moments
    (sum, sum-sq, lag cross-products, head/tail sums) with the
    full-series-mean estimator written as ONE double expression with
    identical parenthesization in both engines; the lag windows run
    per type over the calendar-bounded day grain."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    DEC = "decimal(38,0)"
    w = Window.partitionBy("et").orderBy("day")
    lagd = daily.select(
        "et", "x", F.lag("x", 1).over(w).alias("l1"),
        F.lag("x", 2).over(w).alias("l2"))
    xd = F.col("x").cast(DEC)

    def _msum(expr):
        return F.sum(expr).cast(DEC)

    m = lagd.groupBy("et").agg(
        F.count("*").cast(BIG).alias("n"),
        _msum(xd).alias("s"),
        _msum(xd * F.col("x")).alias("q"),
        _msum(F.when(F.col("l1").isNotNull(), xd * F.col("l1"))
              .otherwise(F.lit(0))).alias("p1"),
        _msum(F.when(F.col("l2").isNotNull(), xd * F.col("l2"))
              .otherwise(F.lit(0))).alias("p2"),
        _msum(F.when(F.col("l1").isNotNull(), F.col("l1"))
              .otherwise(F.lit(0))).alias("h1"),
        _msum(F.when(F.col("l1").isNotNull(), F.col("x"))
              .otherwise(F.lit(0))).alias("t1"),
        _msum(F.when(F.col("l2").isNotNull(), F.col("l2"))
              .otherwise(F.lit(0))).alias("h2"),
        _msum(F.when(F.col("l2").isNotNull(), F.col("x"))
              .otherwise(F.lit(0))).alias("t2"))
    nd = F.col("n").cast("double")
    sd, qd = F.col("s").cast("double"), F.col("q").cast("double")

    def _r(p, h, t, k):
        return (((nd * F.col("n")) * p.cast("double")
                 - (nd * sd) * (h.cast("double") + t.cast("double"))
                 + (nd - k) * (sd * sd))
                / ((nd * F.col("n")) * qd - nd * (sd * sd)))

    r = m.select("et", "n",
                 _r(F.col("p1"), F.col("h1"), F.col("t1"), 1).alias("r1"),
                 _r(F.col("p2"), F.col("h2"), F.col("t2"), 2).alias("r2"))
    r1, r2 = F.col("r1"), F.col("r2")
    return (r.select(F.col("et").alias("event_type"),
                     F.col("n").alias("n_days"),
                     F.round(r1, 6).alias("pacf_1"),
                     F.round((r2 - r1 * r1) / (1.0 - r1 * r1), 6)
                     .alias("pacf_2")))


@query(
    "ts_seasonal_strength",
    oracle=f"""
    WITH {_STL_CTES},
    parts AS (SELECT n, trend, seasonal,
                     n - trend - seasonal AS resid
              FROM tr JOIN se USING (dow))
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(greatest(0.0, 1.0 -
                 (avg(resid * resid) - avg(resid) * avg(resid))
                 / nullif(avg((seasonal + resid) * (seasonal + resid))
                          - avg(seasonal + resid) * avg(seasonal + resid),
                          0.0)), 6) AS seasonal_strength,
           round(greatest(0.0, 1.0 -
                 (avg(resid * resid) - avg(resid) * avg(resid))
                 / nullif(avg((trend + resid) * (trend + resid))
                          - avg(trend + resid) * avg(trend + resid),
                          0.0)), 6) AS trend_strength
    FROM parts
    """)
def ts_seasonal_strength(spark, sf):
    """Seasonal and trend strength of the daily event-count series
    (Hyndman's F_s = 1 - Var(R)/Var(S+R), F_t = 1 - Var(R)/Var(T+R))
    computed from the SAME single-sourced decomposition as
    ts_stl_decompose / ts_stl_anomaly — the one-number 'is this series
    worth deseasonalizing' readout that decides whether the
    seasonality-aware anomaly path applies.  All inputs are the
    calendar-bounded day-grain relation; variances are the identical
    avg-of-squares expression in both engines, rounded at the end."""
    tr, se = _stl_parts(spark, sf)
    parts = (tr.join(se, "dow")
             .select("n", "trend", "seasonal",
                     (F.col("n") - F.col("trend") - F.col("seasonal"))
                     .alias("resid")))

    def _var(c):
        return F.avg(c * c) - F.avg(c) * F.avg(c)

    resid = F.col("resid")
    sr = F.col("seasonal") + resid
    tre = F.col("trend") + resid
    return parts.agg(
        F.count("*").cast(BIG).alias("n_days"),
        F.round(F.greatest(F.lit(0.0),
                           1.0 - _var(resid) / F.nullif(_var(sr),
                                                        F.lit(0.0))), 6)
        .alias("seasonal_strength"),
        F.round(F.greatest(F.lit(0.0),
                           1.0 - _var(resid) / F.nullif(_var(tre),
                                                        F.lit(0.0))), 6)
        .alias("trend_strength"))


# Twiddle factors for the day-of-series DFT as DECIMAL LITERALS — both
# engines parse the identical strings to identical doubles, so the only
# cross-engine noise is group-sum order (absorbed by the output round).
_COS7 = [1.0, 0.6234898018587336, -0.22252093395631434, -0.900968867902419, -0.9009688679024191, -0.2225209339563146, 0.6234898018587334]
_SIN7 = [0.0, 0.7818314824680298, 0.9749279121818236, 0.43388373911755823, -0.433883739117558, -0.9749279121818236, -0.7818314824680299]
_COS14 = [1.0, 0.9009688679024191, 0.6234898018587336, 0.22252093395631445, -0.22252093395631434, -0.6234898018587335, -0.900968867902419, -1.0, -0.9009688679024191, -0.6234898018587337, -0.2225209339563146, 0.22252093395631334, 0.6234898018587334, 0.9009688679024194]
_SIN14 = [0.0, 0.4338837391175581, 0.7818314824680298, 0.9749279121818236, 0.9749279121818236, 0.7818314824680299, 0.43388373911755823, 1.2246467991473532e-16, -0.433883739117558, -0.7818314824680297, -0.9749279121818236, -0.9749279121818238, -0.7818314824680299, -0.4338837391175575]


def _case_lit(col, vals):
    expr = F.lit(0.0)
    for j, v in enumerate(vals):
        expr = F.when(col == j, F.lit(v)).otherwise(expr)
    return expr


@query(
    "ts_periodogram_dow",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1),
    idx AS (SELECT x, row_number() OVER (ORDER BY day) - 1 AS t
            FROM daily),
    terms AS (
      SELECT 7 AS period,
             CAST(x AS DOUBLE) * CAST((CASE WHEN (t % 7) = 0 THEN 1.0 WHEN (t % 7) = 1 THEN 0.6234898018587336 WHEN (t % 7) = 2 THEN -0.22252093395631434 WHEN (t % 7) = 3 THEN -0.900968867902419 WHEN (t % 7) = 4 THEN -0.9009688679024191 WHEN (t % 7) = 5 THEN -0.2225209339563146 WHEN (t % 7) = 6 THEN 0.6234898018587334 ELSE 0.0 END) AS DOUBLE) AS xc, CAST(x AS DOUBLE) * CAST((CASE WHEN (t % 7) = 0 THEN 0.0 WHEN (t % 7) = 1 THEN 0.7818314824680298 WHEN (t % 7) = 2 THEN 0.9749279121818236 WHEN (t % 7) = 3 THEN 0.43388373911755823 WHEN (t % 7) = 4 THEN -0.433883739117558 WHEN (t % 7) = 5 THEN -0.9749279121818236 WHEN (t % 7) = 6 THEN -0.7818314824680299 ELSE 0.0 END) AS DOUBLE) AS xs
      FROM idx
      UNION ALL
      SELECT 14 AS period,
             CAST(x AS DOUBLE) * CAST((CASE WHEN (t % 14) = 0 THEN 1.0 WHEN (t % 14) = 1 THEN 0.9009688679024191 WHEN (t % 14) = 2 THEN 0.6234898018587336 WHEN (t % 14) = 3 THEN 0.22252093395631445 WHEN (t % 14) = 4 THEN -0.22252093395631434 WHEN (t % 14) = 5 THEN -0.6234898018587335 WHEN (t % 14) = 6 THEN -0.900968867902419 WHEN (t % 14) = 7 THEN -1.0 WHEN (t % 14) = 8 THEN -0.9009688679024191 WHEN (t % 14) = 9 THEN -0.6234898018587337 WHEN (t % 14) = 10 THEN -0.2225209339563146 WHEN (t % 14) = 11 THEN 0.22252093395631334 WHEN (t % 14) = 12 THEN 0.6234898018587334 WHEN (t % 14) = 13 THEN 0.9009688679024194 ELSE 0.0 END) AS DOUBLE) AS xc, CAST(x AS DOUBLE) * CAST((CASE WHEN (t % 14) = 0 THEN 0.0 WHEN (t % 14) = 1 THEN 0.4338837391175581 WHEN (t % 14) = 2 THEN 0.7818314824680298 WHEN (t % 14) = 3 THEN 0.9749279121818236 WHEN (t % 14) = 4 THEN 0.9749279121818236 WHEN (t % 14) = 5 THEN 0.7818314824680299 WHEN (t % 14) = 6 THEN 0.43388373911755823 WHEN (t % 14) = 7 THEN 1.2246467991473532e-16 WHEN (t % 14) = 8 THEN -0.433883739117558 WHEN (t % 14) = 9 THEN -0.7818314824680297 WHEN (t % 14) = 10 THEN -0.9749279121818236 WHEN (t % 14) = 11 THEN -0.9749279121818238 WHEN (t % 14) = 12 THEN -0.7818314824680299 WHEN (t % 14) = 13 THEN -0.4338837391175575 ELSE 0.0 END) AS DOUBLE) AS xs
      FROM idx),
    pw AS (SELECT period, sum(xc) AS c, sum(xs) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM terms GROUP BY period)
    SELECT CAST(period AS BIGINT) AS period, n AS n_days,
           round(2.0 * (c * c + s * s) / n, 4) AS power
    FROM pw ORDER BY period
    """)
def ts_periodogram_dow(spark, sf):
    """Single-frequency periodogram of the daily event-count series at
    the weekly and biweekly periods: power = 2|sum x_t e^(-2 pi i
    t/p)|^2 / n — the frequency-domain 'is there a 7-day cycle' test
    behind ts_stl_decompose's seasonal model choice.  The DFT twiddle
    factors are LITERAL doubles keyed on t mod p (cos/sin computed at
    authoring time — runtime libm trig could differ by 1 ulp between
    engines); the series index comes from one rank over the
    calendar-bounded day grain."""
    daily = (T(spark, sf, "events")
             .groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.count("*").cast(BIG).alias("x")))
    idx = daily.select(
        "x", (F.row_number().over(Window.orderBy("day")) - 1).alias("t"))

    def _terms(p, cos, sin):
        return idx.select(
            F.lit(p).alias("period"),
            (F.col("x") * _case_lit(F.col("t") % p, cos)).alias("xc"),
            (F.col("x") * _case_lit(F.col("t") % p, sin)).alias("xs"))

    terms = _terms(7, _COS7, _SIN7).unionAll(_terms(14, _COS14, _SIN14))
    pw = terms.groupBy("period").agg(
        F.sum("xc").alias("c"), F.sum("xs").alias("s"),
        F.count("*").cast(BIG).alias("n"))
    return (pw.select(F.col("period").cast(BIG).alias("period"),
                      F.col("n").alias("n_days"),
                      F.round(2.0 * (F.col("c") * F.col("c")
                                     + F.col("s") * F.col("s"))
                              / F.col("n"), 4).alias("power")))


@query(
    "ts_ljung_box",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    lagd AS (SELECT et, x,
                    lag(x, 1) OVER (PARTITION BY et ORDER BY day) AS l1,
                    lag(x, 2) OVER (PARTITION BY et ORDER BY day) AS l2,
                    lag(x, 3) OVER (PARTITION BY et ORDER BY day) AS l3
             FROM daily),
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
                 CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
                     AS q,
                 CAST(sum(CASE WHEN l1 IS NOT NULL
                          THEN CAST(x AS DECIMAL(38,0)) * l1 ELSE 0 END)
                      AS DECIMAL(38,0)) AS p1,
                 CAST(sum(CASE WHEN l2 IS NOT NULL
                          THEN CAST(x AS DECIMAL(38,0)) * l2 ELSE 0 END)
                      AS DECIMAL(38,0)) AS p2,
                 CAST(sum(CASE WHEN l3 IS NOT NULL
                          THEN CAST(x AS DECIMAL(38,0)) * l3 ELSE 0 END)
                      AS DECIMAL(38,0)) AS p3,
                 CAST(sum(CASE WHEN l1 IS NOT NULL THEN l1 ELSE 0 END)
                      AS DECIMAL(38,0)) AS h1,
                 CAST(sum(CASE WHEN l1 IS NOT NULL THEN x ELSE 0 END)
                      AS DECIMAL(38,0)) AS t1,
                 CAST(sum(CASE WHEN l2 IS NOT NULL THEN l2 ELSE 0 END)
                      AS DECIMAL(38,0)) AS h2,
                 CAST(sum(CASE WHEN l2 IS NOT NULL THEN x ELSE 0 END)
                      AS DECIMAL(38,0)) AS t2,
                 CAST(sum(CASE WHEN l3 IS NOT NULL THEN l3 ELSE 0 END)
                      AS DECIMAL(38,0)) AS h3,
                 CAST(sum(CASE WHEN l3 IS NOT NULL THEN x ELSE 0 END)
                      AS DECIMAL(38,0)) AS t3
          FROM lagd GROUP BY et),
    r AS (SELECT et, n,
                 round(((CAST(n AS DOUBLE) * n) * CAST(p1 AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                    * (CAST(h1 AS DOUBLE) + CAST(t1 AS DOUBLE))
                  + (CAST(n AS DOUBLE) - 1)
                    * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * n) * CAST(q AS DOUBLE)
                    - CAST(n AS DOUBLE)
                      * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))), 6) AS r1,
                 round(((CAST(n AS DOUBLE) * n) * CAST(p2 AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                    * (CAST(h2 AS DOUBLE) + CAST(t2 AS DOUBLE))
                  + (CAST(n AS DOUBLE) - 2)
                    * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * n) * CAST(q AS DOUBLE)
                    - CAST(n AS DOUBLE)
                      * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))), 6) AS r2,
                 round(((CAST(n AS DOUBLE) * n) * CAST(p3 AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                    * (CAST(h3 AS DOUBLE) + CAST(t3 AS DOUBLE))
                  + (CAST(n AS DOUBLE) - 3)
                    * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * n) * CAST(q AS DOUBLE)
                    - CAST(n AS DOUBLE)
                      * (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))), 6) AS r3
          FROM m)
    SELECT et AS event_type, n AS n_days, r1, r2, r3,
           round(CAST(n AS DOUBLE) * (n + 2)
                 * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                    + r3 * r3 / (n - 3)), 6) AS q_lb
    FROM r ORDER BY event_type
    """)
def ts_ljung_box(spark, sf):
    """Ljung-Box portmanteau test at lags 1-3 of each type's daily
    value series: Q = n(n+2) sum_k r_k^2/(n-k) — the "is there ANY
    linear autocorrelation left" gate a forecasting pipeline runs on
    model residuals (vs ts_pacf which diagnoses WHICH lag).  The r_k
    reuse the exact-moment full-mean ACF estimator from ts_pacf (sum,
    sum-sq, lag cross-products, head/tail edge sums — all
    DECIMAL(38,0)) and are ROUNDED to 6dp in both engines before Q so
    the engines square identical doubles.  One per-type lag window
    over the day grain + one 5-row agg."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    DECL = "decimal(38,0)"
    w = Window.partitionBy("et").orderBy("day")
    lagd = daily.select(
        "et", "x", F.lag("x", 1).over(w).alias("l1"),
        F.lag("x", 2).over(w).alias("l2"),
        F.lag("x", 3).over(w).alias("l3"))
    xd = F.col("x").cast(DECL)

    def _msum(expr):
        return F.sum(expr).cast(DECL)

    aggs = [F.count("*").cast(BIG).alias("n"),
            _msum(xd).alias("s"), _msum(xd * F.col("x")).alias("q")]
    for i in (1, 2, 3):
        li = F.col(f"l{i}")
        aggs += [
            _msum(F.when(li.isNotNull(), xd * li).otherwise(F.lit(0)))
            .alias(f"p{i}"),
            _msum(F.when(li.isNotNull(), li).otherwise(F.lit(0)))
            .alias(f"h{i}"),
            _msum(F.when(li.isNotNull(), F.col("x")).otherwise(F.lit(0)))
            .alias(f"t{i}")]
    m = lagd.groupBy("et").agg(*aggs)
    nd = F.col("n").cast("double")
    sd, qd = F.col("s").cast("double"), F.col("q").cast("double")
    den = (nd * F.col("n")) * qd - nd * (sd * sd)

    def _r(i):
        pd_, hd, td = (F.col(f"p{i}").cast("double"),
                       F.col(f"h{i}").cast("double"),
                       F.col(f"t{i}").cast("double"))
        num = ((nd * F.col("n")) * pd_ - (nd * sd) * (hd + td)
               + (nd - i) * (sd * sd))
        return F.round(num / den, 6).alias(f"r{i}")

    r = m.select("et", "n", _r(1), _r(2), _r(3))
    r1, r2, r3, n = F.col("r1"), F.col("r2"), F.col("r3"), F.col("n")
    return r.select(F.col("et").alias("event_type"),
                    F.col("n").alias("n_days"), "r1", "r2", "r3",
                    F.round(n.cast("double") * (n + 2)
                            * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                               + r3 * r3 / (n - 3)), 6).alias("q_lb"))


@query(
    "ts_holt_winters",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             sum(CAST(round(value * 100) AS BIGINT)) AS c,
             count(value) AS nv
      FROM events GROUP BY 1, 2 HAVING count(value) > 0),
    dv AS (SELECT event_type, c / (100.0 * nv) AS v,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY d) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM dv0),
    dv0 AS (SELECT event_type, d, c, nv FROM daily),
    init AS (
      SELECT event_type, n, list(v ORDER BY rn) AS vs
      FROM dv WHERE rn <= 7 AND n >= 8 GROUP BY event_type, n),
    base AS (
      SELECT event_type, 7 AS rn, n,
             CAST(((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0 AS DOUBLE) AS l,
             CAST(0.0 AS DOUBLE) AS b,
             [CAST(vs[1] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0,
              CAST(vs[2] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0,
              CAST(vs[3] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0,
              CAST(vs[4] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0,
              CAST(vs[5] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0,
              CAST(vs[6] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0,
              CAST(vs[7] AS DOUBLE)
                - ((((((vs[1] + vs[2]) + vs[3]) + vs[4]) + vs[5])
                    + vs[6]) + vs[7]) / 7.0] AS s
      FROM init),
    rec AS (
      SELECT event_type, rn, n, l, b, s FROM base
      UNION ALL
      SELECT d.event_type, d.rn, r.n,
             (0.5 * (d.v - r.s[1]) + 0.5 * (r.l + r.b)) AS l,
             0.3 * ((0.5 * (d.v - r.s[1]) + 0.5 * (r.l + r.b)) - r.l)
               + 0.7 * r.b AS b,
             r.s[2:7]
               || [0.2 * (d.v - (0.5 * (d.v - r.s[1])
                                 + 0.5 * (r.l + r.b)))
                   + 0.8 * r.s[1]] AS s
      FROM rec r JOIN dv d ON d.event_type = r.event_type
                          AND d.rn = r.rn + 1)
    SELECT event_type, CAST(n AS BIGINT) AS n_points,
           l AS level, b AS trend, s[1] AS season_next,
           l + b + s[1] AS forecast_1
    FROM rec WHERE rn = n
    """)
def ts_holt_winters(spark, sf):
    """Holt-Winters additive triple exponential smoothing of daily
    mean event value per type (fmx.operators.temporal.
    holt_winters_additive, alpha=0.5 beta=0.3 gamma=0.2, weekly
    period 7): level, trend AND a rotating 7-slot day-of-week
    seasonal register evolve together — the forecast ts_holt_linear
    biases on seasonal series.  Same engine discipline as
    ts_holt_linear: integer-cent daily means, one aggregate
    higher-order fold with literal coefficients (the seasonal
    register rides the accumulator as a rotate-and-append array —
    bounded at 7 doubles forever), level expression textually
    repeated in the trend/season updates on BOTH sides, outputs ship
    UNROUNDED because the oracle's recursive CTE replays the IEEE
    arithmetic bit-for-bit (multi-state recursion = recursive CTE,
    never list_reduce — the documented DuckDB stale-struct trap)."""
    from fmx.operators.temporal import holt_winters_additive

    daily = (T(spark, sf, "events")
             .groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100)
                        .cast("bigint")).alias("c"),
                  F.count("value").alias("nv"))
             .filter(F.col("nv") > 0))
    dv = daily.select("event_type", "d",
                      (F.col("c") / (100.0 * F.col("nv"))).alias("v"))
    return holt_winters_additive(dv, ["event_type"], "d", "v",
                                 period=7, alpha=0.5, beta=0.3,
                                 gamma=0.2)


@query(
    "ts_turning_points",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    lagged AS (SELECT et, x,
                      lag(x) OVER (PARTITION BY et ORDER BY day) AS xp,
                      lead(x) OVER (PARTITION BY et ORDER BY day) AS xn
               FROM daily),
    m AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
                               AND ((x > xp AND x > xn)
                                    OR (x < xp AND x < xn))
                               THEN 1 ELSE 0 END) AS BIGINT) AS t_pts
          FROM lagged GROUP BY et)
    SELECT et AS event_type, n_days, t_pts,
           round(2.0 * (n_days - 2) / 3.0, 6) AS expected_t,
           round((t_pts - 2.0 * (n_days - 2) / 3.0)
                 / sqrt((16.0 * n_days - 29.0) / 90.0), 6) AS z_stat
    FROM m ORDER BY event_type
    """)
def ts_turning_points(spark, sf):
    """Turning-point test of serial randomness on each event type's
    daily value total: count strict local extrema (x greater than both
    neighbors or less than both), compare against the i.i.d.
    expectation E[T] = 2(n-2)/3 with Var[T] = (16n-29)/90 — the
    classical quick check that a series is noise rather than
    trend/cycle (complements ts_mann_kendall, which detects monotone
    trend but is blind to oscillation).  Ties with a neighbor are NOT
    extrema (strict inequalities) so integer-cents comparisons are
    deterministic in both engines.  Day-grain lag/lead windows are
    per-type partitions over the bounded series; one agg to one row
    per type; z is one double formula over exact integers."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    w = Window.partitionBy("et").orderBy("day")
    lagged = daily.select(
        "et", "x",
        F.lag("x").over(w).alias("xp"),
        F.lead("x").over(w).alias("xn"))
    tp = (F.when(F.col("xp").isNotNull() & F.col("xn").isNotNull()
                 & (((F.col("x") > F.col("xp"))
                     & (F.col("x") > F.col("xn")))
                    | ((F.col("x") < F.col("xp"))
                       & (F.col("x") < F.col("xn")))), 1)
          .otherwise(0))
    m = lagged.groupBy("et").agg(
        F.count("*").cast(BIG).alias("n_days"),
        F.sum(tp).cast(BIG).alias("t_pts"))
    n, t = F.col("n_days"), F.col("t_pts")
    return (m.select(F.col("et").alias("event_type"), "n_days", "t_pts",
                     F.round(2.0 * (n - 2) / 3.0, 6).alias("expected_t"),
                     F.round((t - 2.0 * (n - 2) / 3.0)
                             / F.sqrt((16.0 * n - 29.0) / 90.0), 6)
                     .alias("z_stat")))


@query(
    "ts_cox_stuart",
    oracle="""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY date_trunc('day', ts))
                  AS BIGINT) AS rn
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    n AS (SELECT et, CAST(count(*) AS BIGINT) AS nd FROM daily
          GROUP BY et),
    pairs AS (SELECT a.et, b.x - a.x AS d
              FROM daily a
              JOIN n USING (et)
              JOIN daily b ON a.et = b.et
                          AND b.rn = a.rn + nd // 2
              WHERE a.rn <= nd // 2),
    m AS (SELECT et,
                 CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS s_pos,
                 CAST(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_eff
          FROM pairs GROUP BY et)
    SELECT et AS event_type, n_eff, s_pos,
           round((s_pos - n_eff / 2.0) / sqrt(n_eff / 4.0), 6) AS z_stat
    FROM m ORDER BY event_type
    """)
def ts_cox_stuart(spark, sf):
    """Cox-Stuart trend sign test on each event type's daily value
    total: pair day i with day i + floor(n/2) (first half vs second
    half; the odd middle day drops), count positive differences, and
    compare against the no-trend Binomial(n', 1/2) via the
    large-sample normal z — the minimal-assumption trend screen
    (only signs, no ranks), complementing ts_mann_kendall (all-pairs
    ranks) at O(n) pair volume instead of O(n^2).  Zero differences
    drop from both the count and n' (the standard treatment).
    Integer cents make every sign exact; z is one double formula.
    The half-offset join is rn-keyed at the day grain — bounded, no
    window beyond the per-type row_number."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x"))
             .select("et", "x",
                     F.row_number().over(
                         Window.partitionBy("et").orderBy("day"))
                     .cast(BIG).alias("rn")))
    n = daily.groupBy("et").agg(F.count("*").cast(BIG).alias("nd"))
    half = F.expr("nd DIV 2")
    a = daily.join(n, "et").withColumn("_h", half)
    b = daily.select(F.col("et"), F.col("rn").alias("rn_b"),
                     F.col("x").alias("x_b"))
    pairs = (a.filter(F.col("rn") <= F.col("_h"))
             .join(b, (a["et"] == b["et"])
                   & (F.col("rn_b") == F.col("rn") + F.col("_h")))
             .select(a["et"], (F.col("x_b") - a["x"]).alias("d")))
    m = pairs.groupBy("et").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).cast(BIG)
        .alias("s_pos"),
        F.sum(F.when(F.col("d") != 0, 1).otherwise(0)).cast(BIG)
        .alias("n_eff"))
    return (m.select(F.col("et").alias("event_type"), "n_eff", "s_pos",
                     F.round((F.col("s_pos") - F.col("n_eff") / 2.0)
                             / F.sqrt(F.col("n_eff") / 4.0), 6)
                     .alias("z_stat")))



HURST_WINDOWS = (8, 16, 32)


@query(
    "ts_hurst_rs",
    oracle=f"""
    WITH daily AS (
      SELECT event_type AS et, date_trunc('day', ts) AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2),
    idx AS (SELECT et, x,
                   CAST(row_number() OVER (PARTITION BY et ORDER BY day)
                        AS BIGINT) AS rn
            FROM daily),
    ws AS (SELECT unnest([{", ".join(str(w) for w in HURST_WINDOWS)}])
               AS w),
    blk AS (SELECT i.et, ws.w, (i.rn - 1) // ws.w AS b, i.rn, i.x
            FROM idx i CROSS JOIN ws),
    bs AS (SELECT et, w, b, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                      AS s,
                  CAST(sum(CAST(x AS DECIMAL(38,0)) * x)
                       AS DECIMAL(38,0)) AS q
           FROM blk GROUP BY et, w, b),
    -- scaled cumulative deviation: D_j * w = w*cumsum_j - j*S, exact
    cd AS (SELECT blk.et, blk.w, blk.b,
                  CAST(blk.w AS DECIMAL(38,0))
                      * CAST(sum(blk.x) OVER (PARTITION BY blk.et,
                            blk.w, blk.b ORDER BY blk.rn
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DECIMAL(38,0))
                  - CAST(row_number() OVER (PARTITION BY blk.et, blk.w,
                            blk.b ORDER BY blk.rn) AS DECIMAL(38,0))
                      * bs.s AS dw
           FROM blk JOIN bs ON blk.et = bs.et AND blk.w = bs.w
                            AND blk.b = bs.b
           WHERE bs.n = blk.w),
    rr AS (SELECT et, w, b,
                  CAST(max(dw) - min(dw) AS DECIMAL(38,0)) AS rw
           FROM cd GROUP BY et, w, b),
    rsb AS (SELECT rr.et, rr.w,
                   round(CAST(rr.rw AS DOUBLE)
                         / sqrt(CAST(rr.w * bs.q - bs.s * bs.s
                                     AS DOUBLE)), 6) AS rs
            FROM rr JOIN bs ON rr.et = bs.et AND rr.w = bs.w
                            AND rr.b = bs.b
            WHERE rr.w * bs.q - bs.s * bs.s > 0),
    mrs AS (SELECT et, w, round(ln(avg(rs)), 6) AS v,
                   round(ln(CAST(w AS DOUBLE)), 9) AS u,
                   CAST(count(*) AS BIGINT) AS n_blocks
            FROM rsb GROUP BY et, w),
    fit AS (SELECT et, CAST(count(*) AS BIGINT) AS k,
                   sum(u) AS su, sum(v) AS sv, sum(u * v) AS suv,
                   sum(u * u) AS suu,
                   CAST(sum(n_blocks) AS BIGINT) AS n_blocks
            FROM mrs GROUP BY et)
    SELECT et AS event_type, n_blocks,
           round((k * suv - su * sv) / (k * suu - su * su), 4)
               AS hurst
    FROM fit WHERE k >= 2 ORDER BY event_type
    """)
def ts_hurst_rs(spark, sf):
    """Hurst exponent per event type via classical rescaled-range
    (R/S) analysis of the daily value totals (Hurst 1951; Mandelbrot
    & Wallis): split the day series into full blocks of w in
    {8,16,32}, per block R/S = range of cumulative mean deviations /
    population sd, then H = slope of ln(mean R/S) vs ln(w).  H ~ 0.5
    = memoryless; H > 0.5 = long-range persistence (trends compound
    — forecastable, and naive day-sampling under-covers regimes);
    H < 0.5 = mean-reverting.  The long-memory readout complementing
    [[ts_autocorrelation]] (fixed small lags) and ts_dickey_fuller
    (unit root).

    Exactness/scale: everything under each sqrt/division is an EXACT
    integer — the block cumulative deviation is scaled by w
    (D_j*w = w*cumsum - j*S, DECIMAL), the block variance term is
    w*Q - S^2, and R/S = Rw/sqrt(wQ - S^2) is ONE double formula
    rounded 6dp per block; per-(type,w) means average <= n_days/w
    rounded doubles; the 3-point OLS runs on 6dp/9dp-rounded (v,u).
    Constant blocks (zero variance) are skipped, as is any type with
    fewer than two window sizes populated.  All grains are
    calendar-bounded (day, block) — data-size-independent at fixed
    time span; the only corpus-scale stage is the daily rollup."""
    daily = (T(spark, sf, "events")
             .filter(F.col("value").isNotNull())
             .groupBy(F.col("event_type").alias("et"),
                      F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast(BIG))
                  .cast(BIG).alias("x")))
    widx = Window.partitionBy("et").orderBy("day")
    idx = daily.select("et", "x",
                       F.row_number().over(widx).cast(BIG).alias("rn"))
    ws = spark.createDataFrame([(w,) for w in HURST_WINDOWS], "w bigint")
    blk = idx.crossJoin(F.broadcast(ws)).select(
        "et", "w", F.expr("(rn - 1) DIV w").alias("b"), "rn", "x")
    bs = blk.groupBy("et", "w", "b").agg(
        F.count("*").cast(BIG).alias("n"),
        F.sum(F.col("x").cast(DEC)).cast(DEC).alias("s"),
        F.sum(F.col("x").cast(DEC) * F.col("x")).cast(DEC).alias("q"))
    wcum = (Window.partitionBy("et", "w", "b").orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, 0))
    wrn = Window.partitionBy("et", "w", "b").orderBy("rn")
    cd = (blk.join(bs, ["et", "w", "b"])
          .filter(F.col("n") == F.col("w"))
          .select("et", "w", "b",
                  (F.col("w").cast(DEC)
                   * F.sum("x").over(wcum).cast(DEC)
                   - F.row_number().over(wrn).cast(DEC) * F.col("s"))
                  .alias("dw")))
    rr = cd.groupBy("et", "w", "b").agg(
        (F.max("dw") - F.min("dw")).cast(DEC).alias("rw"))
    rsb = (rr.join(bs, ["et", "w", "b"])
           .filter(F.col("w") * F.col("q") - F.col("s") * F.col("s") > 0)
           .select("et", "w",
                   F.round(F.col("rw").cast("double")
                           / F.sqrt((F.col("w") * F.col("q")
                                     - F.col("s") * F.col("s"))
                                    .cast("double")), 6).alias("rs")))
    mrs = rsb.groupBy("et", "w").agg(
        F.round(F.log(F.avg("rs")), 6).alias("v"),
        F.count("*").cast(BIG).alias("n_blocks"))
    mrs = mrs.withColumn(
        "u", F.round(F.log(F.col("w").cast("double")), 9))
    fit = mrs.groupBy("et").agg(
        F.count("*").cast(BIG).alias("k"),
        F.sum("u").alias("su"), F.sum("v").alias("sv"),
        F.sum(F.col("u") * F.col("v")).alias("suv"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum("n_blocks").cast(BIG).alias("n_blocks"))
    k = F.col("k")
    return (fit.filter(k >= 2)
            .select(F.col("et").alias("event_type"), "n_blocks",
                    F.round((k * F.col("suv") - F.col("su")
                             * F.col("sv"))
                            / (k * F.col("suu") - F.col("su")
                               * F.col("su")), 4).alias("hurst")))
