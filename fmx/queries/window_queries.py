"""Window functions (SURVEY §2.5) and time-window analytics over events.

W1/W2 are the reference's only window shapes (unbounded partition sums,
Model.scala:191,211-212); ranking, frames, lag, tumbling/sliding/session
windows are engine capabilities the new engine adds.  The session-window
query is the batch twin of the Structured Streaming operator in
``fmx.streaming``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"


@query(
    "w1_partition_sum",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey), 2) AS order_qty
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200
    """)
def w1_partition_sum(spark, sf):
    """Unbounded partition sum broadcast back onto detail rows
    (ref W1, Model.scala:211-212)."""
    w = Window.partitionBy("l_orderkey")
    return (T(spark, sf, "lineitem")
            .select(F.col("l_orderkey").cast(BIG).alias("l_orderkey"),
                    F.col("l_linenumber").cast(BIG).alias("l_linenumber"),
                    F.round(F.sum("l_quantity").over(w), 2).alias("order_qty"))
            .orderBy("l_orderkey", "l_linenumber").limit(200))


@query(
    "w2_vector_sum_by_label",
    headline=True,
    oracle="""
    SELECT CAST(label AS BIGINT) AS label,
           CAST(pos AS BIGINT) AS pos,
           round(sum(v), 4) AS s
    FROM (SELECT label,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings)
    GROUP BY label, pos
    """)
def w2_vector_sum_by_label(spark, sf):
    """Element-wise vector sum per group — the VectorSum-UDAF-over-window
    (ref W2, Model.scala:191) rewritten as posexplode + two-key hash agg:
    scales because a hot group spreads across k shuffle keys."""
    emb = T(spark, sf, "embeddings").select(
        F.col("label").cast(BIG).alias("label"),
        F.col("embedding").cast("array<double>").alias("embedding"))
    return (emb.select("label", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("label", F.col("pos").cast(BIG).alias("pos"))
            .agg(F.round(F.sum("v"), 4).alias("s")))


@query(
    "w3_row_number_topk",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """)
def w3_row_number_topk(spark, sf):
    """Ranking window + top-k per group (engine capability; deterministic
    tiebreak on o_orderkey). Spark pushes rn<=3 into the sort via
    WindowGroupLimit — no full materialization per group."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (T(spark, sf, "orders")
            .select(F.col("o_custkey").cast(BIG).alias("o_custkey"),
                    F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.row_number().over(w).cast(BIG).alias("rn"))
            .filter(F.col("rn") <= 3))


@query(
    "w4_moving_sum",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS mov_sum
    FROM events
    """)
def w4_moving_sum(spark, sf):
    """rowsBetween(-2, 0) moving sum (engine capability)."""
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, Window.currentRow))
    return (T(spark, sf, "events")
            .select(F.col("user_id").cast(BIG).alias("user_id"),
                    F.col("event_id").cast(BIG).alias("event_id"),
                    F.round(F.sum("value").over(w), 4).alias("mov_sum")))


@query(
    "w5_lag_delta",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(event_id AS BIGINT) AS event_id,
           round(value - lag(value, 1, 0.0) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id), 4)
               AS delta
    FROM events
    """)
def w5_lag_delta(spark, sf):
    """lag()-based delta (engine capability)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (T(spark, sf, "events")
            .select(F.col("user_id").cast(BIG).alias("user_id"),
                    F.col("event_id").cast(BIG).alias("event_id"),
                    F.round(F.col("value")
                            - F.lag("value", 1, 0.0).over(w), 4).alias("delta")))


@query(
    "win_tumbling_hour",
    headline=True,
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """)
def win_tumbling_hour(spark, sf):
    """Tumbling 1-hour event-time window (F.window) — the batch twin of
    the streaming aggregation in fmx.streaming (SURVEY §2.9)."""
    return (T(spark, sf, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 4).alias("total"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    "event_type", "cnt", "total"))


@query(
    "win_sliding",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT time_bucket(INTERVAL '30 minutes', ts)
                   - to_minutes(30 * k) AS ws
          FROM events, (SELECT unnest([0, 1]) AS k))
    GROUP BY ws
    """)
def win_sliding(spark, sf):
    """Sliding window (1h size / 30m slide): each event lands in 2 windows
    (engine capability)."""
    return (T(spark, sf, "events")
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"), "cnt"))


@query(
    "win_session_30m",
    headline=True,
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total
    FROM sessions GROUP BY user_id, session_id
    """)
def win_session_30m(spark, sf):
    """Sessionization with a 30-minute inactivity gap via
    ``F.session_window`` — native gap-session operator; the oracle proves
    equivalence to the classic gaps-and-islands SQL.  Streaming twin in
    fmx.streaming."""
    return (T(spark, sf, "events")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total"))
            .select(F.col("user_id").cast(BIG).alias("user_id"),
                    F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    "n_events", "total"))


@query(
    "w6_ntile_cume",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice, o_orderkey)
    """)
def w6_ntile_cume(spark, sf):
    """Distribution-analytic window functions: ntile quartiles,
    percent_rank, cume_dist per customer (unique-key ORDER BY suffix
    keeps every engine's ranking identical)."""
    from pyspark.sql import Window

    w = (Window.partitionBy("o_custkey")
         .orderBy("o_totalprice", "o_orderkey"))
    return (T(spark, sf, "orders")
            .filter(F.col("o_custkey") < 50)
            .select(F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.ntile(4).over(w).cast(BIG).alias("quartile"),
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume")))


@query(
    "stats_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS price_qty_corr,
           round(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)
               AS intercept
    FROM lineitem GROUP BY l_returnflag
    """)
def stats_corr_regr(spark, sf):
    """Bivariate statistics per group: correlation, sample covariance,
    and least-squares slope/intercept — single-pass partial-aggregable
    moments (no second scan, no driver math)."""
    li = T(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("price_qty_corr"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 6)
                 .alias("qty_disc_covar"),
                 F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4)
                 .alias("slope"),
                 F.round(F.regr_intercept("l_extendedprice", "l_quantity"),
                         4).alias("intercept")))


@query(
    "w7_time_range_sum",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           round(sum(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch(ts)
                                  RANGE BETWEEN 3600 PRECEDING
                                        AND CURRENT ROW), 4)
               AS rolling_1h
    FROM events
    """)
def w7_time_range_sum(spark, sf):
    """Time-based RANGE window frame: per-user rolling 1-hour value sum
    (frame bounds in event-time seconds, not row counts — the frame a
    row-count window gets wrong on irregular arrivals).

    Ordering is the FRACTIONAL epoch (ts as double — microsecond
    precision), matching the oracle's epoch() exactly: ordering by
    unix_timestamp (truncated whole seconds) shifts events near the
    3600s frame boundary into/out of the window and creates phantom
    RANGE peers among same-second events — caught by the first sf0.1
    registry-wide oracle sweep (round 7), invisible at sf<=0.01."""
    from pyspark.sql import Window

    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").cast("double"))
         .rangeBetween(-3600, 0))
    return (T(spark, sf, "events")
            .select(F.col("event_id").cast(BIG).alias("event_id"),
                    F.col("user_id").cast(BIG).alias("user_id"),
                    F.round(F.sum("value").over(w), 4).alias("rolling_1h")))


@query(
    "scd2_user_status",
    oracle="""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           event_type AS status,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id),
                             '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00')
               AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM events
    """)
def scd2_user_status(spark, sf):
    """SCD-type-2 history build: each event opens a validity interval
    closed by the user's next event (lead window; open intervals get the
    9999 sentinel + is_current flag) — the dimension-table temporal
    modeling pattern, one shuffle on the key."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (T(spark, sf, "events")
            .select(F.col("user_id").cast(BIG).alias("user_id"),
                    F.col("event_type").alias("status"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("valid_from"),
                    F.coalesce(F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"),
                               F.lit("9999-12-31 00:00:00"))
                    .alias("valid_to"),
                    F.when(nxt.isNull(), 1).otherwise(0)
                    .cast("int").alias("is_current")))


PIT_TS = "2024-01-15 00:00:00"


@query(
    "scd2_point_in_time",
    oracle=f"""
    SELECT CAST(user_id AS BIGINT) AS user_id,
           event_type AS status,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from
    FROM events WHERE ts <= TIMESTAMP '{PIT_TS}'
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """)
def scd2_point_in_time(spark, sf):
    """Point-in-time lookup against the SCD2 history: each user's status
    valid at a fixed as-of timestamp — the dimension read every
    training-snapshot join needs (features as they WERE, not as they
    are).  The as-of filter is a plain ts predicate, so it pushes down
    to the parquet scan (row groups after the PIT never load); one
    per-user window picks the last open interval."""
    return (T(spark, sf, "events")
            .filter(F.col("ts") <= F.lit(PIT_TS).cast("timestamp"))
            .withColumn("_rn", F.row_number().over(
                Window.partitionBy("user_id")
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())))
            .filter(F.col("_rn") == 1)
            .select(F.col("user_id").cast(BIG).alias("user_id"),
                    F.col("event_type").alias("status"),
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
                    .alias("valid_from")))


@query(
    "w8_rolling_median",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)),
    fr AS (
      SELECT event_type, h, n,
             list_sort(list(n) OVER (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS l
      FROM hourly)
    SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(n AS BIGINT) AS n,
           CASE WHEN len(l) % 2 = 1 THEN l[(len(l) + 1) // 2] * 1.0
                ELSE (l[len(l) // 2] + l[len(l) // 2 + 1]) / 2.0
           END AS med7_n
    FROM fr
    """)
def w8_rolling_median(spark, sf):
    """Rolling 7-hour MEDIAN of hourly event counts per type — the
    robust twin of the w4 moving sum (a single burst hour drags a
    moving average for 7 rows; the median shrugs it off), and the
    window shape Spark has no native holistic function for.  The
    frame's values collect into a sorted array (bounded at 7
    elements — collect_list over a ROWS frame, never partition-wide)
    and the median is exact element arithmetic: integer counts make
    odd frames integer-exact and even frames exact half-integers, so
    NO rounding is applied (rounding a value ON the half boundary is
    the documented cross-engine trap).  Upstream grain is the hourly
    hash-agg; the window partitions by event_type over
    calendar-bounded rows."""
    hourly = (T(spark, sf, "events")
              .groupBy("event_type",
                       F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count("*").alias("n")))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(-6, 0))
    arr = F.sort_array(F.collect_list("n").over(w))
    m = F.size(arr)
    med = F.when(
        m % 2 == 1,
        F.element_at(arr, ((m + 1) / 2).cast("int")) * 1.0
    ).otherwise(
        (F.element_at(arr, (m / 2).cast("int"))
         + F.element_at(arr, (m / 2 + 1).cast("int"))) / 2.0)
    return hourly.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast(BIG).alias("n"),
        med.alias("med7_n"))


@query(
    "w9_percent_rank",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE))
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n,
           round(percent_rank() OVER (PARTITION BY event_type
                                      ORDER BY n, d), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY event_type
                                   ORDER BY n, d), 6) AS cume
    FROM daily
    """)
def w9_percent_rank(spark, sf):
    """percent_rank + cume_dist of daily event volume within each
    event type — "how unusual was this day" as a relative rank,
    completing the ranking-window family (row_number/rank/ntile/lag
    already covered in w3/w5/curriculum).  Both functions are exact
    rational arithmetic over integer ranks — engine-identical before
    the emit round.  Upstream grain is the daily hash-agg; windows
    partition by event_type over calendar-bounded rows (never row
    grain)."""
    daily = (T(spark, sf, "events")
             .groupBy("event_type", F.to_date("ts").alias("d"))
             .agg(F.count("*").alias("n")))
    w = Window.partitionBy("event_type").orderBy("n", "d")
    return daily.select(
        "event_type", F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast(BIG).alias("n"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"))


@query(
    "w10_cumulative_distinct_users",
    oracle="""
    WITH fo AS (SELECT user_id, min(CAST(ts AS DATE)) AS d
                FROM events GROUP BY 1),
    firsts AS (SELECT d, CAST(count(*) AS BIGINT) AS new_users
               FROM fo GROUP BY 1),
    days AS (SELECT CAST(ts AS DATE) AS d,
                    CAST(count(*) AS BIGINT) AS n_events
             FROM events GROUP BY 1)
    SELECT strftime(days.d, '%Y-%m-%d') AS day, n_events,
           CAST(coalesce(new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY days.d
                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumulative_users
    FROM days LEFT JOIN firsts ON days.d = firsts.d
    """)
def w10_cumulative_distinct_users(spark, sf):
    """Cumulative distinct users per day — the running COUNT(DISTINCT)
    no engine supports directly over a window, via the classic
    first-occurrence decomposition: a user contributes exactly once,
    on their first-seen day, so the cumulative distinct count is a
    plain running SUM of per-day first-timer counts.  Scale shape:
    one user-grain min agg + one day-grain agg + a cumulative window
    over calendar-bounded rows — the naive windowed set-union would
    carry every user id in window state."""
    ev = T(spark, sf, "events")
    fo = (ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d")))
    firsts = fo.groupBy("d").agg(F.count("*").cast(BIG)
                                 .alias("new_users"))
    days = (ev.groupBy(F.to_date("ts").alias("d"))
            .agg(F.count("*").cast(BIG).alias("n_events")))
    w = (Window.orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (days.join(firsts, "d", "left")
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                    "n_events",
                    F.coalesce("new_users", F.lit(0)).cast(BIG)
                    .alias("new_users"),
                    F.sum(F.coalesce("new_users", F.lit(0))).over(w)
                    .cast(BIG).alias("cumulative_users")))
