"""Second batch of engine-capability queries: pivot, percentiles,
statistical aggregates, grouping sets, ranking functions, array/map SQL,
interval arithmetic, correlated subqueries, union-by-name."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"


@query(
    "pivot_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS O,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS F,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """)
def pivot_status(spark, sf):
    """Pivot (engine capability): explicit value list so no extra
    distinct-scan job is needed."""
    return (T(spark, sf, "orders")
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["O", "F", "P"])
            .agg(F.count(F.lit(1))))


@query(
    "percentiles",
    oracle="""
    SELECT l_returnflag,
           round(median(l_extendedprice), 4) AS med,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem GROUP BY l_returnflag
    """)
def percentiles(spark, sf):
    """Exact continuous percentiles (engine capability)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.median("l_extendedprice"), 4).alias("med"),
                 F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4)
                 .alias("p25"),
                 F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4)
                 .alias("p75")))


@query(
    "stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_discount), 6) AS var_disc,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
    FROM lineitem GROUP BY l_returnflag
    """)
def stats_agg(spark, sf):
    """Moment-based statistical aggregates (engine capability)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
                 F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
                 F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                 .alias("corr_qp"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 6)
                 .alias("cov_qd")))


@query(
    "grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, '-') AS rf,
           coalesce(l_linestatus, '-') AS ls,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)
def grouping_sets(spark, sf):
    """GROUP BY GROUPING SETS via Spark SQL (engine capability)."""
    T(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT coalesce(l_returnflag, '-') AS rf,
               coalesce(l_linestatus, '-') AS ls,
               round(sum(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "rank_functions",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           round(percent_rank() OVER w, 6) AS prank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey LIMIT 200
    """)
def rank_functions(spark, sf):
    """dense_rank / percent_rank / ntile (engine capability)."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (T(spark, sf, "orders")
            .select(F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.dense_rank().over(w).cast(BIG).alias("drank"),
                    F.round(F.percent_rank().over(w), 6).alias("prank"),
                    F.ntile(4).over(w).cast(BIG).alias("quartile"))
            .orderBy("o_orderkey").limit(200))


@query(
    "window_value_funcs",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(first_value(l_quantity) OVER w, 2) AS first_qty,
           round(last_value(l_quantity) OVER
                 (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS last_qty,
           round(cume_dist() OVER w, 6) AS cd
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity)
    ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 200
    """)
def window_value_funcs(spark, sf):
    """first_value / last_value (explicit full frame) / cume_dist.
    The window order includes l_quantity: (orderkey, linenumber) is NOT
    unique in the data, and first/last over a non-total order are
    tie-ambiguous across engines."""
    order = [F.col("l_linenumber"), F.col("l_quantity")]
    w = Window.partitionBy("l_orderkey").orderBy(*order)
    w_full = (Window.partitionBy("l_orderkey").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    return (T(spark, sf, "lineitem")
            .select(F.col("l_orderkey").cast(BIG).alias("l_orderkey"),
                    F.col("l_linenumber").cast(BIG).alias("l_linenumber"),
                    F.col("l_quantity"),
                    F.round(F.first("l_quantity").over(w), 2)
                    .alias("first_qty"),
                    F.round(F.last("l_quantity").over(w_full), 2)
                    .alias("last_qty"),
                    F.round(F.cume_dist().over(w), 6).alias("cd"))
            .orderBy("l_orderkey", "l_linenumber", "l_quantity")
            .limit(200).drop("l_quantity"))


@query(
    "array_sql_funcs",
    oracle="""
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4)
               AS vsum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax
    FROM embeddings ORDER BY vec_id LIMIT 200
    """)
def array_sql_funcs(spark, sf):
    """Higher-order array functions (aggregate/filter/array_max)."""
    emb = T(spark, sf, "embeddings").withColumn(
        "emb", F.col("embedding").cast("array<double>"))
    return (emb.select(
        F.col("vec_id").cast(BIG).alias("vec_id"),
        F.round(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x), 4)
         .alias("vsum"),
        F.size(F.filter("emb", lambda x: x > 0)).cast(BIG).alias("n_pos"),
        F.round(F.array_max("emb"), 6).alias("vmax"))
        .orderBy("vec_id").limit(200))


@query(
    "map_funcs",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey, k,
           round(v, 4) AS v
    FROM (SELECT l_orderkey, 'qty' AS k, l_quantity AS v FROM lineitem
          WHERE l_linenumber = 1
          UNION ALL
          SELECT l_orderkey, 'disc' AS k, l_discount AS v FROM lineitem
          WHERE l_linenumber = 1)
    ORDER BY l_orderkey, k, v LIMIT 200
    """)
def map_funcs(spark, sf):
    """map construction + explode to long format (engine capability)."""
    li = T(spark, sf, "lineitem").filter("l_linenumber = 1")
    m = F.create_map(F.lit("qty"), F.col("l_quantity"),
                     F.lit("disc"), F.col("l_discount"))
    return (li.select(F.col("l_orderkey").cast(BIG).alias("l_orderkey"),
                      F.explode(m).alias("k", "v"))
            .withColumn("v", F.round("v", 4))
            .orderBy("l_orderkey", "k", "v").limit(200))


@query(
    "interval_arith",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS later,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts)
                AS BIGINT) AS mins_since_epoch0
    FROM events ORDER BY event_id LIMIT 200
    """)
def interval_arith(spark, sf):
    """Timestamp interval arithmetic + date_diff (engine capability)."""
    return (T(spark, sf, "events")
            .select(F.col("event_id").cast(BIG).alias("event_id"),
                    F.date_format(
                        F.col("ts") + F.expr("INTERVAL 90 MINUTES"),
                        "yyyy-MM-dd HH:mm:ss").alias("later"),
                    F.floor(
                        (F.unix_timestamp("ts")
                         - F.unix_timestamp(
                             F.lit("2024-01-01 00:00:00").cast("timestamp")))
                        / 60).cast(BIG).alias("mins_since_epoch0"))
            .orderBy("event_id").limit(200))


@query(
    "exists_subquery",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 90000)
    """)
def exists_subquery(spark, sf):
    """Correlated EXISTS subquery (planned as a semi-join)."""
    T(spark, sf, "customer").createOrReplaceTempView("customer")
    T(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 90000)
    """)


@query(
    "scalar_subquery",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6)
               AS price_ratio
    FROM orders ORDER BY o_orderkey LIMIT 100
    """)
def scalar_subquery(spark, sf):
    """Scalar subquery (broadcast of a 1-row aggregate)."""
    T(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6)
                   AS price_ratio
        FROM orders ORDER BY o_orderkey LIMIT 100
    """)


@query(
    "string_manipulation",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           lpad(p_brand, 12, '_') AS padded,
           replace(p_type, ' ', '/') AS replaced,
           reverse(p_brand) AS rev,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
    FROM part ORDER BY p_partkey LIMIT 200
    """)
def string_manipulation(spark, sf):
    """lpad / replace / reverse / position (engine capability)."""
    return (T(spark, sf, "part")
            .select(F.col("p_partkey").cast(BIG).alias("p_partkey"),
                    F.lpad("p_brand", 12, "_").alias("padded"),
                    F.replace("p_type", F.lit(" "), F.lit("/")).alias("replaced"),
                    F.reverse("p_brand").alias("rev"),
                    F.instr("p_name", "a").cast(BIG).alias("first_a"))
            .orderBy("p_partkey").limit(200))


@query(
    "bool_bitwise_aggs",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_big_discount,
           CAST(bit_and(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS band,
           CAST(bit_or(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS bor
    FROM lineitem GROUP BY l_returnflag
    """)
def bool_bitwise_aggs(spark, sf):
    """bool_and/bool_or and bitwise aggregates (engine capability)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
                 F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
                 F.bit_and(F.col("l_linenumber").cast(BIG)).alias("band"),
                 F.bit_or(F.col("l_linenumber").cast(BIG)).alias("bor")))


@query(
    "unpivot_melt",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, metric, round(v, 2) AS v
    FROM (SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS v
          FROM part
          UNION ALL
          SELECT p_partkey, 'price' AS metric, p_retailprice AS v FROM part)
    ORDER BY p_partkey, metric LIMIT 200
    """)
def unpivot_melt(spark, sf):
    """unpivot/melt: wide -> long (engine capability)."""
    return (T(spark, sf, "part")
            .select(F.col("p_partkey").cast(BIG).alias("p_partkey"),
                    F.col("p_size").cast("double").alias("size"),
                    F.col("p_retailprice").alias("price"))
            .unpivot("p_partkey", ["size", "price"], "metric", "v")
            .withColumn("v", F.round("v", 2))
            .orderBy("p_partkey", "metric").limit(200))


@query(
    "null_safe_equality",
    oracle="""
    WITH o2 AS (SELECT o_orderkey,
                       CASE WHEN o_orderstatus = 'P' THEN NULL
                            ELSE o_orderstatus END AS st
                FROM orders)
    SELECT coalesce(a.st, '<null>') AS st,
           CAST(count(*) AS BIGINT) AS pairs
    FROM o2 a JOIN o2 b
      ON a.st IS NOT DISTINCT FROM b.st
     AND a.o_orderkey = b.o_orderkey
    GROUP BY a.st
    """)
def null_safe_equality(spark, sf):
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing (engine capability)."""
    o2 = (T(spark, sf, "orders")
          .select("o_orderkey",
                  F.when(F.col("o_orderstatus") == "P", None)
                  .otherwise(F.col("o_orderstatus")).alias("st")))
    a = o2.select(F.col("o_orderkey").alias("ka"), F.col("st").alias("sa"))
    b = o2.select(F.col("o_orderkey").alias("kb"), F.col("st").alias("sb"))
    return (a.join(b, (F.col("sa").eqNullSafe(F.col("sb")))
                   & (F.col("ka") == F.col("kb")))
            .groupBy(F.coalesce("sa", F.lit("<null>")).alias("st"))
            .agg(F.count("*").alias("pairs")))


@query(
    "union_by_name",
    oracle="""
    SELECT CAST(k AS BIGINT) AS k, src, round(bal, 2) AS bal FROM (
      SELECT c_custkey AS k, 'cust' AS src, c_acctbal AS bal FROM customer
      UNION ALL BY NAME
      SELECT s_acctbal AS bal, 'supp' AS src, s_suppkey AS k FROM supplier)
    ORDER BY src, k LIMIT 200
    """)
def union_by_name(spark, sf):
    """unionByName: position-independent union (engine capability)."""
    c = T(spark, sf, "customer").select(
        F.col("c_custkey").alias("k"), F.lit("cust").alias("src"),
        F.col("c_acctbal").alias("bal"))
    s = T(spark, sf, "supplier").select(
        F.col("s_acctbal").alias("bal"), F.lit("supp").alias("src"),
        F.col("s_suppkey").alias("k"))
    return (c.unionByName(s)
            .select(F.col("k").cast(BIG).alias("k"), "src",
                    F.round("bal", 2).alias("bal"))
            .orderBy("src", "k").limit(200))


@query(
    "histogram_width_bucket",
    oracle="""
    -- width_bucket(x, 0, 600000, 24) spelled out (DuckDB lacks it)
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 600000 THEN 25
                     ELSE floor(o_totalprice / 25000.0) + 1 END AS BIGINT)
               AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY bucket
    """)
def histogram_width_bucket(spark, sf):
    """Equi-width histogram via width_bucket — the one-pass profiling
    shape for numeric columns (bucket id is a pure expression, the agg
    carries only bucket cardinality)."""
    return (T(spark, sf, "orders")
            .groupBy(F.width_bucket("o_totalprice", F.lit(0.0),
                                    F.lit(600000.0), F.lit(24))
                     .cast(BIG).alias("bucket"))
            .agg(F.count("*").cast(BIG).alias("n"),
                 F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi")))


@query(
    "j8_salted_join_agg",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """)
def j8_salted_join_agg(spark, sf):
    """Salted equi-join (fmx.core.skew.salted_join): the fact side gets
    a uniform salt, the dimension replicates once per salt, the join key
    becomes (key, salt) — a power-law hot key lands on num_salts
    reducers instead of one.  Result-identical to the plain join the
    oracle runs (salt only changes row placement)."""
    from fmx.core.skew import salted_join

    li = T(spark, sf, "lineitem").select("l_suppkey", "l_extendedprice")
    s = (T(spark, sf, "supplier")
         .select(F.col("s_suppkey").alias("l_suppkey"), "s_name"))
    return (salted_join(li, s, "l_suppkey", num_salts=8)
            .groupBy("s_name")
            .agg(F.count("*").cast(BIG).alias("n_items"),
                 F.round(F.sum("l_extendedprice"), 2).alias("total")))


@query(
    "a10_salted_hot_agg",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """)
def a10_salted_hot_agg(spark, sf):
    """Two-phase salted aggregation (fmx.core.skew.salted_agg) on a
    5-value hot key: partial agg on (key, salt) spreads each hot group
    over 16 reducers, the final agg merges 16 rows per key.  Identical
    answer to the direct group-by the oracle runs."""
    from fmx.core.skew import salted_agg

    ev = T(spark, sf, "events")
    return (salted_agg(ev, ["event_type"],
                       {"n": "count(*)", "_t": "sum(value)"},
                       num_salts=16)
            .select("event_type", F.col("n").cast(BIG).alias("n"),
                    F.round("_t", 2).alias("total_value")))


@query(
    "dq_expectations",
    oracle="""
    WITH t AS (SELECT count(*) AS n,
                      sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50
                               THEN 0 ELSE 1 END) AS v_qty,
                      sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1
                               THEN 0 ELSE 1 END) AS v_disc,
                      sum(CASE WHEN l_extendedprice > 0
                               THEN 0 ELSE 1 END) AS v_price,
                      sum(CASE WHEN l_shipdate IS NOT NULL
                               THEN 0 ELSE 1 END) AS v_ship
               FROM lineitem)
    SELECT rule, CAST(n AS BIGINT) AS n_rows,
           CAST(v AS BIGINT) AS n_violations,
           round(1.0 - v / n, 6) AS pass_rate
    FROM t, LATERAL (VALUES ('discount_range', v_disc),
                            ('price_positive', v_price),
                            ('qty_range', v_qty),
                            ('shipdate_present', v_ship)) AS r(rule, v)
    """)
def dq_expectations(spark, sf):
    """Data-quality gate: 4 named expectations over lineitem validated
    in ONE aggregation pass (each rule is a conditional count — 50
    rules on 100 TB is still a single scan)."""
    from fmx.operators.dq import check_expectations

    li = T(spark, sf, "lineitem")
    return check_expectations(li, {
        "qty_range": F.col("l_quantity").between(1, 50),
        "discount_range": F.col("l_discount").between(0, 0.1),
        "price_positive": F.col("l_extendedprice") > 0,
        "shipdate_present": F.col("l_shipdate").isNotNull(),
    })


@query(
    "dq_functional_dependency",
    oracle="""
    WITH fd1 AS (SELECT 'o_orderkey->o_custkey' AS fd, o_orderkey AS det,
                        CAST(count(DISTINCT o_custkey) AS BIGINT) AS v,
                        CAST(count(*) AS BIGINT) AS nr
                 FROM orders GROUP BY 1, 2),
    fd2 AS (SELECT 'p_brand->p_type' AS fd, p_brand AS det,
                   CAST(count(DISTINCT p_type) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS nr
            FROM part GROUP BY 1, 2),
    fd3 AS (SELECT 'o_custkey->o_orderpriority' AS fd,
                   CAST(o_custkey AS VARCHAR) AS det,
                   CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS v,
                   CAST(count(*) AS BIGINT) AS nr
            FROM orders GROUP BY 1, 2),
    u AS (SELECT fd, CAST(det AS VARCHAR) AS det, v, nr FROM fd1
          UNION ALL SELECT * FROM fd2
          UNION ALL SELECT * FROM fd3)
    SELECT fd, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN v > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating_keys,
           CAST(max(v) AS BIGINT) AS max_variants,
           CAST(sum(CASE WHEN v > 1 THEN nr ELSE 0 END) AS BIGINT)
               AS n_rows_in_violation
    FROM u GROUP BY fd ORDER BY fd
    """)
def dq_functional_dependency(spark, sf):
    """Functional-dependency audit — does A determine B?  One
    groupBy(A) + count(DISTINCT B) per candidate FD, unioned into a
    per-FD violation report (keys with >1 dependent variant, the worst
    key's variant count, and the row mass sitting on violating keys).
    The audited set spans one FD that must HOLD (o_orderkey ->
    o_custkey: a key constraint, so n_violating_keys == 0 is the
    pass condition dq_key_uniqueness can't express) and two expected
    to fail on independent synthetic columns.  Each FD is a single
    shuffle on the determinant; no joins, no windows."""

    def audit(df, fd, det, dep):
        return (df.groupBy(F.col(det).cast("string").alias("det"))
                .agg(F.count_distinct(F.col(dep)).cast(BIG).alias("v"),
                     F.count("*").cast(BIG).alias("nr"))
                .select(F.lit(fd).alias("fd"), "det", "v", "nr"))

    orders = T(spark, sf, "orders")
    part = T(spark, sf, "part")
    u = (audit(orders, "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
         .unionAll(audit(part, "p_brand->p_type", "p_brand", "p_type"))
         .unionAll(audit(orders, "o_custkey->o_orderpriority",
                         "o_custkey", "o_orderpriority")))
    return (u.groupBy("fd")
            .agg(F.count("*").cast(BIG).alias("n_keys"),
                 F.sum(F.when(F.col("v") > 1, 1).otherwise(0)).cast(BIG)
                 .alias("n_violating_keys"),
                 F.max("v").cast(BIG).alias("max_variants"),
                 F.sum(F.when(F.col("v") > 1, F.col("nr")).otherwise(0))
                 .cast(BIG).alias("n_rows_in_violation")))
