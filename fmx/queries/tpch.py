"""TPC-H-family benchmark queries adapted to the driver's star schema
(no p_container/o_shippriority etc. in the synthetic tables — the join
and aggregation shapes are the point).  All headline benchmarks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"


@query(
    "tpch_q3_shipping_priority",
    headline=True,
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """)
def tpch_q3_shipping_priority(spark, sf):
    """TPC-H Q3 shape: selective dim filter -> two fact joins -> agg ->
    top-10.  Filters push to all three scans; customer side broadcasts."""
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = T(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy(F.col("l_orderkey").cast(BIG).alias("l_orderkey"),
                     "o_orderdate")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("l_orderkey", "revenue",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("orderdate"))
            .orderBy(F.col("revenue").desc(), "l_orderkey").limit(10))


@query(
    "tpch_q5_local_supplier",
    headline=True,
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """)
def tpch_q5_local_supplier(spark, sf):
    """TPC-H Q5 shape: 6-way join with a region filter; nation/region/
    supplier broadcast, the fact tables shuffle on the order key.

    Size-adaptive plan (measured both ways at sf0.1): below
    ``Q5_PREREDUCE_BYTES`` of lineitem the simple left-deep shape wins
    (the extra pre-reduction jobs cost more than the small shuffle they
    avoid, 1.4s vs 1.0s); above it the ASIA filter is pushed through
    customer→orders FIRST, so every downstream shuffle carries ~1/5 of
    the orders/customer rows — the shape you want at 100 TB."""
    shape = "prereduced" if _table_bytes(sf, "lineitem") >= Q5_PREREDUCE_BYTES \
        else "simple"
    return tpch_q5_shape(spark, sf, shape)


Q5_PREREDUCE_BYTES = 1 << 30  # 1 GiB of lineitem parquet


def _table_bytes(sf_dir: str, name: str) -> int:
    import os

    p = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(p):
        return sum(os.path.getsize(os.path.join(dp, f))
                   for dp, _, fs in os.walk(p) for f in fs)
    return os.path.getsize(p) if os.path.exists(p) else 0


def tpch_q5_shape(spark, sf, shape: str):
    """Q5 with an explicit plan shape ('simple' | 'prereduced') — both
    produce identical results (asserted in tests); tpch_q5_local_supplier
    picks by input size."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    s = F.broadcast(T(spark, sf, "supplier"))
    n = F.broadcast(T(spark, sf, "nation"))
    r = F.broadcast(T(spark, sf, "region").filter(F.col("r_name") == "ASIA"))
    agg = lambda joined: (  # noqa: E731
        joined.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2)
             .alias("revenue")))
    if shape == "simple":
        return agg(li.join(o, li.l_orderkey == o.o_orderkey)
                   .join(c, o.o_custkey == c.c_custkey)
                   .join(s, (li.l_suppkey == s.s_suppkey)
                         & (c.c_nationkey == s.s_nationkey))
                   .join(n, s.s_nationkey == n.n_nationkey)
                   .join(r, n.n_regionkey == r.r_regionkey))
    # prereduced: ASIA nations (broadcast, tiny) restrict customers via
    # an equi-join BEFORE the fact joins — orders and every later
    # shuffle carry only ASIA customers' rows (~1/5)
    n_asia = n.join(r, n.n_regionkey == r.r_regionkey)
    c_asia = c.join(F.broadcast(n_asia),
                    c.c_nationkey == n_asia.n_nationkey)
    o_red = o.join(c_asia, o.o_custkey == c_asia.c_custkey)
    return agg(li.join(o_red, li.l_orderkey == o_red.o_orderkey)
               .join(s, (li.l_suppkey == s.s_suppkey)
                     & (F.col("c_nationkey") == s.s_nationkey)))


@query(
    "tpch_q6_forecast_revenue",
    headline=True,
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """)
def tpch_q6_forecast_revenue(spark, sf):
    """TPC-H Q6: pure scan-filter-agg — every predicate reaches the
    parquet reader (PushedFilters), zero joins, one partial+final agg."""
    li = T(spark, sf, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02) & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue")))


@query(
    "tpch_q12_priority_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """)
def tpch_q12_priority_counts(spark, sf):
    """TPC-H Q12 shape: join + conditional-sum aggregation."""
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(is_high, 1).otherwise(0)).cast(BIG)
                 .alias("high_line_count"),
                 F.sum(F.when(~is_high, 1).otherwise(0)).cast(BIG)
                 .alias("low_line_count")))


@query(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """)
def tpch_q14_promo_share(spark, sf):
    """TPC-H Q14 shape: broadcast dim join + conditional revenue ratio."""
    li = T(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    p = F.broadcast(T(spark, sf, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (li.join(p, li.l_partkey == p.p_partkey)
            .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6)
                 .alias("promo_pct")))


@query(
    "having_filter",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS spend
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
    """)
def having_filter(spark, sf):
    """Aggregate + HAVING (post-aggregation filter)."""
    return (T(spark, sf, "orders")
            .groupBy(F.col("o_custkey").cast(BIG).alias("o_custkey"))
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("spend"))
            .filter(F.col("n_orders") >= 15))


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """)
def tpch_q10_returned_items(spark, sf):
    """TPC-H Q10 shape: quarter of returned lineitems -> customer
    revenue ranking.  Date + returnflag predicates push to the scans,
    nation broadcasts, top-20 runs as TakeOrderedAndProject."""
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    li = T(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    c = T(spark, sf, "customer")
    n = F.broadcast(T(spark, sf, "nation"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("c_custkey").cast(BIG).alias("c_custkey"),
                     "c_name", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), "c_custkey").limit(20))


Q18_QTY = 250


@query(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING sum(l_quantity) > {Q18_QTY})
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """)
def tpch_q18_large_orders(spark, sf):
    """TPC-H Q18 shape: agg-derived semi-join (orders whose total
    quantity exceeds a threshold) -> enrich with customer -> re-agg.
    The HAVING subquery becomes a leftsemi join on the grouped fact —
    one extra shuffle on l_orderkey, reused by the outer agg."""
    li = T(spark, sf, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q"))
           .filter(F.col("q") > Q18_QTY)
           .select("l_orderkey"))
    o = T(spark, sf, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey", "leftsemi")
    c = T(spark, sf, "customer")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_custkey").cast(BIG).alias("c_custkey"),
                     "c_name",
                     F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                     "o_orderdate", "o_totalprice")
            .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
            .select("c_custkey", "c_name", "o_orderkey",
                    F.date_format("o_orderdate", "yyyy-MM-dd")
                    .alias("orderdate"),
                    F.round("o_totalprice", 2).alias("totalprice"),
                    "total_qty")
            .orderBy(F.col("totalprice").desc(), "o_orderkey").limit(100))


@query(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """)
def tpch_q19_disjunctive(spark, sf):
    """TPC-H Q19 shape: disjunctive mixed-table predicates over a
    broadcast dim join — Catalyst extracts the common l_quantity/p_size
    bounds as scan-level filters, the OR evaluates post-join in
    codegen."""
    li = T(spark, sf, "lineitem")
    p = F.broadcast(T(spark, sf, "part"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (((b == "Brand#12") & q.between(1, 11) & s.between(1, 5))
            | ((b == "Brand#23") & q.between(10, 20) & s.between(1, 10))
            | ((b == "Brand#34") & q.between(20, 30) & s.between(1, 15)))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@query(
    "tpch_q4_late_orders",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """)
def tpch_q4_late_orders(spark, sf):
    """TPC-H Q4 shape (adapted: ship-lag > 60 days replaces the absent
    commit/receipt dates): EXISTS decorrelates to a left-semi join on
    the order key; the quarter filter pushes to the orders scan."""
    o = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp")))
    li = T(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(li, (li.l_orderkey == o.o_orderkey)
                  & (li.l_shipdate > F.col("o_orderdate")
                     + F.expr("INTERVAL 60 DAYS")), "leftsemi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").cast(BIG).alias("order_count")))


@query(
    "tpch_q13_custdist",
    oracle="""
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count
    """)
def tpch_q13_custdist(spark, sf):
    """TPC-H Q13 shape: outer join with a join-side predicate, then a
    distribution-of-counts double aggregation (customers keyed first,
    then histogram — the second agg input is only |customers| rows)."""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy(F.col("c_count").cast(BIG).alias("c_count"))
            .agg(F.count("*").cast(BIG).alias("custdist")))


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """)
def tpch_q17_small_qty_revenue(spark, sf):
    """TPC-H Q17 shape: per-part correlated average decorrelated into an
    aggregate + broadcast join.  The per-part avg is computed ONLY over
    the brand's parts (semi-join pushdown before the agg) — at 100 TB
    the unpushed variant aggregates the whole fact table for a 1/25
    brand slice."""
    li = T(spark, sf, "lineitem")
    p = F.broadcast(T(spark, sf, "part")
                    .filter(F.col("p_brand") == "Brand#23")
                    .select("p_partkey"))
    li_brand = li.join(p, li.l_partkey == p.p_partkey)
    avg_q = (li_brand.groupBy("l_partkey")
             .agg((0.2 * F.avg("l_quantity")).alias("_lim")))
    return (li_brand.join(F.broadcast(avg_q), "l_partkey")
            .filter(F.col("l_quantity") < F.col("_lim"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly")))


@query(
    "tpch_q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (SELECT avg(c_acctbal) AS v FROM customer
                     WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """)
def tpch_q22_idle_rich_customers(spark, sf):
    """TPC-H Q22 shape (adapted: mktsegment replaces the absent phone
    prefix; 'no urgent orders' keeps the anti-join selective): global
    scalar average (one tiny broadcast) + anti join + aggregation."""
    c = T(spark, sf, "customer")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg(F.avg("c_acctbal").alias("_avg")))
    urgent = (T(spark, sf, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_custkey").alias("c_custkey")))
    return (c.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("_avg"))
            .join(urgent, "c_custkey", "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").cast(BIG).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, CAST(l_year AS BIGINT) AS l_year,
           round(sum(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 year(l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """)
def tpch_q7_nation_volume(spark, sf):
    """TPC-H Q7 shape: the same dimension (nation) joined in two roles
    (supplier side / customer side) with a disjunctive cross-role
    predicate.  Both nation copies broadcast; the disjunction evaluates
    after both roles attach — Catalyst can't split it, which is the
    point of the shape."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    s = F.broadcast(T(spark, sf, "supplier"))
    n1 = F.broadcast(T(spark, sf, "nation")
                     .select(F.col("n_nationkey").alias("_n1k"),
                             F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(T(spark, sf, "nation")
                     .select(F.col("n_nationkey").alias("_n2k"),
                             F.col("n_name").alias("cust_nation")))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(n1, F.col("s_nationkey") == F.col("_n1k"))
            .join(n2, F.col("c_nationkey") == F.col("_n2k"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast(BIG).alias("l_year"))
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(o_year AS BIGINT) AS o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) / sum(volume), 6) AS mkt_share
    FROM (SELECT year(o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN customer ON c_custkey = o_custkey
               JOIN nation n1 ON c_nationkey = n1.n_nationkey
               JOIN region ON n1.n_regionkey = r_regionkey
               JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    GROUP BY o_year
    """)
def tpch_q8_market_share(spark, sf):
    """TPC-H Q8 shape: national market share inside a customer region —
    a 7-way star with nation in two roles and a conditional-revenue
    ratio.  Region/nation/part/supplier broadcast; facts shuffle once
    on the order key."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    s = F.broadcast(T(spark, sf, "supplier"))
    p = F.broadcast(T(spark, sf, "part")
                    .filter(F.col("p_type") == "PROMO")
                    .select("p_partkey"))
    n1 = F.broadcast(T(spark, sf, "nation")
                     .select(F.col("n_nationkey").alias("_n1k"),
                             F.col("n_regionkey").alias("_n1r")))
    r = F.broadcast(T(spark, sf, "region")
                    .filter(F.col("r_name") == "ASIA"))
    n2 = F.broadcast(T(spark, sf, "nation")
                     .select(F.col("n_nationkey").alias("_n2k"),
                             F.col("n_name").alias("supp_nation")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_share = F.when(F.col("supp_nation") == "NATION_3", vol) \
                  .otherwise(0.0)
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(n1, F.col("c_nationkey") == F.col("_n1k"))
            .join(r, F.col("_n1r") == F.col("r_regionkey"))
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(n2, F.col("s_nationkey") == F.col("_n2k"))
            .groupBy(F.year("o_orderdate").cast(BIG).alias("o_year"))
            .agg(F.round(F.sum(asia_share) / F.sum(vol), 6)
                 .alias("mkt_share")))


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                   - 0.5 * p_retailprice * l_quantity
                   AS DECIMAL(18,4)) AS amount
          FROM part JOIN lineitem ON p_partkey = l_partkey
               JOIN supplier ON s_suppkey = l_suppkey
               JOIN orders ON o_orderkey = l_orderkey
               JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%widget%')
    GROUP BY nation, o_year
    """)
def tpch_q9_product_profit(spark, sf):
    """TPC-H Q9 shape (adapted: cost = 0.5 x retailprice x quantity —
    the synthetic schema has no partsupp): profit by supplier nation and
    order year for a part-name slice.  Part/supplier/nation broadcast,
    one fact shuffle on the order key."""
    li = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders")
    s = F.broadcast(T(spark, sf, "supplier"))
    n = F.broadcast(T(spark, sf, "nation"))
    p = F.broadcast(T(spark, sf, "part")
                    .filter(F.col("p_name").like("%widget%"))
                    .select("p_partkey", "p_retailprice"))
    # Accumulate in DECIMAL so the sum is exact / order-independent —
    # double sums land on either side of a .005 rounding boundary
    # depending on reduction order (observed at sf0.001).
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
              ).cast("decimal(18,4)")
    return (li.join(p, li.l_partkey == p.p_partkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast(BIG).alias("o_year"))
            .agg(F.round(F.sum(amount), 2).cast("double")
                 .alias("sum_profit")))


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                 AS n_late_supp
      FROM late GROUP BY l_orderkey)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late JOIN per_order USING (l_orderkey)
              JOIN supplier ON s_suppkey = l_suppkey
    WHERE is_late = 1 AND n_supp > 1 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """)
def tpch_q21_waiting_supplier(spark, sf):
    """TPC-H Q21 shape (adapted lateness = shipped >60 days after
    order): suppliers solely responsible for a multi-supplier order
    shipping late.  The reference formulation is EXISTS + NOT EXISTS
    self-joins (three lineitem scans); here both decorrelate into one
    (order, supplier) aggregate + a window over the order key — ONE
    lineitem scan, no correlated re-scans, no join-back."""
    from pyspark.sql import Window

    o = T(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = T(spark, sf, "lineitem")
    late = (li.join(o, li.l_orderkey == o.o_orderkey)
            .select("l_orderkey", "l_suppkey",
                    F.when(F.col("l_shipdate") > F.col("o_orderdate")
                           + F.expr("INTERVAL 60 DAYS"), 1)
                    .otherwise(0).alias("is_late")))
    per_supp = (late.groupBy("l_orderkey", "l_suppkey")
                .agg(F.max("is_late").alias("supp_late"),
                     F.sum("is_late").alias("n_late_rows")))
    w = Window.partitionBy("l_orderkey")
    x = (per_supp
         .withColumn("n_supp", F.count("*").over(w))
         .withColumn("n_late_supp", F.sum("supp_late").over(w)))
    s = F.broadcast(T(spark, sf, "supplier"))
    return (x.filter((F.col("supp_late") == 1) & (F.col("n_supp") > 1)
                     & (F.col("n_late_supp") == 1))
            .join(s, x.l_suppkey == s.s_suppkey)
            .groupBy("s_name")
            .agg(F.sum("n_late_rows").cast(BIG).alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name").limit(20))


# --- Q2/Q11/Q16/Q20: the partsupp-dependent shapes -----------------------
# The driver schema ships no partsupp table, so one is SYNTHESIZED
# deterministically from part x 4 suppliers with pure integer arithmetic
# (identical in Spark and DuckDB — engine-portable like the md5-derived
# hashes elsewhere).  The point of these queries is the JOIN/AGG SHAPE
# (decorrelated min-cost window, fraction-of-total having, distinct
# supplier counting, excess-stock semi-join), not TPC-H-kit data.

_PS_SQL = """
ns AS (SELECT count(*) AS _n FROM supplier),
g AS (SELECT unnest(generate_series(0, 3)) AS i),
partsupp AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey * 7 + i * 13 + 1) % _n AS ps_suppkey,
         CAST((p_partkey * 37 + i * 71) % 9999 + 1 AS BIGINT)
             AS ps_availqty,
         round(100.0 + ((p_partkey * 31 + i * 17) % 80000) / 100.0, 2)
             AS ps_supplycost
  FROM part, ns, g)
"""


def synthetic_partsupp(spark, sf):
    """Deterministic partsupp: every part links to 4 suppliers with
    arithmetic-derived keys, availqty, and supplycost.  Generated, not
    stored — the build is a broadcast 1-row count + explode, so it
    costs one narrow map stage at any scale."""
    part = T(spark, sf, "part").select("p_partkey")
    ns = F.broadcast(T(spark, sf, "supplier").agg(F.count("*").alias("_n")))
    p, i = F.col("p_partkey"), F.col("i")
    return (part.crossJoin(ns)
            .select("p_partkey", "_n",
                    F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
            .select(p.alias("ps_partkey"),
                    ((p * 7 + i * 13 + 1) % F.col("_n")).alias("ps_suppkey"),
                    ((p * 37 + i * 71) % 9999 + 1).cast(BIG)
                    .alias("ps_availqty"),
                    F.round(100.0 + ((p * 31 + i * 17) % 80000) / 100.0, 2)
                    .alias("ps_supplycost")))


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_SQL},
    rs AS (SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           WHERE n_regionkey = 1),
    costs AS (SELECT ps_partkey, ps_suppkey, ps_supplycost,
                     min(ps_supplycost) OVER (PARTITION BY ps_partkey)
                         AS min_cost
              FROM partsupp JOIN rs ON ps_suppkey = rs.s_suppkey
              WHERE ps_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_size = 24))
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           CAST(ps_partkey AS BIGINT) AS p_partkey, ps_supplycost
    FROM costs JOIN rs ON ps_suppkey = rs.s_suppkey
    WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 50
    """)
def tpch_q2_min_cost_supplier(spark, sf):
    """TPC-H Q2 shape: minimum-cost supplier per part within a region —
    the correlated min subquery DECORRELATED into a per-part window
    min over the region-filtered partsupp (one pass, no re-scan per
    part); region suppliers broadcast."""
    ps = synthetic_partsupp(spark, sf)
    nat = T(spark, sf, "nation").filter(F.col("n_regionkey") == 1)
    rs = (T(spark, sf, "supplier")
          .join(F.broadcast(nat),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    target = (T(spark, sf, "part").filter(F.col("p_size") == 24)
              .select("p_partkey"))
    costs = (ps.join(F.broadcast(rs.select("s_suppkey")),
                     ps["ps_suppkey"] == F.col("s_suppkey"))
             .join(F.broadcast(target),
                   ps["ps_partkey"] == F.col("p_partkey"))
             .select("ps_partkey", "ps_suppkey", "ps_supplycost"))
    from pyspark.sql import Window
    w = Window.partitionBy("ps_partkey")
    best = (costs.withColumn("min_cost", F.min("ps_supplycost").over(w))
            .filter(F.col("ps_supplycost") == F.col("min_cost")))
    return (best.join(F.broadcast(rs),
                      best["ps_suppkey"] == rs["s_suppkey"])
            .select(F.round("s_acctbal", 2).alias("s_acctbal"),
                    "s_name", "n_name",
                    F.col("ps_partkey").cast(BIG).alias("p_partkey"),
                    "ps_supplycost")
            .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
            .limit(50))


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_PS_SQL},
    natsup AS (SELECT s_suppkey FROM supplier
               JOIN nation ON s_nationkey = n_nationkey
               WHERE n_regionkey = 3),
    val AS (SELECT ps_partkey, sum(ps_supplycost * ps_availqty) AS v
            FROM partsupp JOIN natsup ON ps_suppkey = s_suppkey
            GROUP BY ps_partkey),
    tot AS (SELECT sum(v) AS t, count(*) AS np FROM val)
    SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey,
           round(v, 2) AS stock_value
    FROM val, tot WHERE v > t * 1.5 / np
    ORDER BY stock_value DESC, ps_partkey
    """)
def tpch_q11_important_stock(spark, sf):
    """TPC-H Q11 shape: per-part stock value for one region's
    suppliers, keeping parts above 1.5x the average share.  The
    threshold scales with part count (the kit's fixed fraction goes
    vacuous as parts grow); the total enters as a broadcast 1-row
    cross join, not a collected literal."""
    ps = synthetic_partsupp(spark, sf)
    nat3 = T(spark, sf, "nation").filter(F.col("n_regionkey") == 3)
    natsup = (T(spark, sf, "supplier")
              .join(F.broadcast(nat3),
                    F.col("s_nationkey") == F.col("n_nationkey"))
              .select("s_suppkey"))
    val = (ps.join(F.broadcast(natsup),
                   ps["ps_suppkey"] == F.col("s_suppkey"))
           .groupBy("ps_partkey")
           .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty"))
                .alias("v")))
    tot = val.agg(F.sum("v").alias("t"), F.count("*").alias("np"))
    return (val.crossJoin(F.broadcast(tot))
            .filter(F.col("v") > F.col("t") * 1.5 / F.col("np"))
            .select(F.col("ps_partkey").cast(BIG).alias("ps_partkey"),
                    F.round("v", 2).alias("stock_value"))
            .orderBy(F.col("stock_value").desc(), "ps_partkey"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount))
                 AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey),
    mx AS (SELECT max(total_rev) AS m FROM rev)
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           round(total_rev, 2) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey, mx
    WHERE total_rev = m
    ORDER BY s_suppkey
    """)
def tpch_q15_top_supplier(spark, sf):
    """TPC-H Q15 shape: the revenue view (3-month shipped revenue per
    supplier) joined back against its own max — the max enters as a
    broadcast scalar, so the view is computed once and never
    re-scanned per row."""
    li = (T(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= "1998-01-01")
                  & (F.col("l_shipdate") < "1998-04-01")))
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("m"))
    return (rev.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev") == F.col("m"))
            .join(T(spark, sf, "supplier"),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .select(F.col("s_suppkey").cast(BIG).alias("s_suppkey"),
                    "s_name", F.round("total_rev", 2).alias("total_rev"))
            .orderBy("s_suppkey"))


@query(
    "tpch_q16_supplier_cnt",
    oracle=f"""
    WITH {_PS_SQL},
    excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON ps_partkey = p_partkey
    WHERE p_brand <> 'Brand#13' AND p_size IN (9, 10, 24)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM excl)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """)
def tpch_q16_supplier_cnt(spark, sf):
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) slice, excluding flagged suppliers via an ANTI join (the
    NOT IN that stays null-safe and never nested-loops)."""
    ps = synthetic_partsupp(spark, sf)
    part = (T(spark, sf, "part")
            .filter((F.col("p_brand") != "Brand#13")
                    & F.col("p_size").isin(9, 10, 24))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    excl = (T(spark, sf, "supplier")
            .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (ps.join(F.broadcast(part),
                    ps["ps_partkey"] == F.col("p_partkey"))
            .join(F.broadcast(excl),
                  ps["ps_suppkey"] == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("ps_suppkey").cast(BIG)
                 .alias("supplier_cnt"))
            .select("p_brand", "p_type",
                    F.col("p_size").cast(BIG).alias("p_size"),
                    "supplier_cnt")
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


@query(
    "tpch_q20_excess_stock",
    oracle=f"""
    WITH {_PS_SQL},
    shipped AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                GROUP BY l_partkey, l_suppkey),
    excess AS (SELECT DISTINCT ps_suppkey
               FROM partsupp JOIN shipped
                 ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
               WHERE ps_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_name LIKE '%widget%')
                 AND ps_availqty > 0.5 * q)
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
    FROM supplier JOIN excess ON s_suppkey = ps_suppkey
    ORDER BY s_suppkey
    """)
def tpch_q20_excess_stock(spark, sf):
    """TPC-H Q20 shape: suppliers holding more than half their shipped
    quantity of forecast ('widget') parts — shipped quantities
    pre-aggregated at (part, supplier) grain so the partsupp
    comparison is an equi-join, then a semi join up to suppliers."""
    ps = synthetic_partsupp(spark, sf)
    shipped = (T(spark, sf, "lineitem")
               .filter(F.col("l_shipdate") >= "1998-01-01")
               .groupBy("l_partkey", "l_suppkey")
               .agg(F.sum("l_quantity").alias("q")))
    widgets = (T(spark, sf, "part")
               .filter(F.col("p_name").like("%widget%"))
               .select("p_partkey"))
    excess = (ps.join(F.broadcast(widgets),
                      ps["ps_partkey"] == F.col("p_partkey"))
              .join(shipped,
                    (ps["ps_partkey"] == F.col("l_partkey"))
                    & (ps["ps_suppkey"] == F.col("l_suppkey")))
              .filter(F.col("ps_availqty") > 0.5 * F.col("q"))
              .select("ps_suppkey").distinct())
    return (T(spark, sf, "supplier")
            .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"),
                  "left_semi")
            .select(F.col("s_suppkey").cast(BIG).alias("s_suppkey"),
                    "s_name")
            .orderBy("s_suppkey"))
