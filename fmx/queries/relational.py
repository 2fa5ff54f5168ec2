"""Relational capability layer — the declared queries of SURVEY.md §2
(scans, projections, all join shapes, aggregations, windows, sorts,
set ops, scalar functions), expressed with the DataFrame API so Catalyst
owns the physical strategy.

Scale notes are attached per query where the plan shape matters at
100 TB: broadcast of dimension tables, partial aggregation, pushdown.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"


# ---------------------------------------------------------------------------
# projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------

@query(
    "p1_projection",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS rev
    FROM lineitem ORDER BY l_orderkey, l_linenumber, rev LIMIT 100
    """)
def p1_projection(spark, sf):
    """Multi-column projection pipeline (ref Model.scala:148-233 P1).
    Column pruning reaches the parquet scan: only 4 of 11 cols read.
    rev joins the ORDER BY: (orderkey, linenumber) is not unique."""
    return (T(spark, sf, "lineitem")
            .select(F.col("l_orderkey").cast(BIG).alias("l_orderkey"),
                    F.col("l_linenumber").cast(BIG).alias("l_linenumber"),
                    F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
                     .alias("rev"))
            .orderBy("l_orderkey", "l_linenumber", "rev")
            .limit(100))


@query(
    "p2_drop_column",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment
    FROM customer
    """)
def p2_drop_column(spark, sf):
    """Column drop (ref Model.scala:84-85 P2)."""
    return (T(spark, sf, "customer").drop("c_acctbal")
            .select(F.col("c_custkey").cast(BIG).alias("c_custkey"), "c_name",
                    F.col("c_nationkey").cast(BIG).alias("c_nationkey"),
                    "c_mktsegment"))


@query(
    "p3_nullif_coalesce",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'X') AS st
    FROM orders ORDER BY o_orderkey LIMIT 100
    """)
def p3_nullif_coalesce(spark, sf):
    """Null-fill predicate family (ref Model.scala:86 P3)."""
    return (T(spark, sf, "orders")
            .select(F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")),
                               F.lit("X")).alias("st"))
            .orderBy("o_orderkey").limit(100))


@query(
    "p4_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
def p4_distinct(spark, sf):
    """distinct (ref SGD.scala:231 P4) — partial-agg before shuffle."""
    return T(spark, sf, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "p6_filter_group",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem WHERE l_quantity > 25
    GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100
    """)
def p6_filter_group(spark, sf):
    """Filter + group (P6). The quantity predicate is pushed to the
    parquet scan (PushedFilters)."""
    return (T(spark, sf, "lineitem")
            .filter(F.col("l_quantity") > 25)
            .groupBy(F.col("l_orderkey").cast(BIG).alias("l_orderkey"))
            .agg(F.count("*").alias("cnt"))
            .orderBy("l_orderkey").limit(100))


# ---------------------------------------------------------------------------
# joins (SURVEY §2.3) — all four reference shapes + semi/anti capabilities
# ---------------------------------------------------------------------------

@query(
    "j1_inner_join_agg",
    headline=True,
    oracle="""
    SELECT n_name, CAST(count(*) AS BIGINT) AS cnt,
           round(sum(c_acctbal), 2) AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """)
def j1_inner_join_agg(spark, sf):
    """Inner equi-join onto a dimension (ref J1, Model.scala:102-112).
    nation is tiny -> broadcast: no shuffle of the fact side."""
    c = T(spark, sf, "customer")
    n = F.broadcast(T(spark, sf, "nation"))
    return (c.join(n, c.c_nationkey == n.n_nationkey, "inner")
            .groupBy("n_name")
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("c_acctbal"), 2).alias("bal")))


@query(
    "j2_left_join_coalesce",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           coalesce(c_name, '??') AS cname
    FROM orders LEFT JOIN customer
      ON o_custkey = c_custkey AND c_acctbal > 9000
    ORDER BY o_orderkey LIMIT 100
    """)
def j2_left_join_coalesce(spark, sf):
    """left_outer + coalesce default (ref J2, Model.scala:154-171)."""
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (o.join(c, (o.o_custkey == c.c_custkey) & (c.c_acctbal > 9000), "left")
            .select(F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.coalesce("c_name", F.lit("??")).alias("cname"))
            .orderBy("o_orderkey").limit(100))


@query(
    "j3_left_join_fill",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           round(coalesce(c_acctbal, 0.0), 2) AS bal
    FROM orders LEFT JOIN customer
      ON o_custkey = c_custkey AND c_acctbal > 5000
    ORDER BY o_orderkey LIMIT 100
    """)
def j3_left_join_fill(spark, sf):
    """left_outer + na.fill fallback (ref J3, Model.scala:78-86)."""
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (o.join(c, (o.o_custkey == c.c_custkey) & (c.c_acctbal > 5000), "left")
            .select(F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.col("c_acctbal").alias("bal"))
            .na.fill({"bal": 0.0})
            .select("o_orderkey", F.round("bal", 2).alias("bal"))
            .orderBy("o_orderkey").limit(100))


@query(
    "j4_full_outer_upsert",
    oracle="""
    WITH a AS (SELECT o_custkey AS k, round(sum(o_totalprice), 2) AS v
               FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
         b AS (SELECT o_custkey AS k, round(sum(o_totalprice), 2) AS v
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
    SELECT CAST(coalesce(a.k, b.k) AS BIGINT) AS k,
           round(coalesce(a.v, 0) + coalesce(b.v, 0), 2) AS v
    FROM a FULL OUTER JOIN b ON a.k = b.k
    """)
def j4_full_outer_upsert(spark, sf):
    """full-outer key-merge upsert (ref J4, SGD.scala:156-175)."""
    o = T(spark, sf, "orders")
    a = (o.filter("o_orderstatus = 'O'").groupBy("o_custkey")
         .agg(F.round(F.sum("o_totalprice"), 2).alias("v"))
         .select(F.col("o_custkey").alias("ak"), F.col("v").alias("av")))
    b = (o.filter("o_orderstatus = 'F'").groupBy("o_custkey")
         .agg(F.round(F.sum("o_totalprice"), 2).alias("v"))
         .select(F.col("o_custkey").alias("bk"), F.col("v").alias("bv")))
    return (a.join(b, a.ak == b.bk, "outer")
            .select(F.coalesce("ak", "bk").cast(BIG).alias("k"),
                    F.round(F.coalesce("av", F.lit(0.0))
                            + F.coalesce("bv", F.lit(0.0)), 2).alias("v")))


@query(
    "j5_semi_join",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 50000)
    """)
def j5_semi_join(spark, sf):
    """left-semi join (engine capability beyond the reference)."""
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (c.join(o.filter("o_totalprice > 50000"),
                   c.c_custkey == o.o_custkey, "left_semi")
            .select(F.col("c_custkey").cast(BIG).alias("c_custkey")))


@query(
    "j6_anti_join",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT')
    """)
def j6_anti_join(spark, sf):
    """left-anti join (engine capability): customers with no URGENT
    order.  (Every customer has *some* order in the synthetic data, so
    the unfiltered anti-join would be vacuously empty — r02 lesson.)"""
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .select(F.col("c_custkey").cast(BIG).alias("c_custkey")))


@query(
    "j7_broadcast_two_dims",
    oracle="""
    SELECT r_name, CAST(count(*) AS BIGINT) AS suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """)
def j7_broadcast_two_dims(spark, sf):
    """Snowflake join through two broadcast dims (ref scalar-broadcast
    family, Model.scala:95)."""
    s = T(spark, sf, "supplier")
    n = F.broadcast(T(spark, sf, "nation"))
    r = F.broadcast(T(spark, sf, "region"))
    return (s.join(n, s.s_nationkey == n.n_nationkey)
            .join(r, n.n_regionkey == r.r_regionkey)
            .groupBy("r_name").agg(F.count("*").alias("suppliers")))


# ---------------------------------------------------------------------------
# aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@query(
    "a1_tpch_q1",
    headline=True,
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """)
def a1_tpch_q1(spark, sf):
    """Hash aggregation, TPC-H Q1 family (ref A1, Model.scala:119-124).
    Map-side partial agg -> tiny shuffle (4 groups)."""
    li = T(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc), 2).alias("sum_disc_price"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order")))


@query(
    "a2_group_avg",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           round(sum(o_totalprice) / count(*), 6) AS avg_price
    FROM orders GROUP BY o_custkey
    """)
def a2_group_avg(spark, sf):
    """sum/count gradient-averaging shape (ref A2, SGD.scala:148-155)."""
    return (T(spark, sf, "orders")
            .groupBy(F.col("o_custkey").cast(BIG).alias("o_custkey"))
            .agg(F.round(F.sum("o_totalprice") / F.count("*"), 6)
                 .alias("avg_price")))


@query(
    "a3_group_min_date",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_order
    FROM orders GROUP BY o_custkey
    """)
def a3_group_min_date(spark, sf):
    """Deterministic replacement for the reference's first() dedup
    (ref A3, SGD.scala:134-136 — first() is order-dependent; min is not)."""
    return (T(spark, sf, "orders")
            .groupBy(F.col("o_custkey").cast(BIG).alias("o_custkey"))
            .agg(F.date_format(F.min("o_orderdate"), "yyyy-MM-dd")
                 .alias("first_order")))


@query(
    "a5_collect_set_sorted",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prios
    FROM orders GROUP BY o_custkey
    """)
def a5_collect_set_sorted(spark, sf):
    """set-agg, sorted for determinism (ref A5, Sample.scala:109-112)."""
    return (T(spark, sf, "orders")
            .groupBy(F.col("o_custkey").cast(BIG).alias("o_custkey"))
            .agg(F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",")
                 .alias("prios")))


@query(
    "a6_global_sum",
    oracle="SELECT round(sum(l_extendedprice), 2) AS total FROM lineitem")
def a6_global_sum(spark, sf):
    """Global sum as SQL agg, not RDD reduce (ref A6, SGD.scala:137-138)."""
    return (T(spark, sf, "lineitem")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("total")))


@query(
    "a7_min_max",
    oracle="""
    SELECT round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
    FROM orders
    """)
def a7_min_max(spark, sf):
    """min/max label-range scan (ref A7, Sample.scala:130-135)."""
    return (T(spark, sf, "orders")
            .agg(F.round(F.min("o_totalprice"), 2).alias("lo"),
                 F.round(F.max("o_totalprice"), 2).alias("hi")))


@query("a8_count", oracle="SELECT count(*) AS cnt FROM lineitem")
def a8_count(spark, sf):
    """count() (ref A8, SGD.scala:124) — parquet row-group metadata only."""
    return T(spark, sf, "lineitem").agg(F.count("*").alias("cnt"))


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supps
    FROM lineitem GROUP BY l_returnflag
    """)
def agg_count_distinct(spark, sf):
    """distinct-aggregate (engine capability; expand-based plan)."""
    return (T(spark, sf, "lineitem").groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("nd_parts"),
                 F.countDistinct("l_suppkey").alias("nd_supps")))


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           round(sum(l_quantity), 2) AS qty,
           CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """)
def agg_rollup(spark, sf):
    """GROUP BY ROLLUP (engine capability)."""
    return (T(spark, sf, "lineitem")
            .rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("qty"),
                 F.count("*").alias("cnt"))
            .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
                    F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
                    "qty", "cnt"))


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS st,
           coalesce(o_orderpriority, 'ALL') AS pri,
           round(sum(o_totalprice), 2) AS rev
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """)
def agg_cube(spark, sf):
    """GROUP BY CUBE (engine capability)."""
    return (T(spark, sf, "orders")
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
            .select(F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
                    F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
                    "rev"))


# ---------------------------------------------------------------------------
# sorts / limits / set ops (SURVEY §2.6)
# ---------------------------------------------------------------------------

@query(
    "sort_limit_topk",
    oracle="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(l_quantity, 2) AS qty
    FROM lineitem
    ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 50
    """)
def sort_limit_topk(spark, sf):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge of k rows, no full sort at any scale."""
    return (T(spark, sf, "lineitem")
            .select(F.col("l_orderkey").cast(BIG).alias("l_orderkey"),
                    F.col("l_linenumber").cast(BIG).alias("l_linenumber"),
                    F.round("l_quantity", 2).alias("qty"))
            .orderBy(F.col("qty").desc(), "l_orderkey", "l_linenumber")
            .limit(50))


@query(
    "set_union_distinct",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
    UNION
    SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier
    """)
def set_union_distinct(spark, sf):
    c = T(spark, sf, "customer").select(F.col("c_nationkey").cast(BIG).alias("k"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").cast(BIG).alias("k"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT CAST(o_custkey AS BIGINT) AS k FROM orders WHERE o_orderstatus = 'O'
    """)
def set_intersect(spark, sf):
    o = T(spark, sf, "orders")
    a = o.filter("o_orderstatus = 'F'").select(F.col("o_custkey").cast(BIG).alias("k"))
    b = o.filter("o_orderstatus = 'O'").select(F.col("o_custkey").cast(BIG).alias("k"))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
    EXCEPT
    SELECT CAST(o_custkey AS BIGINT) AS k FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """)
def set_except(spark, sf):
    """EXCEPT over key sets (non-empty slice: customers minus
    urgent-order customers — the unfiltered difference is empty)."""
    c = T(spark, sf, "customer").select(F.col("c_custkey").cast(BIG).alias("k"))
    o = (T(spark, sf, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .select(F.col("o_custkey").cast(BIG).alias("k")))
    return c.exceptAll(o).distinct()


# ---------------------------------------------------------------------------
# scalar functions (SURVEY §2.7) + engine capabilities (json/date/regex)
# ---------------------------------------------------------------------------

@query(
    "f1_explode_tokens",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, w
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    ORDER BY doc_id, w LIMIT 200
    """)
def f1_explode_tokens(spark, sf):
    """explode/lateral view (ref F1, Model.scala:100)."""
    return (T(spark, sf, "documents")
            .select(F.col("doc_id").cast(BIG).alias("doc_id"),
                    F.explode(F.split("text", " ")).alias("w"))
            .orderBy("doc_id", "w").limit(200))


@query(
    "f3_clamp",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           round(least(greatest(o_totalprice, 1000.0), 100000.0), 2) AS clamped
    FROM orders ORDER BY o_orderkey LIMIT 100
    """)
def f3_clamp(spark, sf):
    """least/greatest clamp (ref F3, Model.scala:131)."""
    return (T(spark, sf, "orders")
            .select(F.col("o_orderkey").cast(BIG).alias("o_orderkey"),
                    F.round(F.least(F.greatest("o_totalprice", F.lit(1000.0)),
                                    F.lit(100000.0)), 2).alias("clamped"))
            .orderBy("o_orderkey").limit(100))


@query(
    "f4_math",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(sign(c_acctbal) AS DOUBLE) AS sgn,
           round(abs(c_acctbal), 2) AS ab,
           round(pow(c_acctbal, 2), 2) AS sq,
           round(sqrt(abs(c_acctbal)), 6) AS rt
    FROM customer ORDER BY c_custkey LIMIT 100
    """)
def f4_math(spark, sf):
    """signum/abs/pow/sqrt (ref F4, SGD.scala:121,179)."""
    return (T(spark, sf, "customer")
            .select(F.col("c_custkey").cast(BIG).alias("c_custkey"),
                    F.signum("c_acctbal").alias("sgn"),
                    F.round(F.abs("c_acctbal"), 2).alias("ab"),
                    F.round(F.pow("c_acctbal", F.lit(2)), 2).alias("sq"),
                    F.round(F.sqrt(F.abs("c_acctbal")), 6).alias("rt"))
            .orderBy("c_custkey").limit(100))


@query(
    "f6_split_cast",
    oracle="""
    SELECT split_part(p_type, ' ', 1) AS family,
           CAST(count(*) AS BIGINT) AS cnt,
           round(avg(p_retailprice), 6) AS avg_price
    FROM part GROUP BY split_part(p_type, ' ', 1)
    """)
def f6_split_cast(spark, sf):
    """string split + array index (ref F6, Sample.scala:121-122)."""
    return (T(spark, sf, "part")
            .groupBy(F.split("p_type", " ")[0].alias("family"))
            .agg(F.count("*").alias("cnt"),
                 F.round(F.avg("p_retailprice"), 6).alias("avg_price")))


@query(
    "json_extract",
    oracle="""
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events ORDER BY event_id LIMIT 200
    """)
def json_extract(spark, sf):
    """JSON path extraction over events.props (engine capability,
    SURVEY §2.7 note)."""
    return (T(spark, sf, "events")
            .select(F.col("event_id").cast(BIG).alias("event_id"),
                    F.get_json_object("props", "$.k").cast(BIG).alias("k"))
            .orderBy("event_id").limit(200))


@query(
    "date_trunc_month",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """)
def date_trunc_month(spark, sf):
    """date_trunc + group (engine capability)."""
    return (T(spark, sf, "events")
            .groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                     .alias("d"),
                     "event_type")
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 4).alias("total")))


@query(
    "string_funcs",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           upper(c_name) AS up,
           substring(c_name, 1, 8) AS sub,
           CAST(length(c_name) AS BIGINT) AS len,
           concat(c_mktsegment, '-', c_name) AS cc
    FROM customer ORDER BY c_custkey LIMIT 100
    """)
def string_funcs(spark, sf):
    """upper/substring/length/concat (ref F6 family)."""
    return (T(spark, sf, "customer")
            .select(F.col("c_custkey").cast(BIG).alias("c_custkey"),
                    F.upper("c_name").alias("up"),
                    F.substring("c_name", 1, 8).alias("sub"),
                    F.length("c_name").cast(BIG).alias("len"),
                    F.concat_ws("-", "c_mktsegment", "c_name").alias("cc"))
            .orderBy("c_custkey").limit(100))


@query(
    "regexp_funcs",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS vowels
    FROM part ORDER BY p_partkey LIMIT 200
    """)
def regexp_funcs(spark, sf):
    """regexp extract/count (engine capability)."""
    return (T(spark, sf, "part")
            .select(F.col("p_partkey").cast(BIG).alias("p_partkey"),
                    F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
                    F.regexp_count("p_name", F.lit("[aeiou]")).cast(BIG)
                     .alias("vowels"))
            .orderBy("p_partkey").limit(200))
