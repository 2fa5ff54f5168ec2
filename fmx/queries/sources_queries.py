"""Source-operator queries (SURVEY §2.1): in-memory literal relations
(S2), libsvm-style text parsing (S3), and approximate aggregates
(engine capabilities, rows-only checks — HLL/quantile sketches are
engine-specific by design).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fmx.queries import query
from fmx.sources import load_table as T
from fmx.sources import read_libsvm_text

_LIBSVM_FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "data", "sample_libsvm.txt")


@query(
    "s2_inline_relation",
    oracle="""
    SELECT * FROM (VALUES (1, 'a', 1.5), (2, 'b', -0.5), (3, 'c', 0.0))
        AS t(id, tag, x)
    """)
def s2_inline_relation(spark, sf):
    """In-memory literal relation (ref S2, Suite:34-53 toDF fixtures)."""
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -0.5), (3, "c", 0.0)],
        "id bigint, tag string, x double")


@query(
    "s3_libsvm_parse",
    oracle=f"""
    WITH raw AS (SELECT column0 AS line FROM
                 read_csv('{_LIBSVM_FIXTURE}', delim=NULL, header=false)),
    toks AS (SELECT string_split(trim(line), ' ') AS t FROM raw),
    pairs AS (SELECT CAST(t[1] AS DOUBLE) AS label, unnest(t[2:]) AS pair
              FROM toks)
    SELECT label,
           CAST(CAST(string_split(pair, ':')[1] AS INTEGER) - 1 AS BIGINT)
               AS featureId,
           CAST(string_split(pair, ':')[2] AS DOUBLE) AS featureValue
    FROM pairs
    """)
def s3_libsvm_parse(spark, sf):
    """1-indexed ``label idx:val`` text parsing to 0-indexed long format
    (ref S3, data/sample.txt:1-6) — native split/explode, no UDF."""
    out = read_libsvm_text(spark, _LIBSVM_FIXTURE)
    return out.select("label", F.col("featureId").cast("bigint")
                      .alias("featureId"), "featureValue")


def _memoized_export(src: str, path: str, write) -> None:
    """Run the ``write`` export once per source-content fingerprint:
    size + mtime + md5 of head/tail 4 KiB (the parquet footer lives in
    the tail, so an mtime-preserving regeneration still changes the
    stamp); unreadable source (e.g. a remote URI) -> never memoize,
    always re-export.  The marker file is underscore-prefixed so
    Spark's file discovery skips it and it never enters the scan.
    Shared by every roundtrip query whose export is a declared,
    memoized side effect (s1 CSV, s5 JSONL)."""
    stamp = None
    try:
        import hashlib

        st = os.stat(src)
        with open(src, "rb") as fh:
            head = fh.read(4096)
            fh.seek(max(0, st.st_size - 4096))
            tail = fh.read(4096)
        stamp = (f"{st.st_size}:{st.st_mtime_ns}:"
                 f"{hashlib.md5(head + tail).hexdigest()}")
    except OSError:
        pass
    marker = os.path.join(path, "_fmx_src_stamp")
    if stamp is not None:
        try:
            with open(marker) as fh:
                if fh.read() == stamp:
                    return
        except OSError:
            pass
    write()
    if stamp is not None:
        with open(marker, "w") as fh:
            fh.write(stamp)


_CSV_ROUNDTRIP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "spark-warehouse",
    "_s1_csv_roundtrip")


@query(
    "s1_csv_roundtrip",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey,
           CAST(sum(l_partkey + l_suppkey) AS BIGINT) AS sum_keys,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_price_cents,
           CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_qty_cents,
           CAST(count(DISTINCT l_returnflag) AS BIGINT) AS n_flags,
           strftime(min(l_shipdate), '%Y-%m-%d') AS min_shipdate,
           strftime(max(l_shipdate), '%Y-%m-%d') AS max_shipdate
    FROM lineitem
    """)
def s1_csv_roundtrip(spark, sf):
    """CSV scan with explicit schema (ref S1,
    FactorizationMachinesSample.scala:98-102 spark.read.csv): write
    lineitem out as CSV, read it back through fmx.sources.read_csv,
    and fold to count + integer checksums + date bounds that the
    DuckDB oracle computes from the PARQUET originals — value equality
    proves the CSV writer/parser round-trips every column type (ints,
    doubles via shortest-round-trip rendering, strings, timestamps).

    Checksums are integer sums (order-independent, no float-sum drift);
    money/quantity fold through floor(x*100+0.5) — pure IEEE ops both
    engines, no decimal re-rendering (see the registry docstring on
    rounding).  The roundtrip directory is per-SF so harness SFs don't
    clash.  At scale this is the ingest-validation pattern: land CSV,
    re-aggregate, compare registers against the upstream's manifest.

    The CSV export is the query's DECLARED side effect (a write job at
    construction — the one registry query whose semantics are a
    write+read-back), but it is MEMOIZED on the source parquet's
    (size, mtime): plan-only passes over the registry (lint,
    invariance, driver-action audits) re-export nothing after the
    first materialization for a given source."""
    li = T(spark, sf, "lineitem")
    path = os.path.join(_CSV_ROUNDTRIP_DIR,
                        os.path.basename(os.path.normpath(sf)))
    _memoized_export(
        os.path.join(sf, "lineitem.parquet"), path,
        lambda: (li.write.mode("overwrite").option("header", "true")
                 .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
                 .csv(path)))
    from fmx.sources import read_csv
    back = read_csv(spark, path, header=True, schema=li.schema,
                    options={"timestampFormat": "yyyy-MM-dd HH:mm:ss"})
    cents = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("bigint")  # noqa: E731
    return back.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("l_orderkey").cast("bigint").alias("sum_orderkey"),
        F.sum(F.col("l_partkey") + F.col("l_suppkey")).cast("bigint")
        .alias("sum_keys"),
        F.sum(cents("l_extendedprice")).cast("bigint")
        .alias("sum_price_cents"),
        F.sum(cents("l_quantity")).cast("bigint").alias("sum_qty_cents"),
        F.count_distinct("l_returnflag").cast("bigint").alias("n_flags"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd")
        .alias("min_shipdate"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd")
        .alias("max_shipdate"))


@query("approx_distinct")  # sketch-based: engine-specific, rows-only
def approx_distinct(spark, sf):
    """HyperLogLog++ approximate distinct counts (engine capability;
    sketches are engine-specific so no cross-engine oracle)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey", rsd=0.02)
                 .alias("approx_parts")))


@query("approx_quantiles")  # sketch-based: engine-specific, rows-only
def approx_quantiles(spark, sf):
    """Greenwald-Khanna approximate percentiles (engine capability)."""
    return (T(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", F.lit(0.5), 1000)
                 .alias("approx_median")))


def _hll_oracle() -> str:
    from fmx.operators.sketches import hll_sql
    return ("WITH src AS (SELECT event_type, user_id FROM events),\n"
            + hll_sql("event_type", "user_id", "src", tag="hll"))


def _cms_oracle() -> str:
    from fmx.operators.sketches import cms_sql
    return ("WITH src AS (SELECT user_id FROM events),\n"
            "probes AS (SELECT DISTINCT user_id FROM events),\n"
            + cms_sql("user_id", "src", "probes") + """
    SELECT user_id, CAST(est_count AS BIGINT) AS est_count
    FROM cms_est ORDER BY est_count DESC, user_id LIMIT 15
    """)


@query("approx_topk_cms", oracle=_cms_oracle())
def approx_topk_cms(spark, sf):
    """Heavy hitters by count-min sketch: most-active users of the
    events stream, counted through a fixed d=4 x w=256 counter state
    instead of a per-key exact count.  Engine-portable (md5-salted row
    hashes, plain integer arithmetic) so the CM upper-bound estimates
    hash-verify cross-engine.  At 100 TB the state is the constant-
    memory path: one hash-agg whose map-side combine bounds every
    task's output at d*w cells, and estimates are a broadcast probe —
    the probe side never shuffles."""
    from fmx.operators.sketches import cms_estimate, cms_state

    ev = T(spark, sf, "events")
    state = cms_state(ev, "user_id")
    probes = ev.select("user_id").distinct()
    est = cms_estimate(state, probes, "user_id")
    return (est.select("user_id",
                       F.col("est_count").cast("bigint").alias("est_count"))
            .orderBy(F.desc("est_count"), "user_id").limit(15))


def _bloom_oracle() -> str:
    from fmx.operators.sketches import bloom_sql
    return ("WITH bench AS (SELECT text FROM documents "
            "WHERE doc_id % 7 = 0),\n"
            "docs AS (SELECT doc_id, source, text FROM documents),\n"
            + bloom_sql("text", "bench", "docs", "p.doc_id, p.source") + """
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN maybe_present THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
    FROM bloom_flags GROUP BY source ORDER BY source
    """)


@query("bloom_contamination", oracle=_bloom_oracle())
def bloom_contamination(spark, sf):
    """Benchmark-contamination screen via an engine-portable Bloom
    filter: the held-out set's texts (every 7th doc) set k=5 md5-salted
    bits of an m=8192 filter; every corpus doc probes all 5 positions
    (no false negatives).  The filter is a <= m-row relation that
    broadcasts, so screening a 100 TB corpus is map-side — contrast
    with `text_contamination`'s exact n-gram join, which shuffles the
    corpus.  Per-source flag counts are the pipeline's report shape."""
    from fmx.operators.sketches import bloom_bits, bloom_probe

    docs = T(spark, sf, "documents")
    bits = bloom_bits(docs.filter(F.col("doc_id") % 7 == 0), "text")
    flags = bloom_probe(docs.select("doc_id", "source", "text"),
                        bits, "text")
    return (flags.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum(F.col("maybe_present").cast("int")).cast("bigint")
                 .alias("n_flagged"))
            .orderBy("source"))


@query("approx_distinct_hll", oracle=_hll_oracle())
def approx_distinct_hll(spark, sf):
    """Engine-portable HyperLogLog distinct users per event type: the
    md5-derived register construction and textbook estimator run
    identically on any engine, so unlike approx_count_distinct's
    HLL++ this sketch IS hash-verified cross-engine.  One (group,
    register) hash-agg with map-side combine + a 64-row-per-group
    fold; register state merges by max across partitions/batches."""
    from fmx.operators.sketches import hll_distinct

    return hll_distinct(T(spark, sf, "events"), "event_type", "user_id")


def _kmv_oracle() -> str:
    from fmx.operators.sketches import KMV_K, KMV_M
    m = repr(KMV_M)
    h = ("CAST(concat('0x', substring(md5(concat('kmv:', "
         "CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT)")
    return f"""
    WITH ua AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'click'),
    ub AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase'),
    ha AS (SELECT {h} AS h FROM ua),
    hb AS (SELECT {h} AS h FROM ub),
    sa AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_K}),
    sb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_K}),
    tha AS (SELECT CASE WHEN count(*) >= {KMV_K}
                        THEN CAST(max(h) AS DOUBLE)
                        ELSE {m} END AS th FROM sa),
    thb AS (SELECT CASE WHEN count(*) >= {KMV_K}
                        THEN CAST(max(h) AS DOUBLE)
                        ELSE {m} END AS th FROM sb),
    th AS (SELECT least(tha.th, thb.th) AS theta FROM tha, thb),
    c AS (SELECT CAST(count(*) AS BIGINT) AS c
          FROM sa JOIN sb USING (h), th WHERE h < th.theta),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ua),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM ub),
    ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_common
           FROM ua JOIN ub USING (user_id))
    SELECT n_a, n_b, exact_common,
           CAST(round(c * {m} / theta) AS BIGINT) AS kmv_estimate,
           CAST(CASE WHEN theta < {m} THEN 1 ELSE 0 END AS INT)
             AS theta_saturated
    FROM na, nb, ex, c, th
    """


@query("sketch_kmv_intersection", oracle=_kmv_oracle())
def sketch_kmv_intersection(spark, sf):
    """Theta-sketch-style intersection cardinality of click-users x
    purchase-users from two k=32 KMV sketches
    (fmx.operators.sketches.kmv_intersection): each side keeps its k
    smallest md5 hashes (per-partition heaps — TakeOrderedAndProject,
    never a global sort), theta = min of the per-side thresholds, and
    the estimate counts COMMON hashes below theta scaled by M/theta —
    the direct shared-evidence count that HLL inclusion-exclusion
    (`stickiness_from_hll_registers`'s trick) cannot match for small
    intersections of large sets.  Unsaturated sides degrade to exact
    sets (theta = M), which the sf0.001 run exercises; exact_common is
    the eval readout, dropped at 100 TB where only the k-number-per-
    side state ships and merges."""
    from fmx.operators.sketches import kmv_intersection

    ev = T(spark, sf, "events")
    return kmv_intersection(
        ev.filter(F.col("event_type") == "click").select("user_id"),
        ev.filter(F.col("event_type") == "purchase").select("user_id"),
        "user_id")


def _hist_quantile_oracle() -> str:
    from fmx.operators.sketches import hist_quantiles_sql
    return ("WITH src AS (SELECT l_returnflag, l_extendedprice "
            "FROM lineitem),\n"
            + hist_quantiles_sql("l_returnflag", "l_extendedprice", "src"))


@query("approx_quantiles_hist", oracle=_hist_quantile_oracle())
def approx_quantiles_hist(spark, sf):
    """Engine-portable approximate quantiles (p25/p50/p75 of
    l_extendedprice per return flag) from a 100-bucket equal-width
    histogram sketch — mergeable (per-partition histograms sum) and
    deterministic, so unlike percentile_approx's GK sketch the estimate
    hash-verifies cross-engine (`fmx.operators.sketches.
    hist_quantiles`).  The exact twin is the `percentiles` query."""
    from fmx.operators.sketches import hist_quantiles

    li = T(spark, sf, "lineitem").select("l_returnflag", "l_extendedprice")
    return hist_quantiles(li, "l_returnflag", "l_extendedprice")


@query(
    "bloom_prefilter_join",
    # the oracle is the PLAIN join: bloom pre-filtering must be
    # invisible in the result (no false negatives; false positives die
    # in the exact join) — result equality is the correctness proof
    oracle="""
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = 3
    GROUP BY c.c_custkey
    """)
def bloom_prefilter_join(spark, sf):
    """Runtime-filter join: a bloom filter built from the filtered dim
    keys (<= m rows, broadcast) pre-filters the fact scan BEFORE the
    exact join — the hand-rolled form of Spark's runtime row-group
    pruning, worth ~a full fact shuffle when the dim filter is
    selective.  Bloom semantics guarantee the result equals the plain
    join: no false negatives, and false positives are eliminated by
    the exact join that follows."""
    from pyspark.sql import functions as F

    from fmx.operators.sketches import bloom_bits, bloom_probe

    dim = (T(spark, sf, "customer")
           .filter(F.col("c_nationkey") == 3)
           .select("c_custkey"))
    bits = bloom_bits(dim, "c_custkey", tag="pfj")
    fact = T(spark, sf, "orders").select("o_orderkey", "o_custkey",
                                         "o_totalprice")
    probed = bloom_probe(fact, bits, "o_custkey", tag="pfj")
    pre = probed.filter(F.col("maybe_present")).drop("maybe_present")
    return (pre.join(dim.withColumnRenamed("c_custkey", "o_custkey"),
                     "o_custkey")
            .groupBy("o_custkey")
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue"))
            .select(F.col("o_custkey").cast("bigint").alias("c_custkey"),
                    "n_orders", "revenue"))


def _hll_overlap_oracle() -> str:
    from fmx.operators.sketches import HLL_ALPHA, HLL_B, HLL_M
    wb = 60 - HLL_B + 1
    def est(s, n):
        return (f"CASE WHEN {HLL_ALPHA * HLL_M * HLL_M} / ({s} + ({HLL_M} - {n}))"
                f" <= {2.5 * HLL_M} AND {HLL_M} - {n} > 0"
                f" THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - {n}))"
                f" ELSE {HLL_ALPHA * HLL_M * HLL_M} / ({s} + ({HLL_M} - {n})) END")
    def regs(name, etype):
        return (f"{name} AS (SELECT h % {HLL_M} AS j, "
                f"max({wb} - length(bin(h >> {HLL_B}))) AS m "
                f"FROM (SELECT CAST(concat('0x', substring(md5(concat('hll:', "
                f"CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h "
                f"FROM events WHERE event_type = '{etype}') GROUP BY j)")
    ea, eb, eu = est("sa", "na"), est("sb", "nb"), est("su", "nu")
    return f"""
    WITH {regs('ra', 'view')}, {regs('rb', 'purchase')},
    u AS (SELECT ra.m AS ma, rb.m AS mb,
                 greatest(coalesce(ra.m, 0), coalesce(rb.m, 0)) AS mu
          FROM ra FULL OUTER JOIN rb ON ra.j = rb.j),
    agg AS (SELECT coalesce(sum(power(2.0, -ma)), 0.0) AS sa, count(ma) AS na,
                   coalesce(sum(power(2.0, -mb)), 0.0) AS sb, count(mb) AS nb,
                   coalesce(sum(power(2.0, -mu)), 0.0) AS su, count(*) AS nu
            FROM u)
    SELECT CAST(round({ea}) AS BIGINT) AS n_a,
           CAST(round({eb}) AS BIGINT) AS n_b,
           CAST(round({eu}) AS BIGINT) AS n_union,
           CAST(round(greatest(0.0, {ea} + {eb} - {eu})) AS BIGINT)
               AS n_intersect,
           round(round(greatest(0.0, {ea} + {eb} - {eu}))
                 / round({eu}), 6) AS jaccard
    FROM agg
    """


@query("approx_user_overlap", oracle=_hll_overlap_oracle())
def approx_user_overlap(spark, sf):
    """Audience overlap (view-users vs purchase-users) from HLL
    registers: union = register-wise max, intersection =
    inclusion-exclusion over three deterministic md5 estimates — the
    raw user sets never co-shuffle, and the register tables are the
    persistable artifact a cross-day retention pipeline merges."""
    from fmx.operators.sketches import hll_overlap, hll_registers

    ev = T(spark, sf, "events").withColumn("_g", F.lit(0))
    ra = hll_registers(ev.filter(F.col("event_type") == "view"),
                       "_g", "user_id").drop("_g")
    rb = hll_registers(ev.filter(F.col("event_type") == "purchase"),
                       "_g", "user_id").drop("_g")
    return hll_overlap(ra, rb)


_JSONL_ROUNDTRIP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "spark-warehouse",
    "_s5_jsonl_roundtrip")

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


# shared roundtrip checksum contract: the oracle folds the parquet
# ORIGINALS, the Spark side folds the re-read export — value equality
# proves the format round-trips every column type (s5 JSONL, s6 ORC)
_EVENTS_CHECKSUM_ORACLE = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(user_id) AS BIGINT) AS sum_user_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_cents,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(sum(epoch_us(ts) % 86400000000) AS BIGINT)
               AS sum_day_micros,
           CAST(sum(length(props)) AS BIGINT) AS sum_props_len,
           CAST(count(DISTINCT props) AS BIGINT) AS n_props,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS min_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
    FROM events
    """


def _events_checksum_agg(back):
    """Spark twin of _EVENTS_CHECKSUM_ORACLE over a re-read export."""
    return back.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.sum("user_id").cast("bigint").alias("sum_user_id"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint").alias("sum_value_cents"),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
        F.sum(F.unix_micros("ts") % 86400000000).cast("bigint")
        .alias("sum_day_micros"),
        F.sum(F.length("props")).cast("bigint").alias("sum_props_len"),
        F.count_distinct("props").cast("bigint").alias("n_props"),
        F.date_format(F.min("ts"), _TS_FMT).alias("min_ts"),
        F.date_format(F.max("ts"), _TS_FMT).alias("max_ts"))


@query(
    "s5_jsonl_roundtrip",
    oracle=_EVENTS_CHECKSUM_ORACLE)
def s5_jsonl_roundtrip(spark, sf):
    """JSONL round-trip (fmx.sources.sinks write_jsonl/read_jsonl — the
    interchange format LLM-data tooling speaks): export events as
    gzipped JSON lines, read them back under an EXPLICIT schema
    (inference reads twice and is sample-dependent at scale), and fold
    to integer checksums + microsecond-exact timestamp bounds the
    oracle computes from the parquet originals — value equality proves
    the JSON writer/parser round-trips ints, doubles, strings,
    JSON-in-string props (escaping!), and microsecond timestamps
    (serialized explicitly at micros precision; Spark's default JSON
    timestampFormat keeps millis only, a silent-loss trap this query
    exists to pin down).  The export is the declared, memoized side
    effect (the s1 CSV contract, shared _memoized_export)."""
    from pyspark.sql import types as SQLT

    from fmx.sources.sinks import read_jsonl, write_jsonl

    ev = T(spark, sf, "events")
    out = ev.withColumn("ts", F.date_format("ts", _TS_FMT))
    path = os.path.join(_JSONL_ROUNDTRIP_DIR,
                        os.path.basename(os.path.normpath(sf)))
    _memoized_export(os.path.join(sf, "events.parquet"), path,
                     lambda: write_jsonl(out, path))
    schema = SQLT.StructType([
        SQLT.StructField("event_id", SQLT.LongType()),
        SQLT.StructField("ts", SQLT.StringType()),
        SQLT.StructField("user_id", SQLT.LongType()),
        SQLT.StructField("event_type", SQLT.StringType()),
        SQLT.StructField("value", SQLT.DoubleType()),
        SQLT.StructField("props", SQLT.StringType()),
    ])
    back = (read_jsonl(spark, path, schema=schema)
            .withColumn("ts", F.to_timestamp("ts", _TS_FMT)))
    return _events_checksum_agg(back)


_ORC_ROUNDTRIP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "spark-warehouse",
    "_s6_orc_roundtrip")


@query(
    "s6_orc_roundtrip",
    oracle=_EVENTS_CHECKSUM_ORACLE)
def s6_orc_roundtrip(spark, sf):
    """ORC round-trip: export events to ORC (the columnar format the
    Hive/Trino side of a lakehouse still speaks), read it back, and
    fold to the same integer checksums + microsecond timestamp bounds
    the oracle computes from the parquet originals — value equality
    proves ORC round-trips longs, doubles, strings, and
    MICROSECOND-precision timestamps natively (no string re-encoding
    needed, unlike s5's JSONL where the default format silently keeps
    millis).  The read needs no schema argument: ORC embeds its schema
    in the file footer, so there is no inference pass to go wrong.
    Same declared, memoized export side effect as s1/s5."""
    ev = T(spark, sf, "events")
    path = os.path.join(_ORC_ROUNDTRIP_DIR,
                        os.path.basename(os.path.normpath(sf)))
    _memoized_export(os.path.join(sf, "events.parquet"), path,
                     lambda: ev.write.mode("overwrite").orc(path))
    return _events_checksum_agg(spark.read.orc(path))
