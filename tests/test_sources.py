"""Source-layer regressions."""

from pyspark.sql import functions as F


def test_nanos_to_micros_is_exact_beyond_double_precision(spark):
    """ns→us conversion must use integer division: `(ts/1000).cast(long)`
    promotes to double, and ns values ~1.7e18 exceed 2^53, so ~1.6% of
    us-aligned timestamps came out 1us low (ADVICE r01).  This value is
    us-aligned but not representable in double."""
    # 2025-08-01-ish; float(ns)/1000 truncates to ...015 instead of ...016
    ns = 1_754_000_000_000_016_000
    assert float(ns) != ns  # precondition: not double-representable
    df = spark.createDataFrame([(ns,)], "ts bigint")
    # the exact expression load_table uses for bigint ts columns
    got = df.select(
        F.unix_micros(F.timestamp_micros(F.expr("ts div 1000"))).alias("us")
    ).first()
    assert got.us == ns // 1000
    # the old double path really is lossy on this input (guards against
    # the fixture accidentally being double-representable)
    bad = df.select(
        F.unix_micros(
            F.timestamp_micros((F.col("ts") / 1000).cast("long"))).alias("us")
    ).first()
    assert bad.us != ns // 1000


def test_events_ts_microsecond_exactness(spark, sf_dir):
    """The loaded events.ts must match the raw bigint ns column exactly
    (integer us) for every row."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") != "bigint":
        return  # generator emitted real timestamps; nothing to convert
    from fmx.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    got = sorted(r.us for r in
                 ev.select(F.unix_micros("ts").alias("us")).collect())
    want = sorted(r.w for r in
                  raw.select(F.expr("ts div 1000").alias("w")).collect())
    assert got == want


def test_events_ts_reads_as_session_tz_timestamp(spark, sf_dir):
    """The events.ts column must surface as TIMESTAMP (session-tz), not
    TIMESTAMP_NTZ: watermarked streaming rejects NTZ event time, and the
    driver-regenerated parquet stores isAdjustedToUTC=false timestamps
    that Spark 3.4+ would otherwise infer as NTZ
    (spark.sql.parquet.inferTimestampNTZ.enabled=false in fmx.session)."""
    from pyspark.sql.types import TimestampType

    from fmx.sources import load_table

    ts_type = dict(load_table(spark, sf_dir, "events").dtypes)["ts"]
    assert ts_type == "timestamp", ts_type
    f = [f for f in load_table(spark, sf_dir, "events").schema.fields
         if f.name == "ts"][0]
    assert isinstance(f.dataType, TimestampType)


def test_read_csv_malformed_record_handling(spark, tmp_path):
    """Dirty-CSV ingestion: PERMISSIVE+corrupt_col quarantines bad lines
    in a side column (dead-letter routing), DROPMALFORMED drops them —
    a 100 TB load never dies on one bad row unless FAILFAST is asked
    for."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from fmx.sources import read_csv

    p = tmp_path / "dirty.csv"
    p.write_text("id,name,score\n1,alpha,0.5\nnot_a_number,beta\n"
                 "3,gamma,2.5\n")
    schema = StructType([StructField("id", LongType()),
                         StructField("name", StringType()),
                         StructField("score", DoubleType())])

    perm = read_csv(spark, str(p), schema=schema,
                    corrupt_col="_bad").cache()
    good = perm.filter("_bad IS NULL")
    bad = perm.filter("_bad IS NOT NULL")
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]["_bad"]

    dropped = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED")
    # count() would prune every column, parse nothing, and report 3 —
    # malformed rows only drop when some column is actually materialized
    assert len(dropped.collect()) == 2
    perm.unpersist()
