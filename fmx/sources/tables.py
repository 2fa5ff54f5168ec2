"""Table sources over the driver-generated parquet test data (TESTDATA.md).

The reference's only sources are CSV + in-memory fixtures
(FactorizationMachinesSample.scala:98-102, Suite:34-53); the engine reads
parquet natively (`spark.read.parquet` — vectorized scan, predicate
pushdown, column pruning) plus CSV/JSON/libsvm helpers for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Schema cache: metastore-style catalog of parquet schemas keyed on the
# resolved file path.  Without it every load_table call runs parquet
# schema inference — a driver-side footer-read JOB that costs one
# scheduling floor (~30-80 ms) per table per query, the single largest
# fixed overhead on sub-second headliners (guide §6: production tables
# carry catalog schemas; re-inferring per query is pure waste).  Only
# SCHEMAS are cached (StructType metadata, a few hundred bytes) — never
# data, plans, or results; every query still scans the parquet fresh.
_SCHEMA_CACHE: dict[str, "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver test table (parquet) from ``sf_dir``, with
    ns-timestamp columns normalized to Spark-friendly microseconds."""
    # defensive: the caller's session may not carry fmx defaults (the
    # driver harness builds its own SparkSession); timestamp formatting
    # in the oracle-checked queries assumes UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # tz-naive parquet timestamps (isAdjustedToUTC=false, the current
    # testdata format) would otherwise infer as TIMESTAMP_NTZ, on which
    # CAST(ts AS DOUBLE) and watermarks are illegal; read as session-tz
    # TIMESTAMP (UTC session zone ⇒ same wall times as the DuckDB oracle)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # older generator runs stored events.ts as parquet
        # TIMESTAMP(NANOS), which Spark 4 rejects unless read as long;
        # normalize to a microsecond timestamp (lossless: the generator
        # emits us-resolution). Set defensively — the driver's session
        # may lack the conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division: `/` would promote to double, and ns values
            # ~1.7e18 exceed 2^53, shaving 1us off ~1.6% of timestamps
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _tz_normalize(df)
    return _tz_normalize(_read_parquet(spark, path))


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """parquet scan with the inferred schema cached per resolved path
    (first read infers and remembers; later reads skip the footer job).
    The cache key includes the conf that changes inference output
    (nanosAsLong) so the same file read under a different session conf
    can never see a stale schema."""
    import os as _os

    key = (_os.path.realpath(path)
           + "|" + str(spark.conf.get(
               "spark.sql.legacy.parquet.nanosAsLong", "false")))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _tz_normalize(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TIMESTAMP.

    Backstop for sessions where the ``inferTimestampNTZ`` conf could not
    take effect (e.g. the file's footer was already cached with an NTZ
    schema): downstream operators cast event times to DOUBLE and declare
    watermarks, both of which reject NTZ."""
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """All test tables as a name -> DataFrame dict."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for spark.sql queries."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(spark: SparkSession, path: str, header: bool = True,
             infer_schema: bool = True, schema=None,
             mode: str = "PERMISSIVE",
             corrupt_col: str | None = None,
             options: dict[str, str] | None = None) -> DataFrame:
    """CSV scan with header + schema inference (reference S1,
    FactorizationMachinesSample.scala:98-102).

    Dirty-data controls for real ingestion: pass an explicit ``schema``
    plus ``corrupt_col`` to capture unparseable lines in a side column
    (PERMISSIVE quarantine — route them to a dead-letter sink instead
    of failing a 100 TB load), ``mode='DROPMALFORMED'`` to drop them,
    or ``mode='FAILFAST'`` to abort on the first bad record.
    ``options`` passes any further CSV reader options through verbatim
    (timestampFormat, delimiter, nullValue, ...)."""
    reader = (spark.read
              .option("header", str(header).lower())
              .option("mode", mode))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        if corrupt_col is not None:
            from pyspark.sql.types import StringType, StructField, StructType
            schema = StructType(list(schema.fields)
                                + [StructField(corrupt_col, StringType())])
            reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        reader = reader.schema(schema)
    else:
        if corrupt_col is not None:
            # silently skipping the quarantine would be worse than
            # failing: inference needs the real schema to know which
            # records are malformed
            raise ValueError(
                "corrupt_col requires an explicit schema — inferred "
                "schemas cannot quarantine malformed records")
        reader = reader.option("inferSchema", str(infer_schema).lower())
    return reader.csv(path)


def read_libsvm_text(spark: SparkSession, path: str) -> DataFrame:
    """Parse the reference's 1-indexed ``label idx:val ...`` fixture format
    (reference data/sample.txt:1-6, S3) into
    ``(label double, featureId int, featureValue double)`` long format —
    natively (split + explode), no Python UDF."""
    raw = spark.read.text(path)
    toks = raw.select(F.split(F.trim(F.col("value")), r"\s+").alias("t"))
    # blank/whitespace-only lines split to [''] — drop them BEFORE the
    # explode, or they'd surface as phantom all-null samples
    toks = toks.filter(F.col("t")[0] != "")
    # explode_outer: a label-only line (zero active features) is a
    # valid sample and must keep its label row (null feature columns)
    # — plain explode would silently drop it from class priors
    return (
        toks.select(
            F.col("t")[0].cast("double").alias("label"),
            F.explode_outer(F.slice("t", 2, 1_000_000)).alias("pair"))
        .select(
            "label",
            (F.split("pair", ":")[0].cast("int") - 1).alias("featureId"),
            F.split("pair", ":")[1].cast("double").alias("featureValue"))
    )
