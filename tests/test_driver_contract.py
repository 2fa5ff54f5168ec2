"""__spark_entry__ contract: entry smoke + registry alignment."""

import __spark_entry__ as entrymod


def test_entry_returns_rows_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema.simpleString() == "struct<vec_id:bigint,prediction:double>"


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    # tight lower bound: a module accidentally dropped from
    # fmx.queries._MODULES silently removes its whole query family —
    # the count floor catches that class of regression (210 at r5)
    assert len(qs) >= 220
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # the non-oracled set is exactly the declared non-SQL ops
    # (dedup_clusters gained a recursive-CTE oracle in round 2;
    # multimodal_features gained a byte-histogram oracle in round 3;
    # ann_pq_trained gained an invariant oracle in round 6;
    # ann_ivf_topk gained an invariant oracle in round 9)
    assert set(qs) - set(osql) == {"approx_distinct", "approx_quantiles"}
    # callables, not results
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in osql.values())


def test_vanilla_session_replay():
    """Replay the driver's environment: a SparkSession with NO fmx confs.

    Round 5 shipped 219/219 green locally while the driver window showed
    two red rows, because the local harness session pins
    ``spark.sql.parquet.inferTimestampNTZ.enabled=false``
    (fmx/session.py) and the driver's vanilla session does not — the
    regenerated tz-naive testdata then read as TIMESTAMP_NTZ and
    ``CAST(ts AS DOUBLE)`` failed at analysis time.  This test runs in a
    subprocess (the in-process pytest session already carries fmx confs,
    and ``getOrCreate`` would reuse it) and does two things:

    1. analyzes the registry selection (every query under
       FMX_FULL_SUITE=1; the headliner + sentinel + hash-sample
       selection plus the event-time family in the default tier —
       ``df.schema`` forces resolution; the r5 failure mode was an
       analysis-time DATATYPE_MISMATCH);
    2. value-compares the event-time queries against their DuckDB
       oracles at sf0.001 (the class of query the env drift broke).
    """
    import subprocess
    import sys

    script = r'''
import sys
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("vanilla-replay")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
# assert genuinely vanilla: no fmx conf leaked in
assert spark.conf.get(
    "spark.sql.parquet.inferTimestampNTZ.enabled", "true") == "true", \
    "session is not vanilla — replay is vacuous"

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"
qs, osql = e.queries(), e.oracle_sql()
import json, os
sel = set(json.loads(os.environ["FMX_REPLAY_SELECTION"]))
bad = []
for name, fn in qs.items():
    if name not in sel:
        continue
    try:
        fn(spark, SF).schema  # forces analysis
    except Exception as ex:
        bad.append(f"{name}: {type(ex).__name__}: {ex}")
if bad:
    print("ANALYSIS FAILURES:\n" + "\n".join(bad))
    sys.exit(1)

# value-compare the event-time family (what the r5 env drift broke)
import duckdb
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

EVENT_TIME = [
    "event_sessionization", "ts_interval_coverage", "abandoned_sessions",
    "funnel_within_session", "win_tumbling_hour", "win_session_30m",
    "asof_purchase_last_click", "ts_resample_ohlc", "cdc_apply_changes",
]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df.astype(str)

for name in EVENT_TIME:
    a = canon(qs[name](spark, SF).toPandas())
    b = canon(con.sql(osql[name]).df())
    if not a.equals(b):
        print(f"VALUE MISMATCH: {name}")
        sys.exit(1)
print("VANILLA REPLAY OK")
'''
    # default tier analyzes the registry selection (headliners +
    # sentinels + hash sample + the event-time family below);
    # FMX_FULL_SUITE=1 analyzes every registry query as before
    import json
    import os

    from tests.conftest import registry_selection

    sel = set(registry_selection()) | {
        "event_sessionization", "ts_interval_coverage",
        "abandoned_sessions", "funnel_within_session",
        "win_tumbling_hour", "win_session_30m",
        "asof_purchase_last_click", "ts_resample_ohlc",
        "cdc_apply_changes"}
    env = dict(os.environ, FMX_REPLAY_SELECTION=json.dumps(sorted(sel)))
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=1200, env=env)
    assert proc.returncode == 0 and "VANILLA REPLAY OK" in proc.stdout, (
        f"vanilla replay failed:\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")
