"""Structured Streaming operators (SURVEY §2.9: the reference has no
streaming surface; these are the engine-capability layer).

Each operator is the streaming twin of a batch query in
``fmx.queries.window_queries`` — same transformation applied to a
``readStream`` DataFrame, with watermarks bounding state.  Tests drive
them with ``trigger(availableNow=True)`` over the parquet test data and
assert equality with the batch twin.

Scale notes: watermark + windowed aggregation keeps state per (window,
key) only until the watermark passes; ``applyInPandasWithState`` holds
one state row per user — both bounded, both partitioned by key across
executors.

State-schema compatibility matrix (r12 verdict #8 — the single place
the per-operator checkpoint caveats point at).  State tuples
serialize POSITIONALLY at the state-store layer: any field add,
remove, reorder, or retype makes a checkpoint written by the old
build fail at unpack on resume.  The rules:

| operator | state schema (current) | since | checkpoint-compat rule |
|---|---|---|---|
| user_running_totals | (n long, total double) | r01, v1 | frozen; any change ⇒ discard+rebuild |
| stream_asof_enrich | (click_id long, click_us long) | r02, v1 | frozen |
| stream_cdc_latest | (ts_us long, event_id long, value double, is_del bool) | r04, v1 | frozen |
| stream_sessionize_ids | (last_us long, cur long) | r05, v1 | frozen |
| stream_inverted_postings | (df long, postings string) | r05, v1 | frozen |
| stream_kmv_state | (hs string, ver long) | r10 v1 → r11 v2 (+ver) | v1 checkpoints invalid — discard and restart; rebuilt state converges (k-min merge law) |
| stream_cusum_state | (c long, mx long, n long, ver long) | r12, v1 | pinned order; any change ⇒ discard+rebuild (fold replays) |

Migration convention for every operator above: state is always
REBUILDABLE from replayed source data (registers fold
associatively / snapshots carry ``ver``), so the supported migration
is discard-checkpoint-and-replay, never in-place state rewrite.
When a schema must grow, append fields only, bump the version in
this table, and note the invalidation in the operator docstring
(the stream_kmv_state r11 entry is the template).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                               StringType, StructField, StructType,
                               TimestampType)

def _file_stream(spark: SparkSession, sf_dir: str, file_name: str,
                 max_files: int) -> DataFrame:
    """Shared file-source stream mechanics: expose the single parquet
    file via a symlink directory (streaming sources need a directory),
    lock the schema from a batch peek, and pin the session timezone to
    UTC — the oracle-checked batch twins format timestamps assuming
    UTC (fmx.sources.tables.load_table sets the same conf), and a
    foreign caller session may not carry fmx defaults."""
    import os
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = os.path.abspath(f"{sf_dir}/{file_name}")
    stream_dir = os.path.join(tempfile.gettempdir(),
                              "fmx_stream_" + src.replace("/", "_"))
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, file_name)
    # lexists: a broken symlink still EXISTS for symlink() purposes;
    # the except guards the create race between concurrent sessions
    if not os.path.lexists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass
    schema = spark.read.parquet(src).schema
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(stream_dir))


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files: int = 1) -> DataFrame:
    """File-source stream over the events parquet (schema locked from a
    batch peek — streaming sources need explicit schemas, and a
    *directory* path, so the single file is exposed via a symlink dir).

    ts normalization mirrors fmx.sources.load_table (nanos -> micros).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = _file_stream(spark, sf_dir, "events.parquet", max_files)
    if dict(stream.dtypes).get("ts") == "bigint":
        # integer division (see fmx.sources.tables.load_table): double
        # division loses 1us on ns values above 2^53
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def stream_tumbling_agg(events: DataFrame,
                        watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour counts/sums per event_type with watermarked state
    (batch twin: queries.window_queries.win_tumbling_hour)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"),
                 F.round(F.sum("value"), 4).alias("total"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    "event_type", "cnt", "total"))


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Session windows per user with an inactivity gap (batch twin:
    win_session_30m).  State = one open session per user, closed by the
    watermark."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("total"))
            .select(F.col("user_id").cast("bigint").alias("user_id"),
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    "n_events", "total"))


def enrich_stream(events: DataFrame, dim: DataFrame,
                  on: str = "user_id") -> DataFrame:
    """Stream-static join: enrich a stream with a dimension table.
    The static side is broadcast per micro-batch — no stream state at
    all, the canonical dimension-enrichment shape."""
    return events.join(F.broadcast(dim), on, "left")


def write_foreach_batch_parquet(stream: DataFrame, path: str,
                                checkpoint: str) -> "object":
    """foreachBatch parquet sink: per-batch idempotent append keyed by
    batch_id (the checkpoint replays a failed batch with the same id, so
    the partition overwrite makes redelivery exactly-once)."""
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.withColumn("_batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id").parquet(path))

    return (stream.writeStream.foreachBatch(_write)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())


def stream_stream_attribution(events: DataFrame,
                              watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: purchases attributed to a same-user
    click within the preceding hour.  Both sides watermarked; the time
    bound lets Spark expire click state once no purchase can match —
    bounded state, the canonical stream-stream join shape.
    (Batch twin: fmx.queries.analytics.attribution_interval_join.)"""
    c = (events.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts"))
         .withWatermark("c_ts", watermark))
    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("purchase_id"),
                 F.col("user_id").alias("p_user"),
                 F.col("ts").alias("p_ts"))
         .withWatermark("p_ts", watermark))
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner")
    return joined.select(
        F.col("click_id").cast("bigint").alias("click_id"),
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        F.col("c_user").cast("bigint").alias("user_id"),
        F.floor(F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("bigint").alias("lag_sec"))


def stream_dedup(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps state
    only inside the watermark horizon — the streaming twin of
    fmx.operators.dedup.exact_dedup, with bounded state."""
    keys = keys or ["event_id"]
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _update_user_totals(key: tuple[Any, ...],
                        pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
    # custom stateful operator: running (count, sum) per user —
    # the applyInPandasWithState template for arbitrary per-key state
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "total_value": [total]})


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running event count and value sum, emitted on every
    micro-batch (Update mode)."""
    return (events
            .select("user_id", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_user_totals,
                outputStructType=RUNNING_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="Update",
                timeoutConf=GroupStateTimeout.NoTimeout))


ASOF_SCHEMA = StructType([
    StructField("purchase_id", LongType()),
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("click_id", LongType()),
    StructField("click_ts", TimestampType()),
])

# latest click per user carried across micro-batches (micros to keep the
# state schema primitive)
_ASOF_STATE = StructType([
    StructField("click_id", LongType()),
    StructField("click_us", LongType()),
])


def _enrich_purchases_with_click(key, pdfs, state):
    """Per-user state machine: replay the batch in event-time order,
    remembering the latest click (ties -> largest event_id, the batch
    asof_join rule) and emitting every purchase with it attached."""
    if state.exists:
        last_id, last_us = state.get
    else:
        last_id, last_us = -1, -1
    rows = pd.concat(list(pdfs))
    # clicks sort before purchases at equal ts so an equal-ts click is
    # visible to the purchase (right_ts <= left_ts semantics)
    rows = rows.sort_values(
        ["ts", "event_type", "event_id"],
        key=lambda s: s.map({"click": 0, "purchase": 1})
        if s.name == "event_type" else s)
    out = {"purchase_id": [], "user_id": [], "ts": [],
           "click_id": [], "click_ts": []}
    for r in rows.itertuples():
        if r.event_type == "click":
            last_id, last_us = int(r.event_id), int(r.ts.value // 1000)
        elif r.event_type == "purchase":
            out["purchase_id"].append(int(r.event_id))
            out["user_id"].append(int(key[0]))
            out["ts"].append(r.ts)
            out["click_id"].append(None if last_id < 0 else last_id)
            out["click_ts"].append(
                None if last_us < 0
                else pd.Timestamp(last_us * 1000))
    state.update((last_id, last_us))
    yield pd.DataFrame(out)


def stream_asof_enrich(events: DataFrame) -> DataFrame:
    """Streaming as-of enrichment: attach the user's most recent click
    to every purchase as it streams through — the stateful twin of
    fmx.operators.temporal.asof_join (which proves the same semantics
    in one batch plan).  State is O(1) per user (one click id +
    timestamp); correctness across micro-batches relies on per-user
    event-time ordering of arrivals, the availableNow/replay case —
    for out-of-order production streams, front it with a watermarked
    sort buffer or fall back to the batch operator."""
    return (events
            .filter(F.col("event_type").isin("click", "purchase"))
            # narrow BEFORE the stateful shuffle: props and the unused
            # metrics would otherwise ride Arrow into the state worker
            .select("user_id", "event_id", "ts", "event_type")
            .groupBy("user_id")
            .applyInPandasWithState(
                _enrich_purchases_with_click,
                outputStructType=ASOF_SCHEMA,
                stateStructType=_ASOF_STATE,
                outputMode="Append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_hll_registers(events: DataFrame, group_col: str,
                         value_col: str) -> DataFrame:
    """Streaming cardinality state: the HLL register table maintained
    incrementally — state is EXACTLY groups x 64 max-rank registers
    (bounded forever, no watermark needed), because HLL registers merge
    by max.  Emit in update/complete mode and fold with
    ``fmx.operators.sketches.hll_fold`` wherever the estimate is
    consumed (the fold is 64 rows/group, stateless).  This is the
    mergeable-sketch pattern: the same register state unions across
    batches, streams, and days."""
    from fmx.operators.sketches import hll_registers

    # hll_registers is one groupBy-max — directly streamable
    return hll_registers(events, group_col, value_col)


CDC_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("op", StringType()),
])

# latest applied change per key (micros for a primitive state schema)
_CDC_STATE = StructType([
    StructField("ts_us", LongType()),
    StructField("event_id", LongType()),
    StructField("value", DoubleType()),
    StructField("is_del", BooleanType()),
])


def _cdc_apply(key, pdfs, state):
    # latest-wins CDC apply: order by (ts, event_id); the delete
    # indicator comes from the input 'op' column (CDC_SCHEMA declares
    # it) — never derived inside the operator, so arbitrary change
    # streams are applied as the producer tagged them.  The winner per
    # chunk is a vectorized sort/tail (max over chunk maxes == max
    # over the union), not a per-row Python loop; a NULL change value
    # stays NULL (the batch compaction carries it through — coercing
    # to NaN would dodge `value IS NULL` predicates downstream).
    if state.exists:
        ts_us, eid, val, dele = state.get
    else:
        ts_us, eid, val, dele = -1, -1, None, False
    for pdf in pdfs:
        if not len(pdf):
            continue
        best = pdf.sort_values(["ts", "event_id"]).iloc[-1]
        b_us = int(best.ts.value // 1_000)
        if (b_us, int(best.event_id)) > (ts_us, eid):
            ts_us, eid = b_us, int(best.event_id)
            val = None if pd.isna(best.value) else float(best.value)
            dele = (best.op == "D")
    state.update((ts_us, eid, val, dele))
    yield pd.DataFrame({
        "user_id": [key[0]], "event_id": [eid],
        "ts": [pd.Timestamp(ts_us, unit="us")],
        "value": pd.array([val], dtype="Float64"),
        "op": ["D" if dele else "U"]})


def stream_cdc_latest(events: DataFrame) -> DataFrame:
    """Streaming CDC compaction: per-key latest-wins state maintained
    across micro-batches via ``applyInPandasWithState`` — the streaming
    twin of the batch ``cdc_apply_changes`` merge (Update mode emits
    the current compacted row, tombstones flagged op='D').  State per
    key is one fixed-width tuple — bounded by key cardinality, not
    stream length.

    The input must carry an ``op`` column ('D' = delete, anything else
    = upsert) — the delete rule belongs to the PRODUCER of the change
    stream, not this operator (deriving it here would silently
    tombstone arbitrary keys on real streams)."""
    return (events
            .select("user_id", "event_id", "ts", "value", "op")
            .groupBy("user_id")
            .applyInPandasWithState(
                _cdc_apply,
                outputStructType=CDC_SCHEMA,
                stateStructType=_CDC_STATE,
                outputMode="Update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def stream_hist_registers(events: DataFrame, group_col: str,
                          value_col: str, lo: float, hi: float,
                          buckets: int = 100) -> DataFrame:
    """Streaming quantile state: a fixed-edge histogram register table
    maintained incrementally (state = groups x buckets counts, bounded
    forever — histogram registers merge by SUM, so one streaming
    groupBy-count is the whole operator).  Fold with
    ``fmx.operators.sketches.hist_fixed_fold`` wherever the quantile
    estimate is consumed — the same mergeable-sketch pattern as
    stream_hll_registers."""
    from fmx.operators.sketches import hist_fixed_registers

    return hist_fixed_registers(events, group_col, value_col, lo, hi,
                                buckets)


def stream_dq_counts(events: DataFrame, rules=None) -> DataFrame:
    """Streaming data-quality gate: the same one-pass conditional-count
    expectation aggregation as fmx.operators.dq.check_expectations,
    running as a streaming global agg (complete mode) — violation
    counts are sums, hence mergeable across micro-batches with state =
    one row per rule.  Alert when a pass_rate dips; no second stream
    pass, no per-rule jobs."""
    from fmx.operators.dq import check_expectations

    if rules is None:
        rules = {
            "value_not_null": F.col("value").isNotNull(),
            "value_in_range": F.col("value").between(-1e6, 1e6),
            "known_event_type": F.col("event_type").isin(
                "view", "click", "purchase", "error", "signup"),
            "no_error_events": F.col("event_type") != "error",
            "user_id_nonneg": F.col("user_id") >= 0,
        }
    return check_expectations(events, rules)


SESSION_ID_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("session_n", LongType()),
])

_SESSION_ID_STATE = StructType([
    StructField("last_us", LongType()),   # last event time seen (µs)
    StructField("cur", LongType()),       # current 0-based session index
])

_SESSION_GAP_US = 1800 * 1_000_000       # 30-minute gap, matching the
                                         # batch twin's default


def _assign_session_ids(key, pdfs, state):
    # per-event session-id assignment (the streaming twin of
    # fmx.operators.temporal.sessionize): state = (last event time,
    # current session index).  Events are sorted within the micro-batch
    # by (ts, event_id); ACROSS batches the operator assumes
    # time-ordered arrival (the at-ingest-order contract every
    # per-event sessionizer has — a late event would need the session
    #-window aggregate form instead).
    if state.exists:
        last_us, cur = state.get
    else:
        last_us, cur = -1, -1
    batch = pd.concat(list(pdfs))
    batch = batch.sort_values(["ts", "event_id"])
    out_n = []
    for r in batch.itertuples(index=False):
        r_us = int(r.ts.value // 1_000)
        if last_us < 0 or (r_us - last_us) > _SESSION_GAP_US:
            cur += 1
        out_n.append(cur)
        last_us = r_us
    state.update((last_us, cur))
    yield pd.DataFrame({
        "user_id": [key[0]] * len(batch),
        "event_id": batch["event_id"].astype("int64"),
        "ts": batch["ts"],
        "session_n": pd.Series(out_n, dtype="int64", index=batch.index),
    })


def stream_sessionize_ids(events: DataFrame) -> DataFrame:
    """Per-EVENT session-id assignment on a stream (30-minute gap):
    unlike ``sessionize_stream`` (which emits session AGGREGATES via
    the native session window), this tags every event with its 0-based
    per-user ``session_n`` as it flows — the online-feature form
    (current-session counters, in-session personalization).

    State per user = 16 bytes (last event time + session index),
    carried across micro-batches by ``applyInPandasWithState``; output
    equals the batch twin ``fmx.operators.temporal.sessionize`` under
    in-order arrival (asserted in tests, including cross-batch)."""
    return (events
            .select("user_id", "event_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _assign_session_ids,
                outputStructType=SESSION_ID_SCHEMA,
                stateStructType=_SESSION_ID_STATE,
                outputMode="Update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def read_documents_stream(spark: SparkSession, sf_dir: str,
                          max_files: int = 1) -> DataFrame:
    """File-source stream over the documents parquet (same symlink-dir
    + locked-schema mechanics as ``read_events_stream``)."""
    return _file_stream(spark, sf_dir, "documents.parquet", max_files)


POSTINGS_SCHEMA = StructType([
    StructField("token", StringType()),
    StructField("df", LongType()),
    StructField("postings", StringType()),
])

# per-token register: running distinct-doc count + the lowest
# max_postings doc ids as a csv (bounded state per token, forever)
_POSTINGS_STATE = StructType([
    StructField("df", LongType()),
    StructField("postings", StringType()),
])


def stream_inverted_postings(docs: DataFrame, min_df: int = 2,
                             max_postings: int = 20) -> DataFrame:
    """Streaming incremental inverted index: per-token document
    frequency + capped posting list maintained across micro-batches —
    the indexing side of ingest-time search, as the same mergeable-
    register pattern as the HLL/histogram state (state per token is
    ONE count + <= ``max_postings`` ids, bounded forever; a min-k set
    merges associatively, so batch boundaries can't change the
    result).

    Assumes each document arrives exactly ONCE on the stream (true for
    file/log sources; a redelivering source needs an upstream
    ``stream_dedup``) — df increments rely on it.  Equality with the
    batch twin (``fmx.operators.text.inverted_index``) is pinned by
    test; the ``df >= min_df`` noise filter applies to the EMITTED
    relation, while state keeps singletons so late mates can still
    promote them."""
    # same tokenization as the batch twin (no empty-token filter: the
    # twins must agree token-for-token)
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.col("text"), " ")).alias("token"))

    def _apply(key, pdfs, state: GroupState):
        seen = set()
        for pdf in pdfs:
            seen.update(int(d) for d in pdf["doc_id"])
        if state.exists:
            df0, csv = state.get
            posts = [int(x) for x in csv.split(",") if x != ""]
        else:
            df0, posts = 0, []
        df0 += len(seen)
        posts = sorted(set(posts) | seen)[:max_postings]
        state.update((df0, ",".join(str(p) for p in posts)))
        yield pd.DataFrame({"token": [key[0]], "df": [df0],
                            "postings": [",".join(str(p) for p in posts)]})

    out = (toks.groupBy("token")
           .applyInPandasWithState(
               _apply,
               outputStructType=POSTINGS_SCHEMA,
               stateStructType=_POSTINGS_STATE,
               outputMode="Update",
               timeoutConf=GroupStateTimeout.NoTimeout))
    return out.filter(F.col("df") >= min_df)


def stream_ab_registers(events: DataFrame) -> DataFrame:
    """Streaming A/B experiment state: per-arm (n, sum, sumsq) moment
    registers over purchase values — count/sum/sum-of-squares merge
    associatively, so the state is 2 rows x 3 numbers forever and the
    mean/SE readout folds from the registers wherever it's consumed
    (the same mergeable-register pattern as the HLL/histogram state).
    Arm assignment is the identical md5 coin as the batch
    ``eval_ab_experiment`` — a user's arm never changes mid-stream."""
    from fmx.operators.sampling import hash_uniform01

    u = hash_uniform01("user_id", "exp1", 42)
    # non-null user_id only, matching the batch readout: the md5 coin is
    # undefined for anonymous events (concat-of-NULL differs per engine)
    assigned = (events.filter((F.col("event_type") == "purchase")
                              & F.col("user_id").isNotNull())
                .withColumn("arm", F.when(u < 0.5, F.lit("control"))
                            .otherwise(F.lit("treatment"))))
    return (assigned.groupBy("arm")
            # count(value): the fold divides s/n for the mean, and the
            # batch readout's avg(value) skips NULLs — count(*) would
            # bias mean/SE low on null-bearing streams
            .agg(F.count("value").cast("long").alias("n"),
                 F.sum("value").alias("s"),
                 F.sum(F.col("value") * F.col("value")).alias("s2")))


def stream_checksum_registers(rows: DataFrame, key_col: str, sig,
                              num_buckets: int = 256) -> DataFrame:
    """Streaming table-reconciliation state: the ``checksum_registers``
    bucket table (count + signature-sum mod 2^40 per bucket) maintained
    incrementally over an append stream — state is EXACTLY
    ``num_buckets`` rows forever (both registers merge by addition, no
    watermark needed).  Emit in update/complete mode and compare
    against a reference side's registers with the same stateless join
    ``table_diff`` uses: continuous replication verification without
    ever re-scanning the source."""
    from fmx.operators.dq import checksum_registers

    # one groupBy with additive aggs — directly streamable
    return checksum_registers(rows, key_col, sig, num_buckets)


def stream_ks_registers(events: DataFrame, value_col: str = "value",
                        id_col: str = "user_id", lo: float = 0.0,
                        hi: float = 1000.0, num_bins: int = 64,
                        tag: str = "ksdrift", seed: int = 7) -> DataFrame:
    """Streaming two-sample drift state: per (arm, bin) count registers
    over FIXED bin edges — counts merge by addition, so the state is at
    most 2 * num_bins rows forever and the binned KS statistic (max
    cumulative-share gap, see the batch ``eval_ks_split_drift``) folds
    from the registers wherever it's consumed.  Fixed edges are the
    streaming concession: the batch query derives bins from the global
    min/max, which a stream cannot know up front — pin edges from
    historical data; the statistic is a valid binned KS for ANY fixed
    binning.  Arm assignment is the same md5 coin family as the batch
    split (non-null ids only — the coin is undefined on NULL)."""
    from fmx.operators.sampling import hash_uniform01
    from fmx.operators.sketches import hist_fixed_registers

    u = hash_uniform01(id_col, tag, seed)
    base = (events.filter(F.col(value_col).isNotNull()
                          & F.col(id_col).isNotNull())
            .withColumn("arm", F.when(u < 0.5, F.lit("a"))
                        .otherwise(F.lit("b"))))
    # the binning IS hist_fixed_registers (one definition of the edge
    # math for batch, streaming, and this drift state)
    return (hist_fixed_registers(base, "arm", value_col,
                                 float(lo), float(hi), int(num_bins))
            .select("arm", F.col("bucket").cast("long").alias("bin"),
                    F.col("c").cast("long").alias("n")))


def stream_cms_registers(events: DataFrame, value_col: str = "user_id",
                         tag: str = "cms") -> DataFrame:
    """Streaming count-min frequency state: the ``cms_state`` cell
    table maintained incrementally over an append stream — counters
    merge by per-cell SUM, so state is exactly d x w rows forever
    (no watermark, no per-key growth): bounded-memory frequency
    estimates over an unbounded key domain, the property a
    heavy-hitters monitor needs at 100 TB.  Fold with
    ``fmx.operators.sketches.cms_estimate`` against any probe set
    wherever the registers are consumed — the same
    mergeable-register pattern as stream_hll/hist/checksum."""
    from fmx.operators.sketches import cms_state

    return cms_state(events.filter(F.col(value_col).isNotNull()),
                     value_col, tag=tag)


def stream_bloom_registers(events: DataFrame,
                           value_col: str = "user_id",
                           tag: str = "bloom") -> DataFrame:
    """Streaming Bloom membership state: the distinct set-bit relation
    of ``bloom_bits`` maintained incrementally — set bits only ever
    turn on (union = DISTINCT), so state is bounded by the filter
    width m forever, no watermark.  Emit in update mode and
    ``bloom_probe`` the snapshot wherever membership is consumed (the
    streaming side of the decontamination gate: eval-set bits stream
    in, training batches probe).  Completes the mergeable-register
    family: HLL (max), histogram/CMS/checksum (sum), Bloom (or)."""
    from fmx.operators.sketches import BLOOM_K, BLOOM_M, _md5_long

    pos = F.array(*[F.pmod(_md5_long(F.col(value_col), f"{tag}{i}:"),
                           F.lit(BLOOM_M)) for i in range(BLOOM_K)])
    return (events.filter(F.col(value_col).isNotNull())
            .select(F.explode(pos).alias("pos"))
            .dropDuplicates(["pos"]))


def stream_freshness_registers(rows: DataFrame, group_col: str,
                               ts_col: str) -> DataFrame:
    """Streaming data-freshness state: per-group newest event time —
    a MAX register, so state is exactly one row per group forever (no
    watermark; max merges across batches and across partitions).
    Emit in update/complete mode and derive the lag report with
    ``fmx.operators.dq.freshness_from_registers`` wherever the
    registers are consumed — the streaming side of the
    did-source-X-stop-delivering gate (batch twin:
    ``fmx.operators.dq.freshness_lag``).  Extends the mergeable-
    register family: HLL (max), hist/CMS/checksum (sum), Bloom (or),
    freshness (max)."""
    return rows.groupBy(group_col).agg(F.max(ts_col).alias("last_ts"))


def stream_idgap_registers(rows: DataFrame, id_col: str,
                           bucket: int = 4096) -> DataFrame:
    """Streaming key-contiguity state: per-bucket (n, mn, mx) of
    DISTINCT ids seen so far — every register field mergeable
    (sum/min/max); snapshots fold into the contiguity report with
    ``fmx.operators.dq.id_gaps_from_registers`` — the streaming side
    of the did-the-exporter-drop-a-chunk gate (batch twin:
    ``fmx.operators.dq.id_gaps``).  Ids are deduplicated WITHIN the
    stream (dropDuplicates) so at-least-once redelivery cannot
    inflate n and mask holes — the dedup keeps one state row PER ID
    (the register side stays one row per bucket); in production bound
    that state with ``withWatermark`` + dropDuplicates on (id, ts),
    which preserves exactness for any replay horizon inside the
    watermark.  mn/mx are replay-proof with or without the dedup.  Extends the mergeable-register
    family: HLL (max), hist/CMS/checksum (sum), Bloom (or),
    freshness (max), contiguity (sum/min/max)."""
    return (rows.filter(F.col(id_col).isNotNull())
            .dropDuplicates([id_col])
            .groupBy(F.floor(F.col(id_col) / int(bucket)).alias("bucket"))
            .agg(F.count("*").alias("n"), F.min(id_col).alias("mn"),
                 F.max(id_col).alias("mx")))


def stream_activity_registers(events: DataFrame,
                              anchor: str = "2024-01-01") -> DataFrame:
    """Streaming engagement state: (user_id, day-offset) presence
    registers relative to a FIXED anchor date — the incremental half
    of the activity bitmask (event_activity_bitmask derives the anchor
    from the batch min date; a stream cannot, so the anchor is
    configuration).  State is bounded by users x 63 rows forever and
    the merge is idempotent presence (any positive count), so batches,
    streams, and backfills union losslessly.  Fold with
    :func:`activity_mask_fold` wherever the bitmask is consumed."""
    off = F.datediff(F.to_date("ts"), F.lit(anchor).cast("date"))
    return (events
            .filter((off >= 0) & (off < 63))
            .groupBy("user_id", off.alias("off"))
            .agg(F.count("*").alias("c")))


def activity_mask_fold(regs: DataFrame) -> DataFrame:
    """Fold (user_id, off) presence registers into the packed BIGINT
    activity bitmask + bit_count readout — stateless, user-grain,
    identical arithmetic to the batch event_activity_bitmask query.
    The fold aggregates with bit_or, NOT sum: presence registers union
    across snapshots (batch + stream + backfill may each carry the
    same (user, off) row), and OR of the same bit is idempotent where
    a sum would carry into the WRONG bit."""
    return (regs.groupBy("user_id")
            .agg(F.bit_or(F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(off AS INT))"))
                .cast("bigint").alias("mask"))
            .withColumn("n_active_days",
                        F.bit_count("mask").cast("bigint")))


KMV_STREAM_SCHEMA = StructType([
    StructField("group", StringType()),
    StructField("ver", LongType()),    # per-group snapshot version —
    # consumers MUST select the max-ver snapshot per group (see
    # stream_kmv_state docstring)
    StructField("h", LongType()),
])
_KMV_STATE = StructType([
    StructField("hs", StringType()),   # comma-joined sorted hashes —
    # scalar state round-trips losslessly (array-typed state columns
    # arrow-copy fine but a flat string keeps the tuple contract dumb)
    StructField("ver", LongType()),    # snapshot counter
])


def stream_kmv_state(events: DataFrame, group_col: str, value_col: str,
                     k: int | None = None, tag: str = "kmv") -> DataFrame:
    """Streaming KMV cardinality/intersection state per group: the k
    smallest distinct 60-bit hashes, maintained with
    ``applyInPandasWithState`` — per-group state is <= k longs FOREVER
    (each batch merges its hashes and re-prunes to the k minimum), the
    bounded-memory property none of the pure-agg register twins can
    provide for a top-k-of-distinct state.  Extends the mergeable-
    register family with its fourth merge law: HLL (max),
    hist/CMS/checksum (sum), Bloom (or), KMV (min-k).

    Emits the group's CURRENT sketch (one row per retained hash,
    stamped with a per-group snapshot ``ver``) each batch the group
    appears in.  **Snapshot contract**: with append-style sinks
    (memory sink, files) earlier emissions persist, so a consumer that
    unions ALL output rows gets a SUPERSET of the sketch — hashes
    evicted by later batches linger from older snapshots.  Consumers
    must take only the latest snapshot per group: filter to
    ``ver = max(ver) OVER (PARTITION BY group)`` (or join against
    ``groupBy(group).agg(max(ver))``).  The two-batch eviction test
    (tests/test_streaming.py::test_stream_kmv_state_two_batch_eviction)
    pins exactly this: batch-2 snapshots evict batch-1 hashes, the
    naive union does not.  Downstream, two groups' latest snapshots
    feed the same theta-intersection math as the batch
    ``fmx.operators.sketches.kmv_intersection`` (merge rule
    ``kmv_merge``: k smallest of the union — associative, so batch,
    stream, and cross-day states all fold).

    **Checkpoint migration (r11)**: adding the snapshot ``ver`` field
    changed the ``applyInPandasWithState`` state schema from one field
    to two — a streaming query resuming from a checkpoint written by
    the pre-``ver`` build will fail at the state-store/unpack layer.
    Discard such checkpoints and restart the query from the source
    (the sketch rebuilds from replayed input; the merge law makes the
    rebuilt state converge to the same k-minimum set).  The full
    per-operator schema/compat table lives in the MODULE docstring's
    state-schema compatibility matrix."""
    from fmx.operators.sketches import KMV_K, _md5_long

    kk = int(k if k is not None else KMV_K)
    hashed = (events.filter(F.col(value_col).isNotNull())
              .select(F.col(group_col).cast("string").alias("group"),
                      _md5_long(F.col(value_col), f"{tag}:").alias("h")))

    def upd(key: Any, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        cur: set[int] = set()
        ver = 0
        if state.exists:
            blob, ver = state.get
            if blob:
                cur.update(int(x) for x in blob.split(","))
        for pdf in pdfs:
            cur.update(int(x) for x in pdf["h"])
        best = sorted(cur)[:kk]
        ver = int(ver) + 1
        state.update((",".join(str(x) for x in best), ver))
        yield pd.DataFrame({"group": [key[0]] * len(best),
                            "ver": [ver] * len(best), "h": best})

    return (hashed.groupBy("group")
            .applyInPandasWithState(
                upd,
                outputStructType=KMV_STREAM_SCHEMA,
                stateStructType=_KMV_STATE,
                outputMode="Update",
                timeoutConf=GroupStateTimeout.NoTimeout))


CUSUM_STREAM_SCHEMA = StructType([
    StructField("group", StringType()),
    StructField("ver", LongType()),     # per-group batch version —
    # consumers take the max-ver row per group (snapshot contract,
    # same as stream_kmv_state)
    StructField("n_seen", LongType()),
    StructField("cusum_hi", LongType()),
    StructField("max_cusum", LongType()),
])
_CUSUM_STATE = StructType([
    StructField("c", LongType()),       # current one-sided upper CUSUM
    StructField("mx", LongType()),      # running max of c
    StructField("n", LongType()),       # events folded so far
    StructField("ver", LongType()),     # snapshot counter
])


def stream_cusum_state(events: DataFrame, group_col: str = "event_type",
                       k_ref: int = 2500) -> DataFrame:
    """Streaming one-sided upper CUSUM per group over event value
    cents: C <- max(0, C + cent - k_ref), folded in (ts, event_id)
    order within each batch and carried across batches in state —
    the streaming twin of the batch ``stats_cusum_chart`` (which
    derives k from the data; a stream cannot see the global mean, so
    the reference is CONFIGURATION — the hll-anchor convention).
    State is four longs per group FOREVER; each batch the group
    appears in emits one snapshot row (group, ver, n_seen, cusum_hi,
    max_cusum), and consumers take the max-``ver`` row per group.

    Determinism: cross-partition arrival order is not defined for a
    shuffled stream, so the fold ORDER is pinned explicitly — each
    batch's rows sort by (ts, event_id) before folding, and batches
    themselves are ordered by the source (file order under
    availableNow).  Integer arithmetic end-to-end: no float state to
    drift, and replaying the same batches yields byte-identical
    snapshots.

    **Checkpoint compat**: the four-long state order (c, mx, n, ver)
    is pinned — see the module docstring's state-schema compatibility
    matrix for the append-only/discard-and-replay rules shared by
    every stateful operator here."""
    src = (events.filter(F.col("value").isNotNull())
           .select(F.col(group_col).cast("string").alias("group"),
                   F.col("ts"), F.col("event_id"),
                   F.floor(F.col("value") * 100 + 0.5).cast("long")
                   .alias("cent")))

    kr = int(k_ref)

    def upd(key: Any, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
        c, mx, n, ver = (state.get if state.exists else (0, 0, 0, 0))
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for cent in pdf["cent"]:
                c = max(0, c + int(cent) - kr)
                mx = max(mx, c)
                n += 1
        ver = int(ver) + 1
        state.update((int(c), int(mx), int(n), ver))
        yield pd.DataFrame({"group": [key[0]], "ver": [ver],
                            "n_seen": [n], "cusum_hi": [int(c)],
                            "max_cusum": [int(mx)]})

    return (src.groupBy("group")
            .applyInPandasWithState(
                upd,
                outputStructType=CUSUM_STREAM_SCHEMA,
                stateStructType=_CUSUM_STATE,
                outputMode="Update",
                timeoutConf=GroupStateTimeout.NoTimeout))
