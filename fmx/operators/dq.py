"""Data-quality expectation operators — the validation gate a pipeline
runs before promoting a batch (Deequ/Great-Expectations shape, as pure
DataFrame ops).

``check_expectations`` turns a dict of named boolean rules into ONE
aggregation pass: each rule becomes a conditional count, so validating
50 rules on 100 TB costs a single scan with partial aggregation — never
one job per rule.  ``failing_rows`` returns the violating rows
themselves (bounded by a per-rule limit) for debugging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["check_expectations", "failing_rows", "table_diff",
           "checksum_registers", "table_diff_drilldown", "freshness_lag",
           "freshness_from_registers", "null_rate_drift", "id_gaps",
           "id_gap_registers", "id_gaps_from_registers"]


def check_expectations(df: DataFrame,
                       rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, pass_rate).
    A rule is a boolean Column that should be TRUE for every row;
    nulls count as violations (unknown is not acceptable).  An empty
    batch reports 0 violations and pass_rate 1.0 (vacuously clean —
    gate on n_rows separately if empty means broken)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = []
    for name, cond in rules.items():
        # coalesce: sum over zero rows is NULL, and a promotion gate
        # comparing NULL == 0 silently misbehaves
        bad = F.coalesce(F.sum(F.when(cond, 0).otherwise(1)), F.lit(0))
        aggs.append(bad.alias(f"_v_{name}"))
    totals = df.agg(F.count("*").alias("_n"), *aggs)
    pairs = F.array(*[
        # backtick-quoted: a dotted rule name ('price.positive') must
        # resolve as one column, not nested-field access
        F.struct(F.lit(name).alias("rule"),
                 F.col(f"`_v_{name}`").cast("bigint").alias("n_violations"))
        for name in rules])
    rate = F.when(F.col("_n") == 0, F.lit(1.0)).otherwise(
        F.round(1.0 - F.col("p.n_violations") / F.col("_n"), 6))
    return (totals
            .select(F.col("_n"), F.explode(pairs).alias("p"))
            .select(F.col("p.rule").alias("rule"),
                    F.col("_n").cast("bigint").alias("n_rows"),
                    F.col("p.n_violations").alias("n_violations"),
                    rate.alias("pass_rate")))


def failing_rows(df: DataFrame, rules: dict[str, Column],
                 limit_per_rule: int = 100) -> DataFrame:
    """The violating rows, tagged by rule, capped per rule (debugging
    output stays bounded no matter how broken the batch is)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    parts = []
    for name, cond in rules.items():
        parts.append(df.filter(~F.coalesce(cond, F.lit(False)))
                     .limit(limit_per_rule)
                     .withColumn("_rule", F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

_CHK_MOD = 2 ** 40
# shared NULL sentinel for keys and signatures: NULLs must participate
# in bucketing and checksums instead of vanishing from register sums
_NULL_SENTINEL = "\u0000null"


def _bucket_of(key_col: str, num_buckets: int):
    """Bucket hash shared by stage-1 registers and the stage-2
    drill-down restriction — ONE definition, because the two stages
    must agree byte-for-byte on the bucket input.  NULL keys coalesce
    to a sentinel so they land in a real bucket (hash64(NULL) would
    yield a NULL bucket that full-outer register joins can never pair
    and bucket equi-joins silently drop)."""
    from fmx.operators.dedup import hash64

    key_str = F.coalesce(F.col(key_col).cast("string"),
                         F.lit(_NULL_SENTINEL))
    return F.pmod(hash64(key_str), F.lit(int(num_buckets)))


def checksum_registers(df: DataFrame, key_col: str, sig: Column,
                       num_buckets: int = 256) -> DataFrame:
    """The mergeable register state behind ``table_diff``: per bucket
    (= md5-hash(key) mod ``num_buckets``) a row count and a checksum
    (sum of per-row signature hashes mod 2^40).  Both registers are
    ASSOCIATIVE — counts add, checksums add mod — so the same fold runs
    batch, incrementally (yesterday's registers + today's delta), or as
    streaming state (see fmx.streaming.ops.stream_checksum_registers):
    reconciling two 100 TB snapshots never re-reads either side beyond
    its own one scan.

    Returns (bucket, n, chk)."""
    from fmx.operators.dedup import hash64

    # NULL sig coalesces to a sentinel (mirroring _bucket_of's NULL-key
    # sentinel): hash64(NULL) is NULL and sum() would silently skip the
    # row while n still counts it, so two snapshots differing only
    # inside NULL-sig rows would reconcile as equal
    sig_str = F.coalesce(sig.cast("string"), F.lit(_NULL_SENTINEL))
    # the per-row hash is bounded by 2^40, but a plain BIGINT sum of
    # 2^40-bounded terms overflows signed 64-bit at ~2^23 rows per
    # bucket (ANSI mode => ARITHMETIC_OVERFLOW at scale); accumulate in
    # DECIMAL(38,0) (headroom ~10^26 rows) and take the mod at the end
    # — same value as a mod-as-you-go sum, so registers stay mergeable
    return (df.select(
                _bucket_of(key_col, num_buckets).alias("bucket"),
                F.pmod(hash64(sig_str), F.lit(_CHK_MOD))
                .cast("decimal(38,0)").alias("_h"))
            .groupBy("bucket")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.pmod(F.sum("_h"), F.lit(_CHK_MOD)).cast("bigint")
                 .alias("chk")))


def table_diff(a: DataFrame, b: DataFrame, key_col: str, sig: Column,
               num_buckets: int = 256) -> DataFrame:
    """Checksum-bucket table reconciliation (the data-diff pattern):
    find WHERE two table snapshots differ without joining them row-by-
    row.  Each side folds to ``num_buckets`` (count, checksum) rows —
    bucket = md5-hash(key) mod buckets, checksum = sum of a per-row
    signature hash — and only buckets whose registers disagree are
    reported.  At 100 TB this is two scans + two bucket-grain aggs +
    a broadcastable join of two tiny relations; drill-down then targets
    just the differing buckets (a partition-pruned re-scan), never the
    whole table.

    ``sig`` is a STRING Column rendering the row's compared content;
    keep it engine-portable (ints/strings — avoid raw double-to-string
    casts, whose formatting differs across engines; round to fixed
    decimals and cast via BIGINT instead).

    Returns (bucket, n_a, n_b, chk_a, chk_b) for differing buckets.
    Per-row hashes are 2^40-bounded and accumulated in DECIMAL(38,0)
    with the mod taken after the sum (a plain BIGINT sum would overflow
    at ~2^23 rows/bucket under ANSI mode), so the register stays exact
    at any realistic row count.
    """
    fa = (checksum_registers(a, key_col, sig, num_buckets)
          .withColumnsRenamed({"n": "n_a", "chk": "chk_a"}))
    fb = (checksum_registers(b, key_col, sig, num_buckets)
          .withColumnsRenamed({"n": "n_b", "chk": "chk_b"}))
    return (fa.join(fb, "bucket", "full_outer")
            .select(F.col("bucket").cast("bigint").alias("bucket"),
                    F.coalesce("n_a", F.lit(0)).alias("n_a"),
                    F.coalesce("n_b", F.lit(0)).alias("n_b"),
                    F.coalesce("chk_a", F.lit(-1)).alias("chk_a"),
                    F.coalesce("chk_b", F.lit(-1)).alias("chk_b"))
            .filter((F.col("n_a") != F.col("n_b"))
                    | (F.col("chk_a") != F.col("chk_b"))))


def table_diff_drilldown(a: DataFrame, b: DataFrame, key_col: str,
                         sig: Column, diff_buckets: DataFrame,
                         num_buckets: int = 256) -> DataFrame:
    """Stage 2 of the data-diff pattern: given the differing buckets
    from :func:`table_diff`, re-scan both sides RESTRICTED to those
    buckets and emit the exact differing keys —
    (key, status in {only_a, only_b, changed}, sig_a, sig_b).

    The bucket restriction is an equi-join against the broadcast
    differing-bucket relation, so only ~|diff|/num_buckets of each
    table survives into the per-key full-outer join; with a
    bucket-aligned physical layout the restriction prunes whole
    partitions before the scan.  Two 100 TB snapshots that differ in a
    handful of buckets reconcile key-by-key at the cost of reading
    those buckets only."""
    bset = F.broadcast(
        diff_buckets.select(F.col("bucket").cast("bigint").alias("_bk"))
        .distinct())

    def _side(df: DataFrame, key_out: str, out: str) -> DataFrame:
        # sig coalesces to the register sentinel: a present row whose
        # sig renders NULL must NOT look like an absent side to the
        # status logic below (only_a/only_b derive from sig NULLness)
        sig_str = F.coalesce(sig.cast("string"), F.lit(_NULL_SENTINEL))
        return (df.withColumn(
                    "_bk",
                    _bucket_of(key_col, num_buckets).cast("bigint"))
                .join(bset, "_bk")
                .select(F.col(key_col).alias(key_out), sig_str.alias(out)))

    # null-safe pairing end-to-end: the bucket hash above coalesces a
    # NULL key to a sentinel (matching checksum_registers), and the
    # key join uses eqNullSafe so a NULL-key row diffs like any other
    sa, sb = _side(a, "_ka", "sig_a"), _side(b, "_kb", "sig_b")
    status = (F.when(F.col("sig_a").isNull(), F.lit("only_b"))
              .when(F.col("sig_b").isNull(), F.lit("only_a"))
              .otherwise(F.lit("changed")))
    return (sa.join(sb, F.col("_ka").eqNullSafe(F.col("_kb")),
                    "full_outer")
            .filter(F.col("sig_a").isNull() | F.col("sig_b").isNull()
                    | (F.col("sig_a") != F.col("sig_b")))
            .select(F.coalesce("_ka", "_kb").alias(key_col),
                    status.alias("status"), "sig_a", "sig_b"))


def freshness_lag(df: DataFrame, group_col: str, ts_col: str,
                  warn_lag_hours: float = 24.0) -> DataFrame:
    """Per-source data-freshness gate: each group's newest event time
    against the dataset's newest event time — the "did source X stop
    delivering" check that runs before every incremental promotion.

    Returns (group, last_ts, lag_hours, stale) where lag is measured
    from the GLOBAL max timestamp (portable: no wall-clock now() — the
    same frame always grades the same) and stale flags lags over
    ``warn_lag_hours``.

    One scan: a (group) max-agg plus a 1-row global-max broadcast
    (the global max folds FROM the per-group registers — the scan is
    not read twice).  The register is max-mergeable, so the same fold
    runs incrementally over arriving batches / streaming snapshots
    (see fmx.streaming.ops.stream_freshness_registers) — report
    derivation is ONE definition, :func:`freshness_from_registers`."""
    per = df.groupBy(group_col).agg(F.max(ts_col).alias("last_ts"))
    return freshness_from_registers(per, group_col, warn_lag_hours)


def freshness_from_registers(registers: DataFrame, group_col: str,
                             warn_lag_hours: float = 24.0) -> DataFrame:
    """Fold a (group, last_ts) max-register table (batch
    ``freshness_lag`` internals or ``stream_freshness_registers``
    snapshots — registers from several sources merge by group-max
    first) into the freshness report: (group, last_ts, lag_hours,
    stale).  Runs entirely on the group-count-bounded register
    relation: one max-agg + a 1-row broadcast."""
    glob = registers.agg(F.max("last_ts").alias("_gmax"))
    lag_h = ((F.col("_gmax").cast("double")
              - F.col("last_ts").cast("double")) / 3600.0)
    # a group whose last_ts is NULL (only NULL event times) is the
    # dead-source case this gate exists for: stale must be TRUE, not
    # NULL (a NULL would pass a `stale` filter unnoticed)
    return (registers.crossJoin(F.broadcast(glob))
            .select(group_col, "last_ts",
                    F.round(lag_h, 4).alias("lag_hours"),
                    F.coalesce(lag_h > float(warn_lag_hours),
                               F.lit(True)).alias("stale")))


def null_rate_drift(df: DataFrame, cols: list[str],
                    ts_col: str) -> DataFrame:
    """Per-column null-rate drift between the early and late half of
    the batch's time range: (col, n_early, rate_early, n_late,
    rate_late, drift) — the schema-health trend check (an upstream
    extractor silently started emitting NULLs mid-window) that
    complements dq_psi_drift's value-distribution view.

    The time midpoint comes from a 1-row min/max aggregate over the
    fractional epoch (``cast('double')`` — whole-second truncation
    shifts boundary rows, the w7 lesson) broadcast back over the
    fact; all per-period per-column counts then run in a single
    conditional aggregation pass (one scan, map-side combinable, no
    shuffle beyond the 1-row exchange), and the long-format explode
    happens on the 1-row result.  Rows with NULL timestamps belong to
    neither period (they carry no trend information; gate them via
    check_expectations).  Integer count ratios keep every rate
    engine-exact; an empty period reports NULL rates and NULL drift
    rather than pretending stability."""
    ep = F.col(ts_col).cast("double")
    rng = df.agg(F.min(ep).alias("_mn"), F.max(ep).alias("_mx"))
    late = ep > (F.col("_mn") + F.col("_mx")) / 2.0
    # the period row counts are column-independent: compute them ONCE,
    # not once per profiled column (halves the per-row aggregate work)
    aggs = [F.sum(F.when(~late, 1).otherwise(0)).alias("_ne"),
            F.sum(F.when(late, 1).otherwise(0)).alias("_nl")]
    for i, c in enumerate(cols):
        isn = F.col(c).isNull().cast("long")
        aggs += [
            F.sum(F.when(~late, isn).otherwise(0)).alias(f"_nne_{i}"),
            F.sum(F.when(late, isn).otherwise(0)).alias(f"_nnl_{i}"),
        ]
    one = df.crossJoin(F.broadcast(rng)).agg(*aggs)
    def _rate(num, den):
        return F.round(F.col(num) / F.nullif(F.col(den), F.lit(0)), 6)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col"),
            F.coalesce(F.col("_ne"), F.lit(0)).cast("bigint")
            .alias("n_early"),
            _rate(f"_nne_{i}", "_ne").alias("rate_early"),
            F.coalesce(F.col("_nl"), F.lit(0)).cast("bigint")
            .alias("n_late"),
            _rate(f"_nnl_{i}", "_nl").alias("rate_late"),
            F.round(F.abs(F.col(f"_nnl_{i}") / F.nullif(F.col("_nl"), F.lit(0))
                          - F.col(f"_nne_{i}") / F.nullif(F.col("_ne"), F.lit(0))),
                    6).alias("drift"))
        for i, c in enumerate(cols)])
    return one.select(F.explode(rows).alias("r")).select("r.*")


def id_gap_registers(df: DataFrame, id_col: str,
                     bucket: int = 4096) -> DataFrame:
    """Bucket-grain contiguity registers for :func:`id_gaps`:
    (bucket, n, mn, mx) at floor(id / bucket) grain.  Every field is
    MERGEABLE (n: sum, mn: min, mx: max), so the same registers
    accumulate incrementally over arriving batches or as Structured
    Streaming state (fmx.streaming.ops.stream_idgap_registers) and
    merge across sources by bucket before folding — the
    freshness-register discipline applied to key contiguity.  NULL
    ids are excluded (no position on the id line), and ids are
    DEDUPLICATED first: n must count distinct positions on the id
    line or duplicate deliveries would mask real holes (inflated n
    cancels missing ids in the fold's subtraction).  The distinct
    hash-partitions on _id while the groupBy keys on floor(_id /
    bucket) — different partitionings — so it DOES cost one extra
    exchange, but that exchange is bounded by distinct-id cardinality
    after partial (map-side) aggregation, and correctness requires
    it."""
    return (df.filter(F.col(id_col).isNotNull())
            .select(F.col(id_col).alias("_id")).distinct()
            .groupBy(F.floor(F.col("_id") / int(bucket)).alias("bucket"))
            .agg(F.count("*").alias("n"), F.min("_id").alias("mn"),
                 F.max("_id").alias("mx")))


def id_gaps_from_registers(registers: DataFrame) -> DataFrame:
    """Fold (bucket, n, mn, mx) contiguity registers (batch
    ``id_gap_registers`` or ``stream_idgap_registers`` snapshots —
    merge multi-source registers by bucket-sum/min/max first) into
    the contiguity report: ONE row (n_ids, id_min, id_max, n_missing,
    n_buckets, n_gap_buckets, max_bucket_missing).  Runs entirely on
    the bucket-count-bounded register relation; report derivation is
    ONE definition shared by the batch and streaming paths."""
    local_miss = F.col("mx") - F.col("mn") + 1 - F.col("n")
    return registers.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_ids"),
        F.min("mn").cast("bigint").alias("id_min"),
        F.max("mx").cast("bigint").alias("id_max"),
        (F.max("mx") - F.min("mn") + 1 - F.sum("n")).cast("bigint")
        .alias("n_missing"),
        F.count("*").cast("bigint").alias("n_buckets"),
        F.coalesce(F.sum((local_miss > 0).cast("long")), F.lit(0))
        .cast("bigint").alias("n_gap_buckets"),
        F.max(local_miss).cast("bigint").alias("max_bucket_missing"))


def id_gaps(df: DataFrame, id_col: str, bucket: int = 4096) -> DataFrame:
    """Primary-key contiguity report: ONE row (n_ids, id_min, id_max,
    n_missing, n_buckets, n_gap_buckets, max_bucket_missing) — the
    "did the upstream exporter drop a chunk?" check (a missing
    partition shows up as a huge contiguous hole; TPC-H orderkeys,
    which legitimately use 1 in 4 values, show steady per-bucket
    gaps).

    n_missing is EXACT at any scale: (id_max - id_min + 1) - n_ids
    from one integer aggregate.  The per-bucket view (floor(id /
    bucket) grain) localizes holes without any ordering: a bucket's
    (local_max - local_min + 1 - n) counts its internal holes, so the
    whole report is two hash-aggs with map-side combine — no window,
    no sort, no join.  Holes that span bucket boundaries appear in
    the global count but not in any bucket's local count (by
    construction); shrink ``bucket`` to localize further.  NULL ids
    are excluded (gate them via check_expectations).  An empty batch
    reports 0 ids / 0 buckets with NULL range stats.  Composition:
    :func:`id_gap_registers` (mergeable, with a streaming twin) +
    :func:`id_gaps_from_registers` (the shared fold)."""
    return id_gaps_from_registers(id_gap_registers(df, id_col, bucket))
