"""One-off 10x scale point for the heaviest bench headliners (r7
verdict #6): the 100 TB story is design-argued in SCALE.md; this tool
converts one step of it into measurement by running the 5 heaviest
queries at sf0.1 and at a 10x weak-scaled replica (sf1.0-equivalent)
in the SAME session and reporting the observed scaling exponent
(t ~ n^alpha: alpha = log10(t_10x / t_1x)).

Build step (``--build``): materializes /root/repo/data/sf1.0/ as 10
key-offset replicas of the driver's sf0.1 parquet — ids are shifted
by replica * 10^7 so key cardinality scales with volume (no
hot-key artifacts), and embedding vectors get a tiny per-replica
deterministic shift (+replica * 0.003 per component) so similarity
workloads see 10x DISTINCT points rather than 10 exact copies of
each (exact copies would collapse every near-dup cell into
pathological all-pairs work that real 10x data doesn't have).  The
graph replicas are disjoint (no cross-replica edges): component
count scales 10x, per-component work stays constant — classic weak
scaling.  This directory is an EXPERIMENT artifact, never an oracle
input; correctness always runs on the driver's untouched
/root/testdata.

Usage::

    python -m tools.scale_experiment --build   # ~170 MB under data/
    python -m tools.scale_experiment --run     # prints the JSON table
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, "data", "sf1.0")
REPLICAS = 10
OFF = 10_000_000

HEAVY = ["graph_connected_components", "dedup_semantic", "ann_ivfpq_topk",
         "dedup_cross_corpus",
         # r8 verdict #5 (half): pmi's zip-based bigram build must not
         # go all-pairs; er_fuzzy_match gets its own protocol below —
         # at 10x under an UNCHANGED 1-char blocking key the full
         # query is the measured cliff (>60 min wall; candidate pairs
         # grow ~100x), so the experiment measures the candidate
         # explosion exactly and times the DOCUMENTED fix (prefix-2
         # re-blocking) instead of burning an hour proving a hang
         "text_pmi_bigrams"]


def build() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    reps = f"(SELECT unnest(range({REPLICAS})) AS r)"

    specs = {
        "lineitem": f"""
            SELECT l_orderkey + r * {OFF} AS l_orderkey,
                   l_partkey + r * {OFF} AS l_partkey,
                   l_suppkey + r * {OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet', {reps}""",
        "documents": f"""
            SELECT doc_id + r * {OFF} AS doc_id, text, lang, source, n_chars
            FROM '{SRC}/documents.parquet', {reps}""",
        "embeddings": f"""
            SELECT vec_id + r * {OFF} AS vec_id,
                   CAST(list_transform(embedding,
                        x -> x + r * 0.003) AS FLOAT[]) AS embedding,
                   label
            FROM '{SRC}/embeddings.parquet', {reps}""",
        # er_fuzzy_match input: every replica's names get a 5-char
        # replica-letter suffix, so cross-replica Levenshtein is >= 5
        # (> max_dist=3 — replicas never MATCH each other, like real
        # distinct entities), first chars and relative length bands are
        # untouched, and block KEYS stay at their sf0.1 cardinality —
        # i.e. this measures the honest consequence of 10x data under
        # an unchanged blocking key (block occupancy grows 10x).
        "part": f"""
            SELECT p_partkey + r * {OFF} AS p_partkey,
                   p_name || repeat(chr(CAST(97 + r AS INTEGER)), 5)
                       AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet', {reps}""",
        # graph_hits_3iter input: keys shift together so the
        # customer->supplier purchase graph stays replica-disjoint
        "orders": f"""
            SELECT o_orderkey + r * {OFF} AS o_orderkey,
                   o_custkey + r * {OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM '{SRC}/orders.parquet', {reps}""",
        # er_fellegi_sunter input: custkeys shift, but nation /
        # segment / acctbal / name text are kept VERBATIM — nation
        # cardinality does not scale with data (the real-world trap),
        # so replica rows mix inside nation blocks and the experiment
        # measures the honest quadratic consequence of a fixed-
        # cardinality blocking key at 10x
        "customer": f"""
            SELECT c_custkey + r * {OFF} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet', {reps}""",
        # events (r11: the resample-fan-out experiments —
        # eval_permutation_test / sample_poisson_bootstrap): event and
        # user keys shift so md5(event_id:b) replicate coins are FRESH
        # per replica (10x independent draws, the honest weak-scaling
        # shape); ts/value/type/props verbatim — 10x rows from the
        # same distribution
        "events": f"""
            SELECT event_id + r * {OFF} AS event_id, ts,
                   user_id + r * {OFF} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet', {reps}""",
    }
    for t, sql in specs.items():
        out = os.path.join(DST, f"{t}.parquet")
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"built {out}: {n} rows")


def _time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run(names=None) -> None:
    """names: optional subset of registry queries to time instead of the
    full HEAVY protocol (skips the ER and training extras)."""
    import fmx
    from pyspark.sql import functions as F

    from fmx.fm import FMRegressorSGD
    from fmx.queries import all_queries
    from fmx.sources import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = fmx.get_spark(app_name="scale_experiment",
                          master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    specs = all_queries()
    out: dict[str, dict] = {}
    for name in (names or HEAVY):
        fn = specs[name].fn
        t_small = _time_query(fn, spark, SRC)
        t_big = _time_query(fn, spark, DST)
        out[name] = {"sf0.1_sec": t_small, "sf1.0_sec": t_big,
                     "alpha": round(math.log10(t_big / t_small), 2)}
        print(name, out[name])

    if names:
        print(json.dumps({"scale_experiment": out,
                          "replicas": REPLICAS, "src": SRC, "dst": DST}))
        spark.stop()
        return

    # ER at scale: the r9 canonicalize-then-match upgrade made the
    # full query measurable at 10x (the row-grain plan was a measured
    # >60-minute straggler: this corpus has ~80 distinct names over
    # 20k rows, so row-pair candidates explode 100x — 4.1e9 pairs —
    # while distinct-name pairs stay tiny).  Report the measured time
    # at both scales PLUS the exact row-pair count that the old plan
    # would have Levenshteined, so the ledger shows both the cliff
    # and why the shipped plan doesn't fall off it.
    fn = specs["er_fuzzy_match"].fn
    t_small = _time_query(fn, spark, SRC)
    t_big = _time_query(fn, spark, DST)

    def _row_pairs(spark, sf_dir) -> int:
        from fmx.sources import load_table as _T

        part = _T(spark, sf_dir, "part")
        lb = part.select(
            F.expr("substring(p_name, 1, 1)").alias("bp"),
            (F.length("p_name") / 4).cast("bigint").alias("bb"))
        blocks = lb.groupBy("bp", "bb").agg(F.count("*").alias("c"))
        return blocks.agg(F.sum(F.col("c") * F.col("c"))
                          .alias("p")).collect()[0]["p"]

    out["er_fuzzy_match"] = {
        "sf0.1_sec": t_small, "sf1.0_sec": t_big,
        "alpha": round(math.log10(t_big / t_small), 2),
        "row_pairs_sf0.1": int(_row_pairs(spark, SRC)),
        "row_pairs_sf1.0": int(_row_pairs(spark, DST))}
    print("er_fuzzy_match", out["er_fuzzy_match"])

    def _fit(sf_dir: str) -> float:
        emb = load_table(spark, sf_dir, "embeddings").select(
            F.col("embedding").cast("array<double>").alias("features"))
        train = emb.withColumn(
            "label",
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x))
        est = FMRegressorSGD(dimFactorization=8, maxIter=3,
                             miniBatchFraction=0.34, stepSize=0.1,
                             seed=1234)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            m = est.fit(train)
            m.strength.count(), m.factors.count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    t_small, t_big = _fit(SRC), _fit(DST)
    out["fm_train_sgd_3iter"] = {
        "sf0.1_sec": t_small, "sf1.0_sec": t_big,
        "alpha": round(math.log10(t_big / t_small), 2)}
    print("fm_train_sgd_3iter", out["fm_train_sgd_3iter"])
    print(json.dumps({"scale_experiment": out, "replicas": REPLICAS,
                      "src": SRC, "dst": DST}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--names", default=None,
                    help="comma-separated registry queries to time "
                         "instead of the HEAVY protocol")
    args = ap.parse_args()
    if args.build:
        build()
    if args.run:
        run([n for n in args.names.split(",") if n] if args.names else None)
    if not (args.build or args.run):
        print(__doc__)


if __name__ == "__main__":
    main()
