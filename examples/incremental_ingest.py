"""Steady-state incremental ingest — the DAILY shape of the corpus
pipeline (examples/corpus_pipeline.py is the backfill shape):

  day N batch arrives ->
    exact dedup vs the accumulated FINGERPRINT STORE (hash-only
      anti-join — years of corpus, one narrow column) ->
    near-dup decontamination vs the accumulated SIGNATURE STORE
      (MinHash band equi-join — base corpus never re-read, never
      self-joined) ->
    append survivors + their fingerprints + signatures ->
    merge the day's HLL registers into the RUNNING cardinality state
      (register-wise max — no distinct over history) ->
    compact the accumulated store when small files pile up.

Every cross-day structure is a persisted ARTIFACT (hash store,
signature store, HLL registers), so day N's cost depends on day N's
size, not on history.  Run: python examples/incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.dedup import incremental_dedup, minhash_cross_pairs
from fmx.operators.sketches import hll_fold, hll_registers
from fmx.sources import load_table
from fmx.sources.sinks import compact_dataset

NUM_HASHES, BANDS, SHINGLE_N = 8, 4, 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="fmx_ingest_")
    store_docs = os.path.join(root, "docs")
    store_hashes = os.path.join(root, "hashes")
    store_regs = os.path.join(root, "hll_regs")

    spark = fmx.get_spark(app_name="fmx-incremental-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    # simulate three daily batches by doc_id residue
    days = [docs.filter(F.col("doc_id") % 3 == d) for d in range(3)]

    for day, batch in enumerate(days):
        n_in = batch.count()

        if day == 0:
            fresh = incremental_dedup(
                batch, spark.createDataFrame([], "content_hash string"),
                "doc_id", "text")
        else:
            seen = spark.read.parquet(store_hashes)
            fresh = incremental_dedup(batch, seen, "doc_id", "text")
        n_exact = fresh.count()

        if day > 0:
            # near-dup decontamination vs accumulated corpus: the batch
            # is signed fresh; the BASE side reads the persisted
            # signature store — the historical text is never touched
            base_sigs = spark.read.parquet(store_docs).select(
                "doc_id", "text")  # (store keeps text for this demo;
            # a production store would persist _minhash_wide's output
            # and skip re-signing — same join, zero base compute)
            dup_ids = (minhash_cross_pairs(
                fresh, base_sigs, "doc_id", "text",
                num_hashes=NUM_HASHES, bands=BANDS, shingle_n=SHINGLE_N)
                .select(F.col("batch_id").alias("doc_id")).distinct())
            fresh = fresh.join(dup_ids, "doc_id", "left_anti")
        n_clean = fresh.count()

        # append survivors + artifacts
        (fresh.drop("content_hash").write.mode("append")
         .parquet(store_docs))
        (fresh.select("content_hash").write.mode("append")
         .parquet(store_hashes))

        # merge the day's HLL registers into the running state
        # (register-wise max — the distinct-user count over ALL history
        # without ever re-reading it)
        day_regs = hll_registers(
            fresh.withColumn("_g", F.lit("docs")), "_g", "doc_id")
        if day > 0:
            prev = spark.read.parquet(store_regs)
            day_regs = (prev.unionByName(day_regs)
                        .groupBy("_g", "_j").agg(F.max("m").alias("m")))
        day_regs.write.mode("overwrite").parquet(store_regs + "_new")
        # swap (registers are tiny; rewrite-and-rename is simplest)
        if os.path.exists(store_regs):
            shutil.rmtree(store_regs)
        os.rename(store_regs + "_new", store_regs)

        est = hll_fold(spark.read.parquet(store_regs), "_g").collect()[0]
        print(f"day {day}: batch {n_in} -> exact-fresh {n_exact} "
              f"-> near-dup-clean {n_clean}; store ~{est.approx_distinct} "
              f"distinct docs (HLL)")

    # compaction: three daily appends leave small files; rewrite the
    # store to ~target-size files (crash-safe swap inside)
    n_files_before = sum(1 for f in os.listdir(store_docs)
                         if f.endswith(".parquet"))
    n_files = compact_dataset(spark, store_docs, target_mb=64)
    total = spark.read.parquet(store_docs).count()
    print(f"compacted store: {n_files_before} files -> {n_files}; "
          f"{total} docs total at {store_docs}")
    spark.stop()


if __name__ == "__main__":
    main()
