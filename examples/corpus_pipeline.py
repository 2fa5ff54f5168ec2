"""End-to-end training-data curation pipeline over the documents table —
the LLM-data workflow the extension operators exist for:

  load -> URL provenance (canonicalize, per-domain cap, temperature
  mixture) -> quality + entropy + repetition filters -> language
  annotate -> exact dedup -> near-dup dedup (MinHash LSH + connected
  components, keep canonical) -> benchmark decontamination ->
  token accounting -> chunk to context windows -> pack into
  fixed-budget sequences -> deterministic train/val split ->
  partitioned parquet out

Every stage is a pure DataFrame -> DataFrame function; each funnel
boundary is lazily localCheckpointed so the per-stage diagnostic
counts and the final write each execute only their own stage, not
the whole prefix again (the funnel was quadratic in pipeline depth
without the cuts).

Run: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators import dedup as D
from fmx.operators import text as X
from fmx.sources import load_table
from fmx.sources.sinks import write_partitioned


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else os.path.join(tempfile.gettempdir(), "fmx_corpus_out"))
    spark = fmx.get_spark(app_name="fmx-corpus-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. URL provenance: canonicalize a (synthesized) crawl URL, cap
    #    docs per domain, then temperature-flatten the domain mixture —
    #    crawls are power-law over hosts, so both steps run BEFORE any
    #    expensive per-document work
    from fmx.operators.sampling import temperature_mixture
    from fmx.operators.web import per_domain_cap, url_normalize

    with_url = docs.withColumn(
        "url", F.concat(F.lit("https://www."), F.col("source"),
                        F.lit(".example.com/docs/"),
                        F.col("doc_id").cast("string"),
                        F.lit("?utm_source=crawl")))
    capped = per_domain_cap(url_normalize(with_url, "url"), "domain",
                            cap=1000,
                            order_cols=[F.col("n_chars").desc(),
                                        F.col("doc_id")])
    mixed = temperature_mixture(capped, "domain", "doc_id",
                                alpha=0.7, largest_frac=0.9)
    # each funnel stage is lazily localCheckpointed: the stage's count
    # materializes it ONCE, and every later stage (and the final write)
    # reads the cached parent instead of re-executing the whole prefix
    # — the funnel was quadratic in pipeline depth without this (~930
    # scheduling-floor stages at sf0.001; guide §1.1 recompute waste).
    # Values are unchanged: a checkpoint is a plan cut, not a transform.
    mixed = mixed.localCheckpoint(eager=False)
    n0b = mixed.count()
    docs = mixed.drop("url", "url_norm", "domain_rank")

    # 1. quality + entropy + language annotation (single-pass column
    #    expressions; entropy cuts both tails — repeated filler AND
    #    base64/binary spill), then the Gopher rule bundle as the hard
    #    gate (each rule independently auditable — the continuous
    #    quality score ranks, the rules gate)
    quality = X.quality_score(docs, "doc_id", "text")
    ent = X.char_entropy(docs, "doc_id", "text").select(
        "doc_id", "char_entropy")
    lang = X.language_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    # min/max_words widened to the synthetic corpus's 10-99-word range:
    # the defaults (20/90) would silently drop both tails of LEGITIMATE
    # docs here — the gate should catch junk, not the long tail
    rules = X.gopher_filters(docs, "doc_id", "text",
                             min_words=10,
                             max_words=200).select("doc_id", "passed")
    annotated = (docs.join(quality, "doc_id").join(ent, "doc_id")
                 .join(lang, "doc_id").join(rules, "doc_id"))
    kept = annotated.filter(
        (F.col("quality") >= 0.3)
        & F.col("char_entropy").between(1.5, 6.5)
        & F.col("passed")).drop("passed")
    kept = kept.localCheckpoint(eager=False)
    n1 = kept.count()

    # 2. exact dedup (md5 groupBy, keep min doc_id)
    canon = D.exact_dedup(kept, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id"))
    kept = kept.join(canon, "doc_id", "left_semi").localCheckpoint(eager=False)
    n2 = kept.count()

    # 3. near-dup dedup: LSH candidates -> exact-Jaccard verify ->
    #    connected components -> keep cluster minimum
    pairs = D.minhash_lsh_pairs(kept, "doc_id", "text",
                                verify_threshold=0.5)
    deduped = D.dedup_keep_canonical(kept, pairs.select("id_a", "id_b"),
                                     "doc_id").localCheckpoint(eager=False)
    n3 = deduped.count()

    # 3b. drop boilerplate/degenerate docs (Gopher repetition filters)
    rep = X.repetition_stats(deduped, "doc_id", "text")
    deduped = (deduped.join(rep, "doc_id")
               .filter((F.col("top_word_frac") < 0.5)
                       & (F.col("dup_word_frac") < 0.9))
               .drop("top_word_frac", "dup_word_frac", "top_bigram_frac")
               .localCheckpoint(eager=False))
    n4 = deduped.count()

    # 3c. span-level hygiene: drop docs that are mostly cross-doc
    #     boilerplate even though no whole-document duplicate exists
    spans = D.duplicate_spans(deduped, "doc_id", "text", n=8)
    deduped = (deduped.join(spans.select("doc_id", "dup_span_ratio"),
                            "doc_id", "left")
               .filter(F.coalesce(F.col("dup_span_ratio"), F.lit(0.0))
                       < 0.8)
               .drop("dup_span_ratio")
               .localCheckpoint(eager=False))
    n4b = deduped.count()

    # 3d. model-based quality gate: hashed linear classifier score
    #     (fasttext-shape inference — md5 weights stand in for a
    #     trained table, which would drop in as a broadcast join)
    scored = X.hashed_linear_score(deduped, "doc_id", "text")
    deduped = (deduped.join(scored.select("doc_id", "keep"), "doc_id")
               .filter(F.col("keep")).drop("keep")
               .localCheckpoint(eager=False))
    n5b = deduped.count()

    # 3e. benchmark decontamination: drop any doc that shares an LSH
    #     band with the held-out "benchmark" slice (here: src19, the
    #     same cross-corpus shape as a real eval-set sweep) — the
    #     benchmark is never self-joined, and at production scale its
    #     signature table is a persisted artifact
    bench = load_table(spark, sf_dir, "documents").filter(
        F.col("source") == "src19")
    contaminated = D.minhash_cross_pairs(
        deduped, bench, "doc_id", "text").select(
        F.col("batch_id").alias("doc_id")).distinct()
    deduped = (deduped.join(contaminated, "doc_id", "left_anti")
               .localCheckpoint(eager=False))
    n5c = deduped.count()

    # 4. token accounting for the surviving corpus
    counts = X.token_counts(deduped, "doc_id", "text")
    total = counts.agg(F.sum("ws_tokens").alias("ws"),
                       F.sum("bpe_tokens").alias("bpe")).first()

    # 5. chunk to 64-token context windows, pack into 512-token
    #    sequences, split train/val deterministically by doc hash
    from fmx.operators.sampling import hash_split, pack_sequences

    chunks = X.chunk_tokens(deduped, "doc_id", "text",
                            chunk_size=64, stride=64)
    chunk_ids = chunks.select(
        (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("chunk_key"),
        "n_tokens")
    packed = pack_sequences(chunk_ids, "chunk_key", "n_tokens", budget=512)
    n_seqs = packed.select("bucket", "bin").distinct().count()
    split = hash_split(deduped, "doc_id",
                       {"train": 0.95, "val": 0.05}, seed=7)

    # 6. partitioned write (hive layout by split then language)
    write_partitioned(split.select("doc_id", "text", "pred_lang",
                                   "quality", "split"),
                      out_dir, ["split", "pred_lang"],
                      files_per_partition=2)

    print(f"loaded {n0} -> domain-capped+mixed {n0b} "
          f"-> quality+entropy-filtered {n1} -> exact-deduped {n2} "
          f"-> near-dup-deduped {n3} -> repetition-filtered {n4} "
          f"-> span-hygiene {n4b} -> classifier-gated {n5b} "
          f"-> decontaminated {n5c}")
    print(f"surviving tokens: ws={total.ws} bpe={total.bpe}; "
          f"packed into {n_seqs} 512-token sequences")
    print(f"wrote {out_dir} (partitioned by split, pred_lang)")
    spark.stop()


if __name__ == "__main__":
    main()
