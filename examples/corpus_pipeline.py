"""End-to-end training-data curation pipeline over the documents table —
the LLM-data workflow the extension operators exist for:

  load -> quality score -> language filter -> exact dedup ->
  near-dup dedup (MinHash LSH + connected components, keep canonical) ->
  token accounting -> partitioned parquet out

Every stage is a pure DataFrame -> DataFrame function; the whole
pipeline is one lazy plan until the final write.

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

    # 1. quality + language annotation (single-pass column expressions)
    quality = X.quality_score(docs, "doc_id", "text")
    lang = X.language_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    annotated = docs.join(quality, "doc_id").join(lang, "doc_id")
    kept = annotated.filter(F.col("quality") >= 0.3)
    n1 = kept.count()

    # 2. exact dedup (md5 groupBy, keep min doc_id)
    canon = D.exact_dedup(kept, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id"))
    kept = kept.join(canon, "doc_id", "left_semi")
    n2 = kept.count()

    # 3. near-dup dedup: LSH candidates -> exact-Jaccard verify ->
    #    connected components -> keep cluster minimum
    pairs = D.minhash_lsh_pairs(kept, "doc_id", "text",
                                verify_threshold=0.5)
    deduped = D.dedup_keep_canonical(kept, pairs.select("id_a", "id_b"),
                                     "doc_id")
    n3 = deduped.count()

    # 4. token accounting for the surviving corpus
    counts = X.token_counts(deduped, "doc_id", "text")
    total = counts.agg(F.sum("ws_tokens").alias("ws"),
                       F.sum("bpe_tokens").alias("bpe")).first()

    # 5. partitioned write (hive layout by predicted language)
    write_partitioned(deduped.select("doc_id", "text", "pred_lang", "quality"),
                      out_dir, ["pred_lang"], files_per_partition=2)

    print(f"loaded {n0} -> quality-filtered {n1} -> exact-deduped {n2} "
          f"-> near-dup-deduped {n3}")
    print(f"surviving tokens: ws={total.ws} bpe={total.bpe}")
    print(f"wrote {out_dir} (partitioned by pred_lang)")
    spark.stop()


if __name__ == "__main__":
    main()
