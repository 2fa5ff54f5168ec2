"""Training-data selection workflow over the documents table — the
"which documents make the cut, in what order, against what control"
loop of a pretraining data team, composed from engine operators:

  1. score: lexical diversity + token count per document (one scan)
  2. frontier: Pareto skyline of (diversity ^, length ^) — the
     documents no other document beats on both axes (bucketed
     decomposition, no global window)
  3. mix: token-budget selection per source (cumulative window,
     md5-stable under corpus growth)
  4. curriculum: easy-to-hard staging of the selected mix
  5. control: length-matched en/de pairs for a fair quality eval
  6. DSIR importance scoring against a target slice (arXiv:2302.03169)
  7. split-leakage audit: near-dups crossing the train/eval boundary

Run: python examples/data_selection.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.dedup import split_leakage
from fmx.operators.sampling import (dsir_weights, hash_uniform01,
                                    matched_pairs, pareto_frontier,
                                    token_budget_mix)
from fmx.operators.text import cluster_terms
from fmx.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-data-selection")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    # 1.+2. quality/cost axes -> Pareto frontier
    base = docs.select(
        "doc_id", "source",
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks)).alias("lex_div"),
        (-F.size(toks).cast("double")).alias("neg_tokens"))
    frontier = pareto_frontier(base, "lex_div", "neg_tokens", "doc_id")
    n_all, n_front = docs.count(), frontier.count()
    print(f"Pareto frontier: {n_front}/{n_all} documents are undominated "
          "on (diversity, length)")

    # 3. token-budget mix: every source contributes up to 800 tokens
    mix = token_budget_mix(docs, "source", "doc_id", F.size(toks),
                           budgets={}, default_budget=800, seed=42)
    per_src = (mix.groupBy("source")
               .agg(F.count("*").alias("docs"),
                    F.max("cum_tokens").alias("tokens"))
               .orderBy("source"))
    print("token-budget mix (first 5 sources):")
    for r in per_src.limit(5).collect():
        print(f"  {r.source}: {r.docs} docs, {r.tokens} tokens")

    # 4. what is each source about? (c-TF-IDF readout on the mix)
    terms = cluster_terms(mix, "source", "text", k=3)
    print("distinctive terms of src0:",
          [r.token for r in
           terms.filter(F.col("source") == "src0")
           .orderBy("term_rank").collect()])

    # 5. matched-control eval pairs (length-confound removed)
    pairs = matched_pairs(docs, "lang", "en", "de", "n_chars",
                          "doc_id", bucket_width=128, seed=42)
    n_pairs = pairs.count()
    spread = pairs.agg(
        F.round(F.avg(F.abs(F.col("treat_len") - F.col("control_len"))), 1)
        .alias("d")).first().d
    print(f"matched en/de pairs: {n_pairs}, mean |len diff| = {spread} chars"
          " (unmatched sampling would not control this)")

    # 6. DSIR importance scoring: which documents look most like the
    # English slice?  (hashed-unigram log-likelihood ratio, mean per doc)
    scored = dsir_weights(docs, "doc_id", "text",
                          F.col("lang") == "en", num_buckets=256)
    top = (scored.join(docs.select("doc_id", "lang"), "doc_id")
           .orderBy(F.col("weight").desc(), "doc_id").limit(100))
    en_share = top.agg(
        F.round(F.avg(F.when(F.col("lang") == "en", 1.0).otherwise(0.0)), 2)
        .alias("s")).first().s
    print(f"DSIR top-100: {en_share:.0%} en "
          "(importance weights find the target slice without labels)")

    # 7. leakage audit: do any near-duplicates cross the train/eval
    # boundary of the production hash split?
    u = hash_uniform01("doc_id", "split", 42)
    split = (F.when(u < 0.9, F.lit("train"))
             .when(u < 0.95, F.lit("val")).otherwise(F.lit("test")))
    leaks = split_leakage(docs, "doc_id", "text", split)
    n_leaks = leaks.count()
    print(f"split-leakage audit: {n_leaks} near-dup pair(s) cross the "
          "90/5/5 split -> route to the eval-dedup pass before training")

    spark.stop()


if __name__ == "__main__":
    main()
