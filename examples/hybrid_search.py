"""Hybrid retrieval pipeline: lexical BM25 + vector ANN fused by
reciprocal rank — the two-tower search stack every RAG/search system
runs, composed entirely from engine operators:

  keyword side:  documents -> BM25 top-k (one corpus explode,
                 broadcast df/N/avgdl, TakeOrdered heaps)
  vector side:   embeddings -> IVF-PQ shortlist (residual codes,
                 cell-pruned ADC) -> exact cosine rerank
  fusion:        rrf(q, d) = sum 1/(60 + rank) over both rankings —
                 corpus-size-independent (only the top-k' rows fuse)

The synthetic tables share the id space (doc_id == vec_id), standing
in for a corpus where every document carries both text and an
embedding.

Run: python examples/hybrid_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators.similarity import (cosine_topk, ivfpq_rerank_topk,
                                      ivfpq_topk, rrf_fuse)
from fmx.operators.text import bm25_topk
from fmx.sources import load_table

K = 5
SHORTLIST = 10
N_QUERIES = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-hybrid-search")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    # --- lexical side: one BM25 ranking per keyword bag.  A real
    # system derives the bag from the query text; here each query id
    # gets a fixed bag so the demo stays deterministic.
    bm = (bm25_topk(docs, "doc_id", "text",
                    terms=["dup", "spark", "merge"], k=SHORTLIST)
          .select(F.col("doc_id").alias("vec_id"), "rank"))
    # broadcast the single lexical ranking to every query id
    qids = queries.select(F.col("vec_id").alias("query_id"))
    lexical = qids.crossJoin(F.broadcast(bm))
    print(f"BM25 shortlist: {bm.count()} docs "
          f"(terms dup/spark/merge, k={SHORTLIST})")

    # --- vector side: IVF-PQ shortlist -> exact rerank
    vec = ivfpq_rerank_topk(emb, queries, "vec_id", "embedding",
                            k=SHORTLIST, k_cand=25)
    print(f"vector shortlist rows: {vec.count()} "
          f"(IVF cell-pruned PQ scan + {25}-candidate exact rerank)")

    fused = rrf_fuse([lexical.select("query_id", "vec_id",
                                     F.col("rank")),
                      vec.select("query_id", "vec_id", "rank")],
                     k=K)
    print("fused top results per query (rrf = 1/(60+r_lex) + "
          "1/(60+r_vec)):")
    for r in fused.filter(F.col("rank") <= 3).orderBy(
            "query_id", "rank").collect():
        print(f"  q={r.query_id} -> doc {r.vec_id} "
              f"rrf={r.rrf:.6f} rank={r.rank}")

    # sanity: fusion must keep vector-relevant results in the top-k
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=K)
    hits = (fused.select("query_id", "vec_id")
            .join(exact.select("query_id", "vec_id"),
                  ["query_id", "vec_id"]).count())
    total = exact.count()
    print(f"fused recall vs exact cosine top-{K}: {hits}/{total}")

    # IVF-PQ standalone readout (the cell-pruned compressed scan)
    ivfpq = ivfpq_topk(emb, queries, "vec_id", "embedding", k=K)
    h2 = (ivfpq.select("query_id", "vec_id")
          .join(exact.select("query_id", "vec_id"),
                ["query_id", "vec_id"]).count())
    print(f"ivf-pq recall vs exact cosine top-{K}: {h2}/{total} "
          f"(nprobe-limited; rerank path above is the serving shape)")

    spark.stop()


if __name__ == "__main__":
    main()
