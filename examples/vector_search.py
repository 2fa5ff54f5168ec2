"""End-to-end vector-search pipeline over the embeddings table — the
similarity-stack workflow:

  load -> L2 normalize -> int8 quantize (serving corpus) ->
  sign-LSH bucketed ANN -> recall check vs brute-force exact top-k

Normalization turns cosine into dot products; quantization shows the
4x memory cut for the corpus side; the LSH path is the 100 TB shape
(bucket equi-join, never all-pairs) and its recall is measured against
the exact answer on the same data.

Run: python examples/vector_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.operators import similarity as S
from fmx.sources import load_table

K = 5
N_QUERIES = 20


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = fmx.get_spark(app_name="fmx-vector-search")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()

    norm = S.normalize_embeddings(emb, "vec_id")
    avg_norm = norm.agg(F.round(F.avg("l2_norm"), 4)).first()[0]
    quant = S.quantize_embeddings(emb, "vec_id")
    avg_scale = quant.agg(F.round(F.avg("scale"), 6)).first()[0]
    print(f"corpus: {n} vectors, avg L2 norm {avg_norm}, "
          f"avg int8 scale {avg_scale}")

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=K)
    total = exact.count()
    for probe, label in [(False, "single-probe"), (True, "multi-probe")]:
        approx = S.lsh_topk(emb, queries, "vec_id", "embedding", k=K,
                            num_planes=4, multiprobe=probe)
        hits = (exact.select("query_id", "vec_id")
                .join(approx.select("query_id", "vec_id"),
                      ["query_id", "vec_id"]).count())
        print(f"LSH {label} recall@{K}: {hits}/{total} = "
              f"{hits / total:.3f} (bucket equi-join; corpus side never "
              f"fans out)")

    # PQ/ADC: the memory path — corpus becomes m=4 codes per vector
    # (~128x smaller resident index); distance tables broadcast per
    # query.  PQ approximates L2, so measure against exact L2 top-k.
    pq = S.pq_topk(emb, queries, "vec_id", "embedding", k=K, m=4,
                   num_codes=16, dim=64)
    ex = emb.select("vec_id", F.posexplode("embedding").alias("p", "x"))
    qx = (ex.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("query_id"), "p",
                  F.col("x").alias("qx")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    exact_l2 = (ex.join(qx, "p")
                .filter(F.col("vec_id") != F.col("query_id"))
                .groupBy("query_id", "vec_id")
                .agg(F.sum((F.col("x") - F.col("qx")) ** 2).alias("d2"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= K))
    hits = (exact_l2.select("query_id", "vec_id")
            .join(pq.select("query_id", "vec_id"),
                  ["query_id", "vec_id"]).count())
    print(f"PQ ADC recall@{K} vs exact L2: {hits}/{total} = "
          f"{hits / total:.3f} (4x16 codebook, scan side reads 4 ints "
          f"per vector)")

    # Two-stage retrieval: PQ shortlist (k_cand=25 from codes) -> exact
    # cosine rerank of just the shortlist.  Recall comes from the cheap
    # compressed scan, precision from an exact pass that touches only
    # k_cand full vectors per query.
    rr = S.pq_rerank_topk(emb, queries, "vec_id", "embedding", k=K,
                          k_cand=25, m=4, num_codes=16, dim=64)
    exact_cos = S.cosine_topk(emb, queries, "vec_id", "embedding", k=K)
    rr_hits = (exact_cos.select("query_id", "vec_id")
               .join(rr.select("query_id", "vec_id"),
                     ["query_id", "vec_id"]).count())
    print(f"PQ->exact rerank recall@{K} vs exact cosine: "
          f"{rr_hits}/{total} = {rr_hits / total:.3f}")

    spark.stop()


if __name__ == "__main__":
    main()
