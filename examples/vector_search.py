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

    spark.stop()


if __name__ == "__main__":
    main()
