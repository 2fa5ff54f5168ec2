"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small) query
  set against the corpus, JVM-native dot products, per-query top-k via
  ranking window.  The baseline and the verifier.
- ``random_projection_lsh``: sign-LSH bucketing (random hyperplanes
  derived from md5 hashes — engine-portable, deterministic).  The scale
  path: candidates share a bucket key, so search is an equi-join instead
  of a cross join; recall tunable via #planes / #tables.
- ``ivf_topk``: IVF-style coarse quantization — assign every vector to
  its nearest of C centroids, probe only the query's cell.

At 100 TB the corpus side never broadcasts; the query side does.  All
plans keep the corpus scan pruned to (id, vector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fmx.core import linalg as L

__all__ = ["cosine_topk", "random_projection_lsh", "lsh_topk", "ivf_topk"]


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 5,
                query_id: str = "query_id") -> DataFrame:
    """Exact cosine top-k: (query_id, id, cosine, rank).

    ``queries`` is broadcast (ANN queries are few); the corpus streams
    through one narrow stage — no shuffle of the corpus until the final
    per-query top-k (a k-row heap per partition via window + filter).
    Rank is deterministic: ties broken on corpus id after rounding.
    """
    # norms are hoisted out of the pair loop: query norms computed once
    # in the broadcast side, corpus norms once per corpus row — the
    # per-pair work is a single dot-product fold
    q = F.broadcast(
        queries.select(F.col(id_col).alias(query_id),
                       F.col(vec_col).alias("_qv"),
                       L.vec_norm(vec_col).alias("_qn")))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"),
                      L.vec_norm(vec_col).alias("_cn"))
    sim = (c.crossJoin(q)
           .filter(F.col(id_col) != F.col(query_id))
           .select(query_id, id_col,
                   F.round(
                       F.when((F.col("_qn") > 0) & (F.col("_cn") > 0),
                              L.vec_dot("_qv", "_cv")
                              / (F.col("_qn") * F.col("_cn")))
                       .otherwise(F.lit(0.0)), 6).alias("cosine")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(id_col))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _plane_component(p: int, i) -> F.Column:
    """Deterministic hyperplane component in [-1, 1): md5-derived so any
    engine can replay it (DuckDB oracle does)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"plane:{p}:"),
                                          i.cast("string"))), 1, 15),
               16, 10).cast("double")
    return h / F.lit(float(2 ** 59)) - F.lit(1.0)


def random_projection_lsh(df: DataFrame, id_col: str, vec_col: str,
                          num_planes: int = 8) -> DataFrame:
    """Sign-LSH bucket per vector: (id, bucket) where bucket is the
    bit-string of sign(v·h_p) for md5-derived hyperplanes h_p.

    Computed in long format: explode to (id, pos, x), join nothing —
    the plane component is a *function* of (p, pos), so each projection
    is one hash-agg over k·P rows per vector.
    """
    ex = _as_double(df, vec_col).select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "x"))
    projs = [
        F.sum(F.col("x") * _plane_component(p, F.col("pos"))).alias(f"_d{p}")
        for p in range(num_planes)]
    wide = ex.groupBy(id_col).agg(*projs)
    bucket = F.concat(*[
        F.when(F.col(f"_d{p}") >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(num_planes)])
    return wide.select(F.col(id_col), bucket.alias("bucket"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, num_planes: int = 6,
             query_id: str = "query_id") -> DataFrame:
    """ANN top-k: candidates = same sign-LSH bucket; exact cosine rerank
    within the bucket.  The corpus-side work is an equi-join on bucket —
    at 10⁹ vectors this is the difference between feasible and not."""
    cb = random_projection_lsh(corpus, id_col, vec_col, num_planes)
    qb = random_projection_lsh(queries, id_col, vec_col, num_planes)
    c = corpus.join(cb, id_col)
    q = (queries.join(qb, id_col)
         .select(F.col(id_col).alias(query_id), F.col(vec_col).alias("_qv"),
                 "bucket"))
    cand = (c.join(F.broadcast(q), "bucket")
            .filter(F.col(id_col) != F.col(query_id)))
    sim = cand.select(
        query_id, id_col,
        F.round(L.cosine_similarity("_qv", F.col(vec_col)), 6).alias("cosine"))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(id_col))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, num_cells: int = 8,
             query_id: str = "query_id") -> DataFrame:
    """IVF-flat ANN: coarse cells seeded from the first ``num_cells``
    corpus vectors (deterministic, training-free); every vector is
    assigned to its max-cosine cell; queries probe one cell.

    Cell assignment broadcasts the centroids; probing is an equi-join on
    cell — corpus is never cross-joined.
    """
    cents = F.broadcast(
        corpus.orderBy(id_col).limit(num_cells)
        .select(F.monotonically_increasing_id().alias("_cell"),
                F.col(vec_col).alias("_centroid")))

    def assign(df: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy(id_col).orderBy(
            F.col("_sim").desc(), F.col("_cell"))
        return (df.crossJoin(cents)
                .withColumn("_sim", L.cosine_similarity(vec_col, "_centroid"))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(df["*"], F.col("_cell").alias(out)))

    c = assign(corpus, "cell")
    q = (assign(queries, "cell")
         .select(F.col(id_col).alias(query_id), F.col(vec_col).alias("_qv"),
                 "cell"))
    sim = (c.join(F.broadcast(q), "cell")
           .filter(F.col(id_col) != F.col(query_id))
           .select(query_id, id_col,
                   F.round(L.cosine_similarity("_qv", F.col(vec_col)), 6)
                   .alias("cosine")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(id_col))
    return (sim.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
