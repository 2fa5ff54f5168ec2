"""End-to-end Structured Streaming demo over the events stream:

  read stream -> enrich with a static user dimension (broadcast join)
  -> score each event with a compiled FM expression (zero-shuffle)
  -> sessionize with a 30-minute gap (watermarked state)
  -> foreachBatch parquet sink (per-batch-id idempotent overwrite)

All four stages run in ONE streaming query; state is bounded by the
watermark.  Run: python examples/streaming_pipeline.py [sf_dir] [out]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import fmx
from fmx.fm import FMModel
from fmx.fm.serving import fm_score_expr
from fmx.sources import load_table
from fmx.streaming import ops as S


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = (sys.argv[2] if len(sys.argv) > 2
           else os.path.join(tempfile.gettempdir(), "fmx_stream_out"))
    spark = fmx.get_spark(app_name="fmx-streaming-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # static dimension + a small hand-set model, both driver-known
    dim = (load_table(spark, sf_dir, "events")
           .groupBy("user_id").agg(F.count("*").alias("lifetime_events")))
    model = FMModel(
        dim_factorization=2, global_bias=0.1,
        strength=spark.createDataFrame([(0, 0.4), (1, 0.05)],
                                       "featureId bigint, strength double"),
        factors=spark.createDataFrame([(0, [0.1, 0.0]), (1, [0.0, 0.1])],
                                      "featureId bigint, vec array<double>"))

    stream = S.read_events_stream(spark, sf_dir)
    enriched = S.enrich_stream(stream, dim)
    scored = enriched.withColumn(
        "engagement",
        fm_score_expr(model, F.array(
            (F.col("value") / 100.0),
            (F.col("lifetime_events") / 100.0).cast("double"))))
    sessions = (scored
                .withWatermark("ts", "2 hours")
                .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                         "user_id")
                .agg(F.count("*").alias("n_events"),
                     F.round(F.sum("engagement"), 4).alias("session_score"))
                .select("user_id",
                        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                        .alias("session_start"),
                        "n_events", "session_score"))

    q = S.write_foreach_batch_parquet(
        sessions, out, checkpoint=os.path.join(out + "_ckpt"))
    q.awaitTermination(300)

    # a parallel DQ gate on the same source: one-pass conditional
    # counts, mergeable across micro-batches (complete mode)
    dq = (S.stream_dq_counts(S.read_events_stream(spark, sf_dir))
          .writeStream.format("memory").queryName("dq_gate")
          .outputMode("complete").trigger(availableNow=True).start())
    dq.awaitTermination(120)

    result = spark.read.parquet(out)
    print(f"sessions written: {result.count()}")
    print("DQ gate:")
    spark.sql("SELECT * FROM dq_gate ORDER BY rule").show(truncate=False)
    result.orderBy(F.col("session_score").desc()).show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
