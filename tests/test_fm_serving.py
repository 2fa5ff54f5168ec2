"""fm_score_expr: the zero-shuffle serving path must reproduce the
relational predict path exactly, including on a real stream."""

import pytest
from pyspark.sql import functions as F

from fmx.fm.serving import fm_score_expr, score_stream
from tests.test_fm_model import GOLDEN, build_golden_model


def test_score_expr_matches_golden(spark):
    model = build_golden_model(spark)
    df = spark.createDataFrame(
        [(100, [1.0, 2.0, 1.5, -1.0]),
         (101, [0.5, 0.0, -1.5, 0.0]),   # dense form of the sparse golden row
         (103, [0.0, 0.0, 0.0, 0.0])],
        "rowId int, features array<double>")
    out = {r.rowId: r.p for r in df.select(
        "rowId", fm_score_expr(model, "features").alias("p")).collect()}
    assert out[100] == pytest.approx(23.77, abs=1e-8)
    assert out[101] == pytest.approx(5.275, abs=1e-8)
    # all-zero dense row: every term contributes 0 -> bias (the serving
    # path's equivalent of the empty-vector fallback)
    assert out[103] == pytest.approx(5.0, abs=1e-8)


def test_score_expr_no_shuffle_or_python(spark):
    model = build_golden_model(spark)
    df = spark.range(10).select(
        F.array(*[F.rand(seed=i) for i in range(4)]).alias("features"))
    plan = (df.select(fm_score_expr(model, "features").alias("p"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_score_stream_end_to_end(spark, sf_dir):
    """Score a real parquet-backed stream with a trained-shape model."""
    from fmx.streaming.ops import read_events_stream

    model = build_golden_model(spark)
    stream = read_events_stream(spark, sf_dir)
    feats = stream.select(
        "event_id",
        F.array(F.col("value"), F.lit(1.0), F.lit(0.5), F.lit(0.0))
        .alias("features"))
    scored = score_stream(model, feats, "features")
    q = (scored.writeStream.format("memory").queryName("scored")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM scored").collect()
    assert rows and all(r.prediction is not None for r in rows)
    # spot-check one row against the batch expression
    want = {r.event_id: r.p for r in
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("event_id",
                    F.array(F.col("value"), F.lit(1.0), F.lit(0.5), F.lit(0.0))
                    .alias("features"))
            .select("event_id", fm_score_expr(model, "features").alias("p"))
            .limit(50).collect()}
    got = {r.event_id: r.prediction for r in rows}
    for eid, p in want.items():
        assert got[eid] == pytest.approx(p, abs=1e-9)
    q.stop()
