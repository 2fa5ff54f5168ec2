"""Online FM training: per-micro-batch SGD steps."""

import pytest
from pyspark.sql import functions as F

from fmx.fm import FMRegressorSGD
from fmx.fm.online import OnlineFMTrainer


def test_online_steps_reduce_loss(spark):
    """Feeding the same distribution repeatedly through _sgd_step (the
    foreachBatch unit) must reduce loss across steps."""
    from tests.test_fm_sgd import synthetic_fm_data

    df = synthetic_fm_data(spark, n=150, seed=31).cache()
    est = FMRegressorSGD(dimFactorization=3, regParam=0.0, stepSize=0.5,
                         seed=5, fitIntercept=True)
    trainer = OnlineFMTrainer(estimator=est)
    for i in range(3):
        trainer.process_batch(df, i)
    assert len(trainer.losses) == 3
    assert trainer.losses[-1] < trainer.losses[0]
    model = trainer.model()
    out = model.transform(df)
    assert out.count() == 150


def test_online_training_through_real_stream(spark, sf_dir):
    """The trainer attached to an actual file stream learns a constant
    target through the streaming machinery."""
    from fmx.streaming.ops import read_events_stream

    est = FMRegressorSGD(dimFactorization=2, regParam=0.0, stepSize=1.0,
                         seed=7, fitIntercept=True,
                         minLabel=0.0, maxLabel=1.0)
    trainer = OnlineFMTrainer(estimator=est)
    stream = read_events_stream(spark, sf_dir)
    feats = stream.select(
        F.array((F.col("value") / 100.0), F.lit(0.5)).alias("features"),
        F.lit(0.7).cast("double").alias("label"))
    q = trainer.train(feats)
    q.awaitTermination(120)
    q.stop()
    assert trainer.step_count >= 1
    assert trainer.losses
    # one fitIntercept step on constant labels moves w0 toward 0.7
    assert 0.0 < trainer.w0 <= 0.9
    model = trainer.model()
    probe = spark.createDataFrame([([0.1, 0.5],)], "features array<double>")
    p = model.transform(probe).first().prediction
    assert p == pytest.approx(trainer.w0, abs=0.5)
