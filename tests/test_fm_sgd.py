"""FMRegressorSGD training tests: convergence, determinism, pipeline
compatibility (reference SGD loop SGD.scala:88-216; sample app
Sample.scala:16-73 exercises CrossValidator)."""

import random

import pytest
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.linalg import Vectors

from fmx.fm import FMModel, FMRegressorSGD


def synthetic_fm_data(spark, n=400, seed=7):
    """y = 0.5 + 0.3*x0 - 0.2*x1 + 0.4*x0*x2 + noise, scaled into [0,1]."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        x = [rng.uniform(0, 1) for _ in range(4)]
        y = 0.2 + 0.3 * x[0] - 0.2 * x[1] + 0.4 * x[0] * x[2] \
            + rng.gauss(0, 0.01)
        rows.append((Vectors.dense(x), min(max(y, 0.0), 1.0)))
    return spark.createDataFrame(rows, ["features", "label"])


def test_sgd_loss_decreases_and_beats_bias(spark):
    df = synthetic_fm_data(spark).cache()
    est = FMRegressorSGD(dimFactorization=4, maxIter=8, miniBatchFraction=0.125,
                         regParam=0.0, stepSize=0.5, initialSd=0.01, seed=42)
    model = est.fit(df)
    losses = est.training_loss_
    assert len(losses) >= 6
    assert losses[-1] < losses[0] * 0.9, losses

    pred = model.transform(df)
    mae = RegressionEvaluator(metricName="mae").evaluate(pred)
    assert mae < 0.12, mae


def test_sgd_deterministic_given_seed(spark):
    df = synthetic_fm_data(spark, n=120).cache()
    kw = dict(dimFactorization=3, maxIter=4, miniBatchFraction=0.25,
              regParam=0.01, stepSize=0.5, seed=99)
    m1 = FMRegressorSGD(**kw).fit(df)
    m2 = FMRegressorSGD(**kw).fit(df)
    w1 = sorted((r.featureId, round(r.strength, 12))
                for r in m1.strength.collect())
    w2 = sorted((r.featureId, round(r.strength, 12))
                for r in m2.strength.collect())
    assert w1 == w2


def test_l1_shrinkage_drives_weights_to_zero(spark):
    df = synthetic_fm_data(spark, n=100).cache()
    est = FMRegressorSGD(dimFactorization=3, maxIter=3, miniBatchFraction=0.34,
                         regParam=50.0, stepSize=1.0, seed=5)
    model = est.fit(df)
    rows = model.strength.collect()
    assert all(r.strength == 0.0 for r in rows)
    assert all(all(v == 0.0 for v in r.vec) for r in model.factors.collect())


def test_cross_validator_compat(spark):
    """The reference's only end-to-end app runs under CrossValidator +
    RegressionEvaluator (Sample.scala:41-63, M7)."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    df = synthetic_fm_data(spark, n=160).cache()
    fm = FMRegressorSGD(dimFactorization=2, maxIter=3, miniBatchFraction=0.34,
                        stepSize=0.5, seed=3)
    grid = (ParamGridBuilder()
            .addGrid(fm.regParam, [1e-6, 0.0])
            .build())
    cv = CrossValidator(estimator=fm, estimatorParamMaps=grid,
                        evaluator=RegressionEvaluator(metricName="mae"),
                        numFolds=2, seed=11)
    cv_model = cv.fit(df)
    out = cv_model.transform(df)
    assert out.count() == 160
    assert "prediction" in out.columns


def test_fit_long_format(spark):
    """Long-format training: no feature vectors anywhere; converges and
    is deterministic under the seed."""
    from pyspark.sql import functions as F

    df = synthetic_fm_data(spark, n=200, seed=21)
    from fmx.core.linalg import explode_vector
    long_df = explode_vector(
        df.withColumn("sampleId", F.monotonically_increasing_id()),
        "features", id_cols=["sampleId", "label"]).cache()
    long_df.count()

    est = FMRegressorSGD(dimFactorization=3, maxIter=4,
                         regParam=0.0, stepSize=0.5, seed=77,
                         fitIntercept=True)
    m1 = est.fit_long(long_df)
    losses1 = list(est.training_loss_)
    assert losses1[-1] < losses1[0], losses1

    est2 = FMRegressorSGD(dimFactorization=3, maxIter=4,
                          regParam=0.0, stepSize=0.5, seed=77,
                          fitIntercept=True)
    est2.fit_long(long_df)
    assert [round(x, 9) for x in est2.training_loss_] == \
           [round(x, 9) for x in losses1]

    out = m1.transform(df)
    assert out.count() == df.count()


def test_cross_check_builtin_fmregressor(spark):
    """SURVEY §5 plan item (3): sanity-check our SGD against Spark's
    built-in pyspark.ml.regression.FMRegressor on the same synthetic FM
    data — different optimizers (AdamW vs decayed SGD), so the contract
    is 'both clearly beat the constant-mean baseline', not equality."""
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.regression import FMRegressor
    from pyspark.sql import functions as F

    df = synthetic_fm_data(spark, n=300, seed=13).cache()
    mean_label = df.agg(F.avg("label")).first()[0]
    baseline_mae = df.agg(
        F.avg(F.abs(F.col("label") - F.lit(mean_label)))).first()[0]
    ev = RegressionEvaluator(metricName="mae")

    builtin = FMRegressor(factorSize=4, maxIter=50, stepSize=0.1, seed=1)
    mae_builtin = ev.evaluate(builtin.fit(df).transform(df))

    ours = FMRegressorSGD(dimFactorization=4, maxIter=8,
                          miniBatchFraction=0.125, regParam=0.0,
                          stepSize=0.5, seed=42, fitIntercept=True)
    mae_ours = ev.evaluate(ours.fit(df).transform(df))

    assert mae_builtin < baseline_mae * 0.8
    assert mae_ours < baseline_mae * 0.8, (mae_ours, baseline_mae)
    # and within a loose band of the heavily-iterated builtin
    assert mae_ours < max(3 * mae_builtin, 0.15), (mae_ours, mae_builtin)


def test_fit_intercept_learns_bias(spark):
    """fitIntercept=True (our opt-in extension: the reference mixes in
    HasFitIntercept but never updates w0) must learn a constant shift
    the weights alone struggle with."""
    import random
    rng = random.Random(3)
    rows = [(Vectors.dense([rng.uniform(0, 0.1) for _ in range(3)]),
             0.7 + rng.gauss(0, 0.01)) for _ in range(200)]
    df = spark.createDataFrame(rows, ["features", "label"]).cache()
    kw = dict(dimFactorization=2, maxIter=5, miniBatchFraction=0.2,
              regParam=0.0, stepSize=1.0, seed=4, minLabel=0.0, maxLabel=1.0)
    with_b = FMRegressorSGD(**kw, fitIntercept=True)
    model_b = with_b.fit(df)
    without = FMRegressorSGD(**kw)
    model_0 = without.fit(df)
    assert model_0.global_bias == 0.0
    assert 0.3 < model_b.global_bias <= 0.9
    assert with_b.training_loss_[-1] < without.training_loss_[-1] * 0.5


def test_model_params_flow_from_estimator(spark):
    df = synthetic_fm_data(spark, n=60).cache()
    est = FMRegressorSGD(dimFactorization=2, maxIter=2, miniBatchFraction=0.5,
                         seed=1, minLabel=0.0, maxLabel=1.0,
                         predictionCol="p2")
    model = est.fit(df)
    assert isinstance(model, FMModel)
    assert model.getPredictionCol() == "p2"
    assert model.getMinLabel() == 0.0 and model.getMaxLabel() == 1.0
    out = model.transform(df)
    stats = out.selectExpr("min(p2) lo", "max(p2) hi").first()
    assert stats.lo >= 0.0 and stats.hi <= 1.0
