"""Binary FM classifier — logistic loss on top of the shared FM
dataflow.

Engine capability beyond the reference (README.md:12 lists regression +
mini-batch SGD only; libFM-family libraries pair the same factorized
model with a sigmoid link for classification).  Differences from
``FMRegressorSGD``:

- the per-sample error driving the gradients becomes σ(ŷ) − y (gradient
  of log-loss through the sigmoid link) instead of ŷ − y;
- the tracked loss is binary cross-entropy;
- the fitted model emits rawScore + probability + thresholded 0/1
  prediction.

Everything else (seeded init, disjoint mini-batches, lr decay, L1
shrinkage, lineage truncation, fitIntercept) is inherited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fmx.fm.model import FMModel
from fmx.fm.sgd import FMRegressorSGD

__all__ = ["FMClassifierSGD", "FMClassifierModel"]


def _sigmoid(c):
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-c))


def _unset(params_obj, param) -> None:
    # remove a param from both the set and default maps (pyspark's
    # clear() only touches the set map, and the regressor *defaults*
    # minLabel/maxLabel — which would clamp logits here)
    params_obj._paramMap.pop(param, None)
    params_obj._defaultParamMap.pop(param, None)


class FMClassifierModel(FMModel):
    """FMModel whose transform emits rawScore (the FM logit),
    probability = σ(rawScore), and prediction = 1{probability >=
    threshold}."""

    def __init__(self, threshold: float = 0.5, **kw):
        super().__init__(**kw)
        self.threshold = float(threshold)

    def _extra_metadata(self) -> dict:
        return {"threshold": self.threshold}

    def _restore_extra_metadata(self, extra: dict) -> None:
        self.threshold = float(extra.get("threshold", 0.5))

    def _transform(self, dataset: DataFrame) -> DataFrame:
        raw = super()._transform(dataset)
        p = self.getPredictionCol()
        return (raw.withColumnRenamed(p, "rawScore")
                .withColumn("probability", _sigmoid(F.col("rawScore")))
                .withColumn(p, (F.col("probability") >= self.threshold)
                            .cast("double")))


class FMClassifierSGD(FMRegressorSGD):
    """Trains the factorized model with logistic loss; labels must be
    0/1.  Raw scores are unbounded logits, so label clamping is
    disabled."""

    def __init__(self, threshold: float = 0.5, **kw):
        super().__init__(**kw)
        self._threshold = float(threshold)
        _unset(self, self.minLabel)
        _unset(self, self.maxLabel)

    def _error_and_loss(self, pred: DataFrame, label: str) -> DataFrame:
        prob = _sigmoid(F.col("pred"))
        eps = F.lit(1e-12)
        return (pred
                .withColumn("err", prob - F.col(label))
                .withColumn(
                    "loss_term",
                    -(F.col(label) * F.log(prob + eps)
                      + (1 - F.col(label)) * F.log(F.lit(1.0) - prob + eps))))

    def _fit(self, dataset: DataFrame) -> FMClassifierModel:
        reg_model = super()._fit(dataset)
        model = FMClassifierModel(
            threshold=self._threshold,
            dim_factorization=reg_model.dim_factorization,
            global_bias=reg_model.global_bias,
            strength=reg_model.strength,
            factors=reg_model.factors)
        model._resetUid(self.uid)
        self._copyValues(model)
        _unset(model, model.minLabel)
        _unset(model, model.maxLabel)
        model.parent = self
        return model
