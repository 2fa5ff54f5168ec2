"""FM model serving: score rows with ZERO shuffles.

``fm_score_expr`` compiles a trained model into one Catalyst column
expression — the parameter tables are collected to the driver (this is
the explicitly-small-model path: |features| x (1+k) doubles must fit on
the driver, the same budget as a broadcast join) and embedded as array
literals.  Scoring is then a per-row fold: usable in batch maps, on
Structured Streams (where the relational predict path's groupBy would
need watermark machinery), and inside any other expression.

The relational ``FMModel.transform`` stays the scale path for huge
parameter tables; this is its low-latency dual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fmx.fm.model import FMModel

__all__ = ["fm_score_expr", "score_stream"]


def fm_score_expr(model: FMModel, features: Column | str,
                  n_features: int | None = None) -> Column:
    """Compile ``model`` into a column expression over a dense
    ``array<double>`` features column.

    ŷ = w0 + Σ_i w_i·x_i + ½·Σ_f [(Σ_i v_if·x_i)² − Σ_i v_if²·x_i²]
    with w and v_f embedded as array literals; each Σ_i is one
    ``aggregate(zip_with(...))`` fold — no joins, no aggregations.
    """
    feat = F.col(features) if isinstance(features, str) else features
    k = model.dim_factorization

    rows = {int(r["featureId"]): (float(r["strength"]), list(r["vec"]))
            for r in model.strength.join(model.factors, "featureId")
                                   .collect()}
    dim = (n_features if n_features is not None
           else (max(rows) + 1 if rows else 0))
    w = [rows.get(i, (0.0, [0.0] * k))[0] for i in range(dim)]
    v = [[rows.get(i, (0.0, [0.0] * k))[1][f] for i in range(dim)]
         for f in range(k)]

    # zip_with pads the shorter side with NULLs when the feature array
    # length differs from the compiled dim (easy with sparse-trained
    # models where dim = max(featureId)+1 undershoots); coalesce each
    # product to 0.0 so a mismatch contributes nothing instead of
    # nulling the whole score.  Pass n_features for sparse-trained models.
    def _dot(arr, lit_arr, term):
        return F.aggregate(
            F.zip_with(arr, lit_arr,
                       lambda x, c: F.coalesce(term(x, c), F.lit(0.0))),
            F.lit(0.0), lambda a, x: a + x)

    w_lit = F.array(*[F.lit(x) for x in w])
    lin = _dot(feat, w_lit, lambda x, wi: x * wi)
    pred = F.lit(model.global_bias) + lin
    for f in range(k):
        vf = F.array(*[F.lit(x) for x in v[f]])
        s = _dot(feat, vf, lambda x, vi: x * vi)
        q = _dot(feat, vf, lambda x, vi: x * x * vi * vi)
        pred = pred + 0.5 * (s * s - q)

    lo, hi = model.getMinLabel(), model.getMaxLabel()
    if lo is not None:
        pred = F.greatest(pred, F.lit(float(lo)))
    if hi is not None:
        pred = F.least(pred, F.lit(float(hi)))
    return pred


def score_stream(model: FMModel, stream: DataFrame, features_col: str,
                 n_features: int | None = None,
                 output_col: str = "prediction") -> DataFrame:
    """Attach FM predictions to a streaming DataFrame — stateless
    per-row scoring, valid in any output mode."""
    return stream.withColumn(
        output_col, fm_score_expr(model, features_col, n_features))
