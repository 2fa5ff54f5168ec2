from fmx.fm.classifier import FMClassifierModel, FMClassifierSGD  # noqa: F401
from fmx.fm.model import FMModel  # noqa: F401
from fmx.fm.serving import fm_score_expr, score_stream  # noqa: F401
from fmx.fm.sgd import FMRegressorSGD  # noqa: F401
