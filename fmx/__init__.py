"""fmx — a PySpark-native analytics engine with the capabilities of
soonraah/fm_spark, rebuilt Spark-first.

The reference (https://github.com/soonraah/fm_spark) is a Factorization
Machines library on Spark 2.1/Scala whose entire dataflow is relational
operators over DataFrames (see SURVEY.md).  fmx re-expresses that surface
as idiomatic PySpark 4.x:

- ``fmx.core.linalg``   — native column-expression vector math (replaces the
  reference's 10 Scala UDFs + the ``VectorSum`` UDAF with Catalyst
  higher-order functions; whole-stage codegen friendly).
- ``fmx.fm``            — ``FMModel`` / ``FMRegressorSGD`` pyspark.ml
  Estimator/Model pair (reference parity: FactorizationMachinesModel.scala,
  FactorizationMachinesSGD.scala).
- ``fmx.operators``     — the relational capability layer (SURVEY.md §2
  declared queries) plus LLM-data-pipeline operators: dedup, similarity
  search, text analysis, multimodal columns.
- ``fmx.streaming``     — Structured Streaming variants (windows, sessions).
- ``fmx.sources``       — table loaders over the driver parquet test data.

Every operator is a pure DataFrame -> DataFrame function designed for a
multi-executor cluster: declarative plans (Catalyst optimizes), broadcast
hints for dimension tables, no driver-side collects in the dataflow,
seeded determinism throughout.
"""

__version__ = "0.1.0"

from fmx.session import get_spark, sql  # noqa: F401
