"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship FM-predict dataflow at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extension layer) with DuckDB oracle
SQL where the semantics are ANSI-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full Factorization Machines batch inference
    (explode -> param joins -> two-level agg -> scalar combine) over the
    embeddings table with formula-derived parameters."""
    from fmx.queries.fm_queries import fm_predict

    return fm_predict(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query (SURVEY.md §2 +
    extension layer)."""
    import fmx.queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted only for the
    deliberately non-SQL-expressible ops (IVF argmax assignment,
    mapInPandas featurizer)."""
    import fmx.queries as Q

    return Q.oracle_sql()
