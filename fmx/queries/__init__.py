"""Query registry: every declared operator/query from SURVEY.md §2 plus
engine-capability and LLM-pipeline queries, each paired (where
SQL-expressible) with a DuckDB oracle statement over the same parquet
tables.

Conventions that make the driver's hash-compare deterministic:

- every aggregate/computed column is aliased identically in the Spark
  plan and the oracle SQL;
- integer outputs are cast to BIGINT and floats to DOUBLE **on both
  sides** (DuckDB's sum(int)->HUGEINT, length()->BIGINT etc. would
  otherwise mismatch Spark's types);
- doubles are rounded (2 for money sums, 4-6 elsewhere) in both engines;
- timestamps/dates are emitted as formatted strings (session tz = UTC);
- LIMIT queries carry a total ORDER BY (unique key suffix).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The external driver's correctness gate verifies a 50-entry prefix of
# this registry, so ordering is a coverage decision.  Cumulative driver
# coverage so far: r01 green-lit relational/relational2 + the first
# window/TPC-H batch; r02 green-lit fm, tpch, dedup, ann, text, w1-w4.
# Round 3 therefore promotes, via _PRIORITY below, exactly the queries
# that have never had a driver row (the 30 round-2 additions) plus the
# rows whose prior verdict was vacuous or rows-only (tpch_q9 after the
# predicate fix, multimodal_features after gaining an oracle) and the
# new round-3 queries.  Union of r01..r03 driver rows then covers every
# oracled entry.  README.md documents the current window.
_MODULES = [
    "fmx.queries.fm_queries",
    "fmx.queries.tpch",
    "fmx.queries.dedup_queries",
    "fmx.queries.similarity_queries",
    "fmx.queries.text_queries",
    "fmx.queries.window_queries",
    "fmx.queries.sources_queries",
    "fmx.queries.analytics",
    "fmx.queries.temporal_queries",
    "fmx.queries.sampling_queries",
    "fmx.queries.relational",
    "fmx.queries.relational2",
]

# Names listed here are emitted FIRST by all_queries()/queries() (in this
# order); everything else follows in registration order.  Keep this list
# at <= 50 names so the whole driver window is deliberate.
_PRIORITY = [
    # -- the 30 queries with no driver CORRECTNESS row in r01/r02 --
    "w5_lag_delta",
    "win_tumbling_hour",
    "win_sliding",
    "win_session_30m",
    "w6_ntile_cume",
    "stats_corr_regr",
    "w7_time_range_sum",
    "scd2_user_status",
    "s2_inline_relation",
    "s3_libsvm_parse",
    "approx_distinct",
    "approx_quantiles",
    "funnel_view_click_purchase",
    "cohort_retention",
    "attribution_interval_join",
    "latest_event_per_user",
    "dedup_levenshtein_prefix",
    "asof_purchase_last_click",
    "range_join_price_bands",
    "hypertable_rollup",
    "sample_hash_split",
    "sample_stratified",
    "sample_pack_sequences",
    "pipeline_dataprep",
    "sample_temperature_mixture",
    "sample_per_source_cap",
    "histogram_width_bucket",
    "j8_salted_join_agg",
    "a10_salted_hot_agg",
    "dq_expectations",
    # -- re-checks: vacuous / rows-only verdicts fixed this round --
    "tpch_q9_product_profit",
    "multimodal_features",
    "j6_anti_join",            # was vacuously empty; predicate now real
    "set_except",              # was vacuously empty; predicate now real
    # -- new round-3 queries --
    "ann_lsh_topk_multiprobe",
    "ann_ivf_topk_fixed",
    "ann_pq_codes",
    "ann_pq_topk",
    "dedup_span_profile",
    "zorder_layout_key",
    "sample_weighted_topk",
    "sample_negatives",
    "text_tfidf_top_terms",
    "approx_distinct_hll",
    "graph_pagerank_3iter",
    "approx_topk_cms",
    "bloom_contamination",
    "profile_key_skew",
    "profile_zscore_outliers",
]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    headline: bool = False          # included in bench.py
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False,
          tags: tuple[str, ...] = ()):
    """Register a (spark, sf_dir) -> DataFrame query, optionally with its
    DuckDB oracle SQL."""
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = QuerySpec(name, fn, oracle, headline,
                                    (fn.__doc__ or "").strip(), tuple(tags))
        return fn
    return deco


def _load() -> None:
    for m in _MODULES:
        importlib.import_module(m)


def all_queries() -> dict[str, QuerySpec]:
    _load()
    ordered: dict[str, QuerySpec] = {}
    for n in _PRIORITY:
        if n in _REGISTRY:
            ordered[n] = _REGISTRY[n]
    for n, s in _REGISTRY.items():
        if n not in ordered:
            ordered[n] = s
    return ordered


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle}


def headline_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items() if s.headline}
