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
#
# Round-4 window: the driver union r01..r03 covered every registry entry
# except text_perplexity, so the front of the window is (a) that one
# gap, (b) the 8 new round-4 queries, (c) profile_zscore_outliers whose
# r03 row was a vacuous 0-row hash-match (threshold could never fire on
# uniform o_totalprice — repointed at heavy-tailed events.value), then
# (d) 40 re-checks of the entries whose most recent driver row is r01
# (oldest evidence first; the 8 r01-era rows left outside the window —
# a7_min_max, a8_count, f4_math, f6_split_cast, p2_drop_column,
# p4_distinct, set_intersect, union_by_name — are trivial shapes that
# remain r01-green and harness-checked).
_PRIORITY = [
    # -- never driver-checked --
    "text_perplexity",
    # -- new round-4 queries --
    "dedup_semantic",
    "ts_gap_fill",
    "ts_resample_ohlc",
    "cdc_apply_changes",
    "profile_mad_outliers",
    "text_quality_classifier",
    "text_inverted_index",
    "multimodal_frame_sample",
    "ann_pq_rerank",
    "copurchase_topk",
    "event_transition_matrix",
    "dq_psi_drift",
    "approx_quantiles_hist",
    "corpus_source_report",
    "seq_next_event_dataset",
    "agg_incremental_merge",
    "bloom_prefilter_join",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q20_excess_stock",
    "sample_length_buckets",
    "rfm_segmentation",
    # -- re-check: r03 row was vacuous (0 rows), query repointed --
    "profile_zscore_outliers",
    # -- re-checks: most recent driver row is r01 --
    "p1_projection",
    "p3_nullif_coalesce",
    "p6_filter_group",
    "j1_inner_join_agg",
    "j2_left_join_coalesce",
    "j3_left_join_fill",
    "j4_full_outer_upsert",
    "j5_semi_join",
    "j7_broadcast_two_dims",
    "a1_tpch_q1",
    "a2_group_avg",
    "a3_group_min_date",
    "a5_collect_set_sorted",
    "a6_global_sum",
    "agg_count_distinct",
    "agg_rollup",
    "sort_limit_topk",
    "f1_explode_tokens",
    "f3_clamp",
    "json_extract",
    "date_trunc_month",
    "string_funcs",
    "regexp_funcs",
    "percentiles",
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
