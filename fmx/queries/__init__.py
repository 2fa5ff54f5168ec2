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
  when a rounded value can land ON the half boundary (e.g. integer
  cents / integer count), do NOT round a double — engines disagree
  there (DuckDB re-renders decimally, Spark rounds the binary double;
  see cohort_ltv_curve) — keep the arithmetic integer (cents, div)
  and divide by a power of ten at the very end;
- sums of LARGE per-group doubles (term ulp exceeding the output
  rounding quantum — e.g. S_g^2/n_g ~1e14 with ulp 0.03 rounded at
  4dp) are partition-order dependent AND engine-round dependent; use
  exact integer scaling instead: multiply by 10^k, exact floor-divmod
  (Spark DECIMAL ``(x - x %% n)/n``; DuckDB ``CAST(x AS HUGEINT) //
  n`` — DuckDB's DECIMAL division routes through DOUBLE past 2^53),
  sum DECIMAL(38,0), divide by 10^k as the final double op
  (eval_anova_f, reworked after the r11 vanilla-window rehearsal);
- rounded doubles that can land exactly on zero (sin/cos at the zero
  crossings, differences of equal values) get ``+ 0.0`` appended on
  BOTH sides: DuckDB's round keeps IEEE -0.0 while Spark's BigDecimal
  HALF_UP has no negative zero — same value, different hash bytes
  (the r10 feat_cyclical_encode red row); ``-0.0 + 0.0 = +0.0``;
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
    "fmx.queries.web_queries",
    "fmx.queries.stats_queries",
]

# Names listed here are emitted FIRST by all_queries()/queries() (in this
# order); everything else follows in registration order.  Keep this list
# at <= 50 names so the whole driver window is deliberate.
#
# Round-9 window, executing the rotation stocked at round-8 close
# (VERDICT r8 "Next round" #1).  The union of driver rows r01..r08
# already covers every entry; this window retires ALL remaining
# pre-r03 evidence and gives the 35 round-8 additions their first
# driver rows:
# (a) the 35 round-8 additions (never driver-checked; all oracled,
#     verified locally at sf0.001+sf0.01+sf0.1 and independently
#     replayed by the r8 judge at sf0.01, 35/35 hash-match);
# (b) the 11 oracled entries whose latest driver row is still r02
#     (TPC-H q4/q12/q13/q14/q17/q18/q19/q22, text_redaction,
#     text_repetition, emb_quantize);
# (c) ann_ivf_topk, r02 rows-only until this round -- it gained an
#     invariant oracle (VERDICT r8 #2), so its first HASH-checked
#     driver row lands here and no entry's evidence predates r03;
# (d) 3 slots for the heaviest r03-era shapes: tpch_q9 (most joins +
#     the round-3 predicate-fix history), graph_pagerank_3iter (the
#     only other iterative-dataflow entry), attribution_interval_join
#     (the bounded interval-join topology).
_PRIORITY = [
    # Round-13 window, executing VERDICT r12 "Next round" #2/#3: the
    # 14 round-12 additions get their first driver rows (all oracled
    # and byte-exact-verified at sf0.001+sf0.01+sf0.1 on registration),
    # plus the new max_df-gated span-profile twin (VERDICT r12 #3 --
    # its row proves the join-based frequency branch AND the filter,
    # which genuinely excludes spans at these SFs), then 35 of the 39
    # remaining r04-evidence entries (alphabetical).  After this window
    # no oracle-able entry's evidence predates r04 except the 4
    # stocked leftovers below.
    # -- (a) r12 additions + the r13 capped twin, never driver-checked --
    "stats_anderson_darling",
    "eval_spiegelhalter_z",
    "eval_cliffs_delta",
    "ts_turning_points",
    "stats_cusum_chart",
    "stats_atkinson_index",
    "ts_dickey_fuller",
    "text_yules_k",
    "eval_mcc",
    "stats_page_trend",
    "graph_degree_assortativity",
    "ann_eval_map",
    "ts_cox_stuart",
    "stats_ks_normal",
    "dedup_span_profile_capped",
    # -- (b) r04-evidence cohort, alphabetical (35 of 39) --
    "a1_tpch_q1",
    "ann_pq_rerank",
    "approx_quantiles_hist",
    "bloom_prefilter_join",
    "copurchase_topk",
    "corpus_source_report",
    "date_trunc_month",
    "dq_psi_drift",
    "event_transition_matrix",
    "f1_explode_tokens",
    "f3_clamp",
    "j1_inner_join_agg",
    "j2_left_join_coalesce",
    "j3_left_join_fill",
    "j4_full_outer_upsert",
    "j5_semi_join",
    "j7_broadcast_two_dims",
    "json_extract",
    "multimodal_frame_sample",
    "p1_projection",
    "p3_nullif_coalesce",
    "p6_filter_group",
    "percentiles",
    "profile_mad_outliers",
    "profile_zscore_outliers",
    "regexp_funcs",
    "rfm_segmentation",
    "sample_length_buckets",
    "seq_next_event_dataset",
    "sort_limit_topk",
    "string_funcs",
    "text_inverted_index",
    "text_perplexity",
    "text_quality_classifier",
    "tpch_q11_important_stock",
    # (Window full at 50.  r14 STOCK, in priority order: the round-13
    # additions (all byte-exact-verified at sf0.001+sf0.01+sf0.1 on
    # registration): text_good_turing, text_burstiness,
    # graph_avg_neighbor_degree, graph_rich_club,
    # eval_isotonic_calibration, stats_conformal_coverage,
    # eval_confident_joint, ts_hurst_rs, ann_diversified_topk; then
    # the r04 remainder (alphabetical):
    # tpch_q15_top_supplier, tpch_q16_supplier_cnt,
    # tpch_q20_excess_stock, tpch_q2_min_cost_supplier.
    # Prior rotation history lives in git: the r13 window at this
    # commit, r12 at b0d144b^, r11 at 5ba79ea^, r10 at 3b0aaef, r9 at
    # 379fa18^, r8 at eccbe04, r7 at a192c46, r6 at 5207f57^, r5 at
    # ded7618.  Everything rotated out is r4+-green and remains
    # covered by the sf0.001+sf0.01(+sf0.1) oracle harness every
    # round; bench headliners additionally run per-round.)
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
