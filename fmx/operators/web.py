"""Web-corpus curation operators: URL canonicalization, domain
extraction, and per-domain capping — the de-biasing / dedup-key steps
of every crawl-derived training corpus (a crawl's URL column is the
primary dedup and provenance key; un-normalized URLs split one page
across dozens of spellings and tracking-param variants).

Everything is pure column expressions (regexp + higher-order array
functions, no lookaheads) so the identical arithmetic replays in DuckDB
for the oracles.  No UDFs, no driver state; all ops are map-only except
the per-domain cap (one shuffle on domain, WindowGroupLimit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["url_normalize", "url_domain", "per_domain_cap",
           "TRACKING_PARAM_RE"]

# tracking params stripped during canonicalization (prefix-matched on
# the 'key=' form; RE2-safe — no lookahead, portable to DuckDB)
TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_AFTER_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def url_domain(url: Column | str) -> Column:
    """Registrable-ish domain of a URL: lowercased host, ``www.`` and
    any ``:port`` stripped (public-suffix lists are a lookup table,
    not an engine feature — join one in for exact eTLD+1 semantics)."""
    u = F.col(url) if isinstance(url, str) else url
    # drop userinfo: 'alice@example.com' and 'example.com' are the
    # same host, not two dedup/cap keys
    host = F.regexp_replace(F.regexp_extract(u, _HOST_RE, 1),
                            "^[^@]*@", "")
    return F.regexp_replace(
        F.regexp_replace(F.lower(host), r"^www\.", ""), ":[0-9]+$", "")


def url_normalize(df: DataFrame, url_col: str,
                  out_col: str = "url_norm") -> DataFrame:
    """Canonicalize a URL column: lowercase scheme+host, strip
    ``www.``, drop the fragment, remove tracking query params
    (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``ref``), sort the
    surviving params (param order is not page identity), and trim the
    path's trailing slash.  Adds ``out_col`` and ``domain``.

    Map-only (zero shuffles): regexp extraction plus one
    filter+sort+join over the split query-param array — all native
    expressions inside whole-stage codegen, linear in corpus bytes.

    Inputs are expected to be ABSOLUTE URLs (scheme://...), which is
    what crawlers record; a scheme-less value passes through UNCHANGED
    rather than being guessed at — which also makes normalization
    idempotent (re-normalizing an output is a no-op, so re-ingesting
    an already-canonical corpus cannot churn dedup keys).
    """
    u = F.col(url_col)
    base = F.regexp_replace(u, "#.*$", "")               # fragment off
    pre = F.regexp_replace(base, r"\?.*$", "")           # scheme://host/path
    q = F.regexp_extract(base, r"\?(.*)$", 1)            # raw query ('' if none)
    scheme = F.lower(F.regexp_extract(pre, _SCHEME_RE, 1))
    # default ports are not page identity: http://h:80/ == http://h/
    # (non-default ports are preserved)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(F.regexp_extract(pre, _HOST_RE, 1),
                                 "^[^@]*@", "")), r"^www\.", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", "")
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(
        F.regexp_replace(pre, _AFTER_HOST_RE, ""), "/+$", "")
    params = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE)))
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))
    norm = F.when(scheme == "", u).otherwise(canon)
    return (df.withColumn(out_col, norm)
            .withColumn("domain", url_domain(url_col)))


def per_domain_cap(df: DataFrame, domain_col: str, cap: int,
                   order_cols: list[str | Column] | None = None) -> DataFrame:
    """Keep at most ``cap`` rows per domain (crawls are power-law
    distributed over hosts; uncapped, a handful of mega-domains
    dominate the training mix).  ``order_cols`` ranks which rows
    survive (defaults to the domain's natural row order — pass a
    quality score for quality-aware capping); include a unique
    tiebreaker for deterministic output.  ``order_cols`` is required:
    ordering by the partition key itself would be constant within
    each window, so which rows survive would be nondeterministic —
    an unreproducible training mix.

    One shuffle on domain; the ranking filter executes as
    WindowGroupLimit (per-partition top-``cap`` heaps — hot domains
    never fully sort)."""
    if not order_cols:
        raise ValueError(
            "per_domain_cap needs order_cols (e.g. a quality score + "
            "a unique id tiebreaker): without an intra-domain order, "
            "which rows survive the cap is nondeterministic")
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    w = Window.partitionBy(domain_col).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .withColumnRenamed("_rn", "domain_rank"))
