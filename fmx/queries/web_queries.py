"""Web-corpus curation queries: URL canonicalization, per-domain stats
and caps.  The testdata ships no URL column, so each query synthesizes
one deterministically from (source, doc_id) — messy on purpose (mixed
case, www, tracking params, unsorted params, fragments, trailing
slashes) — and the oracle replays the identical synthesis, so both
engines normalize the same inputs (same convention as the synthesized
partsupp in tpch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fmx.operators import web as W
from fmx.queries import query
from fmx.sources import load_table as T

BIG = "bigint"


def _messy_url_col():
    d = F.col("doc_id")
    return F.concat(
        F.lit("HTTPS://WWW."), F.col("source"), F.lit(".Example.COM/docs/"),
        (d % 7).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="), d.cast("string"),
        F.when(d % 2 == 0, F.lit("&ref=tw&b=2&a=1")).otherwise(F.lit("&a=1")),
        F.when(d % 5 == 0, F.lit("#frag")).otherwise(F.lit("")))


_MESSY_URL_SQL = """
'HTTPS://WWW.' || source || '.Example.COM/docs/' || CAST(doc_id % 7 AS VARCHAR)
|| CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
|| '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
|| CASE WHEN doc_id % 2 = 0 THEN '&ref=tw&b=2&a=1' ELSE '&a=1' END
|| CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
"""

# DuckDB replay of url_normalize (RE2-safe patterns, shared verbatim
# with the Spark side where literal).  Default-port stripping
# (http://h:80 == http://h) is NOT replayed here because the
# synthesized URLs are portless — the operator's port behavior is
# pinned by unit tests instead (test_url_normalize_ports)
_NORM_SQL = r"""
urls AS (SELECT doc_id, {url} AS url FROM documents),
parts AS (
  SELECT doc_id, url0, url,
         regexp_replace(url, '\?.*$', '') AS pre,
         regexp_extract(regexp_replace(url, '#.*$', ''), '\?(.*)$', 1) AS q
  FROM (SELECT doc_id, url AS url0,
               regexp_replace(url, '#.*$', '') AS url FROM urls)),
norm AS (
  SELECT doc_id, url0,
         lower(regexp_extract(pre, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             AS scheme,
         regexp_replace(lower(regexp_replace(regexp_extract(
             pre, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
             '^[^@]*@', '')),
             '^www\.', '') AS host,
         regexp_replace(regexp_replace(
             pre, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '/+$', '')
             AS path,
         array_to_string(list_sort(list_filter(string_split(q, '&'),
             x -> x <> '' AND NOT regexp_matches(x,
                  '^(utm_[^=]*|gclid|fbclid|msclkid|ref)='))), '&') AS qs
  FROM parts),
canon AS (
  SELECT doc_id,
         CASE WHEN scheme = '' THEN url0
              ELSE scheme || '://' || host || path
                || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
         END AS url_norm,
         host AS domain
  FROM norm)
""".replace("{url}", _MESSY_URL_SQL)


@query(
    "web_url_normalize",
    oracle=f"""
    WITH {_NORM_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id, url_norm, domain
    FROM canon
    """)
def web_url_normalize(spark, sf):
    """URL canonicalization: case-fold scheme/host, strip www/fragment/
    tracking params/trailing slash, sort surviving params.  Map-only —
    zero shuffles, whole-stage codegen end to end."""
    docs = T(spark, sf, "documents").withColumn("url", _messy_url_col())
    out = W.url_normalize(docs, "url")
    return out.select(F.col("doc_id").cast(BIG).alias("doc_id"),
                      "url_norm", "domain")


@query(
    "web_domain_stats",
    oracle=f"""
    WITH {_NORM_SQL}
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT url_norm) AS BIGINT) AS n_pages,
           round(avg(d.n_chars), 4) AS avg_chars
    FROM canon c JOIN documents d USING (doc_id)
    GROUP BY domain
    """)
def web_domain_stats(spark, sf):
    """Per-domain corpus profile (doc count, distinct canonical pages,
    mean length): one hash-agg on domain after the map-only
    normalization — the crawl-mix report that drives per-domain
    sampling weights."""
    docs = T(spark, sf, "documents").withColumn("url", _messy_url_col())
    out = W.url_normalize(docs, "url")
    return (out.groupBy("domain")
            .agg(F.count("*").cast(BIG).alias("n_docs"),
                 F.countDistinct("url_norm").cast(BIG).alias("n_pages"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars")))


@query(
    "web_domain_cap",
    oracle=f"""
    WITH {_NORM_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id, domain,
           CAST(rn AS BIGINT) AS domain_rank
    FROM (SELECT c.doc_id, c.domain,
                 row_number() OVER (PARTITION BY c.domain
                                    ORDER BY d.n_chars DESC, c.doc_id) AS rn
          FROM canon c JOIN documents d USING (doc_id))
    WHERE rn <= 10
    """)
def web_domain_cap(spark, sf):
    """Per-domain cap (keep the 10 longest docs per domain): crawls are
    power-law over hosts, so uncapped mega-domains dominate the mix.
    One shuffle on domain; executes as WindowGroupLimit per-partition
    heaps — hot domains never fully sort."""
    docs = T(spark, sf, "documents").withColumn("url", _messy_url_col())
    norm = W.url_normalize(docs, "url")
    capped = W.per_domain_cap(norm, "domain", cap=10,
                              order_cols=[F.col("n_chars").desc(),
                                          F.col("doc_id")])
    return capped.select(F.col("doc_id").cast(BIG).alias("doc_id"),
                         "domain",
                         F.col("domain_rank").cast(BIG).alias("domain_rank"))


@query(
    "web_domain_mixture",
    oracle=f"""
    WITH {_NORM_SQL},
    counts AS (SELECT domain, count(*) AS n FROM canon GROUP BY domain)
    SELECT domain, CAST(n AS BIGINT) AS n_docs,
           round(least(1.0, 0.5 * ((max(n) OVER ()) * 1.0 / n) ^ 0.5), 6)
               AS keep_p,
           CAST(round(n * least(1.0, 0.5 * ((max(n) OVER ()) * 1.0 / n) ^ 0.5), 0)
                AS BIGINT) AS expected_keep
    FROM counts
    """)
def web_domain_mixture(spark, sf):
    """Temperature-flattened per-domain sampling plan (alpha=0.5,
    largest_frac=0.5 — the multilingual-resampling rule applied to
    crawl domains): keep_p = min(1, 0.5*(max_n/n)^0.5) and the
    expected post-sampling count, from one domain hash-agg + a window
    max over the domain-count relation."""
    from pyspark.sql import Window

    docs = T(spark, sf, "documents").withColumn("url", _messy_url_col())
    norm = W.url_normalize(docs, "url")
    counts = norm.groupBy("domain").agg(F.count("*").alias("n"))
    keep_p = F.least(
        F.lit(1.0),
        F.lit(0.5) * F.pow(F.max("n").over(Window.partitionBy())
                           / F.col("n"), F.lit(0.5)))
    return counts.select(
        "domain", F.col("n").cast(BIG).alias("n_docs"),
        F.round(keep_p, 6).alias("keep_p"),
        F.round(F.col("n") * keep_p, 0).cast(BIG).alias("expected_keep"))
