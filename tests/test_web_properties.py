"""Property-based tests (hypothesis) for round-5 operators:
url_normalize is idempotent and char_entropy respects its information
bounds on arbitrary inputs.  Batched: each hypothesis case collects
rows and ONE Spark job checks the whole batch (a per-example Spark
action would make 25 examples take minutes)."""

import math

import pytest
from hypothesis import given, settings, strategies as st

# URL pieces that exercise every normalization rule
_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS"])
_host = st.from_regex(r"(www\.)?[a-z]{1,8}(\.[a-z]{1,6}){1,2}",
                      fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}/?", fullmatch=True)
_param = st.from_regex(r"[a-z]{1,6}=[A-Za-z0-9]{0,6}", fullmatch=True)
_tracking = st.sampled_from(
    ["utm_source=x", "utm_campaign=abc", "gclid=1", "fbclid=2", "ref=tw"])
_frag = st.sampled_from(["", "#frag", "#a/b?c=1"])


@st.composite
def messy_url(draw):
    scheme = draw(_scheme)
    host = draw(_host)
    path = draw(_path)
    params = draw(st.lists(st.one_of(_param, _tracking), max_size=4))
    frag = draw(_frag)
    q = ("?" + "&".join(params)) if params else ""
    return f"{scheme}://{host}{path}{q}{frag}"


@settings(max_examples=10, deadline=None)
@given(urls=st.lists(messy_url(), min_size=1, max_size=20))
def test_url_normalize_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u): the canonical form is a
    fixed point — re-ingesting already-clean URLs never churns keys."""
    from fmx.operators.web import url_normalize

    df = spark.createDataFrame(list(enumerate(urls)), ["id", "url"])
    once = url_normalize(df, "url").select("id", "url_norm", "domain")
    twice = (url_normalize(once.withColumnRenamed("url_norm", "url"),
                           "url")
             .select("id", F_col("url_norm"), "domain"))
    a = {r.id: (r.url_norm, r.domain) for r in once.collect()}
    b = {r.id: (r.url_norm, r.domain) for r in twice.collect()}
    assert a == b


def F_col(name):
    from pyspark.sql import functions as F
    return F.col(name)


_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_text, min_size=1, max_size=20))
def test_char_entropy_bounds(spark, texts):
    """0 <= H <= log2(n_distinct_chars); n_chars == len(text); empty
    texts emit no row."""
    from fmx.operators.text import char_entropy

    df = spark.createDataFrame(list(enumerate(texts)), ["id", "t"])
    got = {r.id: r for r in char_entropy(df, "id", "t").collect()}
    for i, t in enumerate(texts):
        if len(t) == 0:
            assert i not in got
            continue
        r = got[i]
        assert r.n_chars == len(t)
        assert r.n_distinct_chars == len(set(t))
        # +5e-7: the operator rounds H to 6 decimals, which can round
        # UP past the exact log2 bound by half a rounding step
        assert -5e-7 <= r.char_entropy <= math.log2(max(
            2, r.n_distinct_chars)) + 5e-7


def test_url_normalize_schemeless_passthrough_and_userinfo(spark):
    """A scheme-less value is a fixed point (passes through UNCHANGED,
    no '://' prefix churn), and userinfo never splits a host into two
    dedup/cap keys."""
    from fmx.operators.web import url_domain, url_normalize

    df = spark.createDataFrame(
        [(1, "example.com/a"),                       # scheme-less
         (2, "https://alice@example.com/page"),      # userinfo
         (3, "https://example.com/page")],
        ["id", "url"])
    out = {r.id: (r.url_norm, r.domain)
           for r in url_normalize(df, "url").collect()}
    assert out[1][0] == "example.com/a"              # unchanged
    # re-normalizing the passthrough is still a no-op
    again = (url_normalize(
        spark.createDataFrame([(1, out[1][0])], ["id", "url"]), "url")
        .first().url_norm)
    assert again == out[1][0]
    assert out[2] == out[3]                          # userinfo stripped
    doms = [r[0] for r in
            df.select(url_domain("url")).collect()]
    assert doms[1] == doms[2] == "example.com"


def test_per_domain_cap_requires_order(spark):
    import pytest as _pt

    from fmx.operators.web import per_domain_cap

    df = spark.createDataFrame([(1, "a.com")], ["id", "domain"])
    with _pt.raises(ValueError, match="order_cols"):
        per_domain_cap(df, "domain", cap=1)
