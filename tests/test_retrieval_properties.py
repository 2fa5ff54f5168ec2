"""Property-based tests (hypothesis) for the retrieval/eval operators
added late in round 5: BM25 against a pure-Python reference, shingle
containment against set arithmetic, and RRF against direct summation.
Each case builds a small corpus and checks the full Spark result in
one job (per-example Spark actions would be minutes-slow)."""

import math

from hypothesis import given, settings, strategies as st

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "dup",
                         "spark", "merge", "scan"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


def _bm25_reference(texts, terms, k1=1.2, b=0.75):
    """Straight-from-the-formula BM25 in pure Python."""
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    dl = {i: len(v) for i, v in toks.items()}
    n = len(texts)
    avgdl = sum(dl.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * dl[i] / avgdl)
            scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / denom
    return scores


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(_doc, min_size=2, max_size=12))
def test_bm25_matches_pure_python(spark, texts):
    from fmx.operators.text import bm25_topk

    terms = ["dup", "spark"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 ["doc_id", "text"])
    got = {r.doc_id: r.score
           for r in bm25_topk(docs, "doc_id", "text", terms,
                              k=len(texts)).collect()}
    want = _bm25_reference(texts, terms)
    assert set(got) == set(want)
    for i, s in want.items():
        assert abs(got[i] - s) < 1e-5, (i, got[i], s)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(_doc.filter(lambda t: len(t.split()) >= 3),
                      min_size=2, max_size=8))
def test_containment_matches_set_arithmetic(spark, texts):
    from fmx.operators.dedup import containment_pairs

    def shingles(t, n=3):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    docs = spark.createDataFrame(list(enumerate(texts)),
                                 ["doc_id", "text"])
    got = {(r.id_small, r.id_big): (r.containment, r.jaccard)
           for r in containment_pairs(docs, "doc_id", "text", n=3,
                                      threshold=0.0,
                                      max_df=None).collect()}
    sh = {i: shingles(t) for i, t in enumerate(texts)}
    for a in sh:
        for b in sh:
            if a >= b:
                continue
            inter = len(sh[a] & sh[b])
            if not inter:
                assert (a, b) not in got and (b, a) not in got
                continue
            small, big = (a, b) if len(sh[a]) <= len(sh[b]) else (b, a)
            c = inter / min(len(sh[a]), len(sh[b]))
            j = inter / len(sh[a] | sh[b])
            gc, gj = got[(small, big)]
            assert abs(gc - c) < 1e-9 and abs(gj - j) < 1e-9


@settings(max_examples=8, deadline=None)
@given(r1=st.lists(st.integers(0, 20), min_size=1, max_size=8,
                   unique=True),
       r2=st.lists(st.integers(0, 20), min_size=1, max_size=8,
                   unique=True))
def test_rrf_matches_direct_summation(spark, r1, r2):
    from fmx.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, v, i + 1) for i, v in enumerate(r1)],
        ["query_id", "vec_id", "rank"])
    b = spark.createDataFrame(
        [(0, v, i + 1) for i, v in enumerate(r2)],
        ["query_id", "vec_id", "rank"])
    got = {r.vec_id: r.rrf
           for r in rrf_fuse([a, b], k=100, c=60).collect()}
    want = {}
    for lst in (r1, r2):
        for i, v in enumerate(lst):
            want[v] = want.get(v, 0.0) + 1.0 / (60 + i + 1)
    assert set(got) == set(want)
    for v, s in want.items():
        assert abs(got[v] - s) < 1e-8
