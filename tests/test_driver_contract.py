"""__spark_entry__ contract: entry smoke + registry alignment."""

import __spark_entry__ as entrymod


def test_entry_returns_rows_stable_schema(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema.simpleString() == "struct<vec_id:bigint,prediction:double>"


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    # tight lower bound: a module accidentally dropped from
    # fmx.queries._MODULES silently removes its whole query family —
    # the count floor catches that class of regression (210 at r5)
    assert len(qs) >= 206
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)
    # the non-oracled set is exactly the declared non-SQL ops
    # (dedup_clusters gained a recursive-CTE oracle in round 2;
    # multimodal_features gained a byte-histogram oracle in round 3)
    assert set(qs) - set(osql) == {
        "ann_ivf_topk", "approx_distinct", "approx_quantiles",
        "ann_pq_trained"}
    # callables, not results
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper()
               for s in osql.values())
