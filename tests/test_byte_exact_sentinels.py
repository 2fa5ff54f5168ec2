"""Driver-grade BYTE-EXACT (repr) Spark-vs-oracle compare for the
queries whose correctness lives below the 9dp-rounded harness's
resolution — the harness (test_oracle_harness) rounds floats before
comparing, which forgives exactly the two divergence classes the
driver's value hash does NOT:

- UNROUNDED double outputs (the ts_ewma/holt/theilsen family ships
  raw IEEE folds by design): a 1-ULP cross-engine drift passes the
  harness and reds the driver.  The r13 sweep caught DuckDB parsing
  the ewma oracle's bare weight literals as DECIMAL — the denominator
  CASE chain summed in exact DECIMAL and cast once, 1 ULP off Spark's
  left-associated double chain (868 rows at sf0.001, 3385 at sf0.01).
- IEEE signed zero (-0.0 == 0.0 numerically, different repr): the
  r10 feat_cyclical_encode red row and the r13 text_heaps_law find.

Each sentinel is a registered query whose docstring declares one of
those contracts; repr() is the compare because that is what the
driver's hash distinguishes.
"""

import duckdb
import pytest

import fmx.queries as Q
from fmx.sources import TABLES

SENTINELS = [
    # unrounded-IEEE-fold family (literal-coefficient arithmetic the
    # oracle must replay bit-for-bit)
    "ts_ewma",
    "ts_holt_linear",
    "ts_theilsen_trend",
    "ts_holt_winters",
    # signed-zero family (rounded doubles that can land exactly on 0)
    "text_heaps_law",
    "feat_cyclical_encode",
    # boundary-flag family (flags compare unrounded doubles at the
    # control limit; a ULP drift flips an int column)
    "stats_p_chart",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_rows(df, cols):
    """repr rows via PYTHON scalars: cast to object (numpy scalars ->
    float/int, so a numpy>=2 repr change like np.int32(5) cannot red a
    sentinel for non-engine reasons) and normalize missing values to
    None on both connectors (r13 advice).  -0.0 and 1-ULP drift — the
    divergences these sentinels exist for — survive the cast."""
    c = df[cols].astype(object)
    c = c.where(c.notna(), None)
    return sorted(map(repr, c.itertuples(index=False, name=None)))


@pytest.mark.parametrize("name", SENTINELS)
def test_byte_exact_vs_oracle(spark, sf_dir, duck, name):
    spec = Q.all_queries()[name]
    assert spec.oracle, f"{name} lost its oracle"
    sdf = spec.fn(spark, sf_dir).toPandas()
    ddf = duck.sql(spec.oracle).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = _canon_rows(sdf, cols)
    d = _canon_rows(ddf, cols)
    assert len(s) == len(d), f"{name}: {len(s)} vs {len(d)} rows"
    assert len(s) > 0, f"{name}: vacuous 0-row pass"
    mism = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mism, f"{name}: {len(mism)} repr mismatches; first: {mism[:3]}"
