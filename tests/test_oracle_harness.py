"""Side-by-side Spark vs DuckDB oracle comparison for every registered
query — mimics the driver's CORRECTNESS gate (row count + column names +
order-insensitive value compare) at sf0.001 (set FMX_TEST_SF_DIR to run
against other scale factors)."""

import math

import duckdb
import pytest

import fmx.queries as Q
from fmx.sources import TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df):
    """pandas frame -> column-name-sorted, row-sorted list of tuples with
    floats rounded for comparison."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(round(v, 9))
            else:
                norm.append(v)
        out.append(tuple(norm))
    out.sort(key=repr)
    return cols, out


ALL = Q.all_queries()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = ALL[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke for non-SQL ops
        return
    ddf = duck.sql(spec.oracle).df()
    scols, srows = _normalize(sdf)
    dcols, drows = _normalize(ddf)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}")
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"
