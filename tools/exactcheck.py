"""Driver-style BYTE-EXACT oracle compare (repr() of every cell, which
distinguishes -0.0 from 0.0 and 1 from 1.0 — what the driver's hash
sees) for the named queries at one or more SF dirs.

Usage: python tools/exactcheck.py [--sf DIR ...] query [query ...]
Default SFs: sf0.001 and sf0.01.  Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sfs: list[str] = []
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sfs.append(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    import duckdb

    import fmx
    import fmx.queries as Q
    from fmx.sources import TABLES

    ALL = Q.all_queries()
    spark = fmx.get_spark(app_name="fmx-exactcheck", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    failed = False
    for sfd in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfd}/{t}.parquet'")
        for name in names:
            spec = ALL[name]
            sdf = spec.fn(spark, sfd).toPandas()
            if spec.oracle is None:
                print(f"{sfd} {name}: no oracle (rows={len(sdf)})")
                continue
            ddf = con.sql(spec.oracle).df()
            cols = sorted(sdf.columns)
            s = sorted(map(repr, sdf[cols].itertuples(index=False,
                                                      name=None)))
            d = sorted(map(repr, ddf[cols].itertuples(index=False,
                                                      name=None)))
            ok = s == d
            print(f"{sfd} {name}: exact={ok} rows={len(s)}")
            if not ok:
                failed = True
                diff = [(a, b) for a, b in zip(s, d) if a != b]
                print(f"  first mismatches: {diff[:3]}")
                if len(s) != len(d):
                    print(f"  row counts {len(s)} vs {len(d)}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
