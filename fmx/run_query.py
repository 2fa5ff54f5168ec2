"""CLI query runner: execute any registered query (optionally against
its DuckDB oracle) from the shell.

    python -m fmx.run_query --list
    python -m fmx.run_query a1_tpch_q1
    python -m fmx.run_query dedup_minhash_lsh_pairs --sf /root/testdata/sf0.01 --oracle
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="scale-factor directory")
    ap.add_argument("--list", action="store_true", help="list queries")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the DuckDB oracle and compare row counts")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan")
    ap.add_argument("-n", type=int, default=20, help="rows to show")
    args = ap.parse_args()

    from fmx.queries import all_queries

    registry = all_queries()
    if args.list or not args.name:
        for name, spec in sorted(registry.items()):
            mark = "oracle" if spec.oracle else "rows-only"
            star = "*" if spec.headline else " "
            print(f"{star} {name:32s} [{mark}] {spec.doc.splitlines()[0] if spec.doc else ''}")
        return
    if args.name not in registry:
        sys.exit(f"unknown query '{args.name}' (use --list)")

    import fmx

    spark = fmx.get_spark(app_name=f"fmx-run-{args.name}")
    spark.sparkContext.setLogLevel("ERROR")
    spec = registry[args.name]
    t0 = time.perf_counter()
    df = spec.fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.n, truncate=False)
    n = df.count()
    print(f"{n} rows in {time.perf_counter() - t0:.2f}s")

    if args.oracle and spec.oracle:
        import duckdb

        from fmx.sources import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
        m = con.sql(spec.oracle).df().shape[0]
        print(f"duckdb oracle rows: {m} -> {'MATCH' if m == n else 'MISMATCH'}")
    spark.stop()


if __name__ == "__main__":
    main()
