"""Capture .explain('formatted') for every headline query into
plans/<outdir>/<query>_<tag>.txt — the optimization round's evidence
artifacts (the judge reads these instead of running Spark).

Usage: python tools/capture_plans.py <tag> [outdir] [query ...]
  tag     e.g. 'before' / 'after'
  outdir  default plans/r13
  query   optional subset; default = all headliners
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r13"
    subset = set(sys.argv[3:])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import fmx
    from fmx.queries import headline_queries

    spark = fmx.get_spark(app_name="fmx-plans", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(outdir, exist_ok=True)
    for name, fn in sorted(headline_queries().items()):
        if subset and name not in subset:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
