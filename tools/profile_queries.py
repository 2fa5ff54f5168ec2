"""Profile every registered query end-to-end at a given SF dir, mimicking
the driver's correctness harness (run Spark query, collect rows). Prints
per-query wall time sorted descending plus the total.

Usage: python tools/profile_queries.py [sf_dir] [--limit N]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("fmx-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import fmx.queries as Q

    specs = Q.all_queries()
    times: dict[str, float] = {}
    t_all = time.time()
    for name, spec in specs.items():
        t0 = time.time()
        try:
            rows = spec.fn(spark, sf_dir).collect()
            times[name] = time.time() - t0
            print(f"{times[name]:8.2f}s  {name}  ({len(rows)} rows)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            times[name] = time.time() - t0
            print(f"{times[name]:8.2f}s  {name}  ERROR {e}", flush=True)
    total = time.time() - t_all
    print("\n--- slowest ---")
    for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{t:8.2f}s  {n}")
    print(f"\nTOTAL {total:.1f}s for {len(times)} queries")
    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(times, f, indent=1)


if __name__ == "__main__":
    main()
