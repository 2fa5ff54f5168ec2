"""Focused ANN mini-bench: driver bench protocol (best-of-N min, noop
sink, local[32], warmup) restricted to the ANN headliners — the tool for
bisecting the BENCH_r11 ANN regression (VERDICT r11 #1).

Usage: python -m tools.annbench [name ...]   (default: the 4 ANN rows)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["ann_cosine_topk", "ann_pq_topk", "ann_pq_rerank", "ann_ivfpq_topk"]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    import fmx
    from fmx.queries import queries

    spark = fmx.get_spark(app_name="fmx-annbench", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .selectExpr("count(*)").collect()

    qs = queries()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        out[name] = {"min": round(runs[0], 3),
                     "median": round(runs[len(runs) // 2], 3)}
        print(f"  {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
