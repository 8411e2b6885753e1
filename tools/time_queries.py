#!/usr/bin/env python
"""Time a SUBSET of registered queries to the noop sink — the
per-query twin of bench.py for optimization iteration (guide §1.4:
time the computation, not the sink; §1.5: label the jobs).

Run: python tools/time_queries.py q1 q2 ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, BENCH_REPS (default 2; 1 warm-up always runs).

Prints per-query best-of-reps seconds, one line each, then a total.
Methodology matches bench.py exactly (warm-up + min of reps) so the
numbers are comparable to BENCH artifacts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tda596_lab02mapreduce_spark import registry
from tda596_lab02mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BENCH_REPS", "2"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: time_queries.py <query> ...")
        sys.exit(2)
    spark = get_spark(app_name="tda596-time-queries")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = registry.all_queries()
    # JIT prelude: a fresh JVM charges Spark-infra compilation (codegen
    # compiler, shuffle paths, parquet reader) to whichever query runs
    # first — the bench amortizes this across 101 queries, a short
    # subset run does not. Two cheap varied-shape queries absorb it.
    for pre in ("pricing_summary", "join_sortmerge_revenue"):
        if pre in qs and pre not in names:
            spark.sparkContext.setJobDescription(f"prelude:{pre}")
            qs[pre](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    total = 0.0
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        total += best
        print(f"{best:8.3f}  {name}", flush=True)
    print(f"{total:8.3f}  TOTAL")


if __name__ == "__main__":
    main()
