#!/usr/bin/env python
"""Run a SUBSET of registered queries against their DuckDB oracles —
the per-query twin of tools/sweep_config_free.py for fast iteration
while developing (the full sweep takes ~8 min; a 4-query check takes
seconds).  Same bare session, same verdict logic.

Run: python tools/check_subset.py q1 q2 ...   (names or substrings)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tda596_lab02mapreduce_spark import registry
from tests.oracle import run_oracle, verdict

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    wanted = sys.argv[1:]
    if not wanted:
        print("usage: check_subset.py <query-name-or-substring> ...")
        sys.exit(2)
    reg = registry.registry()
    names = sorted(
        n for n in reg if any(w == n or w in n for w in wanted)
    )
    if not names:
        print(f"no queries match {wanted}")
        sys.exit(2)
    spark = SparkSession.builder.master("local[*]").getOrCreate()
    rc = 0
    for name in names:
        q = reg[name]
        try:
            sdf = q.spark_fn(spark, SF_DIR)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            if q.oracle is None:
                print(f"{name}: rows_only spark_rows={len(s_rows)}")
                continue
            d_cols, d_rows = run_oracle(SF_DIR, q.oracle_text())
            why = verdict(s_cols, s_rows, d_cols, d_rows)
            if why is None:
                print(f"{name}: PASS rows={len(s_rows)}")
            else:
                rc = 1
                print(f"{name}: FAIL rows={len(s_rows)}/{len(d_rows)} why={why}")
        except Exception:
            rc = 1
            print(f"{name}: ERROR\n{traceback.format_exc()}")
    sys.exit(rc)


if __name__ == "__main__":
    main()
