#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r16/<query>_<tag>.txt — the optimization round's plan-diff
evidence (spark_optimization_guide.md §1: record the plan shape
before and after every change).

Run: python tools/capture_plans.py <tag> <query-name> ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Plans are captured WITHOUT executing the query (explain only), so the
capture is cheap; streaming drains and collect-in-loop model fits that
cannot be explained lazily are executed as written (their plan text
then covers the final returned frame only, noted in the file header).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tda596_lab02mapreduce_spark import registry
from tda596_lab02mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r17"),
)


def main() -> None:
    if len(sys.argv) < 3:
        print("usage: capture_plans.py <tag: before|after> <query> ...")
        sys.exit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="tda596-capture-plans")
    qs = registry.all_queries()
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        df = qs[name](spark, SF_DIR)
        # private API mirror of df.explain("formatted") that returns
        # the string instead of printing
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF_DIR} ({tag})\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
