"""The reference harness's last two behavioral probes, translated
(VERDICT r7 item 8).

- ``jobcount`` (main/test-mr.sh:201-223): with 4 contending workers,
  map tasks must be COUNTED exactly 8 times in the visible output —
  re-executions must never inflate what a reader sees.  Spark analogue:
  force a task retry (attempt 0 of one partition crashes AFTER writing
  its temp file — the dangerous half-done case) and assert the
  pluggable textkv sink's visible output counts every row exactly
  once, while an execution log proves a retry really happened (so the
  exactly-once claim is non-vacuous).
- ``early_exit`` (main/test-mr.sh:230-280): output sorted at the
  moment the first worker exits must be byte-identical to the final
  output — commit is FINAL.  Spark analogue: snapshot the committed
  ``mr-out-*`` bytes right after ``save()`` returns, then throw a
  failing append job at the same directory and assert the snapshot
  never changes (the append-clash fail-fast + abort sweep leave
  committed output untouched).

Both run the real DataSourceWriter protocol, not a mock; the retry
probe needs ``local[4,2]`` (attempts > 1), which local-mode pytest
sessions don't have, so it runs in a subprocess like the crash test.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

_JOBCOUNT_SCRIPT = r"""
import os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark import TaskContext
from pyspark.sql import functions as F

out = sys.argv[1]
execlog = sys.argv[2]

spark = (
    SparkSession.builder.master("local[4,2]")
    .appName("jobcount-probe")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tda596_lab02mapreduce_spark.sources.pydatasource import register_textkv_sink

register_textkv_sink(spark)

df = spark.createDataFrame(
    [(f"k{i:02d}", i) for i in range(16)], "k string, v long"
).repartition(4, "k")

def flaky(batches):
    ctx = TaskContext.get()
    with open(execlog, "a") as fh:
        fh.write(f"exec p={ctx.partitionId()} a={ctx.attemptNumber()}\n")
    first = True
    for pdf in batches:
        if first and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            # half-done crash: rows already emitted downstream may have
            # reached the sink's temp file before the task dies
            half = pdf.iloc[: max(1, len(pdf) // 2)]
            yield half
            raise RuntimeError("simulated worker crash after partial output")
        first = False
        yield pdf

src = df.mapInPandas(flaky, df.schema)
src.write.format("textkv_sink").option("path", out).mode("append").save()
print("JOBCOUNT_WRITE_OK")
"""


def test_jobcount_exactly_once_visible_under_retry(tmp_path):
    out = str(tmp_path / "out")
    execlog = str(tmp_path / "execs.log")
    proc = subprocess.run(
        [sys.executable, "-c", _JOBCOUNT_SCRIPT, out, execlog],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "JOBCOUNT_WRITE_OK" in proc.stdout, proc.stderr[-2000:]
    # a retry really happened: >4 executions over 4 partitions, and
    # partition 0 ran twice (attempts 0 and 1)
    execs = open(execlog).read().splitlines()
    assert len(execs) > 4, execs
    assert "exec p=0 a=0" in execs and "exec p=0 a=1" in execs, execs
    # visible output counts every row EXACTLY once — the jobcount
    # contract: re-executions never inflate what a reader sees
    committed = sorted(
        f for f in os.listdir(out) if f.startswith("mr-out-")
    )
    assert committed == [f"mr-out-{p}" for p in range(4)], committed
    lines = sorted(
        ln
        for f in committed
        for ln in open(os.path.join(out, f)).read().splitlines()
    )
    assert lines == sorted(f"k{i:02d} {i}" for i in range(16)), lines


def test_early_exit_committed_output_is_final(spark, tmp_path):
    from tda596_lab02mapreduce_spark.sources.pydatasource import (
        register_textkv_sink,
    )

    register_textkv_sink(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3), ("d", 4)], "k string, v long"
    )
    df.repartition(2, "k").write.format("textkv_sink").option("path", out).mode(
        "append"
    ).save()

    def snapshot() -> dict:
        return {
            f: open(os.path.join(out, f), "rb").read()
            for f in os.listdir(out)
            if f.startswith("mr-out-")
        }

    initial = snapshot()
    assert sorted(initial) == ["mr-out-0", "mr-out-1"]

    # a later FAILING job against the same directory (task raises
    # mid-write) must not disturb the committed bytes
    boom = df.select(
        "k",
        F.when(F.col("v") > 2, F.raise_error("boom"))
        .otherwise(F.col("v"))
        .cast("long")
        .alias("v"),
    )
    with pytest.raises(Exception):
        boom.write.format("textkv_sink").option("path", out).mode("append").save()
    assert snapshot() == initial

    # a later SUCCEEDING append that would clash with committed names
    # must fail fast BEFORE any rename — and leave the bytes untouched
    with pytest.raises(Exception):
        df.repartition(2, "k").write.format("textkv_sink").option(
            "path", out
        ).mode("append").save()
    assert snapshot() == initial
