"""Fault tolerance: the reference's crash test translated to Spark
(SURVEY.md §2B row 25).

The reference kills workers mid-task and requires the job to finish
with oracle-equal output via task re-execution
(main/test-mr.sh:284-307 crash test; mr/coordinator.go's 10s
re-dispatch). Spark's equivalent machinery is task retry
(spark.task.maxFailures) plus the FileOutputCommitter discarding
partial attempts. This test makes one partition's FIRST attempt raise
(TaskContext.attemptNumber == 0 — a deterministic "worker crash"),
and asserts the job completes with exactly the rows a healthy run
produces.

Local mode is fail-fast by default (maxFailures=1), so the scenario
runs in a subprocess with master local[4,2] — retries enabled, same
as any real cluster.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark import TaskContext

spark = (
    SparkSession.builder.master("local[4,2]")  # 4 threads, 2 attempts/task
    .appName("crash-test")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from tda596_lab02mapreduce_spark import io

docs = io.load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
src = docs.repartition(4, "doc_id")

def flaky(batches):
    ctx = TaskContext.get()
    if ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("simulated worker crash (crash.go analogue)")
    for pdf in batches:
        yield pdf

survived = src.mapInPandas(flaky, src.schema)
got = sorted((r.doc_id, r.text) for r in survived.collect())
want = sorted((r.doc_id, r.text) for r in docs.collect())
assert got == want, f"crash recovery lost/duplicated rows: {len(got)} vs {len(want)}"
print("CRASH_RECOVERY_OK", len(got))
"""


def test_task_crash_is_retried_with_identical_output():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "CRASH_RECOVERY_OK" in proc.stdout, (
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
