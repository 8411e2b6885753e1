"""SparkSession factory.

One session shape for tests, bench, and the driver contract. Design
notes for scale (SURVEY.md §4.2): AQE enabled so shuffle partition
counts / join strategies / skew handling re-plan at runtime; UTC
session timezone so timestamp semantics line up with the DuckDB
oracle; Arrow enabled so the Pandas-UDF slow path is batch-vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tda596-lab02mapreduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster the caller passes its own master URL; nothing in
    the engine assumes local mode.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Runtime re-planning: coalesce small shuffle partitions, switch
        # sort-merge→broadcast when a side turns out small, split skewed
        # partitions. All three matter at 100 TB; all free to enable.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # DuckDB-comparison hygiene: one wall-clock everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas_udf / applyInPandas / createDataFrame.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as raw int64 nanos and convert in io.load
        # (floor to µs — matches DuckDB's ns→µs conversion).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # G1 region size 32m (default: heap/2048 → 4m on the 8g local
        # driver): Spark's long-session allocation profile is dominated
        # by multi-MB arrays (shuffle-sorter pages, broadcast relations,
        # growing aggregate maps, Arrow buffers) that are HUMONGOUS on
        # 4m regions (≥ half a region) and fragment the old gen — the
        # documented heap-phasing stall class behind bench.py's
        # isolated-JVM graph group and the main-session outlier
        # watchlist (VERDICT r12 watch #2). 32m regions raise the
        # humongous threshold to 16m so those buffers take the normal
        # young-gen path. JVM-level and heap-relative, not a local[32]
        # tune. SPARK_GRAFT_DRIVER_JAVA_OPTS is APPENDED after the G1
        # flag (ADVICE r16: substitution silently dropped the tune for
        # users exporting an unrelated flag); HotSpot takes the LAST
        # occurrence of a repeated -XX flag, so exporting your own
        # -XX:G1HeapRegionSize=... still overrides.
        .config(
            "spark.driver.extraJavaOptions",
            (
                "-XX:G1HeapRegionSize=32m "
                + os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "")
            ).strip(),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
