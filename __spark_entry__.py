"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over :mod:`tda596_lab02mapreduce_spark.registry` — every
operator from SURVEY.md §2 registers a named (spark_fn, oracle_sql)
pair there; this module just re-exports the inventory in the driver's
shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tda596_lab02mapreduce_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference's own benchmark workload: word count,
    exact wc.go semantics) on /root/testdata/sf0.001."""
    return registry.get("wordcount").spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each SQL-expressible query; keys
    absent here get the driver's weaker rows-only check."""
    return registry.all_oracles()
