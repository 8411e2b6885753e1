"""Fixture table loaders (TESTDATA.md / FIXTURES.md).

The ten driver-generated parquet tables. ``load`` returns a DataFrame
per table; ``register_views`` exposes all of them as temp views so
SQL-shaped queries mirror the DuckDB oracle exactly. Reading is plain
``spark.read.parquet`` — Catalyst owns predicate pushdown, column
pruning, and partition-split sizing (``maxPartitionBytes``); at 100 TB
the same call simply fans out over more splits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in parquet, surfaced as int64 nanos via
        # spark.sql.legacy.parquet.nanosAsLong; floor-divide to µs —
        # identical to DuckDB's ns→TIMESTAMP truncation.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (same names DuckDB
    pre-registers), so ``spark.sql`` queries and oracle SQL read the
    same relations."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
