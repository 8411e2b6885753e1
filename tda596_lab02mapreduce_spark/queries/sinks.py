"""Sink round-trips (SURVEY.md §2B row 2): write through the engine's
committer-protected sinks, re-scan the files, and prove the data
survived bit-exactly against the DuckDB oracle over the ORIGINAL
tables. The reference's analogue is its final `mr-out-*` text output
diffed against the sequential oracle (main/test-mr.sh:103-104).

Output paths live under <repo>/.tmp (gitignored); each query overwrites
its own directory, so repeated invocations are idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io, sources
from tda596_lab02mapreduce_spark.registry import register

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sink_path(sf_dir: str, name: str) -> str:
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return os.path.join(_REPO_ROOT, ".tmp", f"{name}_{tag}")


@register(
    "sink_partitioned_roundtrip",
    oracle="""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY o_orderstatus
""",
    doc=(
        "Partitioned parquet sink + re-scan: orders written "
        "partitionBy(o_orderstatus) through the FileOutputCommitter "
        "(atomic tmp+rename, the reference's mr/coordinator.go:37-53 "
        "contract), read back from the hive-style layout, aggregated — "
        "the oracle runs on the ORIGINAL table, so any loss/corruption/"
        "type-drift in the sink-scan cycle breaks the hash."
    ),
    tags=("sink", "source"),
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load(spark, sf_dir, "orders")
    path = _sink_path(sf_dir, "orders_by_status")
    sources.write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = sources.read_parquet(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "sink_text_kv_roundtrip",
    oracle=r"""
SELECT word AS key, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word
  FROM documents
) t
WHERE word <> ''
GROUP BY word
""",
    doc=(
        "The reference's A10 text sink round-tripped: wordcount results "
        "written as partitioned `key value` text (mr/worker.go:152 "
        "format), re-read at line granularity, parsed back to typed "
        "columns, and hash-matched against the wordcount oracle — "
        "proving the sink, the text scan, and the parse are lossless."
    ),
    tags=("sink", "source", "text"),
)
def sink_text_kv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.mapreduce import save_text_kv

    docs = io.load(spark, sf_dir, "documents")
    from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty

    wc = (
        docs.select(F.explode(tokens_nonempty("text")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("string").alias("value"))
    )
    path = _sink_path(sf_dir, "wc_text_kv")
    save_text_kv(wc, path)
    lines = sources.read_text_lines(spark, path + "/part-*")
    parsed = lines.select(
        F.regexp_extract("line", r"^(\S+) (\S+)$", 1).alias("key"),
        F.regexp_extract("line", r"^(\S+) (\S+)$", 2).cast("long").alias("cnt"),
    )
    return parsed


@register(
    "sink_orc_roundtrip",
    oracle="""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part
GROUP BY p_brand
""",
    doc=(
        "ORC sink + re-scan: part written as ORC (Spark's second "
        "first-class columnar format, same vectorized FileSourceScan + "
        "pushdown path as parquet), read back, aggregated; oracle runs "
        "on the ORIGINAL parquet — any type drift across the "
        "parquet→ORC→scan cycle breaks the hash."
    ),
    tags=("sink", "source"),
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = io.load(spark, sf_dir, "part")
    path = _sink_path(sf_dir, "part_orc")
    sources.write_orc(part, path)
    back = sources.read_orc(spark, path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "sink_csv_roundtrip",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc=(
        "CSV sink + re-scan with explicit schema (CSV is typeless, so the "
        "read-back declares the types — inference is both a second full "
        "pass and a correctness hazard). Doubles survive because Spark "
        "writes shortest-round-trip decimal strings; the aggregate is "
        "hash-matched against the ORIGINAL parquet table."
    ),
    tags=("sink", "source"),
)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer")
    path = _sink_path(sf_dir, "customer_csv")
    sources.write_csv(cust, path)
    back = sources.read_csv(
        spark,
        path,
        schema="c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING",
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_bal"),
    )


@register(
    "sink_json_roundtrip",
    oracle="""
SELECT CAST(s_nationkey AS INT) AS s_nationkey,
       CAST(count(*) AS BIGINT) AS n_supp,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM supplier
GROUP BY s_nationkey
""",
    doc=(
        "JSON-lines sink + re-scan with explicit schema (schemaless "
        "format, declared types on read — same rationale as CSV). "
        "Aggregate hash-matched against the ORIGINAL parquet table."
    ),
    tags=("sink", "source"),
)
def sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = io.load(spark, sf_dir, "supplier")
    path = _sink_path(sf_dir, "supplier_json")
    sources.write_json(supp, path)
    back = sources.read_json(
        spark,
        path,
        schema="s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    )
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_bal"),
    )
