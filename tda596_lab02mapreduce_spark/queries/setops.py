"""Set-operation band of SURVEY.md §2B: union all / union distinct,
intersect(+all), except(+all).

Reference form: union is implicit (reduce concatenates all map
inputs, mr/worker.go:116-118); intersect/except would be tag +
membership test in reducef. Here they are Catalyst set operators
(hash-aggregate based)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


def _event_keys(spark, sf_dir, etype, lo, hi):
    return (
        io.load(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == etype)
            & (F.col("value") >= lo)
            & (F.col("value") < hi)
        )
        .select("user_id")
    )


@register(
    "set_union_all",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click' AND value >= 10 AND value < 80
UNION ALL
SELECT user_id FROM events WHERE event_type = 'view' AND value >= 10 AND value < 80
""",
    doc="UNION ALL: bag concatenation, zero shuffle (partitions append).",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _event_keys(spark, sf_dir, "click", 10, 80)
    b = _event_keys(spark, sf_dir, "view", 10, 80)
    return a.unionByName(b)


@register(
    "set_union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click' AND value >= 10 AND value < 80
UNION
SELECT user_id FROM events WHERE event_type = 'view' AND value >= 10 AND value < 80
""",
    doc="UNION DISTINCT: concatenation + hash dedup shuffle.",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _event_keys(spark, sf_dir, "click", 10, 80)
    b = _event_keys(spark, sf_dir, "view", 10, 80)
    return a.unionByName(b).distinct()


@register(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
""",
    doc="INTERSECT (distinct): users who both purchased and errored.",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = io.load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").select("user_id")
    b = io.load(spark, sf_dir, "events").filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
FROM events WHERE event_type = 'purchase'
""",
    doc=(
        "EXCEPT (distinct): (user, day) pairs with a click but no "
        "purchase that day. (The coarser user-grain form is vacuously "
        "empty on the fixtures — every user eventually has every "
        "event type — and an empty result passes any oracle; the "
        "daily grain keeps the EXCEPT shape with a real answer.)"
    ),
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    a = ev.filter(F.col("event_type") == "click").select("user_id", day)
    b = ev.filter(F.col("event_type") == "purchase").select("user_id", day)
    return a.subtract(b)


@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    doc="INTERSECT ALL: bag semantics (min multiplicity).",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = io.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = io.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    doc="EXCEPT ALL: bag difference (multiplicity-aware).",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = io.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = io.load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)
