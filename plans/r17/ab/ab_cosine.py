#!/usr/bin/env python
"""recsys_item_cosine_topk full query: r16 self-join pair enumeration
vs the packed-explode emission (the _copurchase_edges shape that just
won LPA's fresh-JVM A/B 3/3)."""
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-cosine")
spark.range(1000).selectExpr("sum(id)").collect()


def _per_cust():
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
    )
    return cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks")
    )


def _tail(pc, ic):
    sym = pc.selectExpr("pa AS item", "pb AS neighbor", "c_ab").unionAll(
        pc.selectExpr("pb AS item", "pa AS neighbor", "c_ab")
    )
    ci = ic.selectExpr("pk AS item", "c AS c_i")
    cn = ic.selectExpr("pk AS neighbor", "c AS c_n")
    scored = (
        sym.join(ci, "item")
        .join(cn, "neighbor")
        .select(
            "item",
            "neighbor",
            F.col("c_ab").cast("bigint").alias("n_common"),
            F.expr(
                "CAST((CAST(1000000000000 AS DECIMAL(38,0)) * c_ab * c_ab)"
                " div (c_i * c_n) AS BIGINT)"
            ).alias("cos2_ppt"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cos2_ppt").desc(), F.col("neighbor"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("item", "neighbor", "n_common", "cos2_ppt", "rnk")
    )


def cosine_selfjoin():
    per_cust = _per_cust()
    capped = per_cust.select("ck", F.explode("pks").alias("pk"))
    capped = capped.repartition("ck").localCheckpoint(eager=False)
    ic = capped.groupBy("pk").agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c"))
    pc = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    return _tail(pc, ic)


def cosine_packed():
    per_cust = _per_cust().localCheckpoint(eager=False)
    ic = (
        per_cust.select(F.explode("pks").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c"))
    )
    par = spark.sparkContext.defaultParallelism
    pairs = per_cust.repartition(max(8, par // 4)).select(
        F.explode(
            F.expr(
                "flatten(transform(pks, (x, i) -> "
                "transform(slice(pks, i + 2, size(pks)), "
                "y -> CASE WHEN y >= 2147483648 THEN "
                "CAST(raise_error('overflow') AS BIGINT) "
                "ELSE shiftleft(CAST(x AS BIGINT), 32) + y END)))"
            )
        ).alias("pp")
    )
    pc = (
        pairs.repartition(max(256, 8 * par), F.col("pp"))
        .groupBy("pp")
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
        .select(
            F.shiftright("pp", 32).alias("pa"),
            F.col("pp").bitwiseAND(F.lit(0xFFFFFFFF)).alias("pb"),
            "c_ab",
        )
    )
    return _tail(pc, ic)


def t(fn, label, reps=3):
    fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.3f}  {label}", flush=True)


# sanity: identical results
a = sorted(map(tuple, cosine_selfjoin().collect()))
b = sorted(map(tuple, cosine_packed().collect()))
print("results identical:", a == b, len(a), flush=True)

for rnd in range(2):
    t(cosine_selfjoin, f"r{rnd} cosine self-join (r16)")
    t(cosine_packed, f"r{rnd} cosine packed-explode")
