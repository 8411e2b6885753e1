import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-lpa")
spark.range(1000).selectExpr("sum(id)").collect()

def pairs_variant(distinct: bool):
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
    if distinct:
        cb = cb.distinct()
    per_cust = cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks"))
    capped = per_cust.select("ck", F.explode("pks").alias("pk"))
    capped = capped.repartition("ck").localCheckpoint(eager=False)
    pc = (capped.alias("a").join(capped.alias("b"),
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 5))
    return pc

def t(fn, label):
    fn().write.mode("overwrite").format("noop").save()  # warm
    best = min(
        (lambda t0: (fn().write.mode("overwrite").format("noop").save(), time.perf_counter()-t0)[1])(time.perf_counter())
        for _ in range(3))
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(lambda: pairs_variant(True),  f"round{rnd} WITH distinct")
    t(lambda: pairs_variant(False), f"round{rnd} NO distinct")
