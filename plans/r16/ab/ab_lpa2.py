import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-lpa2")
spark.range(1000).selectExpr("sum(id)").collect()

def lpa(eager: bool):
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
    per_cust = cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks"))
    capped = per_cust.select("ck", F.explode("pks").alias("pk"))
    capped = capped.repartition("ck").localCheckpoint(eager=False)
    pc = (capped.alias("a").join(capped.alias("b"),
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 5))
    e = (pc.selectExpr("pa AS src", "pb AS dst")
         .unionAll(pc.selectExpr("pb AS src", "pa AS dst"))
         .repartition("src").persist())
    lab = e.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("lbl"))
    lab = lab.localCheckpoint() if eager else lab.localCheckpoint(eager=False)
    for _ in range(4):
        lab = (e.join(lab.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst"), F.col("lbl"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy(F.col("dst").alias("id"))
            .agg(F.expr("max_by(lbl, struct(cnt, -lbl))").alias("lbl")))
        lab = lab.localCheckpoint() if eager else lab.localCheckpoint(eager=False)
    sizes = lab.groupBy("lbl").agg(F.count(F.lit(1)).cast("bigint").alias("community_size"))
    out = lab.join(sizes, "lbl").select(F.col("id").alias("part_id"), F.col("lbl").alias("community"), "community_size")
    out.write.mode("overwrite").format("noop").save()
    e.unpersist()

def t(eager, label):
    lpa(eager)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); lpa(eager); best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(True,  f"round{rnd} EAGER ckpt")
    t(False, f"round{rnd} LAZY ckpt")
