import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-ft")
spark.range(1000).selectExpr("sum(id)").collect()

def ft(share_po: bool):
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    part = io.load(spark, SF, "part").select("p_partkey", "p_brand")
    items = (li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .groupBy("ok").agg(F.slice(F.array_sort(F.collect_set("b")), 1, 64).alias("bs"))
        .select("ok", F.explode("bs").alias("b"))
        .localCheckpoint(eager=False))
    minsup = items.agg(F.greatest(F.lit(3).cast("bigint"),
        F.expr("CAST(count(DISTINCT ok) DIV 200 AS BIGINT)")).alias("minsup"))
    po = (items.alias("a").join(items.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.b") < F.col("b.b")))
          .select(F.col("a.ok").alias("ok"), F.col("a.b").alias("b1"), F.col("b.b").alias("b2")))
    if share_po:
        po = po.localCheckpoint(eager=False)
    pairs = (po.groupBy(F.col("b1").alias("pa"), F.col("b2").alias("pb"))
        .agg(F.count(F.lit(1)).alias("ps"))
        .crossJoin(F.broadcast(minsup)).filter(F.col("ps") >= F.col("minsup")).select("pa", "pb"))
    fp = F.broadcast(pairs)
    p12 = po.join(fp, (F.col("b1") == fp.pa) & (F.col("b2") == fp.pb), "left_semi")
    tri = (p12.join(items.alias("c"), (p12.ok == F.col("c.ok")) & (p12.b2 < F.col("c.b")))
        .select("b1", "b2", F.col("c.b").alias("b3"))
        .join(fp, (F.col("b2") == fp.pa) & (F.col("b3") == fp.pb), "left_semi")
        .join(fp, (F.col("b1") == fp.pa) & (F.col("b3") == fp.pb), "left_semi")
        .groupBy("b1", "b2", "b3").agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .crossJoin(F.broadcast(minsup)).filter(F.col("support") >= F.col("minsup")))
    tri.write.mode("overwrite").format("noop").save()

def t(fn, label):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(lambda: ft(False), f"round{rnd} po recomputed")
    t(lambda: ft(True),  f"round{rnd} po checkpointed")
