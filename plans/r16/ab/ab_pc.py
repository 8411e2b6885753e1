import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-pc")
spark.range(1000).selectExpr("sum(id)").collect()
par = spark.sparkContext.defaultParallelism
print("defaultParallelism =", par)

def pc_fn(width):
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
    per_cust = cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks"))
    pairs = per_cust.repartition(max(8, par // 4)).select(
        F.explode(F.expr(
            "flatten(transform(pks, (x, i) -> "
            "transform(slice(pks, i + 2, size(pks)), "
            "y -> struct(x AS pa, y AS pb))))")).alias("p"))
    sel = pairs.select("p.pa", "p.pb")
    if width:
        sel = sel.repartition(width, F.col("pa"), F.col("pb"))
    return (sel.groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 5))

def t(fn, label):
    fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(lambda: pc_fn(64*par), f"round{rnd} width=64*par={64*par}")
    t(lambda: pc_fn(8*par),  f"round{rnd} width=8*par={8*par}")
    t(lambda: pc_fn(None),   f"round{rnd} no explicit repartition")
