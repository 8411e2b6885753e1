import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="mem1g-pc")  # SPARK_GRAFT_DRIVER_MEM=1g via env
par = spark.sparkContext.defaultParallelism
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
pc = (pairs.select("p.pa", "p.pb")
      .repartition(max(256, 8 * par), F.col("pa"), F.col("pb"))
      .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("c"))
      .filter(F.col("c") >= 5))
# full weighted-edge consumer shape, like graph_weighted_cheapest stages it
e = (pc.withColumn("w", F.expr("(1000000 + c - 1) div c").cast("bigint"))
     .selectExpr("pa AS src", "pb AS dst", "w")
     .unionAll(pc.selectExpr("pb AS src", "pa AS dst", "(1000000 + c - 1) div c AS w"))
     .repartition("src"))
e.write.mode("overwrite").format("noop").save()
print("1g-contract OK: pair count + weighted edges completed at 8*par width")
