import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("BENCH_REPS", "2"))
variant = sys.argv[1]  # eager | lazy
lazy = variant == "lazy"
spark = get_spark(app_name=f"iso-kcore-{variant}")
spark.range(1000).selectExpr("sum(id)").collect()


def kcore():
    k, rounds = 25, 5
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(rounds):
        ds = e.groupBy("src").agg(F.count(F.lit(1)).alias("c_s")).filter(
            F.col("c_s") >= k
        )
        dd = e.groupBy("dst").agg(F.count(F.lit(1)).alias("c_d")).filter(
            F.col("c_d") >= k
        )
        e = (
            e.join(ds.select("src"), "src")
            .join(dd.select("dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=not lazy)
        )
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(
            F.lit("cust").alias("node_type"),
            F.col("src").alias("node_id"),
            F.col("deg").cast("bigint").alias("deg"),
        )
        .unionByName(
            e.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("deg"))
            .select(
                F.lit("part").alias("node_type"),
                F.col("dst").alias("node_id"),
                F.col("deg").cast("bigint").alias("deg"),
            )
        )
    )


kcore().write.mode("overwrite").format("noop").save()
best = float("inf")
for _ in range(REPS):
    t0 = time.perf_counter()
    kcore().write.mode("overwrite").format("noop").save()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT kcore_{variant} {best:.3f}")
