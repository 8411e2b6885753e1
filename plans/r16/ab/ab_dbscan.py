import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.operators.dbscan import _points, eps_neighbor_pairs, MINPTS
from tda596_lab02mapreduce_spark.operators.components import connected_components
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-dbscan")
spark.range(1000).selectExpr("sum(id)").collect()

def t(fn, label, reps=2):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

def pairs_only():
    pts = _points(io.load(spark, SF, "embeddings"), "vec_id", "embedding")
    eps_neighbor_pairs(pts).write.mode("overwrite").format("noop").save()

def core_pairs_only():
    pts = _points(io.load(spark, SF, "embeddings"), "vec_id", "embedding")
    pairs = eps_neighbor_pairs(pts).localCheckpoint(eager=False)
    core = (pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= MINPTS).select(F.col("a_id").alias("id")))
    cp = (pairs.join(core.withColumnRenamed("id", "a_id"), "a_id")
          .join(core.withColumnRenamed("id", "b_id"), "b_id")
          .filter(F.col("a_id") < F.col("b_id")))
    cp.write.mode("overwrite").format("noop").save()

def comp_only():
    pts = _points(io.load(spark, SF, "embeddings"), "vec_id", "embedding")
    pairs = eps_neighbor_pairs(pts).localCheckpoint(eager=False)
    core = (pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= MINPTS).select(F.col("a_id").alias("id")))
    cp = (pairs.join(core.withColumnRenamed("id", "a_id"), "a_id")
          .join(core.withColumnRenamed("id", "b_id"), "b_id")
          .filter(F.col("a_id") < F.col("b_id")))
    comp = connected_components(cp, "a_id", "b_id", id_out="id", comp_out="cluster", algorithm="star")
    comp.write.mode("overwrite").format("noop").save()

t(pairs_only, "eps pairs only")
t(core_pairs_only, "pairs + core filter")
t(comp_only, "pairs + core + star components")
