#!/usr/bin/env python
"""Job-count + subplan evidence for the r17 changes whose final-frame
explain is unchanged (lazy-checkpoint fusion, packed pair key):
records Spark's own job counts per variant via job groups, and the
pair-count stage's explain for the packed key."""
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="evidence-jobs")
spark.range(1000).selectExpr("sum(id)").collect()
sc = spark.sparkContext
out = open("/root/repo/plans/r17/jobcount_evidence.txt", "w")


def count_jobs(group, fn):
    sc.setJobGroup(group, group)
    df = fn()
    df.write.mode("overwrite").format("noop").save()
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    ids = tracker.getJobIdsForGroup(group)
    return len(ids)


def kcore(lazy: bool):
    def run():
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
            ds = e.groupBy("src").agg(F.count(F.lit(1)).alias("c_s")).filter(F.col("c_s") >= k)
            dd = e.groupBy("dst").agg(F.count(F.lit(1)).alias("c_d")).filter(F.col("c_d") >= k)
            e = (
                e.join(ds.select("src"), "src")
                .join(dd.select("dst"), "dst")
                .select("src", "dst")
                .localCheckpoint(eager=not lazy)
            )
        return (
            e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
            .select(F.lit("cust").alias("node_type"), F.col("src").alias("node_id"),
                    F.col("deg").cast("bigint").alias("deg"))
            .unionByName(
                e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
                .select(F.lit("part").alias("node_type"), F.col("dst").alias("node_id"),
                        F.col("deg").cast("bigint").alias("deg")))
        )
    return run


def dbscan_star(lazy: bool):
    def run():
        from tda596_lab02mapreduce_spark.operators.dbscan import eps_neighbor_pairs, _points
        from tda596_lab02mapreduce_spark.operators import components as C
        emb = io.load(spark, SF, "embeddings")
        pts = _points(emb, "vec_id", "embedding")
        pairs = eps_neighbor_pairs(pts).localCheckpoint(eager=False)
        core = (pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") >= 5).select(F.col("a_id").alias("id")))
        core_pairs = (pairs.join(core.withColumnRenamed("id", "a_id"), "a_id")
                      .join(core.withColumnRenamed("id", "b_id"), "b_id")
                      .filter(F.col("a_id") < F.col("b_id")))
        e = core_pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        ck = (lambda df: df.localCheckpoint(eager=False)) if lazy else (lambda df: df.localCheckpoint())
        e0 = ck(e)
        nodes = (e0.select(F.col("src").alias("id"))
                 .unionByName(e0.select(F.col("dst").alias("id"))).distinct())
        nodes = ck(nodes)
        cur = ck(e0.select(F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst"))
                 .filter(F.col("src") != F.col("dst")).distinct())
        cnt = cur.count()
        for _ in range(50):
            nxt = ck(C._small_star(C._large_star(cur)))
            nxt_cnt = nxt.count()
            if nxt_cnt == cnt and nxt.subtract(cur).isEmpty():
                cur = nxt
                break
            cur, cnt = nxt, nxt_cnt
        labels = nodes.join(cur.select(F.col("src").alias("id"), F.col("dst").alias("comp")),
                            "id", "left").select("id", F.coalesce("comp", "id").alias("comp"))
        return labels
    return run


out.write("Spark's own job counts per variant (statusTracker.getJobIdsForGroup\n"
          "over one noop-sink execution of each variant, warmed session):\n\n")
for name, fn in (
    ("kcore eager per-round ckpt (r16)", kcore(False)),
    ("kcore lazy per-round ckpt (r17)", kcore(True)),
    ("dbscan star eager ckpt+count (r16)", dbscan_star(False)),
    ("dbscan star lazy ckpt fused w/ count (r17)", dbscan_star(True)),
):
    n = count_jobs(name, fn)
    out.write(f"  {n:3d} jobs  {name}\n")
    print(n, name, flush=True)

# packed pair-count subplan (the _copurchase_edges pc frame, pre-persist)
import importlib
from tda596_lab02mapreduce_spark.queries import association as assoc
orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
# reproduce pc exactly as _copurchase_edges builds it (current code)
li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
    F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
per_cust = cb.groupBy("ck").agg(F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks"))
par = spark.sparkContext.defaultParallelism
pairs = per_cust.repartition(max(8, par // 4)).select(
    F.explode(F.expr(
        "flatten(transform(pks, (x, i) -> "
        "transform(slice(pks, i + 2, size(pks)), "
        "y -> CASE WHEN y >= 2147483648 THEN "
        "CAST(raise_error('overflow') AS BIGINT) "
        "ELSE shiftleft(CAST(x AS BIGINT), 32) + y END)))")).alias("pp"))
pc = (pairs.repartition(max(256, 8 * par), F.col("pp"))
      .groupBy("pp").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") >= 5)
      .select(F.shiftright("pp", 32).alias("pa"),
              F.col("pp").bitwiseAND(F.lit(0xFFFFFFFF)).alias("pb"), "c"))
txt = pc._sc._jvm.PythonSQLUtils.explainString(pc._jdf.queryExecution(), "formatted")
with open("/root/repo/plans/r17/copurchase_paircount_packed_after.txt", "w") as f:
    f.write(f"-- _copurchase_edges pair-count subplan, PACKED key (r17)\n{txt}")
out.close()
print("done")
