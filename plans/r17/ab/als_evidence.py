#!/usr/bin/env python
"""ALS plan evidence (VERDICT r16 next-round #2): capture the FINAL
adaptive plan of a single user-solve half-round under both ratings
preparations — (a) r16 checkpoint-then-repartition-in-plan, (b) r15
repartition-then-checkpoint — plus an in-session A/B of the full
rank-2 query under both. Shows whether the in-plan exchange actually
buys an exchange-free u-aggregation / co-partitioned item join."""
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark
from tda596_lab02mapreduce_spark.operators import als as A

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="als-evidence")
spark.range(1000).selectExpr("sum(id)").collect()


def ratings_r16():
    return A.als_ratings(spark, SF).localCheckpoint(eager=False).repartition(F.col("u"))


def ratings_r15():
    return A.als_ratings(spark, SF).repartition(F.col("u")).localCheckpoint(eager=False)


def final_plan(df):
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


for name, mk in (("r16_ckpt_then_repart", ratings_r16), ("r15_repart_then_ckpt", ratings_r15)):
    ratings = mk()
    y = A._init_item_factors(ratings)
    x = A._half_round(
        ratings, y, join_key="i", group_key="u",
        f1="y1", f2="y2", broadcast_factors=True,
    )
    p_user = final_plan(x)
    y2 = A._half_round(
        ratings, x, join_key="u", group_key="i",
        f1="x1", f2="x2", broadcast_factors=False,
    )
    p_item = final_plan(y2)
    with open(f"/tmp/r17/als_halfround_user_{name}.txt", "w") as f:
        f.write(p_user)
    with open(f"/tmp/r17/als_halfround_item_{name}.txt", "w") as f:
        f.write(p_item)
    print(name, "user-solve Exchanges:", p_user.count("Exchange"),
          "item-solve Exchanges:", p_item.count("Exchange"),
          "item ReuseExchange:", p_item.count("ReusedExchange"))


def rank2(mk):
    def run():
        ratings = mk()
        x, y = A._train_loop(ratings, 2)
        return x.select("u", "n", "x1", "x2")
    return run


def t(fn, label, reps=3):
    fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.3f}  {label}", flush=True)


for rnd in range(2):
    t(rank2(ratings_r16), f"r{rnd} als 2-round trajectory r16-order")
    t(rank2(ratings_r15), f"r{rnd} als 2-round trajectory r15-order")
