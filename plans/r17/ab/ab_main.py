#!/usr/bin/env python
"""Warmed-JVM in-session A/B for the round-17 non-isolated candidates:
  pack    — pair-count aggregate on a packed (pa<<32|pb) bigint key
            vs the two-column key (cosine self-join source and the
            _copurchase_edges explode source)
  drain   — stateful AvailableNow drains at 32 vs 4 shuffle partitions
  star    — dbscan star loop: eager ckpt + count (2 jobs/round) vs
            lazy ckpt + count (1 job/round)
Run: python ab_main.py <block> [block...]   blocks: pack drain star
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab-main")
spark.range(1000).selectExpr("sum(id)").collect()


def t(fn, label, reps=3):
    spark.sparkContext.setJobDescription(f"warmup:{label}")
    fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for r in range(reps):
        spark.sparkContext.setJobDescription(f"timed:{label}:{r}")
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{best:7.3f}  {label}", flush=True)
    return best


# ---------------- pack: cosine pair count -----------------
def _capped(spark):
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
    )
    per_cust = cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks")
    )
    capped = per_cust.select("ck", F.explode("pks").alias("pk"))
    return capped.repartition("ck").localCheckpoint(eager=False)


def cosine_pc_current():
    capped = _capped(spark)
    return (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )


def cosine_pc_packed():
    capped = _capped(spark)
    packed = (
        capped.alias("a")
        .join(
            capped.alias("b"),
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(
            (F.shiftleft(F.col("a.pk").cast("bigint"), 32)
             + F.col("b.pk").cast("bigint")).alias("pp")
        )
        .groupBy("pp")
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    return packed.select(
        F.shiftright("pp", 32).alias("pa"),
        (F.col("pp") - F.shiftleft(F.shiftright("pp", 32), 32)).alias("pb"),
        "c_ab",
    )


# ---------------- pack: copurchase explode source -----------------
def copc_current():
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
    )
    per_cust = cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks")
    )
    par = spark.sparkContext.defaultParallelism
    pairs = per_cust.repartition(max(8, par // 4)).select(
        F.explode(
            F.expr(
                "flatten(transform(pks, (x, i) -> "
                "transform(slice(pks, i + 2, size(pks)), "
                "y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.pa", "p.pb")
        .repartition(max(256, 8 * par), F.col("pa"), F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )


def copc_packed():
    orders = io.load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = io.load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    cb = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk")
    )
    per_cust = cb.groupBy("ck").agg(
        F.slice(F.array_sort(F.collect_set("pk")), 1, 128).alias("pks")
    )
    par = spark.sparkContext.defaultParallelism
    pairs = per_cust.repartition(max(8, par // 4)).select(
        F.explode(
            F.expr(
                "flatten(transform(pks, (x, i) -> "
                "transform(slice(pks, i + 2, size(pks)), "
                "y -> shiftleft(cast(x AS bigint), 32) + y)))"
            )
        ).alias("pp")
    )
    pc = (
        pairs.repartition(max(256, 8 * par), F.col("pp"))
        .groupBy("pp")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 5)
    )
    return pc.select(
        F.shiftright("pp", 32).alias("pa"),
        (F.col("pp") - F.shiftleft(F.shiftright("pp", 32), 32)).alias("pb"),
        "c",
    )


# ---------------- drain: spans_ttl / ohlc_append at N partitions ---------
def drain_spans(nparts):
    def run():
        from tda596_lab02mapreduce_spark.streaming.stateful import user_spans_ttl
        from tda596_lab02mapreduce_spark.streaming.windows import (
            events_stream,
            run_available_now,
        )

        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        try:
            cents = events_stream(spark, SF).select(
                "event_id",
                "user_id",
                "ts",
                F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
            )
            drained = run_available_now(
                user_spans_ttl(cents),
                f"q_ab_spans_{nparts}",
                output_mode="update",
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        return drained.select(
            "user_id", "span_start_us", "span_last_us", "n_events", "sum_cents"
        )

    return run


def drain_ohlc(nparts):
    def run():
        from tda596_lab02mapreduce_spark.queries.timeseries import ohlc_cents_okey
        from tda596_lab02mapreduce_spark.streaming.windows import (
            events_stream,
            run_available_now,
        )

        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        try:
            ev = events_stream(spark, SF)
            cents, okey, aggs = ohlc_cents_okey(ev)
            pts = ev.select("user_id", "ts", cents.alias("cents"), okey.alias("okey"))
            agg = (
                pts.withWatermark("ts", "2 hours")
                .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
                .agg(*aggs)
                .select(
                    "user_id", F.col("w.start").alias("hour"),
                    "open_c", "high_c", "low_c", "close_c", "n_events",
                )
            )
            out = run_available_now(
                agg, f"q_ab_ohlc_{nparts}", output_mode="append"
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        return out

    return run


# ---------------- star: dbscan components loop -----------------
def dbscan_star(lazy_fuse: bool):
    def run():
        from tda596_lab02mapreduce_spark.operators.dbscan import (
            eps_neighbor_pairs,
            _points,
        )
        from tda596_lab02mapreduce_spark.operators import components as C

        emb = io.load(spark, SF, "embeddings")
        pts = _points(emb, "vec_id", "embedding")
        pairs = eps_neighbor_pairs(pts).localCheckpoint(eager=False)
        core = (
            pairs.groupBy("a_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 5)
            .select(F.col("a_id").alias("id"))
        )
        core_pairs = (
            pairs.join(core.withColumnRenamed("id", "a_id"), "a_id")
            .join(core.withColumnRenamed("id", "b_id"), "b_id")
            .filter(F.col("a_id") < F.col("b_id"))
        )
        e = core_pairs.select(
            F.col("a_id").alias("src"), F.col("b_id").alias("dst")
        )
        # inline _star_components with the variant knob
        e0 = e.localCheckpoint()
        nodes = (
            e0.select(F.col("src").alias("id"))
            .unionByName(e0.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint()
        )
        cur = (
            e0.select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        cnt = cur.count()
        for _ in range(50):
            nxt = C._small_star(C._large_star(cur))
            if lazy_fuse:
                nxt = nxt.localCheckpoint(eager=False)
            else:
                nxt = nxt.localCheckpoint()
            nxt_cnt = nxt.count()
            if nxt_cnt == cnt and nxt.subtract(cur).isEmpty():
                cur = nxt
                break
            cur, cnt = nxt, nxt_cnt
        else:
            raise RuntimeError("no fixpoint")
        labels = nodes.join(
            cur.select(F.col("src").alias("id"), F.col("dst").alias("comp")),
            "id",
            "left",
        ).select("id", F.coalesce("comp", "id").alias("comp"))
        return labels

    return run


if __name__ == "__main__":
    blocks = sys.argv[1:] or ["pack", "drain", "star"]
    for rnd in range(2):
        if "pack" in blocks:
            t(cosine_pc_current, f"r{rnd} cosine_pc current")
            t(cosine_pc_packed, f"r{rnd} cosine_pc packed")
            t(copc_current, f"r{rnd} copurchase_pc current")
            t(copc_packed, f"r{rnd} copurchase_pc packed")
        if "drain" in blocks:
            t(drain_spans(32), f"r{rnd} spans_ttl 32p", reps=2)
            t(drain_spans(4), f"r{rnd} spans_ttl 4p", reps=2)
            t(drain_ohlc(32), f"r{rnd} ohlc_append 32p", reps=2)
            t(drain_ohlc(4), f"r{rnd} ohlc_append 4p", reps=2)
        if "star" in blocks:
            t(dbscan_star(False), f"r{rnd} dbscan_star eager")
            t(dbscan_star(True), f"r{rnd} dbscan_star lazyfuse")
