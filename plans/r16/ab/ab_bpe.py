import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-bpe")
spark.range(1000).selectExpr("sum(id)").collect()

def bpe(ckpt: bool, rounds=3):
    docs = io.widen_if_few_splits(io.load(spark, SF, "documents"), "doc_id")
    wf = (docs.select(F.explode(tokens_nonempty("text")).alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    pad = lambda c: F.lpad(c.cast("string"), 7, "0")
    enc = wf.select("word", F.expr(
        "array_join(transform(split(word, ''), "
        "c -> concat('#', lpad(cast(ascii(c) as string), 7, '0'))), '')").alias("enc"), "freq")
    syms = (wf.select(F.explode(F.split("word", "")).alias("c"))
            .filter(F.col("c") != "").distinct()
            .select(pad(F.expr("ascii(c)")).alias("id"), F.col("c").alias("s")))
    if ckpt:
        enc = enc.localCheckpoint(eager=False)
        syms = syms.localCheckpoint(eager=False)
    tops = []
    for r in range(1, rounds + 1):
        mid = str(2000000 + r)
        ids = enc.select(F.expr("filter(split(enc, '#'), x -> x <> '')").alias("ids"), "freq").filter(F.size("ids") >= 2)
        pairs = (ids.select(F.explode(F.expr(
            "transform(slice(ids, 1, size(ids) - 1), "
            "(x, i) -> struct(x AS l, element_at(ids, i + 2) AS r2))")).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r2").alias("r2"))
            .agg(F.sum("freq").cast("bigint").alias("c")))
        sl = syms.select(F.col("id").alias("l"), F.col("s").alias("ls"))
        sr = syms.select(F.col("id").alias("r2"), F.col("s").alias("rs"))
        top = (pairs.join(F.broadcast(sl), "l").join(F.broadcast(sr), "r2")
            .orderBy(F.desc("c"), "ls", "rs").limit(1)
            .select(F.col("l").alias("lid"), F.col("r2").alias("rid"), "ls", "rs", F.col("c").alias("cnt"))
            .localCheckpoint())
        tops.append(top)
        enc = (enc.crossJoin(F.broadcast(top))
            .select("word", F.expr(f"replace(enc, concat('#', lid, '#', rid), '#{mid}')").alias("enc"), "freq")
            .localCheckpoint(eager=False))
        syms = syms.unionAll(top.select(F.lit(mid).alias("id"), F.concat("ls", "rs").alias("s")))
    enc.write.mode("overwrite").format("noop").save()

def t(fn, label):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(lambda: bpe(False), f"round{rnd} NO base ckpt")
    t(lambda: bpe(True),  f"round{rnd} base CKPT")
