import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import ngram_shingles, tokens_nonempty
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-pr")
spark.range(1000).selectExpr("sum(id)").collect()

def pairs_fn(ckpt: bool):
    docs = io.load(spark, SF, "documents")
    toked = docs.select("doc_id", tokens_nonempty(F.col("text")).alias("toks")).filter(F.size("toks") >= 3)
    ex = toked.select("doc_id", F.explode(F.array_distinct(ngram_shingles(F.col("toks"), 3))).alias("shingle"))
    if ckpt:
        ex = ex.localCheckpoint(eager=False)
    rare = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= 50).select("shingle")
    exr = ex.join(rare, "shingle")
    if ckpt:
        exr = exr.localCheckpoint(eager=False)
    return (exr.alias("a").join(exr.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared")).filter(F.col("n_shared") >= 2))

def t(fn, label):
    fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(lambda: pairs_fn(False), f"round{rnd} pairs NO ckpt")
    t(lambda: pairs_fn(True),  f"round{rnd} pairs CKPT")
