import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import ngram_shingles, tokens_nonempty
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-bj")
spark.range(1000).selectExpr("sum(id)").collect()

def pairs_fn(ckpt: bool):
    docs = io.load(spark, SF, "documents")
    toked = docs.select("doc_id", tokens_nonempty(F.col("text")).alias("toks")).filter(F.size("toks") >= 3)
    sh = toked.select("doc_id",
        F.concat_ws(" ", F.slice("toks", 1, 3)).alias("prefix"),
        F.array_distinct(ngram_shingles(F.col("toks"), 3)).alias("s"))
    if ckpt:
        sh = sh.localCheckpoint(eager=False)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.s"), F.col("b.s")))
    return (a.join(b, (F.col("a.prefix") == F.col("b.prefix")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
            (inter.cast("double") / (F.size(F.col("a.s")) + F.size(F.col("b.s")) - inter)).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5))

def t(fn, label):
    fn().write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); fn().write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(lambda: pairs_fn(False), f"round{rnd} blocked-jaccard NO ckpt")
    t(lambda: pairs_fn(True),  f"round{rnd} blocked-jaccard CKPT")
