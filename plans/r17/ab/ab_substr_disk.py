import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import ngram_shingles, tokens_nonempty
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-substr-disk")
spark.range(1000).selectExpr("sum(id)").collect()

def q(lvl):
    W = 8
    docs = io.load(spark, SF, "documents")
    sh = docs.select("doc_id", ngram_shingles(tokens_nonempty("text"), W).alias("gs")).filter(F.size("gs") >= 1)
    pos = sh.select("doc_id", F.posexplode("gs").alias("pos0", "g")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    pos = pos.localCheckpoint(eager=False, storageLevel=lvl)
    dup = (pos.groupBy("g").agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
           .filter(F.col("d0") != F.col("d1")).select("g"))
    covered = pos.join(dup, "g", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > W, 1).otherwise(0)
    grp = covered.withColumn("grp", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return grp.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"), (F.max("pos") + W - 1).alias("span_end"),
        (F.max("pos") + W - 1 - F.min("pos") + 1).alias("span_tokens")
    ).select("doc_id", "span_start", "span_end", "span_tokens")

def t(lvl, label, reps=3):
    q(lvl).write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        q(lvl).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(None, f"r{rnd} substr heap (r16)")
    t(StorageLevel.DISK_ONLY, f"r{rnd} substr DISK_ONLY")
