import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.operators.naive_bayes import (
    naive_bayes_confusion, naive_bayes_fit, naive_bayes_score_columns)
from tda596_lab02mapreduce_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="ab-nb")
spark.range(1000).selectExpr("sum(id)").collect()
docs = io.load(spark, SF, "documents")
model = naive_bayes_fit(docs, dataset_key=SF)  # sidecar (warm)

def serve_join():
    naive_bayes_confusion(docs, model).write.mode("overwrite").format("noop").save()

def serve_fold():
    pred, n_iv = naive_bayes_score_columns(model)
    (docs.select(F.col("lang").alias("true_lang"), pred.alias("pred_lang"),
                 n_iv.alias("n_iv"))
     .filter(F.col("n_iv") > 0)
     .groupBy("true_lang", "pred_lang")
     .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ).write.mode("overwrite").format("noop").save()

def t(fn, label):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter()-t0)
    print(f"{best:7.3f}  {label}", flush=True)

for rnd in range(2):
    t(serve_join, f"round{rnd} serve JOIN+agg")
    t(serve_fold, f"round{rnd} serve FOLD")
