"""MR façade parity tests (SURVEY.md §7 phase 2): RDD form ≡
DataFrame form ≡ native Catalyst query, plus the text-sink
round-trip — the moral equivalent of the reference's differential
test against mrsequential (main/test-mr.sh:81-111)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import apps, io
from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty
from tda596_lab02mapreduce_spark.mapreduce import (
    run_mapreduce,
    run_mapreduce_df,
    save_text_kv,
)


def _inputs(spark, sf_dir):
    """Each document acts as one input file (whole-file granularity)."""
    return io.load(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("filename"),
        F.col("text").alias("contents"),
    )


def _native_wc(spark, sf_dir):
    docs = io.load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens_nonempty("text")).alias("word"))
        .groupBy("word")
        .count()
    )


def test_wc_rdd_facade_matches_native(spark, sf_smoke):
    got = {
        (r.key, int(r.value))
        for r in run_mapreduce(
            spark, _inputs(spark, sf_smoke), apps.wc_map, apps.wc_reduce
        ).collect()
    }
    want = {(r.word, r["count"]) for r in _native_wc(spark, sf_smoke).collect()}
    assert got == want


def test_wc_df_facade_matches_rdd_facade(spark, sf_smoke):
    inputs = _inputs(spark, sf_smoke)
    a = {
        (r.key, r.value)
        for r in run_mapreduce(spark, inputs, apps.wc_map, apps.wc_reduce).collect()
    }
    b = {
        (r.key, r.value)
        for r in run_mapreduce_df(spark, inputs, apps.wc_map, apps.wc_reduce).collect()
    }
    assert a == b


def test_indexer_facade(spark, sf_smoke):
    inputs = _inputs(spark, sf_smoke).limit(50)
    out = run_mapreduce_df(spark, inputs, apps.indexer_map, apps.indexer_reduce)
    rows = {r.key: r.value for r in out.collect()}
    assert rows, "indexer produced nothing"
    # spot-check one word against a direct computation
    word, val = next(iter(sorted(rows.items())))
    n_docs, doc_list = val.split(" ", 1)
    docs = doc_list.split(",")
    assert int(n_docs) == len(docs) == len(set(docs))
    assert docs == sorted(docs), "posting list must be sorted"


def test_partition_invariance(spark, sf_smoke):
    """The reference's parallelism tests reduce to: results must not
    depend on partition layout (SURVEY.md §5)."""
    inputs = _inputs(spark, sf_smoke)
    one = {
        (r.key, r.value)
        for r in run_mapreduce(
            spark, inputs.repartition(1), apps.wc_map, apps.wc_reduce, n_reduce=1
        ).collect()
    }
    many = {
        (r.key, r.value)
        for r in run_mapreduce(
            spark, inputs.repartition(16), apps.wc_map, apps.wc_reduce, n_reduce=10
        ).collect()
    }
    assert one == many


def test_text_sink_roundtrip(spark, sf_smoke, tmp_path):
    out = run_mapreduce(
        spark, _inputs(spark, sf_smoke), apps.wc_map, apps.wc_reduce
    )
    path = str(tmp_path / "mr-out")
    save_text_kv(out, path)
    back = spark.read.text(path).select(
        F.split(F.col("value"), " ", 2)[0].alias("key"),
        F.split(F.col("value"), " ", 2)[1].alias("value"),
    )
    assert {(r.key, r.value) for r in back.collect()} == {
        (r.key, r.value) for r in out.collect()
    }
