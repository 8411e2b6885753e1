"""Properties for the training-data text-prep queries beyond the
oracle hash-match: the tfidf rounding-margin guarantee its docstring
promises, chunk reassembly losslessness, split determinism and
proportions, and the plan shapes that make these scale."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import plans
from tda596_lab02mapreduce_spark.registry import get


def test_tfidf_rounding_margin(spark, sf_correctness):
    """The oracle compares ROUND(tfidf, 4) bitwise between Spark and
    DuckDB. That is only sound if no value sits within libm-drift
    distance (~1e-12 relative) of a 0.00005 rounding boundary — assert
    a 1e-9 absolute margin on every row so fixture regeneration that
    breaks the precondition fails loudly here, not as a driver
    hash-mismatch (the ADVICE r1 double-threshold lesson)."""
    n_docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").count()
    rows = get("text_tfidf").spark_fn(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        unrounded = r.tf * math.log(n_docs / r.df)
        scaled = unrounded * 10_000
        dist = abs(scaled - math.floor(scaled) - 0.5)
        assert dist > 1e-6, (
            f"unrounded tfidf {unrounded} within {dist} of a 4-dp boundary"
        )


def test_chunks_reassemble_to_document(spark, sf_correctness):
    """Stride-24 windows over 32-token chunks: the stride-aligned
    prefix of each chunk (first 24 tokens, all 32 for the last chunk)
    concatenated in chunk order must equal the document's full token
    stream — no token lost or duplicated by the windowing."""
    chunks = get("doc_chunk_windows").spark_fn(spark, sf_correctness)
    recon = (
        chunks.withColumn("tk", F.split("chunk_text", " "))
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_id", "tk", "chunk_len"))
            ).alias("cs")
        )
        .select(
            "doc_id",
            F.flatten(
                F.transform(
                    "cs",
                    lambda c, i: F.when(
                        i == F.size("cs") - 1, c["tk"]
                    ).otherwise(F.slice(c["tk"], 1, 24)),
                )
            ).alias("rebuilt"),
        )
    )
    docs = spark.read.parquet(f"{sf_correctness}/documents.parquet").select(
        "doc_id",
        F.filter(F.split("text", r"[^\p{L}]+"), lambda t: t != F.lit("")).alias(
            "orig"
        ),
    )
    bad = (
        recon.join(docs, "doc_id")
        .filter(F.col("rebuilt") != F.col("orig"))
        .count()
    )
    assert bad == 0


def test_split_assignment_deterministic_and_proportional(spark, sf_correctness):
    out1 = {
        (r.split, r.lang): (r.n_docs, r.total_chars)
        for r in get("split_train_valid_test").spark_fn(spark, sf_correctness).collect()
    }
    out2 = {
        (r.split, r.lang): (r.n_docs, r.total_chars)
        for r in get("split_train_valid_test").spark_fn(spark, sf_correctness).collect()
    }
    assert out1 == out2  # hash split, not rand(): identical across runs
    totals = {}
    for (split, _), (n, _c) in out1.items():
        totals[split] = totals.get(split, 0) + n
    n_all = sum(totals.values())
    # 205/256 ≈ 80.1%, 25/256 ≈ 9.8%, 26/256 ≈ 10.2%; allow binomial noise
    assert 0.70 <= totals["train"] / n_all <= 0.90
    assert 0.04 <= totals["valid"] / n_all <= 0.17
    assert 0.04 <= totals["test"] / n_all <= 0.17


def test_chunking_is_map_only(spark, sf_correctness):
    """Chunking must stay a map-only pipeline over the scan — any
    Exchange here would shuffle the full corpus text at 100 TB."""
    df = get("doc_chunk_windows").spark_fn(spark, sf_correctness)
    assert not plans.has_operator(df, "Exchange"), plans.formatted_plan(df)


def test_bigrams_single_shuffle_with_partial_agg(spark, sf_correctness):
    """One exchange (the bigram key), with a partial HashAggregate
    below it so the shuffle carries per-partition counts, not every
    bigram occurrence."""
    df = get("text_bigram_counts").spark_fn(spark, sf_correctness)
    plan = plans.formatted_plan(df)
    # node list numbers each operator once: "(7) Exchange"; allow the
    # widen_if_few_splits repartition plus the single hashpartitioning
    # on the bigram key, nothing else
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan
    assert "partial" in plan.lower(), plan


def test_passage_dedup_matches_naive(spark, sf_correctness):
    """Naive Python replay of the passage rule (10-token chunks,
    global first-occurrence by (doc_id, chunk_id)) must reproduce
    n_chunks / n_kept / clean_text for every document, including the
    fully-duplicate documents that reassemble to NULL."""
    import re

    from tda596_lab02mapreduce_spark import io as _io
    from tda596_lab02mapreduce_spark.registry import get

    word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
    docs = sorted(
        (r.doc_id, word_re.findall(r.text))
        for r in _io.load(spark, sf_correctness, "documents")
        .select("doc_id", "text")
        .collect()
    )
    seen = set()
    expected = {}
    for doc_id, toks in docs:
        kept, total = [], 0
        for i in range(0, len(toks), 10):
            ctext = " ".join(toks[i : i + 10])
            total += 1
            if ctext not in seen:
                seen.add(ctext)
                kept.append(ctext)
        expected[doc_id] = (total, len(kept), " ".join(kept) or None)
    rows = get("dedup_passage_exact").spark_fn(spark, sf_correctness).collect()
    assert len(rows) == len(expected)
    for r in rows:
        assert (r.n_chunks, r.n_kept, r.clean_text) == expected[r.doc_id], r.doc_id
    assert any(r.n_kept == 0 for r in rows), "fixture has fully-duplicate docs"
    assert any(0 < r.n_kept < r.n_chunks for r in rows), "partial dedup exercised"


def test_weighted_reservoir_props(spark, sf_correctness):
    """A-ES invariants: exactly 50 distinct docs; deterministic across
    invocations; the char-weighted draw over-represents long docs
    (sample mean n_chars > corpus mean); keys are negative and
    strictly ordered."""
    from tda596_lab02mapreduce_spark import io as _io
    from tda596_lab02mapreduce_spark.registry import get

    fn = get("sample_weighted_reservoir").spark_fn
    rows = fn(spark, sf_correctness).collect()
    again = fn(spark, sf_correctness).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    assert len(rows) == 50 and len({r.doc_id for r in rows}) == 50
    keys = [r.es_key_r for r in rows]
    assert all(k < 0 for k in keys)
    assert keys == sorted(keys, reverse=True)
    corpus_mean = (
        _io.load(spark, sf_correctness, "documents")
        .agg({"n_chars": "avg"})
        .collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_stopword_discovery_df_bounds(spark, sf_correctness):
    """Document frequency can never exceed the source's doc count, the
    ppm share is consistent with the integer division, and every
    discovered stopword really is present in >= 60% of the source's
    docs when recounted naively."""
    from tda596_lab02mapreduce_spark.registry import get

    rows = get("text_stopword_discovery").spark_fn(spark, sf_correctness).collect()
    assert rows
    for r in rows:
        assert 0 < r["df_docs"] <= r["n_docs"]
        assert r["df_share_ppm"] == (1_000_000 * r["df_docs"]) // r["n_docs"]
        assert r["df_share_ppm"] >= 600_000
