"""Training-data text-preparation queries (SURVEY.md §2C): TF-IDF
weighting, overlapping-window document chunking, deterministic
train/valid/test splitting, and bigram counting.

These are the corpus-shaping stages an LLM data pipeline runs after
dedup/quality filtering (the reference's pg-*.txt corpus prepared for
training rather than counted — the same wc.go letter-run tokenizer
semantics throughout, ``mrapps/wc.go:21-24``). Everything is pure
Column expressions: tokenization and windowing are row-local, the only
shuffles are the keyed aggregations, so each plan survives a 100×
scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import ngram_shingles, tokens_nonempty
from tda596_lab02mapreduce_spark.registry import register

_TOK_SQL = r"unnest(string_split_regex(text, '[^\p{L}]+'))"

# Single source of truth for the train/valid/test assignment: the
# Spark expression and the SQL fragment MUST stay in lockstep — the
# decontamination audit is only meaningful against the same split the
# training pipeline uses, so both queries (and both oracles) build
# from these two definitions.
_SPLIT_CASE_SQL = """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
              ELSE 'test' END"""


def _split_col() -> Column:
    """80/10/10 md5-bucket split (hex strings compare lexicographically;
    'cd'/'e6' cut 256 buckets at ~80/10/10)."""
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        F.when(bucket < "cd", "train").when(bucket < "e6", "valid").otherwise("test")
    )



@register(
    "text_tfidf",
    oracle=rf"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS word FROM documents),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE word <> '' GROUP BY doc_id, word
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT doc_id, word, tf,
       CAST(count(*) OVER (PARTITION BY word) AS BIGINT) AS df,
       ROUND(tf * ln(CAST(n_docs AS DOUBLE)
                     / count(*) OVER (PARTITION BY word)), 4) AS tfidf
FROM tf, n
""",
    doc=(
        "TF-IDF per (doc, word): one explode + (doc_id, word) hash "
        "aggregate for tf, df via a count window over word (second "
        "shuffle, keyed — no global sort), corpus size N broadcast as "
        "a 1-row cross join (Spark's scalar-subquery shape, not a "
        "driver-side collect). tfidf rounded to 4 dp; the rounding "
        "margin vs the boundary is asserted in tests/test_textprep.py "
        "so Spark/DuckDB libm drift cannot flip a digit."
    ),
    tags=("text", "llm", "agg"),
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = io.widen_if_few_splits(io.load(spark, sf_dir, "documents"), "doc_id")
    tf = (
        docs.select("doc_id", F.explode(tokens_nonempty("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    df_w = F.count(F.lit(1)).over(Window.partitionBy("word"))
    return (
        tf.crossJoin(F.broadcast(n_docs))
        .withColumn("df", df_w)
        .select(
            "doc_id",
            "word",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


@register(
    "doc_chunk_windows",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[^\p{{L}}]+'),
                     t -> t <> '') AS tk
  FROM documents
)
SELECT doc_id,
       CAST((start - 1) // 24 AS BIGINT) AS chunk_id,
       CAST(len(list_slice(tk, start, start + 31)) AS INTEGER) AS chunk_len,
       array_to_string(list_slice(tk, start, start + 31), ' ') AS chunk_text
FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 24)) AS start FROM tok)
""",
    doc=(
        "Overlapping-window chunking for LLM context packing: 32-token "
        "chunks, stride 24 (8-token overlap). Chunk starts come from a "
        "row-local sequence() explode and the slice is computed "
        "in-expression — zero shuffles, zero UDFs; the output is "
        "map-only over the scan, the ideal 100 TB shape. Trailing "
        "chunks shorter than 32 tokens are emitted (chunk_len says "
        "how short), matching how packing pipelines keep tail text."
    ),
    tags=("text", "llm"),
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    tk = tokens_nonempty("text")
    chunk = F.expr("slice(tk, start, 32)")
    return (
        docs.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 1)  # sequence(1, 0, 24) would throw on empty docs
        .select(
            "doc_id",
            "tk",
            F.explode(F.sequence(F.lit(1), F.size("tk"), F.lit(24))).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / F.lit(24)).cast("bigint").alias("chunk_id"),
            F.size(chunk).alias("chunk_len"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


@register(
    "split_train_valid_test",
    oracle=f"""
WITH assigned AS (
  SELECT lang, n_chars, {_SPLIT_CASE_SQL} AS split
  FROM documents
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM assigned GROUP BY split, lang
""",
    doc=(
        "Deterministic train/valid/test assignment: bucket on the "
        "first md5 byte of the stable doc id (hex strings compare "
        "lexicographically, so 'cd'/'e6' cut 256 buckets at ~80/10/10) "
        "— reproducible across engines, runs, and cluster sizes, "
        "unlike rand()-based sampling. Assignment is row-local; the "
        "only shuffle is the tiny (split, lang) rollup. The same "
        "hash-threshold trick does per-stratum downsampling at 100 TB "
        "with zero coordination."
    ),
    tags=("text", "llm", "agg"),
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    return (
        docs.select(_split_col().alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "text_bigram_counts",
    oracle=rf"""
WITH tok AS (
  SELECT list_filter(string_split_regex(text, '[^\p{{L}}]+'),
                     t -> t <> '') AS tk
  FROM documents
)
SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM tok
)
GROUP BY bigram
HAVING count(*) >= 5
""",
    doc=(
        "Adjacent-token bigram counts (n-gram LM statistics / repeated "
        "boilerplate detection), kept where cnt >= 5. Bigrams are "
        "built row-locally from one transform over the token array "
        "(no self-join of the exploded tokens — the naive pos-join "
        "formulation shuffles the whole corpus twice); the single "
        "shuffle is the partial+final count on the bigram key."
    ),
    tags=("text", "llm", "agg"),
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No widening: the zip_with bigram build is cheap enough per row
    # that a full-text shuffle loses (sf0.1: 0.80 s narrow vs 1.00 s).
    docs = io.load(spark, sf_dir, "documents")
    tk = tokens_nonempty("text")
    bigrams = ngram_shingles(F.col("tk"), 2)
    return (
        docs.select(tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
    )


@register(
    "decontaminate_train_split",
    oracle=rf"""
WITH assigned AS (
  SELECT doc_id, text, {_SPLIT_CASE_SQL} AS split
  FROM documents
),
tok AS (
  SELECT doc_id, split,
         list_filter(string_split_regex(text, '[^\p{{L}}]+'), t -> t <> '') AS tk
  FROM assigned WHERE split IN ('train', 'test')
),
sh AS (
  SELECT doc_id, split,
         unnest(list_distinct(list_transform(
           range(1, len(tk) - 6),
           i -> array_to_string(list_slice(tk, i, i + 7), ' ')))) AS s
  FROM tok WHERE len(tk) >= 8
)
SELECT tr.doc_id, CAST(count(DISTINCT te.doc_id) AS BIGINT) AS n_test_docs
FROM sh tr JOIN sh te ON tr.s = te.s
WHERE tr.split = 'train' AND te.split = 'test'
GROUP BY tr.doc_id
""",
    doc=(
        "Benchmark decontamination: train-split documents sharing any "
        "8-token shingle with a test-split document, with the count "
        "of distinct test docs hit. Shingles are built and deduped "
        "row-locally, so the join input is O(doc_len) rows per doc "
        "and the contamination check is a plain equi-join on the "
        "shingle string — never train×test pairs. At 100 TB the "
        "test side is the small split (~10%): hash-join builds on "
        "it, or broadcast when the benchmark suite is bounded."
    ),
    tags=("text", "llm", "join"),
)
def decontaminate_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    split = _split_col()
    tk = tokens_nonempty(F.col("text"))
    shingles = F.array_distinct(ngram_shingles(F.col("tk"), 8))
    sh = (
        docs.select("doc_id", split.alias("split"), tk.alias("tk"))
        .filter(F.col("split").isin("train", "test") & (F.size("tk") >= 8))
        .select("doc_id", "split", F.explode(shingles).alias("s"))
    )
    tr = sh.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("doc_id"), "s"
    )
    te = sh.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_id"), "s"
    )
    return (
        tr.join(te, "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("test_id").alias("n_test_docs"))
    )


@register(
    "corpus_clean_pipeline",
    oracle=r"""
WITH scored AS (
  SELECT doc_id, text, source, n_chars,
         list_filter(string_split_regex(text, '[^\p{L}]+'), t -> t <> '') AS tk
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE len(tk) BETWEEN 10 AND 10000
    AND CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) >= 0.25
    AND CAST(list_contains(tk, 'the') AS INTEGER)
        + CAST(list_contains(tk, 'and') AS INTEGER)
        + CAST(list_contains(tk, 'of') AS INTEGER)
        + CAST(list_contains(tk, 'a') AS INTEGER)
        + CAST(list_contains(tk, 'to') AS INTEGER) >= 2
),
deduped AS (
  SELECT min(doc_id) AS doc_id,
         arg_min(source, doc_id) AS source,
         arg_min(len(tk), doc_id) AS n_tokens,
         arg_min(n_chars, doc_id) AS n_chars
  FROM kept GROUP BY text
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM deduped GROUP BY source
""",
    doc=(
        "The end-to-end corpus-cleaning pipeline a training-data run "
        "executes as ONE declarative plan: quality gate (token count + "
        "type-token ratio) AND language gate (stopword profile) as "
        "row-local filters over a single tokenization, then exact "
        "dedup keeping the lowest doc id per content hash, then the "
        "per-source rollup. The Spark side groups on sha2(text,256) "
        "so the dedup shuffle carries 32-byte keys + counters, never "
        "document payloads (the oracle groups on raw text — "
        "equivalent absent SHA-256 collisions). Filters run before "
        "the shuffle, so rejected docs never leave their input split."
    ),
    tags=("text", "llm", "agg"),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    tk = tokens_nonempty(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.sha2(F.col("text"), 256).alias("h"),
        F.size(tk).alias("n_tokens"),
        (F.size(F.array_distinct(tk)).cast("double") / F.size(tk)).alias("ttr"),
        sum(
            F.array_contains(tk, w).cast("int")
            for w in ["the", "and", "of", "a", "to"]
        ).alias("en_score"),
    )
    kept = scored.filter(
        F.col("n_tokens").between(10, 10000)
        & (F.col("ttr") >= 0.25)
        & (F.col("en_score") >= 2)
    )
    deduped = kept.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
        F.min_by("n_chars", "doc_id").alias("n_chars"),
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "dataset_mix_weighted",
    oracle="""
WITH rated AS (
  SELECT source,
         CASE CAST(substr(source, 4) AS INTEGER) % 4
              WHEN 0 THEN 'g0' WHEN 1 THEN '80'
              WHEN 2 THEN '40' ELSE '20' END AS thr,
         substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) AS b
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE b < thr) AS BIGINT) AS n_kept
FROM rated GROUP BY source
""",
    doc=(
        "Weighted training-mixture sampling: per-source keep rates "
        "(100/50/25/12.5% by source index mod 4, 'g0' > every hex "
        "byte = keep-all) applied via salted-md5 hash thresholds — "
        "the deterministic, coordination-free way to hit a target "
        "data mixture at 100 TB. The salt ('mix'||id) decorrelates "
        "this decision from the train/valid/test split's buckets so "
        "composed pipelines don't bias each other. Row-local "
        "assignment, one tiny per-source rollup."
    ),
    tags=("text", "llm", "agg"),
)
def dataset_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    idx = F.substring("source", 4, 10).cast("int") % 4
    thr = (
        F.when(idx == 0, "g0")
        .when(idx == 1, "80")
        .when(idx == 2, "40")
        .otherwise("20")
    )
    b = F.substring(
        F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))), 1, 2
    )
    return (
        docs.select("source", (b < thr).alias("keep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
        )
    )


@register(
    "text_repetition_metrics",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, unnest(tk) AS token, len(tk) AS n_tokens
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '[^\p{L}]+'), t -> t <> '') AS tk
        FROM documents)
),
uni AS (
  SELECT doc_id, min(n_tokens) AS n_tokens,
         CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
         CAST(max(cnt) AS BIGINT) AS top_token_cnt
  FROM (SELECT doc_id, token, n_tokens, count(*) OVER (PARTITION BY doc_id, token) AS cnt
        FROM tok)
  GROUP BY doc_id
),
big AS (
  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_bigram_cnt
  FROM (
    SELECT doc_id, bg, count(*) AS cnt
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '[^\p{L}]+'), t -> t <> '') AS tk
            FROM documents)
      WHERE len(tk) >= 2
    ) GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT uni.doc_id,
       CAST(uni.n_tokens AS BIGINT) AS n_tokens,
       uni.n_distinct,
       CAST(uni.n_distinct AS DOUBLE) / CAST(uni.n_tokens AS DOUBLE) AS type_token_ratio,
       CAST(uni.top_token_cnt AS DOUBLE) / CAST(uni.n_tokens AS DOUBLE) AS top_token_frac,
       CAST(big.top_bigram_cnt AS DOUBLE) / CAST(uni.n_tokens - 1 AS DOUBLE) AS top_bigram_frac
FROM uni JOIN big USING (doc_id)
WHERE uni.n_tokens >= 2
""",
    doc=(
        "Per-document repetition quality signals — the Gopher-rules "
        "band (Rae et al. 2021, 'Scaling Language Models: ... Gopher', "
        "repetition filters C4/MassiveText pipelines apply before "
        "training): type-token ratio, most-frequent-token fraction, "
        "and most-frequent-bigram fraction. High top-n-gram fractions "
        "flag template/boilerplate spam that survives dedup "
        "(complements text_quality's length/punct/stopword gates). "
        "All counts are exact integers and every fraction is one "
        "final double division of exact integers, so the driver hash "
        "matches with no tolerance. Shape: explode -> (doc_id, gram) "
        "count -> per-doc max, i.e. two keyed aggregations per gram "
        "order, everything partitioned by doc_id — no global state, "
        "linear in corpus size, the per-doc cardinality is bounded by "
        "doc length."
    ),
    tags=("text", "llm", "quality"),
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    tk = tokens_nonempty(F.col("text"))
    base = docs.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 2)

    toks = base.select(
        "doc_id", F.size("tk").alias("n_tokens"), F.explode("tk").alias("token")
    )
    uni = (
        toks.groupBy("doc_id", "token")
        .agg(F.min("n_tokens").alias("n_tokens"), F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("cnt").alias("top_token_cnt"),
        )
    )
    bigrams = base.select(
        "doc_id",
        F.explode(ngram_shingles(F.col("tk"), 2)).alias("bg"),
    )
    big = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_bigram_cnt"))
    )
    return uni.join(big, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")).alias(
            "type_token_ratio"
        ),
        (
            F.col("top_token_cnt").cast("double") / F.col("n_tokens").cast("double")
        ).alias("top_token_frac"),
        (
            F.col("top_bigram_cnt").cast("double")
            / (F.col("n_tokens") - 1).cast("double")
        ).alias("top_bigram_frac"),
    )


@register(
    "dedup_passage_exact",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '[^\p{L}]+'), t -> t <> '') AS tk
  FROM documents
), chunks AS (
  SELECT doc_id, CAST((start - 1) // 10 AS BIGINT) AS chunk_id,
         array_to_string(list_slice(tk, start, start + 9), ' ') AS ctext
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 10)) AS start FROM tok)
), ranked AS (
  SELECT doc_id, chunk_id, ctext,
         row_number() OVER (PARTITION BY ctext
                            ORDER BY doc_id, chunk_id) AS rn
  FROM chunks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       string_agg(CASE WHEN rn = 1 THEN ctext END, ' ' ORDER BY chunk_id)
         AS clean_text
FROM ranked GROUP BY doc_id
""",
    doc=(
        "Passage-level exact dedup (the C4/RefinedWeb repeated-passage "
        "rule at chunk grain): documents split into non-overlapping "
        "10-token passages; every passage that already appeared "
        "anywhere in the corpus (first occurrence = smallest "
        "(doc_id, chunk_id)) is dropped, and each document is "
        "reassembled from its surviving passages in order. The "
        "passage table shuffles (hash-of-passage, ids) — payload "
        "rides only once; the first-occurrence rule is ONE window "
        "over the passage-text key (at 100 TB: an aggregate min + "
        "self-equi-join on a 64-bit passage hash — same shape, "
        "documented swap); reassembly is a doc-keyed ordered "
        "string_agg. 151 passages deduplicate at sf0.01, so the rule "
        "is exercised, not vacuous."
    ),
    tags=("dedup", "text", "llm"),
)
def dedup_passage_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = io.load(spark, sf_dir, "documents")
    tk = tokens_nonempty("text")
    chunk = F.expr("slice(tk, start, 10)")
    chunks = (
        docs.select("doc_id", tk.alias("tk"))
        .filter(F.size("tk") >= 1)
        .select(
            "doc_id",
            "tk",
            F.explode(F.sequence(F.lit(1), F.size("tk"), F.lit(10))).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / F.lit(10)).cast("bigint").alias("chunk_id"),
            F.concat_ws(" ", chunk).alias("ctext"),
        )
    )
    w = Window.partitionBy("ctext").orderBy("doc_id", "chunk_id")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        # nullif: a document whose EVERY passage was already seen
        # elsewhere reassembles to NULL (DuckDB string_agg semantics),
        # not '' — that is the fully-duplicate-document signal.
        F.nullif(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct(F.col("chunk_id"), F.col("ctext")),
                            )
                        )
                    ),
                    lambda s: s.ctext,
                ),
            ),
            F.lit(""),
        ).alias("clean_text"),
    )


@register(
    "sample_weighted_reservoir",
    oracle="""
WITH keyed AS (
  SELECT doc_id, n_chars,
         ln(CAST(CAST(from_hex(substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIT) AS BIGINT) / 1152921504606846976.0) / n_chars AS es_key
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(round(es_key, 8) AS DOUBLE) AS es_key_r
FROM keyed
ORDER BY es_key DESC, doc_id
LIMIT 50
""",
    doc=(
        "Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
        "A-ES): each document draws a deterministic uniform u from the "
        "md5 family (15 hex chars / 2^60 — the same portable-hash "
        "discipline as the LSH md5lin family) and is ranked by "
        "ln(u)/weight with weight = n_chars; the top-50 keys ARE a "
        "weighted sample without replacement — the classic one-pass, "
        "join-free distributed algorithm (vs. sequential reservoir "
        "scans). The top-k is orderBy+limit = TakeOrderedAndProject "
        "(per-partition heaps, no global sort); ln is a single "
        "per-row call on identical bits in both engines, so the "
        "selected SET and order are deterministic, and the reported "
        "key is rounded to 8 dp for the value hash."
    ),
    tags=("sampling", "text", "llm", "topk"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("aes:"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint") / F.lit(float(1 << 60))
    es_key = F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "n_chars", es_key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), F.col("doc_id"))
        .limit(50)
        .select("doc_id", "n_chars", F.round("es_key", 8).alias("es_key_r"))
    )


@register(
    "text_ngram_novelty",
    oracle=r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tk) - 3),
                       i -> array_to_string(tk[i:i+4], ' '))) AS s
  FROM (SELECT doc_id,
               list_filter(string_split_regex(text, '[^\p{L}]+'),
                           t -> t <> '') AS tk
        FROM documents)
  WHERE len(tk) >= 5
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), first_doc AS (
  SELECT g, min(doc_id) AS fdoc FROM ex GROUP BY g
)
SELECT e.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.fdoc < e.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen_before,
       1.0 - CAST(SUM(CASE WHEN f.fdoc < e.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty_ratio
FROM ex e JOIN first_doc f USING (g)
GROUP BY e.doc_id
""",
    doc=(
        "Per-document n-gram novelty score — the data-curation signal "
        "that orders a crawl by marginal information: the fraction of "
        "a document's distinct 5-token shingles whose FIRST corpus "
        "occurrence (minimum doc_id — ingestion order) is this "
        "document.  Low novelty = the document mostly restates "
        "already-ingested text (boilerplate, mirrors, templates) even "
        "when no single document is a near-duplicate — the case "
        "MinHash pair-finding misses because the overlap is spread "
        "across MANY earlier documents.  Shape: one shingle pass, a "
        "shingle-grain min(doc_id) aggregate, one join back, one "
        "doc-grain rollup — all equi-keyed, no pairs anywhere, which "
        "is what makes it viable at 100 TB where pairwise novelty "
        "would be quadratic.  novelty_ratio is 1 − one double "
        "division of exact counts: bit-identical across engines."
    ),
    tags=("text", "dedup", "llm"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.array_distinct(
            ngram_shingles(tokens_nonempty("text"), 5)
        ).alias("s"),
    ).filter(F.size("s") >= 1)
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    first_doc = ex.groupBy("g").agg(F.min("doc_id").alias("fdoc"))
    seen = F.sum(F.when(F.col("fdoc") < F.col("doc_id"), 1).otherwise(0))
    return (
        ex.join(first_doc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            seen.cast("bigint").alias("n_seen_before"),
            (
                F.lit(1.0)
                - seen.cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("novelty_ratio"),
        )
    )


@register(
    "topk_keywords_per_doc",
    oracle=rf"""
WITH tok AS (SELECT doc_id, {_TOK_SQL} AS word FROM documents),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE word <> '' GROUP BY doc_id, word
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word, tf,
         ROUND(tf * ln(CAST(n_docs AS DOUBLE)
                       / count(*) OVER (PARTITION BY word)), 4) AS tfidf
  FROM tf, n
),
ranked AS (
  SELECT doc_id, word, tf, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, word) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, word, tf, tfidf
FROM ranked WHERE rnk <= 3
""",
    doc=(
        "Keyword extraction: top-3 TF-IDF terms per document — the "
        "standard cheap summarizer/labeler in curation UIs and topic "
        "routing.  Shares text_tfidf's scoring (explode → (doc,word) "
        "tf aggregate → word-keyed df window → broadcast scalar N) "
        "and finishes with a doc-keyed row_number ≤ 3 — the "
        "WindowGroupLimit shape (rank pushed into the shuffle as a "
        "group-limit, no full per-doc sort materialized), keyed by "
        "doc_id whose cardinality GROWS with data: the scalable kind "
        "of window.  Ranking is on the 4-dp ROUNDED score with the "
        "word as total-order tiebreak — the bm25 rank-on-rounded "
        "discipline, so libm's ln() ulp drift between engines can "
        "flip neither the score digit (margin-asserted for the "
        "shared text_tfidf rounding) nor the rank."
    ),
    tags=("text", "llm", "window"),
)
def topk_keywords_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = io.widen_if_few_splits(io.load(spark, sf_dir, "documents"), "doc_id")
    tf = (
        docs.select("doc_id", F.explode(tokens_nonempty("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    df_w = F.count(F.lit(1)).over(Window.partitionBy("word"))
    scored = (
        tf.crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / df_w), 4
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id", F.col("rnk").cast("bigint").alias("rnk"), "word", "tf", "tfidf"
        )
    )


# ---------------------------------------------------------------------------
# Corpus-adaptive stopword discovery (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "text_stopword_discovery",
    oracle=r"""
WITH tok AS (
  SELECT DISTINCT source, doc_id, unnest(list_filter(
           string_split_regex(text, '[^\p{L}]+'), t -> t <> '')) AS token
  FROM documents
),
nd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM documents GROUP BY 1),
df AS (SELECT source, token, CAST(count(*) AS BIGINT) AS df_docs
       FROM tok GROUP BY 1, 2)
SELECT df.source, df.token, df.df_docs, nd.n_docs,
       CAST((1000000 * df.df_docs) // nd.n_docs AS BIGINT) AS df_share_ppm
FROM df JOIN nd USING (source)
WHERE (1000000 * df.df_docs) // nd.n_docs >= 600000
""",
    doc=(
        "Corpus-adaptive stopword discovery: per SOURCE, the tokens "
        "present in >= 60% of that source's documents (document "
        "frequency, not term frequency — one boilerplate repeat "
        "doesn't inflate it). This is the data-derived stopword/"
        "boilerplate list quality and dedup pipelines use instead of "
        "a fixed English list (text_quality's stopword ratio uses the "
        "fixed list; this discovers it from the corpus per source). "
        "df_share is integer ppm ((1e6*df) DIV n) so the filter and "
        "output are exact in both engines. Plan: row-local "
        "array_distinct before the explode (a doc contributes one row "
        "per DISTINCT token, bounding the explode at vocab size, not "
        "doc length), one (source, token) keyed count, one broadcast "
        "join of the per-source doc counts (sources are a bounded "
        "catalog; at 100 TB the (source, token) aggregate is the only "
        "corpus-sized shuffle)."
    ),
    tags=("text", "llm", "agg"),
)
def text_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        "doc_id",
        F.explode(F.array_distinct(tokens_nonempty("text"))).alias("token"),
    )
    nd = docs.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    df = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs")
    )
    return (
        df.join(F.broadcast(nd), "source")
        .withColumn(
            "df_share_ppm",
            F.expr("CAST((1000000 * df_docs) DIV n_docs AS BIGINT)"),
        )
        .filter(F.col("df_share_ppm") >= 600000)
        .select("source", "token", "df_docs", "n_docs", "df_share_ppm")
    )


# ---------------------------------------------------------------------------
# Top-p (nucleus) vocabulary mass cut (round-11 widening)
# ---------------------------------------------------------------------------


@register(
    "vocab_top_p_cut",
    oracle=r"""
WITH tok AS (
  SELECT source, unnest(list_filter(
           string_split_regex(text, '[^\p{L}]+'), t -> t <> '')) AS token
  FROM documents
),
cnts AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS total FROM cnts GROUP BY 1),
cum AS (
  SELECT source, token, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY cnt DESC, token
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM cnts
)
SELECT c.source, c.token, c.cnt, c.cum, t.total
FROM cum c JOIN tot t USING (source)
WHERE 10 * (c.cum - c.cnt) < 9 * t.total
""",
    doc=(
        "Top-p (nucleus) vocabulary cut per source: the smallest "
        "count-descending prefix of the token distribution whose "
        "cumulative mass reaches 90% — keep a token iff the mass "
        "BEFORE it is under the cut (10*(cum-cnt) < 9*total, all "
        "exact BIGINTs, (cnt desc, token) total order). The "
        "vocabulary-truncation / nucleus primitive LLM data work "
        "uses to size tokenizers and clip heavy tails — "
        "distribution-shape-aware where vocab_encode_topk's fixed k "
        "is not. The per-source cumulative runs through "
        "functions.rank.grouped_rank_cumsum (range-partitioned local "
        "ranks, a -cnt stripe bucket — monotone along the DESC "
        "order), because a plain source-keyed window caps "
        "parallelism at the source count: 3 sources = 3 tasks "
        "forever on a 100 TB corpus whose per-source vocabulary is "
        "millions of tokens. One (source, token) count shuffle + the "
        "bucketed cumsum + a broadcast join of per-source totals."
    ),
    tags=("text", "llm", "agg", "window"),
)
def vocab_top_p_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import grouped_rank_cumsum

    docs = io.load(spark, sf_dir, "documents")
    cnts = (
        docs.select("source", F.explode(tokens_nonempty("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cum = grouped_rank_cumsum(
        cnts,
        ["source"],
        [F.col("cnt").desc(), F.col("token")],
        [("cum", "cnt")],
        rank_col="__tp_rn",
        bucket_expr=F.floor(-F.col("cnt") / F.lit(64)),
    )
    tot = cnts.groupBy("source").agg(F.sum("cnt").cast("bigint").alias("total"))
    return (
        cum.join(F.broadcast(tot), "source")
        .filter(10 * (F.col("cum") - F.col("cnt")) < 9 * F.col("total"))
        .select(
            "source",
            "token",
            "cnt",
            F.col("cum").cast("bigint").alias("cum"),
            "total",
        )
    )
