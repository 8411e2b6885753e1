"""Association-mining operators (SURVEY.md §2C, round-6 widening):
collocation strength over adjacent token pairs and market-basket
co-occurrence pairs.

Both are corpus-statistics stages a training-data pipeline runs after
cleaning: collocations surface boilerplate phrases and multi-word
expressions worth treating as single tokens (the PMI step of phrase
mining); co-occurrence pairs are the level-2 frequent-itemset pass
(apriori / market-basket) reused here for brand-affinity analysis over
the TPC-H-ish order data.

Exactness discipline (see queries/statml.py): every cross-row
reduction is an integer count; floating point enters only in a final,
identically-shaped multiply/divide expression both engines evaluate
over exactly-representable integers — no transcendentals (a log-based
PMI would hit the libm-divergence documented on scalar_math_libm;
ranking by LIFT is ranking by PMI because log is monotone, so we keep
the rational form and stay bit-exact).

Scale posture: collocation does two corpus aggregations (unigram,
bigram) each a single partial+final count shuffle; the two grand
totals are 1-row broadcasts; the bigram→unigram probe joins run on the
support-filtered bigram table (tiny after `cnt >= 5`), never the raw
token stream. Co-purchase builds per-order brand sets with ONE
collect_set aggregation (bounded: TPC-H has 25 brands, so a set is
<= 25 elements) and generates pairs row-locally from the sorted array
— never the quadratic self-join of exploded rows that would fan out
hot orders at 100 TB; the only other shuffle is the final count on the
pair key.

Tokenization reuses the reference wc.go letter-run semantics
(``mrapps/wc.go:21-24``) via ``tokens_nonempty`` so the DuckDB oracle
replays the identical token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import ngram_shingles, tokens_nonempty
from tda596_lab02mapreduce_spark.registry import register

_MIN_SUPPORT = 5


@register(
    "collocation_lift_bigrams",
    oracle=rf"""
WITH tok AS (
  SELECT list_filter(string_split_regex(text, '[^\p{{L}}]+'), t -> t <> '') AS tk
  FROM documents
),
uni AS (
  SELECT t AS w, CAST(count(*) AS HUGEINT) AS c
  FROM (SELECT unnest(tk) AS t FROM tok)
  GROUP BY t
),
tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM uni),
big AS (
  SELECT bigram, CAST(count(*) AS HUGEINT) AS c12
  FROM (
    SELECT unnest(list_transform(range(1, len(tk)),
                                 i -> tk[i] || ' ' || tk[i + 1])) AS bigram
    FROM tok
  )
  GROUP BY bigram
),
btot AS (SELECT CAST(SUM(c12) AS HUGEINT) AS m FROM big),
sup AS (
  SELECT split_part(bigram, ' ', 1) AS w1,
         split_part(bigram, ' ', 2) AS w2,
         c12
  FROM big WHERE c12 >= {_MIN_SUPPORT}
)
SELECT s.w1, s.w2, CAST(s.c12 AS BIGINT) AS cnt,
       ((CAST(s.c12 AS DOUBLE) * CAST(t.n AS DOUBLE)) * CAST(t.n AS DOUBLE))
         / ((CAST(bt.m AS DOUBLE) * CAST(u1.c AS DOUBLE)) * CAST(u2.c AS DOUBLE))
         AS lift
FROM sup s
JOIN uni u1 ON s.w1 = u1.w
JOIN uni u2 ON s.w2 = u2.w
CROSS JOIN tot t CROSS JOIN btot bt
""",
    doc=(
        "Collocation strength (association lift, the rational form of "
        "PMI) of adjacent token bigrams with support >= 5: "
        "lift = P(w1 w2) / (P(w1) P(w2)) with bigram probability over "
        "the bigram total M and unigram probabilities over the token "
        "total N, i.e. (c12 * N^2) / (M * c1 * c2). All counts are "
        "exact integers; the lift is one identically-parenthesized "
        "double expression, so the value hash matches bitwise (log-free "
        "by design — ranking by lift IS ranking by PMI). Plan: two "
        "corpus count shuffles (unigram, bigram), 1-row total "
        "broadcasts, and unigram probes joined against the tiny "
        "support-filtered bigram table."
    ),
    tags=("text", "llm", "agg", "join"),
)
def collocation_lift_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    toks = docs.select(tokens_nonempty("text").alias("tk"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("decimal(38,0)").alias("n"))
    big = (
        toks.filter(F.size("tk") >= 2)
        .select(F.explode(ngram_shingles(F.col("tk"), 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("c12"))
    )
    btot = big.agg(F.sum("c12").cast("decimal(38,0)").alias("m"))
    sup = big.filter(F.col("c12") >= _MIN_SUPPORT).select(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
        "c12",
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    joined = (
        sup.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    num = (F.col("c12").cast("double") * F.col("n").cast("double")) * F.col(
        "n"
    ).cast("double")
    den = (F.col("m").cast("double") * F.col("c1").cast("double")) * F.col(
        "c2"
    ).cast("double")
    return joined.select(
        "w1",
        "w2",
        F.col("c12").cast("long").alias("cnt"),
        (num / den).alias("lift"),
    )


@register(
    "copurchase_brand_pairs",
    oracle="""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
)
SELECT a.brand AS brand_a, b.brand AS brand_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM ob a JOIN ob b ON a.okey = b.okey AND a.brand < b.brand
GROUP BY a.brand, b.brand
""",
    doc=(
        "Market-basket level-2 frequent itemsets: unordered brand pairs "
        "co-occurring in the same order, with order counts (the apriori "
        "candidate-pair pass / brand-affinity matrix). The oracle uses "
        "the textbook self-join; the Spark plan instead aggregates each "
        "order's distinct brands into ONE sorted array (collect_set is "
        "bounded by the 25-brand dimension, so per-group state is O(1)) "
        "and emits the i<j pairs row-locally — a hot order with k lines "
        "costs k set-inserts and <=C(25,2) emitted pairs instead of a "
        "k^2 join fan-out. Shuffles: the part-key probe join, one "
        "collect_set on orderkey, one count on the pair key."
    ),
    tags=("join", "agg", "analytics"),
)
def copurchase_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = io.load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", F.col("p_brand").alias("brand")
    )
    per_order = ob.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("brand")).alias("brands")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(brands, (x, i) -> "
                "transform(slice(brands, i + 2, size(brands)), "
                "y -> struct(x AS brand_a, y AS brand_b))))"
            )
        ).alias("p")
    )
    return (
        pairs.select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "rfm_customer_segments",
    oracle="""
WITH base AS (
  SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
         CAST(floor(epoch(CAST(max(o.o_orderdate) AS TIMESTAMP))) AS BIGINT)
           AS last_order_s,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS HUGEINT)) AS BIGINT)
           AS total_cents
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey, c.c_nationkey
)
SELECT custkey,
       CAST(ntile(4) OVER (PARTITION BY nationkey
                           ORDER BY last_order_s DESC, custkey) AS INTEGER) AS r_score,
       CAST(ntile(4) OVER (PARTITION BY nationkey
                           ORDER BY n_orders DESC, custkey) AS INTEGER) AS f_score,
       CAST(ntile(4) OVER (PARTITION BY nationkey
                           ORDER BY total_cents DESC, custkey) AS INTEGER) AS m_score
FROM base
""",
    doc=(
        "RFM customer segmentation (recency / frequency / monetary "
        "quartile scores, 1 = best), the classic marketing-analytics "
        "cohort labeler. Quartiles are WITHIN nation — cohort-relative "
        "scoring, and the scale-correct choice: a global ntile needs a "
        "single ordered partition (one task at 100 TB), a keyed ntile "
        "rides the nation partitioning like any other window. "
        "Monetary is exact integer cents; recency is epoch seconds of "
        "the last order; every ntile ordering carries a custkey "
        "tiebreak so tied metrics can't make the quartile assignment "
        "run-dependent. One orders shuffle (custkey rollup) + one "
        "nation-keyed window pass."
    ),
    tags=("window", "agg", "analytics"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = io.load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    base = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy(F.col("c_custkey").alias("custkey"), F.col("c_nationkey").alias("nationkey"))
        .agg(
            # o_orderdate arrives TIMESTAMP_NTZ from the fixture parquet;
            # pin naive wall time == UTC (io.py's events convention) so
            # epoch seconds match DuckDB's epoch(CAST(.. AS TIMESTAMP)).
            F.max(F.to_utc_timestamp(F.col("o_orderdate"), "UTC").cast("long")).alias(
                "last_order_s"
            ),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(20,0)"))
            .cast("bigint")
            .alias("total_cents"),
        )
    )

    def quartile(metric: str) -> F.Column:
        return F.ntile(4).over(
            Window.partitionBy("nationkey").orderBy(
                F.col(metric).desc(), F.col("custkey")
            )
        )

    return base.select(
        "custkey",
        quartile("last_order_s").alias("r_score"),
        quartile("n_orders").alias("f_score"),
        quartile("total_cents").alias("m_score"),
    )
