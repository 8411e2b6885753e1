"""Distribution-drift and statistics band (round-7 widening of the
SURVEY.md §2C training-data surface): PSI drift (batch + the shared
streaming core in streaming/drift.py), two-sample KS, CUSUM
change-point, Markov event transitions, Pareto deciles + Gini, Zipf
rank-frequency fit, per-source token entropy, mutual information,
daily-series autocorrelation, a two-proportion A/B z-test, and a
Holt forecast unrolled as a recursive CTE.

Float-log discipline shared by the band: any metric built from
``ln`` is computed per row/term, rounded to 8 dp, cast to an exact
DECIMAL, and only then SUMMED — so the aggregate is order-independent
and bitwise identical between Spark and DuckDB regardless of partial
ordering (the same pattern as text_tfidf's 4-dp contract; margin vs
the rounding boundary asserted in tests/test_analytics_properties.py).
Single divisions / single ``ln`` calls on identical inputs are
deterministic across both engines' libm for these well-conditioned
inputs; only SUMS of floats are order-sensitive, and none occur here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty
from tda596_lab02mapreduce_spark.registry import register

_TERM_DEC = "decimal(18,8)"
_TOK_ORACLE = r"""
  SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word
  FROM documents
"""


PSI_ORACLE = """
WITH binned AS (
  SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
  FROM events
), cnts AS (
  SELECT bin,
         CAST(SUM(is_ref) AS BIGINT) AS ref_cnt,
         CAST(SUM(1 - is_ref) AS BIGINT) AS cur_cnt
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(SUM(ref_cnt) AS DOUBLE) AS ref_tot,
         CAST(SUM(cur_cnt) AS DOUBLE) AS cur_tot,
         CAST(count(*) AS BIGINT) AS n_bins
  FROM cnts
), terms AS (
  SELECT bin, ref_cnt, cur_cnt,
         CAST(round((ref_cnt + 1) / (ref_tot + n_bins), 8) AS DOUBLE) AS ref_share,
         CAST(round((cur_cnt + 1) / (cur_tot + n_bins), 8) AS DOUBLE) AS cur_share,
         CAST(round(((ref_cnt + 1) / (ref_tot + n_bins)
                     - (cur_cnt + 1) / (cur_tot + n_bins))
                    * ln(((ref_cnt + 1) / (ref_tot + n_bins))
                         / ((cur_cnt + 1) / (cur_tot + n_bins))), 8)
              AS DECIMAL(18,8)) AS psi_term
  FROM cnts, tot
)
SELECT bin, ref_cnt, cur_cnt, ref_share, cur_share,
       CAST(psi_term AS DOUBLE) AS psi_term,
       CAST(round(CAST(SUM(psi_term) OVER () AS DOUBLE), 6) AS DOUBLE) AS psi_total
FROM terms
"""


@register(
    "psi_value_drift",
    oracle=PSI_ORACLE,
    doc=(
        "Population Stability Index between the first and second half "
        "of the events month (fixed boundary 2024-01-16), value binned "
        "into 10 fixed-width bins with Laplace (+1) smoothing so empty "
        "bins never divide by zero. The whole query is one scan and "
        "ONE 10-key aggregate: reference and current counts are "
        "sibling conditional sums in the same pass (no second scan, no "
        "self-join); the 3-row broadcast of totals is Spark's "
        "scalar-subquery shape. Per-bin PSI terms are rounded to 8 dp "
        "and summed as exact decimals (order-independent), so the "
        "drift score is reproducible to the bit at any parallelism — "
        "on a 1000-executor cluster this is a map-side partial "
        "aggregate into 10 final rows."
    ),
    tags=("agg", "stats", "drift", "llm"),
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # core + tail shared with the streaming monitor
    # (streaming/drift.py; stream_psi_monitor runs the identical
    # functions over readStream, so this oracle checks both forms).
    from tda596_lab02mapreduce_spark.streaming.drift import psi_bin_counts, score_psi

    return score_psi(psi_bin_counts(io.load(spark, sf_dir, "events")))


@register(
    "markov_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), trans AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_trans,
       CAST(round(n_trans / CAST(SUM(n_trans) OVER (PARTITION BY prev_type)
                                 AS DOUBLE), 6) AS DOUBLE) AS p_trans
FROM trans
""",
    doc=(
        "First-order Markov transition matrix over per-user event "
        "sequences: lag(event_type) within (user_id, ts, event_id) "
        "order, then (prev, next) counts normalised into row-stochastic "
        "probabilities. Plan: ONE user_id-keyed Exchange feeds the lag "
        "window (in-partition sort, never global), the 25-key "
        "transition aggregate rides a map-side partial, and the "
        "normaliser is a window over the tiny result — no second scan "
        "of events. p_trans is a single integer division (exact "
        "operands), deterministic at any parallelism. At 100 TB the "
        "cost is the one sessionization-grade shuffle every sequence "
        "model needs anyway."
    ),
    tags=("window", "agg", "stats", "sequence"),
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    norm = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.round(
            F.col("n_trans") / F.sum("n_trans").over(norm).cast("double"), 6
        ).alias("p_trans"),
    )


@register(
    "pareto_revenue_concentration",
    oracle="""
WITH cust_rev AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, revenue,
         ntile(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
  FROM cust_rev
), dec AS (
  SELECT decile,
         CAST(count(*) AS BIGINT) AS n_customers,
         SUM(revenue) AS decile_rev
  FROM ranked GROUP BY decile
), tot AS (SELECT SUM(decile_rev) AS total_rev FROM dec)
SELECT decile, n_customers,
       CAST(decile_rev AS DOUBLE) AS decile_rev,
       CAST(round(CAST(decile_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
            AS DOUBLE) AS rev_share,
       CAST(round(CAST(SUM(decile_rev) OVER (ORDER BY decile) AS DOUBLE)
                  / CAST(total_rev AS DOUBLE), 6) AS DOUBLE) AS cum_share
FROM dec, tot
""",
    doc=(
        "Pareto (revenue-concentration) curve: customers ranked by "
        "exact-decimal lifetime revenue, cut into ntile(10) deciles "
        "(o_custkey tiebreak makes the cut deterministic), each "
        "decile's share and cumulative share of total revenue. The "
        "per-customer rollup is the only big shuffle; the decile cut "
        "runs through functions.rank.global_ntile (distributed exact "
        "rank + broadcast per-partition offsets — at 100 TB the "
        "customer-grain aggregate is 1e8-1e9 rows, too big for the "
        "partition-less ntile window this used before), and the "
        "cumulative share is a triangular self-join over exactly 10 "
        "decile rows (no window node at all). Revenue stays DECIMAL "
        "until the final ratio so the shares are exact-input "
        "divisions, bit-stable across engines."
    ),
    tags=("window", "agg", "stats"),
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_ntile

    orders = io.load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    cust_rev = orders.groupBy("o_custkey").agg(F.sum("price").alias("revenue"))
    ranked = global_ntile(
        cust_rev,
        [F.col("revenue").desc(), F.col("o_custkey")],
        10,
        bucket_col="decile",
    )
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("revenue").alias("decile_rev"),
    )
    tot = dec.agg(F.sum("decile_rev").alias("total_rev"))
    # cumulative revenue: triangular join over the 10 decile rows
    prior = dec.select(
        F.col("decile").alias("__d2"), F.col("decile_rev").alias("__rev2")
    )
    cums = (
        dec.join(F.broadcast(prior), F.col("__d2") <= F.col("decile"))
        .groupBy("decile", "n_customers", "decile_rev")
        .agg(F.sum("__rev2").alias("__cum_rev"))
    )
    return (
        cums.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("decile_rev").cast("double").alias("decile_rev"),
            F.round(
                F.col("decile_rev").cast("double") / F.col("total_rev").cast("double"),
                6,
            ).alias("rev_share"),
            F.round(
                F.col("__cum_rev").cast("double") / F.col("total_rev").cast("double"),
                6,
            ).alias("cum_share"),
        )
    )


@register(
    "zipf_token_fit",
    oracle=f"""
WITH freq AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM ({_TOK_ORACLE}) t
  WHERE word <> '' GROUP BY word
), ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY cnt DESC, word) AS DOUBLE)), 8)
              AS DECIMAL(18,8)) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)), 8) AS DECIMAL(18,8)) AS y
  FROM freq
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x * y AS DECIMAL(30,12))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(30,12))) AS sxx
  FROM ranked
)
SELECT n AS vocab_size,
       CAST(round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                  4) AS DOUBLE) AS zipf_slope,
       CAST(round((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                   * CAST(sx AS DOUBLE)) / n, 4) AS DOUBLE) AS zipf_intercept
FROM sums
""",
    doc=(
        "Zipf rank-frequency fit over the corpus vocabulary: OLS slope "
        "and intercept of ln(freq) against ln(rank) — the classic "
        "power-law health check for a training corpus (slope near -1 "
        "is natural text). The regression is NOT a float aggregate: "
        "ln(rank)/ln(freq) are rounded to 8 dp into exact DECIMALs, "
        "the five OLS sums accumulate as decimals (order-independent, "
        "hash-stable), and only the final closed-form slope touches "
        "doubles. One explode+count for frequencies; the vocabulary "
        "ranking runs through functions.rank.global_rank_cumsum "
        "(range-partitioned local ranks + broadcast offsets) — an "
        "open-vocabulary corpus at 100 TB has billions of types, too "
        "many for the partition-less row_number window this used "
        "before. n_types reported as vocab_size (it counts ranked "
        "word TYPES, not token occurrences — ADVICE r7)."
    ),
    tags=("agg", "stats", "text", "llm"),
)
def zipf_token_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    docs = io.load(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens_nonempty("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = global_rank_cumsum(
        freq, [F.col("cnt").desc(), F.col("word")], rank_col="rank"
    ).select(
        F.round(F.log(F.col("rank").cast("double")), 8).cast(_TERM_DEC).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 8).cast(_TERM_DEC).alias("y"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(30,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,12)")).alias("sxx"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        n.alias("vocab_size"),
        F.round(slope, 4).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 4).alias("zipf_intercept"),
    )


@register(
    "token_entropy_by_source",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest(string_split_regex(text, '[^\\p{{L}}]+')) AS word
  FROM documents
), cnts AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
  FROM tok WHERE word <> '' GROUP BY source, word
), terms AS (
  SELECT source, cnt,
         SUM(cnt) OVER (PARTITION BY source) AS total,
         CAST(round(-(cnt / CAST(SUM(cnt) OVER (PARTITION BY source) AS DOUBLE))
                    * ln(cnt / CAST(SUM(cnt) OVER (PARTITION BY source) AS DOUBLE)), 8)
              AS DECIMAL(18,8)) AS term
  FROM cnts
)
SELECT source,
       CAST(max(total) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(round(CAST(SUM(term) AS DOUBLE), 6) AS DOUBLE) AS entropy
FROM terms GROUP BY source
""",
    doc=(
        "Shannon token entropy per document source — the diversity "
        "screen that catches template-spam / boilerplate sources in a "
        "training corpus (low entropy = repetitive source). One "
        "explode into a (source, word) aggregate, a source-keyed "
        "window for totals (same partitioning as the groupBy — no "
        "extra Exchange), per-token -p·ln(p) terms rounded to 8 dp "
        "and summed as exact decimals so the per-source entropy is "
        "order-independent. Everything keys on source; at 100 TB the "
        "shuffle carries one row per (source, distinct-token), not "
        "per occurrence."
    ),
    tags=("agg", "stats", "text", "llm"),
)
def token_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    cnts = (
        docs.select("source", F.explode(tokens_nonempty("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source")
    p = F.col("cnt") / F.sum("cnt").over(w).cast("double")
    terms = cnts.select(
        "source",
        F.sum("cnt").over(w).alias("total"),
        F.round(-p * F.log(p), 8).cast(_TERM_DEC).alias("term"),
    )
    return terms.groupBy("source").agg(
        F.max("total").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        F.round(F.sum("term").cast("double"), 6).alias("entropy"),
    )


@register(
    "mutual_information_type_hour",
    oracle="""
WITH joint AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hr,
         CAST(count(*) AS BIGINT) AS n_xy
  FROM events GROUP BY event_type, hr
), tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM joint),
terms AS (
  SELECT event_type, hr, n_xy,
         SUM(n_xy) OVER (PARTITION BY event_type) AS n_x,
         SUM(n_xy) OVER (PARTITION BY hr) AS n_y,
         CAST(round((n_xy / CAST(n AS DOUBLE))
                    * ln((CAST(n_xy AS DOUBLE) * n)
                         / (CAST(SUM(n_xy) OVER (PARTITION BY event_type) AS DOUBLE)
                            * SUM(n_xy) OVER (PARTITION BY hr))), 8)
              AS DECIMAL(18,8)) AS mi_term
  FROM joint, tot
)
SELECT event_type, hr, n_xy,
       CAST(round(ln((CAST(n_xy AS DOUBLE) * (SELECT n FROM tot))
                     / (CAST(n_x AS DOUBLE) * n_y)), 6) AS DOUBLE) AS pmi,
       CAST(round(CAST(SUM(mi_term) OVER () AS DOUBLE), 6) AS DOUBLE) AS mi_total
FROM terms
""",
    doc=(
        "Mutual information between event type and hour-of-day — the "
        "dependence screen behind feature selection (MI ~ 0 means the "
        "hour tells you nothing about the event mix). One scan, one "
        "125-key joint aggregate; both marginals are windows over the "
        "joint (no second scan), the grand total is a broadcast "
        "scalar. Each p·ln-term sees only exact integer ratios inside "
        "the ln (deterministic across libm for these inputs), is "
        "rounded to 8 dp and summed as exact decimals — "
        "order-independent, like the whole band. Per-cell PMI comes "
        "free from the same terms."
    ),
    tags=("agg", "stats", "drift"),
)
def mutual_information_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("hr")
    )
    joint = ev.groupBy("event_type", "hr").agg(F.count(F.lit(1)).alias("n_xy"))
    tot = joint.agg(F.sum("n_xy").alias("n"))
    wx = Window.partitionBy("event_type")
    wy = Window.partitionBy("hr")
    n_x = F.sum("n_xy").over(wx)
    n_y = F.sum("n_xy").over(wy)
    ratio = (F.col("n_xy").cast("double") * F.col("n")) / (
        n_x.cast("double") * n_y
    )
    terms = joint.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "hr",
        "n_xy",
        F.round(F.log(ratio), 6).alias("pmi"),
        F.round((F.col("n_xy") / F.col("n").cast("double")) * F.log(ratio), 8)
        .cast(_TERM_DEC)
        .alias("mi_term"),
    )
    # grand MI over the ≤ 125 cell rows rides a broadcast 1-row
    # aggregate — keeps the plan free of partition-less window nodes
    grand = terms.agg(F.sum("mi_term").alias("__mi_sum"))
    return terms.crossJoin(F.broadcast(grand)).select(
        "event_type",
        "hr",
        "n_xy",
        "pmi",
        F.round(F.col("__mi_sum").cast("double"), 6).alias("mi_total"),
    )


@register(
    "gini_revenue_concentration",
    oracle="""
WITH cust_rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT revenue,
         CAST(row_number() OVER (ORDER BY revenue, o_custkey) AS BIGINT) AS i
  FROM cust_rev
), sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         SUM(revenue) AS s,
         SUM(CAST(i AS DECIMAL(18,0)) * revenue) AS si
  FROM ranked
)
SELECT n AS n_customers, CAST(s AS DOUBLE) AS total_rev,
       CAST(round((2.0 * CAST(si AS DOUBLE) - (n + 1) * CAST(s AS DOUBLE))
                  / (n * CAST(s AS DOUBLE)), 6) AS DOUBLE) AS gini
FROM sums
""",
    doc=(
        "Gini coefficient of customer revenue — the scalar companion "
        "to the Pareto decile curve, via the exact rank formula "
        "G = (2·Σi·x_i − (n+1)·Σx_i)/(n·Σx_i) on revenue sorted "
        "ascending (custkey tiebreak; ties cannot change the sum). "
        "Revenue and the rank-weighted sum stay DECIMAL to the end — "
        "the whole statistic is exact integer/decimal arithmetic "
        "until one final double division, so it is bit-stable at any "
        "parallelism. One fact shuffle (per-customer rollup); the "
        "customer ranking runs through functions.rank."
        "global_rank_cumsum (range-partitioned local ranks + broadcast "
        "offsets) so no single task ever sorts the 1e8-1e9-row "
        "customer aggregate a 100 TB fact implies."
    ),
    tags=("agg", "window", "stats"),
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    orders = io.load(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    cust_rev = orders.groupBy("o_custkey").agg(F.sum("price").alias("revenue"))
    ranked = global_rank_cumsum(
        cust_rev, ["revenue", "o_custkey"], rank_col="i"
    ).select("revenue", "i")
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("revenue").alias("s"),
        F.sum(F.col("i").cast("decimal(18,0)") * F.col("revenue")).alias("si"),
    )
    n = F.col("n")
    s = F.col("s").cast("double")
    si = F.col("si").cast("double")
    return sums.select(
        n.alias("n_customers"),
        s.alias("total_rev"),
        F.round((2.0 * si - (n + 1) * s) / (n * s), 6).alias("gini"),
    )


@register(
    "acf_daily_events",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY day
), mu AS (
  SELECT SUM(x) / CAST(count(*) AS DOUBLE) AS m FROM daily
), dev AS (
  SELECT day, x - (SELECT m FROM mu) AS dev FROM daily
), denom AS (
  SELECT SUM(CAST(round(dev * dev, 6) AS DECIMAL(24,6))) AS den FROM dev
), lags AS (SELECT unnest(range(1, 8)) AS lag),
pairs AS (
  SELECT l.lag,
         CAST(round(d1.dev * d2.dev, 6) AS DECIMAL(24,6)) AS num_term
  FROM lags l
  JOIN dev d1 ON true
  JOIN dev d2 ON d2.day = d1.day + to_days(CAST(l.lag AS INT))
)
SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(round(CAST(SUM(num_term) AS DOUBLE)
                  / CAST((SELECT den FROM denom) AS DOUBLE), 6) AS DOUBLE) AS acf
FROM pairs GROUP BY lag
""",
    doc=(
        "Lag-1..7 autocorrelation of the daily event-count series — "
        "the weekly-seasonality probe for a telemetry stream. The "
        "series is one date-keyed aggregate (30 rows at fixture "
        "scale; one row per day at any scale), the seven lagged "
        "alignments are an equi-join of the tiny series against "
        "itself shifted by an exploded lag literal — never a window "
        "per lag, never a re-scan of events. The mean is a single "
        "integer-ratio division; every covariance term is rounded to "
        "6 dp and summed as exact decimals, so each r_k is "
        "order-independent. Denominator is the full-series variance "
        "(the standard ACF normalisation)."
    ),
    tags=("agg", "join", "stats", "timeseries"),
)
def acf_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        io.load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    mu = daily.agg(
        (F.sum("x") / F.count(F.lit(1)).cast("double")).alias("m")
    )
    # dev (one row per day) feeds FOUR consumers (denominator + both
    # join sides); without materialization each consumer re-plans the
    # whole events scan (measured: 2 parquet scans in the final plan).
    # The series is O(days) rows — checkpoint it once, scan events once.
    dev = (
        daily.crossJoin(F.broadcast(mu))
        .select("day", "x", (F.col("x") - F.col("m")).alias("dev"))
        .localCheckpoint(eager=True)
    )
    denom = dev.agg(
        F.sum(F.round(F.col("dev") * F.col("dev"), 6).cast("decimal(24,6)")).alias(
            "denom"
        )
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    d1 = dev.select(F.col("day").alias("day1"), F.col("dev").alias("dev1"))
    d2 = dev.select(F.col("day").alias("day2"), F.col("dev").alias("dev2"))
    # d2 is the one-row-per-day series (30 rows at fixture scale,
    # O(days) at any scale): broadcast it EXPLICITLY so the lagged
    # alignment join has one plan shape at every input size — without
    # the hint AQE flips broadcast↔shuffle between sf0.1 and the 10×
    # corpus (observed: 16→17 Exchanges in tools/scale_stress.py).
    pairs = (
        F.broadcast(lags)
        .join(d1, F.lit(True))
        .join(
            F.broadcast(d2),
            F.col("day2")
            == F.col("day1") + F.make_interval(days=F.col("lag")),
        )
        .select(
            "lag",
            F.round(F.col("dev1") * F.col("dev2"), 6)
            .cast("decimal(24,6)")
            .alias("num_term"),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("num_term").alias("num"))
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            "n_pairs",
            F.round(
                F.col("num").cast("double") / F.col("denom").cast("double"), 6
            ).alias("acf"),
        )
    )


@register(
    "ks_value_drift",
    oracle="""
WITH flagged AS (
  SELECT value,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
  FROM events
), tot AS (
  SELECT CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
  FROM flagged
), by_value AS (
  SELECT value,
         CAST(SUM(is_ref) AS BIGINT) AS c_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
  FROM flagged GROUP BY value
), ecdf AS (
  SELECT value,
         SUM(c_ref) OVER (ORDER BY value) AS cum_ref,
         SUM(c_cur) OVER (ORDER BY value) AS cum_cur
  FROM by_value
)
SELECT max(n_ref) AS n_ref, max(n_cur) AS n_cur,
       CAST(round(max(abs(cum_ref / CAST(n_ref AS DOUBLE)
                          - cum_cur / CAST(n_cur AS DOUBLE))), 6) AS DOUBLE) AS ks_d
FROM ecdf, tot
""",
    doc=(
        "Two-sample Kolmogorov-Smirnov statistic between the first "
        "and second half of the events month: D = max |F_ref - F_cur| "
        "over the pooled empirical CDFs — the nonparametric companion "
        "to the binned PSI (catches shape drift PSI's 10 bins smooth "
        "over). One scan, per-value conditional counts, one "
        "value-ordered cumulative window, a max. Every ECDF step is "
        "an exact integer ratio, so D is deterministic. The pooled "
        "ECDF prefix sums run through functions.rank."
        "global_rank_cumsum (range-partitioned local prefixes + "
        "broadcast offsets) — distinct values of a continuous column "
        "are unbounded at 100 TB, so the partition-less cumulative "
        "window this used before was the one non-distributed step."
    ),
    tags=("agg", "window", "stats", "drift"),
)
def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    ev = io.load(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    by_value = ev.groupBy("value").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(1 - F.col("is_ref")).alias("c_cur"),
    )
    tot = by_value.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    ecdf = global_rank_cumsum(
        by_value,
        ["value"],
        [("cum_ref", "c_ref"), ("cum_cur", "c_cur")],
        rank_col="__ks_rank",
        # value is a nonneg double: 16-unit stripes are a deterministic
        # monotone bucket — no sampling job, no checkpoint pin
        bucket_expr=F.floor(F.col("value") / F.lit(16.0)),
    ).select("cum_ref", "cum_cur")
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_ref") / F.col("n_ref").cast("double")
                        - F.col("cum_cur") / F.col("n_cur").cast("double")
                    )
                ),
                6,
            ).alias("ks_d"),
        )
    )


@register(
    "ks_value_drift_binned",
    oracle="""
WITH flagged AS (
  SELECT CAST(floor(value / 8.0) AS BIGINT) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
  FROM events
), tot AS (
  SELECT CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
  FROM flagged
), by_bin AS (
  SELECT bin,
         CAST(SUM(is_ref) AS BIGINT) AS c_ref,
         CAST(SUM(1 - is_ref) AS BIGINT) AS c_cur
  FROM flagged GROUP BY bin
), ecdf AS (
  SELECT bin,
         SUM(c_ref) OVER (ORDER BY bin) AS cum_ref,
         SUM(c_cur) OVER (ORDER BY bin) AS cum_cur
  FROM by_bin
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       max(n_ref) AS n_ref, max(n_cur) AS n_cur,
       CAST(round(max(abs(cum_ref / CAST(n_ref AS DOUBLE)
                          - cum_cur / CAST(n_cur AS DOUBLE))), 6) AS DOUBLE)
         AS ks_d
FROM ecdf, tot
""",
    doc=(
        "Fixed-width BINNED two-sample KS statistic — the scale-safe "
        "twin the exact ks_value_drift doc promises for 100 TB: the "
        "ECDF steps move from distinct values (unbounded for a "
        "continuous column) to width-8 value bins, so the cumulative "
        "state is O(value_range / width) REGARDLESS of row count — "
        "the binning bounds the ECDF support the way a KLL/t-digest "
        "sketch would, but stays exactly replayable in SQL. Binned D "
        "is a lower bound on exact D with error ≤ max per-bin mass; "
        "the exact form remains the correctness anchor. Same "
        "integer-ratio determinism as the exact query; the bin-grain "
        "prefix sums reuse functions.rank.grouped cumsum machinery "
        "with the bin itself as the deterministic monotone bucket "
        "(no sampling job, no partition-less window)."
    ),
    tags=("agg", "window", "stats", "drift"),
)
def ks_value_drift_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    ev = io.load(spark, sf_dir, "events").select(
        F.floor(F.col("value") / F.lit(8.0)).cast("bigint").alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    by_bin = ev.groupBy("bin").agg(
        F.sum("is_ref").alias("c_ref"),
        F.sum(1 - F.col("is_ref")).alias("c_cur"),
    )
    tot = by_bin.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    ecdf = global_rank_cumsum(
        by_bin,
        ["bin"],
        [("cum_ref", "c_ref"), ("cum_cur", "c_cur")],
        rank_col="__ksb_rank",
        bucket_expr=F.col("bin"),
    ).select("cum_ref", "cum_cur")
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_ref") / F.col("n_ref").cast("double")
                        - F.col("cum_cur") / F.col("n_cur").cast("double")
                    )
                ),
                6,
            ).alias("ks_d"),
        )
    )


@register(
    "cusum_changepoint_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY day
), mu AS (
  SELECT SUM(x) / CAST(count(*) AS DOUBLE) AS m FROM daily
), cusum AS (
  SELECT day, x,
         SUM(CAST(round(x - (SELECT m FROM mu), 6) AS DECIMAL(24,6)))
           OVER (ORDER BY day) AS s
  FROM daily
), peak AS (
  SELECT max(abs(s)) AS mx FROM cusum
), first_peak AS (
  SELECT min(day) AS d FROM cusum, peak WHERE abs(s) = mx
)
SELECT day, x, CAST(s AS DOUBLE) AS s_cusum,
       CAST(day = (SELECT d FROM first_peak) AS BOOLEAN) AS is_changepoint
FROM cusum
""",
    doc=(
        "CUSUM change-point screen over the daily event-count series: "
        "S_t = cumulative sum of (x_t − μ); the day where |S_t| peaks "
        "is the most likely level-shift point (Page's test statistic "
        "without the reset, the standard offline form). The deviations "
        "are rounded to 6 dp into exact decimals BEFORE the cumulative "
        "window, so every prefix sum is exact and the argmax is "
        "bit-deterministic (earliest-day tiebreak). One scan, one "
        "day-keyed aggregate, one day-ordered window over the "
        "one-row-per-day series — the same 'window over a tiny "
        "aggregate' scale posture as the rest of the band."
    ),
    tags=("agg", "window", "stats", "drift", "timeseries"),
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        io.load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    mu = daily.agg((F.sum("x") / F.count(F.lit(1)).cast("double")).alias("m"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cusum = daily.crossJoin(F.broadcast(mu)).select(
        "day",
        "x",
        F.sum(F.round(F.col("x") - F.col("m"), 6).cast("decimal(24,6)"))
        .over(wcum)
        .alias("s"),
    )
    wall = Window.partitionBy()
    max_abs = F.max(F.abs(F.col("s"))).over(wall)
    first_peak = F.min(
        F.when(F.abs(F.col("s")) == max_abs, F.col("day"))
    ).over(wall)
    return cusum.select(
        "day",
        "x",
        F.col("s").cast("double").alias("s_cusum"),
        ((F.abs(F.col("s")) == max_abs) & (F.col("day") == first_peak)).alias(
            "is_changepoint"
        ),
    )


@register(
    "ab_test_conversion_z",
    oracle="""
WITH hours AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
           AS converted
  FROM events GROUP BY user_id, hr
), cohorts AS (
  SELECT CAST(user_id % 2 AS INT) AS cohort,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS c
  FROM hours GROUP BY cohort
), wide AS (
  SELECT
    max(CASE WHEN cohort = 0 THEN n END) AS n_a,
    max(CASE WHEN cohort = 0 THEN c END) AS c_a,
    max(CASE WHEN cohort = 1 THEN n END) AS n_b,
    max(CASE WHEN cohort = 1 THEN c END) AS c_b
  FROM cohorts
)
SELECT n_a, c_a, n_b, c_b,
       CAST(round(c_a / CAST(n_a AS DOUBLE), 6) AS DOUBLE) AS rate_a,
       CAST(round(c_b / CAST(n_b AS DOUBLE), 6) AS DOUBLE) AS rate_b,
       CAST(round((c_a / CAST(n_a AS DOUBLE) - c_b / CAST(n_b AS DOUBLE))
                  / sqrt(((c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
                         * (1 - (c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
                         * (1.0 / n_a + 1.0 / n_b)), 6) AS DOUBLE) AS z_stat
FROM wide
""",
    doc=(
        "Two-proportion z-test between user cohorts (user_id parity — "
        "a deterministic stand-in for an assignment column): the "
        "conversion unit is an active user-hour, converted if it "
        "contains a purchase (user-grain conversion is degenerate on "
        "the fixtures: every user eventually purchases). Classic "
        "pooled-variance z. Two keyed aggregates (user-hour grain, "
        "then 2-key cohort rollup) on one scan; the statistic is pure "
        "integer-count arithmetic + one sqrt — deterministic across "
        "engines. The pattern generalizes: swap the parity column for "
        "a real experiment-assignment join and the plan is unchanged."
    ),
    tags=("agg", "stats"),
)
def ab_test_conversion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )
    hours = ev.groupBy("user_id", "hr").agg(
        F.max("is_purchase").cast("int").alias("converted")
    )
    cohorts = hours.groupBy((F.col("user_id") % 2).cast("int").alias("cohort")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("c")
    )
    wide = cohorts.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("cohort") == 0, F.col("c"))).alias("c_a"),
        F.max(F.when(F.col("cohort") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("cohort") == 1, F.col("c"))).alias("c_b"),
    )
    p_a = F.col("c_a") / F.col("n_a").cast("double")
    p_b = F.col("c_b") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b")).cast("double")
    z = (p_a - p_b) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(z, 6).alias("z_stat"),
    )


_HOLT_SQL = """
WITH RECURSIVE daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY day
), seq AS (
  SELECT x, CAST(row_number() OVER (ORDER BY day) AS INT) AS t,
         CAST(count(*) OVER () AS INT) AS n
  FROM daily
), rec AS (
  SELECT 2 AS t,
         CAST(round(s2.x * 0.5 + (s1.x + (s2.x - s1.x)) * 0.5, 6)
              AS DOUBLE) AS level,
         CAST(round((s2.x * 0.5 + (s1.x + (s2.x - s1.x)) * 0.5 - s1.x)
                    * 0.25 + (s2.x - s1.x) * 0.75, 6) AS DOUBLE) AS trend
  FROM seq s1 JOIN seq s2 ON s1.t = 1 AND s2.t = 2
  UNION ALL
  SELECT r.t + 1,
         CAST(round(d.x * 0.5 + (r.level + r.trend) * 0.5, 6) AS DOUBLE),
         CAST(round((d.x * 0.5 + (r.level + r.trend) * 0.5 - r.level) * 0.25
                    + r.trend * 0.75, 6) AS DOUBLE)
  FROM rec r JOIN seq d ON d.t = r.t + 1
  WHERE r.t < d.n
), final AS (
  SELECT level, trend FROM rec ORDER BY t DESC LIMIT 1
), horizon AS (SELECT unnest(range(1, 8)) AS h)
SELECT CAST(h AS INT) AS h,
       CAST(round(level + h * trend, 6) AS DOUBLE) AS forecast
FROM final, horizon
"""


@register(
    "holt_forecast_daily",
    # DuckDB runs _HOLT_SQL verbatim; the Spark side swaps only the
    # horizon-unnest idiom (explode(sequence)) below.
    oracle=_HOLT_SQL,
    doc=(
        "Holt double-exponential smoothing over the daily event-count "
        "series (α=0.5, β=0.25 — dyadic so every smoothing step is "
        "exact binary arithmetic), unrolled as a RECURSIVE CTE: the "
        "level/trend pair steps once per day INSIDE one Catalyst "
        "plan (the Spark-4 recursion the reachability query also "
        "uses), seeded with level₁=x₁, trend₁=x₂−x₁; both state "
        "components are rounded to 6 dp each step so the recursion is "
        "bit-identical across engines, then a 7-day linear forecast "
        "is emitted. The recursion runs over the ONE-ROW-PER-DAY "
        "aggregate — O(days) tiny steps after a single events scan; "
        "at 100 TB the scan dominates and the recursion cost is "
        "unchanged."
    ),
    tags=("timeseries", "stats", "recursive", "forecast"),
)
def holt_forecast_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("events",))
    sql = _HOLT_SQL.replace(
        "unnest(range(1, 8)) AS h", "explode(sequence(1, 7)) AS h"
    )
    return spark.sql(sql)


@register(
    "psi_value_drift_qbins",
    oracle="""
WITH ref AS (
  SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-16'
), edges AS (
  SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
  FROM ref
), binned AS (
  SELECT len(list_filter(edges.e, x -> x < ev.value)) AS bin,
         CASE WHEN ev.ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
  FROM events ev, edges
), cnts AS (
  SELECT bin,
         CAST(SUM(is_ref) AS BIGINT) AS ref_cnt,
         CAST(SUM(1 - is_ref) AS BIGINT) AS cur_cnt
  FROM binned GROUP BY bin
), tot AS (
  SELECT CAST(SUM(ref_cnt) AS DOUBLE) AS ref_tot,
         CAST(SUM(cur_cnt) AS DOUBLE) AS cur_tot,
         CAST(count(*) AS BIGINT) AS n_bins
  FROM cnts
), terms AS (
  SELECT bin, ref_cnt, cur_cnt,
         CAST(round(((ref_cnt + 1) / (ref_tot + n_bins)
                     - (cur_cnt + 1) / (cur_tot + n_bins))
                    * ln(((ref_cnt + 1) / (ref_tot + n_bins))
                         / ((cur_cnt + 1) / (cur_tot + n_bins))), 8)
              AS DECIMAL(18,8)) AS psi_term
  FROM cnts, tot
)
SELECT bin, ref_cnt, cur_cnt,
       CAST(psi_term AS DOUBLE) AS psi_term,
       CAST(round(CAST(SUM(psi_term) OVER () AS DOUBLE), 6) AS DOUBLE) AS psi_total
FROM terms
""",
    doc=(
        "PSI on QUANTILE bins — the industry-standard formulation "
        "(deciles of the REFERENCE distribution as bin edges, so the "
        "reference lands ~uniform and the score measures pure shape "
        "drift; the fixed-width variant psi_value_drift keeps "
        "interpretable bins instead). The nine edges are exact R-7 "
        "interpolated reference deciles computed by the bounded-state "
        "histogram+cumulative-window method (no per-partition value "
        "buffering — stats_exact_quantiles' discipline, global "
        "grain), carried as ONE broadcast array row; bin assignment "
        "is a row-local count of edges below the value (ties at an "
        "edge take the lower bin in both engines). Terms follow the "
        "band's exact-decimal-sum rule. Two scans of events (edges "
        "need the reference pass before binning can start — inherent "
        "to reference-quantile PSI), both map-heavy."
    ),
    tags=("agg", "stats", "drift", "window", "llm"),
)
def psi_value_drift_qbins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "value",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    # exact R-7 reference deciles, bounded state: per-value counts →
    # distributed cumulative counts (functions.rank.global_rank_cumsum:
    # range-partitioned prefixes + broadcast offsets — distinct values
    # of a continuous column are unbounded at 100 TB, so no
    # partition-less window) → floor/ceil order statistics →
    # interpolation; the grand total rides a broadcast 1-row aggregate
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    ref_counts = (
        ev.filter(F.col("is_ref") == 1)
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ntot = ref_counts.agg(F.sum("c").alias("n"))
    r = (
        global_rank_cumsum(
            ref_counts,
            ["value"],
            [("cum", "c")],
            rank_col="__q_rank",
            bucket_expr=F.floor(F.col("value") / F.lit(16.0)),
        )
        .crossJoin(F.broadcast(ntot))
        .select("value", "cum", "n")
    )
    qaggs = []
    for i, p in enumerate([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]):
        idx = (F.col("n") - 1) * F.lit(p)
        lo, hi = F.floor(idx), F.ceil(idx)
        qaggs += [
            F.min(F.when(F.col("cum") >= lo + 1, F.col("value"))).alias(f"lo{i}"),
            F.min(F.when(F.col("cum") >= hi + 1, F.col("value"))).alias(f"hi{i}"),
            F.max(idx - lo).alias(f"f{i}"),
        ]
    qrow = r.agg(*qaggs)
    edge_cols = [
        (F.col(f"lo{i}") + (F.col(f"hi{i}") - F.col(f"lo{i}")) * F.col(f"f{i}"))
        for i in range(9)
    ]
    edges = qrow.select(F.array(*edge_cols).alias("e"))
    binned = ev.crossJoin(F.broadcast(edges)).select(
        F.size(F.filter("e", lambda x: x < F.col("value"))).alias("bin"),
        "is_ref",
    )
    cnts = binned.groupBy("bin").agg(
        F.sum("is_ref").alias("ref_cnt"),
        F.sum(1 - F.col("is_ref")).alias("cur_cnt"),
    )
    tot = cnts.agg(
        F.sum("ref_cnt").cast("double").alias("ref_tot"),
        F.sum("cur_cnt").cast("double").alias("cur_tot"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    ref_share = (F.col("ref_cnt") + 1) / (F.col("ref_tot") + F.col("n_bins"))
    cur_share = (F.col("cur_cnt") + 1) / (F.col("cur_tot") + F.col("n_bins"))
    terms = cnts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.round((ref_share - cur_share) * F.log(ref_share / cur_share), 8)
        .cast(_TERM_DEC)
        .alias("psi_term"),
    )
    # grand total over the ≤ 10 bin rows rides a broadcast 1-row
    # aggregate — no global-window node anywhere in this plan
    grand = terms.agg(F.sum("psi_term").alias("__psi_sum"))
    return terms.crossJoin(F.broadcast(grand)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.col("psi_term").cast("double").alias("psi_term"),
        F.round(F.col("__psi_sum").cast("double"), 6).alias("psi_total"),
    )


@register(
    "kl_divergence_lang_tokens",
    oracle=r"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(text, '[^\p{L}]+'), t -> t <> ''))
           AS word,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_p
  FROM documents
), by_word AS (
  SELECT word,
         CAST(SUM(is_p) AS BIGINT) AS c_p,
         CAST(SUM(1 - is_p) AS BIGINT) AS c_q
  FROM tok GROUP BY word
), tot AS (
  SELECT SUM(c_p) AS n_p, SUM(c_q) AS n_q,
         CAST(count(*) AS BIGINT) AS v
  FROM by_word
), probs AS (
  SELECT CAST(c_p + 1 AS DOUBLE) / (n_p + v) AS p,
         CAST(c_q + 1 AS DOUBLE) / (n_q + v) AS q,
         n_p, n_q, v
  FROM by_word, tot
), terms AS (
  SELECT n_p, n_q, v,
         CAST(round(p * ln(p / q), 8) AS DECIMAL(18, 8)) AS t_pq,
         CAST(round(q * ln(q / p), 8) AS DECIMAL(18, 8)) AS t_qp,
         CAST(round(p * ln(2.0 * p / (p + q))
                    + q * ln(2.0 * q / (p + q)), 8) AS DECIMAL(18, 8)) AS t_js
  FROM probs
)
SELECT CAST(max(n_p) AS BIGINT) AS n_p, CAST(max(n_q) AS BIGINT) AS n_q,
       max(v) AS vocab_size,
       CAST(round(CAST(SUM(t_pq) AS DOUBLE), 6) AS DOUBLE) AS kl_pq,
       CAST(round(CAST(SUM(t_qp) AS DOUBLE), 6) AS DOUBLE) AS kl_qp,
       CAST(round(CAST(SUM(t_js) AS DOUBLE) / 2, 6) AS DOUBLE) AS js
FROM terms
""",
    doc=(
        "KL divergence (both directions) and Jensen-Shannon distance "
        "between the English and non-English token distributions — the "
        "corpus-drift screen a training mix runs before re-weighting "
        "sources (a new crawl whose unigram distribution diverges from "
        "the reference corpus gets flagged here before poisoning the "
        "mix).  Laplace-smoothed over the UNION vocabulary so "
        "disjoint-support words contribute finite mass (en vs zh share "
        "few types — exactly the case unsmoothed KL blows up on).  "
        "Float discipline: p and q are IEEE-identical doubles in both "
        "engines (integer-ratio divisions), each ln-term is rounded to "
        "8 dp into an exact DECIMAL, the word-grain sums are order-"
        "independent decimal adds (hash-stable under any partitioning) "
        "and only the final /2 and 6-dp round touch doubles — the "
        "zipf/psi discipline.  One explode+groupBy on word, a "
        "broadcast 1-row total, a decimal aggregate; vocabulary-grain "
        "all the way, no per-document state."
    ),
    tags=("agg", "stats", "text", "drift", "llm"),
)
def kl_divergence_lang_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = io.load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(tokens_nonempty("text")).alias("word"),
        (F.col("lang") == "en").cast("int").alias("is_p"),
    )
    by_word = tok.groupBy("word").agg(
        F.sum("is_p").alias("c_p"),
        F.sum(1 - F.col("is_p")).alias("c_q"),
    )
    tot = by_word.agg(
        F.sum("c_p").alias("n_p"),
        F.sum("c_q").alias("n_q"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("c_p") + 1).cast("double") / (F.col("n_p") + F.col("v"))
    q = (F.col("c_q") + 1).cast("double") / (F.col("n_q") + F.col("v"))
    dec = "decimal(18,8)"
    terms = by_word.crossJoin(F.broadcast(tot)).select(
        "n_p",
        "n_q",
        "v",
        F.round(p * F.log(p / q), 8).cast(dec).alias("t_pq"),
        F.round(q * F.log(q / p), 8).cast(dec).alias("t_qp"),
        F.round(
            p * F.log(F.lit(2.0) * p / (p + q))
            + q * F.log(F.lit(2.0) * q / (p + q)),
            8,
        )
        .cast(dec)
        .alias("t_js"),
    )
    return terms.agg(
        F.max("n_p").cast("bigint").alias("n_p"),
        F.max("n_q").cast("bigint").alias("n_q"),
        F.max("v").cast("bigint").alias("vocab_size"),
        F.round(F.sum("t_pq").cast("double"), 6).alias("kl_pq"),
        F.round(F.sum("t_qp").cast("double"), 6).alias("kl_qp"),
        F.round(F.sum("t_js").cast("double") / 2, 6).alias("js"),
    )


@register(
    "rolling_corr_daily_types",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(*) FILTER (event_type = 'click') AS HUGEINT) AS clicks,
         CAST(count(*) FILTER (event_type = 'purchase') AS HUGEINT)
           AS purchases
  FROM events GROUP BY day
),
win AS (
  SELECT a.day,
         CAST(count(*) AS HUGEINT) AS n,
         SUM(b.clicks) AS sx, SUM(b.purchases) AS sy,
         SUM(b.clicks * b.clicks) AS sxx,
         SUM(b.purchases * b.purchases) AS syy,
         SUM(b.clicks * b.purchases) AS sxy
  FROM daily a JOIN daily b
    ON b.day >= a.day - INTERVAL 6 DAY AND b.day <= a.day
  GROUP BY a.day
  HAVING count(*) = 7
)
SELECT day,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * syy - sy * sy AS DOUBLE)) AS DOUBLE)
         AS roll_corr_7d
FROM win
WHERE (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
""",
    doc=(
        "7-day rolling Pearson correlation between the daily click and "
        "purchase count series (the co-movement drift monitor ops "
        "dashboards run on metric pairs). All five sufficient "
        "statistics are exact integer sums over a triangular range "
        "self-join of the day-grain aggregate — the calendar bounds "
        "that table (one row per day), so the join is a broadcast of a "
        "tiny spine against itself, NOT a partition-less sliding "
        "window (the Catalyst-folds-constant-partitionBy lesson); "
        "partial windows at the series head are dropped (n = 7 "
        "exactly). The only float math is one division and one "
        "IEEE-correctly-rounded sqrt on identically-shaped integer "
        "inputs, so the hash matches bitwise. At 100 TB the plan is "
        "one events scan + day rollup; everything after runs on "
        "#days rows."
    ),
    tags=("drift", "timeseries", "agg", "join"),
)
def rolling_corr_daily_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("ts", "event_type")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count_if(F.col("event_type") == "click")
        .cast("decimal(20,0)")
        .alias("clicks"),
        F.count_if(F.col("event_type") == "purchase")
        .cast("decimal(20,0)")
        .alias("purchases"),
    )
    a = daily.select(F.col("day").alias("a_day"))
    b = daily.select(
        F.col("day").alias("b_day"),
        F.col("clicks").alias("bx"),
        F.col("purchases").alias("by"),
    )
    win = (
        a.join(
            F.broadcast(b),
            (F.col("b_day") >= F.col("a_day") - F.expr("INTERVAL 6 DAYS"))
            & (F.col("b_day") <= F.col("a_day")),
        )
        .groupBy(F.col("a_day").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("decimal(20,0)").alias("n"),
            F.sum("bx").cast("decimal(38,0)").alias("sx"),
            F.sum("by").cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("bx") * F.col("bx")).cast("decimal(38,0)").alias("sxx"),
            F.sum(F.col("by") * F.col("by")).cast("decimal(38,0)").alias("syy"),
            F.sum(F.col("bx") * F.col("by")).cast("decimal(38,0)").alias("sxy"),
        )
        .filter(F.col("n") == 7)
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return win.filter((dx * dy) > 0).select(
        "day",
        num.cast("bigint").alias("cov_num"),
        (num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")))
        .cast("double")
        .alias("roll_corr_7d"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast error / MASE (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "forecast_mase_daily",
    oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, d, y,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY d) AS y7,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS y1
  FROM daily
),
err AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN y7 IS NOT NULL THEN abs(y - y7) END) AS BIGINT)
           AS sae_snaive,
         CAST(SUM(CASE WHEN y7 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_snaive,
         CAST(SUM(CASE WHEN y1 IS NOT NULL THEN abs(y - y1) END) AS BIGINT)
           AS sae_naive,
         CAST(SUM(CASE WHEN y1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_naive
  FROM lagged GROUP BY 1
)
SELECT event_type, sae_snaive, n_snaive, sae_naive, n_naive,
       CAST((1000 * sae_snaive * n_naive) // (sae_naive * n_snaive)
            AS BIGINT) AS mase_milli
FROM err
""",
    doc=(
        "MASE (mean absolute scaled error, Hyndman-Koehler 2006) of "
        "the seasonal-naive lag-7 forecast of daily event counts, "
        "scaled by the one-step naive MAE — the standard "
        "unit-free forecast-accuracy readout (mase < 1000 milli = "
        "weekly seasonality carries real signal beyond persistence; "
        "the eval twin of holt_forecast_daily, which produces "
        "forecasts but never scores them). Counts are integers, "
        "absolute errors are integers, and the final ratio is one "
        "exact cross-multiplied integer division — nothing to round. "
        "Plan: the corpus collapses to the (type, day) grain first; "
        "both lags ride ONE type-partitioned window pass over that "
        "bounded aggregate (never partition-less); the rollup is a "
        "5-row group."
    ),
    tags=("timeseries", "stats", "window", "agg"),
)
def forecast_mase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        (F.col("ts").cast("long") / F.lit(86400)).cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "y",
        F.lag("y", 7).over(w).alias("y7"),
        F.lag("y", 1).over(w).alias("y1"),
    )
    err = lagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("y7").isNotNull(), F.abs(F.col("y") - F.col("y7"))))
        .cast("bigint")
        .alias("sae_snaive"),
        F.sum(F.when(F.col("y7").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_snaive"),
        F.sum(F.when(F.col("y1").isNotNull(), F.abs(F.col("y") - F.col("y1"))))
        .cast("bigint")
        .alias("sae_naive"),
        F.sum(F.when(F.col("y1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_naive"),
    )
    return err.select(
        "event_type",
        "sae_snaive",
        "n_snaive",
        "sae_naive",
        "n_naive",
        F.expr(
            "CAST((1000 * sae_snaive * n_naive) DIV (sae_naive * n_snaive)"
            " AS BIGINT)"
        ).alias("mase_milli"),
    )


# ---------------------------------------------------------------------------
# Lead-lag cross-correlation (round-11 widening)
# ---------------------------------------------------------------------------


@register(
    "xcorr_click_purchase_leadlag",
    oracle="""
WITH daily AS (
  SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS d,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS nc,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS np
  FROM events GROUP BY 1
),
shifts AS (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS shift),
pairs AS (
  SELECT s.shift, a.nc AS x, b.np AS y
  FROM shifts s
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + s.shift
),
mom AS (
  SELECT shift,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS syy
  FROM pairs GROUP BY shift
)
SELECT CAST(shift AS BIGINT) AS shift_days,
       CAST(n AS BIGINT) AS n_days,
       CAST(ROUND(
         CAST(n * sxy - sx * sy AS DOUBLE)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            AS DOUBLE) AS xcorr
FROM mom
""",
    doc=(
        "Lead-lag cross-correlation of daily click vs purchase "
        "volume at shifts -3..+3 days — the 'does activity X LEAD "
        "metric Y' diagnostic (marketing-mix, capacity planning, "
        "leading-indicator discovery) that same-day rolling "
        "correlation (rolling_corr) cannot answer. All moments are "
        "exact DECIMAL(38,0) sums over the day-grain pairs; the "
        "Pearson tail is one fixed-parenthesization double "
        "expression (sqrt is exactly-rounded IEEE, not libm-"
        "approximated) rounded 6 dp. Plan: the corpus collapses to "
        "ONE day-grain aggregate (map-side combinable — the only "
        "corpus-sized work); the 7-shift alignment join and moment "
        "rollup are calendar-bounded algebra."
    ),
    tags=("stats", "timeseries", "agg", "drift"),
)
def xcorr_click_purchase_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    daily = ev.groupBy(
        (F.col("ts").cast("long") / F.lit(86400)).cast("bigint").alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
    ).localCheckpoint(eager=False)
    shifts = F.broadcast(
        spark.createDataFrame([(s,) for s in range(-3, 4)], "shift int")
    )
    a = daily.select(F.col("d").alias("da"), F.col("nc").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("np").alias("y"))
    pairs = (
        a.crossJoin(shifts)
        .join(b, F.col("db") == F.col("da") + F.col("shift"))
        .select("shift", "x", "y")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = pairs.groupBy("shift").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).cast("decimal(38,0)").alias("sx"),
        F.sum(dec("y")).cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * dec("y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(dec("x") * dec("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dec("y") * dec("y")).cast("decimal(38,0)").alias("syy"),
    )
    r = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        )
    )
    return mom.select(
        F.col("shift").cast("bigint").alias("shift_days"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(r, 6).alias("xcorr"),
    )
