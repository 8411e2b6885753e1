"""Survival-analysis band (round-9 widening): Kaplan-Meier life table
over right-censored durations.

The LLM-pipeline framing: "time from a user's signup event to their
next purchase" is the canonical conversion-latency study, and the
observation window truncates it — signups near the corpus end have
not converted YET, and dropping them (what funnel_time_to_convert's
converted-only contract deliberately does) biases the latency
estimate downward. Survival analysis is the standard fix: censored
observations still contribute risk exposure up to the cut-off. The
operator emits the exact KM LIFE TABLE (distinct event time, number
at risk, deaths, censorings, integer-ppm hazard); the survival curve
S(t) = prod(1 - d/n) is a running product of these rows — kept out of
the contract because a cross-engine float product is exactly the
libm-divergence trap scalar_math_libm documents (exp/ln fold), while
every life-table column is a bit-exact integer.

Exactness discipline (queries/statml.py conventions): durations are
floor-hours from exact epoch-microsecond differences (integer div —
NOT calendar date_diff, whose boundary-crossing semantics differ
between engines); at-risk counts come from one exact distributed
prefix sum; the hazard is integer parts-per-million via integer
division. Zero floats anywhere.

Scale posture: one events scan feeding three branches (signups,
purchases, 1-row max-ts broadcast); the next-purchase probe is a
user-keyed equi-join + min aggregate (the as-of forward-join shape,
operators/asof.py); the life table itself lives at duration grain
(bounded by the observation window in hours), and its prefix sum
rides functions/rank.py's deterministic monotone-bucket fast path —
no partition-less window, no driver-side loop, nothing that caps
parallelism below the corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum
from tda596_lab02mapreduce_spark.registry import register

_US_PER_HOUR = 3_600_000_000


@register(
    "survival_km_signup_purchase",
    oracle=f"""
WITH s AS (
  SELECT event_id, user_id, epoch_us(ts) AS sus
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, epoch_us(ts) AS pus
  FROM events WHERE event_type = 'purchase'
),
mx AS (SELECT max(epoch_us(ts)) AS mxus FROM events),
obs AS (
  SELECT CASE WHEN min(p.pus) IS NULL
              THEN ((SELECT mxus FROM mx) - s.sus) // {_US_PER_HOUR}
              ELSE (min(p.pus) - s.sus) // {_US_PER_HOUR}
         END AS dur_h,
         CASE WHEN min(p.pus) IS NULL THEN 0 ELSE 1 END AS observed
  FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.pus > s.sus
  GROUP BY s.event_id, s.sus
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM obs),
lt AS (
  SELECT dur_h,
         CAST(count(*) AS BIGINT) AS n_all,
         CAST(SUM(observed) AS BIGINT) AS d_events
  FROM obs GROUP BY dur_h
),
cum AS (
  SELECT dur_h, n_all, d_events,
         SUM(n_all) OVER (ORDER BY dur_h) AS cum_all
  FROM lt
)
SELECT dur_h,
       CAST(t.n - c.cum_all + c.n_all AS BIGINT) AS n_at_risk,
       c.d_events,
       CAST(c.n_all - c.d_events AS BIGINT) AS c_censored,
       CAST((1000000 * c.d_events) // (t.n - c.cum_all + c.n_all) AS BIGINT)
         AS hazard_ppm
FROM cum c CROSS JOIN tot t
WHERE c.d_events >= 1
""",
    doc=(
        "Kaplan-Meier life table for signup-to-purchase conversion "
        "latency with right-censoring at the corpus horizon: one row "
        "per distinct floor-hour duration carrying at least one "
        "conversion, with the number at risk (observations whose "
        "duration, converted OR censored, is >= t), conversions d_t, "
        "censorings at t, and the discrete hazard d_t/n_t in exact "
        "integer ppm. Durations are exact epoch-microsecond integer "
        "divisions, at-risk counts come from one distributed prefix "
        "sum over the duration-grain rollup, and the output is "
        "all-integer, so the hash is bit-exact. Censoring is "
        "non-degenerate on the fixture (163 of 2017 signups at "
        "sf0.01). Plan: events scan -> user-keyed forward-min join, "
        "duration rollup, monotone-bucket cumsum, 1-row total "
        "broadcast."
    ),
    tags=("timeseries", "agg", "analytics"),
)
def survival_km_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    s = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.unix_micros("ts").alias("sus")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("pus")
    )
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("mxus"))
    nxt = (
        s.join(p, (s.user_id == F.col("p_user")) & (F.col("pus") > s.sus), "left")
        .groupBy("event_id", "sus")
        .agg(F.min("pus").alias("nxt_us"))
    )
    obs = nxt.crossJoin(F.broadcast(mx)).select(
        F.expr(
            f"CASE WHEN nxt_us IS NULL THEN (mxus - sus) div {_US_PER_HOUR}"
            f" ELSE (nxt_us - sus) div {_US_PER_HOUR} END"
        ).alias("dur_h"),
        F.when(F.col("nxt_us").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("observed"),
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n"))
    lt = obs.groupBy("dur_h").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("observed").alias("d_events"),
    )
    # duration grain is bounded by the observation window in hours;
    # dur_h div 32 is a monotone bucketing, so the cumsum takes the
    # deterministic fast path (no boundary sampling, no checkpoint).
    cum = global_rank_cumsum(
        lt,
        [F.col("dur_h")],
        [("cum_all", F.col("n_all"))],
        bucket_expr=F.expr("dur_h div 32"),
    ).drop("rnk")
    at_risk = F.col("n") - F.col("cum_all") + F.col("n_all")
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("d_events") >= 1)
        .select(
            "dur_h",
            at_risk.cast("bigint").alias("n_at_risk"),
            F.col("d_events").cast("bigint").alias("d_events"),
            (F.col("n_all") - F.col("d_events")).cast("bigint").alias("c_censored"),
            F.expr(
                "CAST((1000000 * d_events) div (n - cum_all + n_all) AS BIGINT)"
            ).alias("hazard_ppm"),
        )
    )
