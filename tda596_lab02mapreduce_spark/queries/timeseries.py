"""Time-series reshaping: dense-grid gap-fill with forward-fill
(the hypertable/timescale-style operator the relational inventory
otherwise lacks) and wide→long unpivot.

The reference has no time dimension at all (untyped K/V pairs,
mr/worker.go:20-24); these extend §2B rows 15/21 the way a metrics
pipeline over the events table needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


@register(
    "timeseries_gapfill",
    oracle="""
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
hourly AS (
  SELECT date_trunc('hour', ts) AS bucket, event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
  FROM ev GROUP BY 1, 2
),
bounds AS (SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1 FROM ev),
spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS bucket FROM bounds),
grid AS (SELECT s.bucket, t.event_type
         FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
filled AS (SELECT g.bucket, g.event_type, hourly.sum_value
           FROM grid g LEFT JOIN hourly USING (bucket, event_type))
SELECT bucket, event_type,
       last_value(sum_value IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ffill,
       CAST(sum_value IS NULL AS BIGINT) AS was_gap
FROM filled
""",
    doc=(
        "Dense-grid gap-fill: hourly sums per event type left-joined "
        "onto the complete hour spine (derived declaratively — 1-row "
        "min/max agg exploded through sequence(), no driver collect), "
        "missing buckets forward-filled with last(ignorenulls) per "
        "type. ~6% of grid cells are gaps on the fixture, so the fill "
        "path is genuinely exercised. Scale shape: spine is "
        "O(hours)×O(types) and broadcast-joined; the only data-sized "
        "shuffles are the hourly agg and the per-type window."
    ),
    tags=("timeseries", "window"),
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("bucket")
    )
    grid = spine.crossJoin(F.broadcast(ev.select("event_type").distinct()))
    filled = grid.join(hourly, ["bucket", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "bucket",
        "event_type",
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_ffill"),
        F.col("sum_value").isNull().cast("long").alias("was_gap"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS metric_value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
""",
    doc=(
        "Wide→long unpivot (the inverse of pivot_segment): each part "
        "row becomes one row per numeric metric via the native "
        "Unpivot/Expand node — row-local, zero shuffle, output is "
        "exactly n_metrics× the input with no data movement."
    ),
    tags=("relational",),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = io.load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@register(
    "user_funnel_conversion",
    oracle="""
WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
stage AS (
  SELECT user_id, user_id % 4 AS cohort,
         min(ts) FILTER (WHERE event_type = 'signup') AS t_signup,
         min(ts) FILTER (WHERE event_type = 'click') AS t_click,
         min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM ev GROUP BY user_id
)
SELECT cohort,
       CAST(count(*) FILTER (WHERE t_signup IS NOT NULL) AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE t_signup IS NOT NULL
                               AND t_click > t_signup) AS BIGINT) AS n_signup_then_click,
       CAST(count(*) FILTER (WHERE t_signup IS NOT NULL
                               AND t_click > t_signup
                               AND t_purchase > t_click) AS BIGINT) AS n_full_funnel
FROM stage
GROUP BY cohort
""",
    doc=(
        "Ordered-sequence funnel (signup → click → purchase) per user, "
        "rolled up by cohort: stage timestamps via conditional-min "
        "aggregation (one pass over events, partial+final), ordering "
        "predicates applied on the per-user row — no self-joins, no "
        "window sort over the raw stream. The 100 TB shape: events "
        "shuffle once on user_id; everything after is per-user-row "
        "local and then a tiny cohort rollup."
    ),
    tags=("timeseries", "agg"),
)
def user_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    stage = ev.groupBy("user_id").agg(
        (F.col("user_id") % 4).alias("cohort"),
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    signed_up = F.col("t_signup").isNotNull()
    clicked_after = signed_up & (F.col("t_click") > F.col("t_signup"))
    full_funnel = clicked_after & (F.col("t_purchase") > F.col("t_click"))
    return stage.groupBy("cohort").agg(
        F.count(F.when(signed_up, 1)).alias("n_signup"),
        F.count(F.when(clicked_after, 1)).alias("n_signup_then_click"),
        F.count(F.when(full_funnel, 1)).alias("n_full_funnel"),
    )


@register(
    "sessionize_events",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS t_start,
       max(ts) AS t_end,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
FROM numbered
GROUP BY user_id, session_id
""",
    doc=(
        "Batch gap-based sessionization (30-min inactivity threshold): "
        "lag + cumulative-sum session numbering, then a per-session "
        "rollup — the batch twin of stream_session_10m's session "
        "window. ONE shuffle on user_id serves the lag window, the "
        "numbering window, and the (user, session) aggregate (same "
        "key prefix, Catalyst reuses the partitioning). Tie-safe: "
        "equal timestamps yield gap 0 regardless of peer order, so "
        "the cumulative numbering is deterministic. Durations in "
        "integer microseconds — no float, no truncation ambiguity."
    ),
    tags=("timeseries", "window", "agg"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = (
        F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    )
    numbered = ev.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


@register(
    "retention_cohorts",
    oracle="""
WITH ev AS (
  SELECT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk
  FROM events
),
fw AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id),
act AS (SELECT DISTINCT user_id, wk FROM ev)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) // 7 AS BIGINT) AS week_offset,
       CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_users
FROM act JOIN fw USING (user_id)
GROUP BY 1, 2
""",
    doc=(
        "Weekly retention cohorts: cohort = ISO week of a user's "
        "first event, cell (cohort, offset) = distinct users active "
        "offset weeks later. First-week agg and the distinct "
        "(user, week) activity set share the user_id shuffle; the "
        "cohort join is keyed on user_id too, so Catalyst plans the "
        "whole triangle on one partitioning + a final small rollup. "
        "Week arithmetic is exact integer days/7 on week-truncated "
        "timestamps — no float, both engines Monday-start."
    ),
    tags=("timeseries", "agg", "join"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    fw = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    act = ev.distinct()
    return (
        act.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "cdc_latest_per_user",
    oracle="""
SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
FROM (
  SELECT user_id, event_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
    doc=(
        "Changelog compaction (Kafka log-compaction / CDC "
        "materialization): the LATEST full row per key, ordered by "
        "event time with the unique event_id as tiebreak so the "
        "survivor is deterministic under equal timestamps. One "
        "shuffle on the key; row_number + rn=1 plans as a "
        "WindowGroupLimit pushdown in Spark (per-partition top-1, "
        "no full sort materialization). This is the read side of "
        "upsert_customer_batch's merge — together they are the "
        "mutable-table story on immutable 100 TB storage."
    ),
    tags=("timeseries", "window"),
)
def cdc_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


@register(
    "window_session_builtin",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS t_start,
       max(ts) AS t_end,
       CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
FROM numbered
GROUP BY user_id, sid
""",
    doc=(
        "Sessionization via the BUILT-IN session_window aggregate — the "
        "declarative twin of sessionize_events's lag+cumsum formulation. "
        "session_window merges events while each arrives strictly within "
        "30 min of the previous, i.e. a new session starts when the gap "
        "is >= the threshold (half-open [ts, ts+gap) windows); the "
        "oracle's lag recursion uses >= to match that boundary exactly, "
        "where sessionize_events deliberately uses the strict-> variant "
        "— the two queries pin BOTH boundary conventions. In batch mode "
        "Catalyst plans session_window as UpdatingSessionsExec + merge, "
        "one user_id exchange; on a stream the identical expression is "
        "the watermarked session aggregation (stream_session_10m)."
    ),
    tags=("timeseries", "window", "agg"),
)
def window_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
        .drop("w")
    )


@register(
    "attribution_linear_touch",
    oracle="""
WITH p AS (SELECT event_id AS purchase_id, user_id, ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts FROM events
      WHERE event_type = 'click'),
pairs AS (
  SELECT p.purchase_id, c.click_id,
         epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY purchase_id ORDER BY click_us, click_id
         ) AS touch_rank,
         CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches
  FROM pairs
)
SELECT purchase_id, click_id, purchase_us, click_us,
       CAST(touch_rank AS BIGINT) AS touch_rank, n_touches,
       CAST(1000000 // n_touches
            + CASE WHEN touch_rank <= 1000000 % n_touches THEN 1 ELSE 0 END
            AS BIGINT) AS credit_ppm
FROM ranked
""",
    doc=(
        "Multi-touch marketing attribution: every purchase's conversion "
        "credit is split linearly across the user's clicks in the "
        "trailing 1-hour window. Credit is INTEGER parts-per-million "
        "with the division remainder assigned to the earliest touches "
        "(credit sums to exactly 1,000,000 per purchase — float-free, "
        "so the oracle hash carries no summation-order hazard; contrast "
        "a double 1/n split, which no engine pair reproduces bitwise). "
        "The touch discovery is the band-join family (equi on user_id + "
        "range predicate — the same shape as join_range_band, SMJ on "
        "the user key); rank and touch count come from one "
        "purchase_id window pass. The as-of join answers last-touch; "
        "this is the multi-touch generalization."
    ),
    tags=("timeseries", "join", "window"),
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        "purchase_id",
        "click_id",
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("c_ts").alias("click_us"),
    )
    w = Window.partitionBy("purchase_id").orderBy("click_us", "click_id")
    ranked = pairs.select(
        "*",
        F.row_number().over(w).cast("bigint").alias("touch_rank"),
        F.count(F.lit(1)).over(Window.partitionBy("purchase_id")).alias("n_touches"),
    )
    # `div` is true integer division (no double round-trip)
    credit = F.expr("1000000L div n_touches") + F.when(
        F.col("touch_rank") <= F.lit(1_000_000) % F.col("n_touches"), 1
    ).otherwise(0)
    return ranked.withColumn("credit_ppm", credit.cast("bigint"))


@register(
    "scd2_point_in_time",
    oracle="""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS valid_from_us,
         CAST(json_extract(props, '$.k') AS BIGINT) AS feature_k,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS valid_to_us
  FROM events WHERE event_type = 'signup'
),
p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS purchase_us
      FROM events WHERE event_type = 'purchase')
SELECT p.purchase_id, p.user_id, p.purchase_us,
       s.feature_k, s.valid_from_us
FROM p JOIN s ON p.user_id = s.user_id
 AND p.purchase_us >= s.valid_from_us
 AND (s.valid_to_us IS NULL OR p.purchase_us < s.valid_to_us)
""",
    doc=(
        "Feature-store point-in-time correctness: the signup changelog "
        "is materialized as SCD2 validity intervals (valid_from = event "
        "ts, valid_to = lead(ts) per user — half-open, last interval "
        "open-ended), then each purchase joins the ONE feature row that "
        "was valid at purchase time — no feature leakage from the "
        "future, the property every training-set builder needs. The "
        "interval build is one user_id window pass; the lookup is an "
        "equi join on user_id with the interval predicate (each "
        "purchase matches exactly one interval by construction, so "
        "output cardinality == purchases-with-a-prior-signup). The "
        "as-of join computes the same answer from raw events; this "
        "form materializes the reusable interval dimension — the "
        "feature-store idiom (build once, many point-in-time lookups). "
        "Timestamps as epoch microseconds; feature from the JSON props "
        "(same extraction both engines)."
    ),
    tags=("timeseries", "join", "scd2"),
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("valid_from_us", "event_id")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            F.col("user_id").alias("s_user"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.get_json_object("props", "$.k").cast("bigint").alias("feature_k"),
        )
        .withColumn(
            "valid_to_us",
            F.lead("valid_from_us").over(
                Window.partitionBy("s_user").orderBy("valid_from_us", "event_id")
            ),
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
    )
    return p.join(
        s,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("purchase_us") >= F.col("valid_from_us"))
        & (F.col("valid_to_us").isNull() | (F.col("purchase_us") < F.col("valid_to_us"))),
    ).select("purchase_id", "user_id", "purchase_us", "feature_k", "valid_from_us")


# ---------------------------------------------------------------------------
# Dyadic EWMA (round-6 widening)
# ---------------------------------------------------------------------------

_EWMA_LAGS = 8  # truncation depth K: weights 2^K .. 2^0 over lags 0..K


def _ewma_terms_sql() -> tuple[str, str]:
    """(numerator, denominator) SQL fragments over lag(y, k) — shared
    shape between the Spark selectExpr and the DuckDB oracle so both
    engines evaluate the identical expression tree."""
    num, den = [], []
    for k in range(_EWMA_LAGS + 1):
        w = 1 << (_EWMA_LAGS - k)
        lagk = f"lag(y, {k}) OVER w" if k else "y"
        num.append(f"COALESCE({lagk} * {w}, 0)")
        den.append(f"CASE WHEN {lagk} IS NULL THEN 0 ELSE {w} END")
    return " + ".join(num), " + ".join(den)


@register(
    "ewma_dyadic_user_value",
    oracle=f"""
WITH pts AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS y
  FROM events
)
SELECT event_id, user_id,
       CAST(({_ewma_terms_sql()[0]}) AS DOUBLE)
         / CAST(({_ewma_terms_sql()[1]}) AS DOUBLE) AS ewma_cents
FROM pts
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    doc=(
        "Per-user exponentially-weighted moving average of event value "
        "(the smoothing / trend feature of every metrics pipeline), "
        "alpha = 1/2 truncated at 8 lags and renormalized over the "
        "weights actually present: ewma_i = sum_k y_(i-k) * 2^(8-k) / "
        "sum_k 2^(8-k). The EWMA recurrence is not a plain window "
        "aggregate; the dyadic truncated form IS — 9 lag() calls over "
        "ONE window spec (one shuffle+sort on user_id), weights are "
        "exact powers of two so the weighted sum stays integer, and "
        "the only float op is the final division (IEEE-exact). "
        "Truncation error < 2^-9 of the value range — below cent "
        "resolution — while keeping bounded state and bit-exact "
        "cross-engine replay; a tolerance-free streaming twin of the "
        "same spec would use applyInPandasWithState."
    ),
    tags=("window", "timeseries"),
)
def ewma_dyadic_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    num_sql, den_sql = _ewma_terms_sql()
    # selectExpr with a named WINDOW isn't available on DataFrames;
    # inline the identical window spec per lag via over().
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def lagk(k: int):
        return F.col("y") if k == 0 else F.lag("y", k).over(w)

    num = None
    den = None
    for k in range(_EWMA_LAGS + 1):
        wt = 1 << (_EWMA_LAGS - k)
        term_n = F.coalesce(lagk(k) * F.lit(wt), F.lit(0))
        term_d = F.when(lagk(k).isNull(), F.lit(0)).otherwise(F.lit(wt))
        num = term_n if num is None else num + term_n
        den = term_d if den is None else den + term_d
    return pts.select(
        "event_id",
        "user_id",
        (num.cast("double") / den.cast("double")).alias("ewma_cents"),
    )


# ---------------------------------------------------------------------------
# Session path trigrams (round-6 widening)
# ---------------------------------------------------------------------------

@register(
    "session_path_trigrams",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
flagged AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, event_id, event_type, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
),
seqs AS (
  SELECT user_id, session_id,
         list(event_type ORDER BY ts, event_id) AS types
  FROM numbered GROUP BY user_id, session_id
)
SELECT trigram, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT unnest(list_transform(
           range(1, len(types) - 1),
           i -> types[i] || '>' || types[i + 1] || '>' || types[i + 2]))
         AS trigram
  FROM seqs WHERE len(types) >= 3
)
GROUP BY trigram
""",
    doc=(
        "Clickstream pattern mining: counts of event-type trigrams "
        "along each session's path (30-min-gap sessionization, the "
        "sessionize_events numbering), the sequence-motif statistic "
        "behind funnel discovery and bot-pattern detection. The path "
        "is assembled per session with ONE collect_list sorted "
        "row-locally (array_sort on (ts, event_id, type) structs — "
        "session length is human-bounded, so per-group state is "
        "small); trigrams explode row-locally via the zip_with "
        "shingle builder. Shuffles: the user_id window partitioning "
        "(shared by both windows and the session rollup) and the "
        "final trigram count. Deterministic under ties via the "
        "event_id tiebreak everywhere."
    ),
    tags=("timeseries", "window", "text", "agg"),
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.text import ngram_shingles

    ev = io.load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    numbered = ev.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    seqs = numbered.groupBy("user_id", "session_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda e: e["event_type"],
        ).alias("types")
    )
    return (
        seqs.filter(F.size("types") >= 3)
        .select(F.explode(ngram_shingles(F.col("types"), 3, sep=">")).alias("trigram"))
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# OHLC resample + rolling median (round-6 widening)
# ---------------------------------------------------------------------------

def ohlc_cents_okey(ev: DataFrame) -> tuple:
    """The OHLC candle's shared ingredients, defined ONCE for the batch
    and streaming twins (the module convention of streaming/windows.py):
    (cents column, collision-free total order key, aggregate list).
    Changing the tiebreak modulus or cents rounding here changes BOTH
    forms together — the property the streaming twin's "hash-matches
    the batch form" claim rests on."""
    okey = (
        F.unix_micros(F.col("ts")).cast("decimal(38,0)") * F.lit(1000000000)
        + F.col("event_id") % 1000000000
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    aggs = [
        F.min_by("cents", "okey").alias("open_c"),
        F.max("cents").alias("high_c"),
        F.min("cents").alias("low_c"),
        F.max_by("cents", "okey").alias("close_c"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    return cents, okey, aggs



@register(
    "timeseries_ohlc_hourly",
    oracle="""
WITH pts AS (
  SELECT user_id,
         time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) * 1000000) AS HUGEINT)
           * 1000000000 + event_id % 1000000000 AS okey
  FROM events
)
SELECT user_id, hour,
       arg_min(cents, okey) AS open_c,
       max(cents) AS high_c,
       min(cents) AS low_c,
       arg_max(cents, okey) AS close_c,
       CAST(count(*) AS BIGINT) AS n_events
FROM pts GROUP BY user_id, hour
""",
    doc=(
        "OHLC downsampling (the candlestick resample of every metrics "
        "and market pipeline): per user and hour, the first (open), "
        "max (high), min (low), and last (close) event value in exact "
        "integer cents. First/last ride ONE aggregation via "
        "min_by/max_by over a total ordering key — epoch micros widened "
        "to decimal with the event id in the low digits, so ties are "
        "impossible by construction and both engines pick identical "
        "rows (arg_min/arg_max in DuckDB). Single partial+final "
        "shuffle on (user, hour); no window, no sort, no second pass — "
        "the reduction shape that survives any scale."
    ),
    tags=("timeseries", "agg"),
)
def timeseries_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    cents, okey, aggs = ohlc_cents_okey(ev)
    pts = ev.select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hour"),
        cents.alias("cents"),
        okey.alias("okey"),
    )
    return pts.groupBy("user_id", "hour").agg(*aggs)


@register(
    "window_rolling_median",
    oracle="""
SELECT event_id, user_id,
       CAST(2 * median(CAST(cents AS DOUBLE))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
         AS dbl_med_c
FROM (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
) t
""",
    doc=(
        "Centered rolling median (window 5) per user — the robust "
        "smoothing twin of the dyadic EWMA: spikes pass through a mean "
        "but not a median. Spark has no median window function, so the "
        "frame is materialized row-locally (collect_list over ROWS "
        "2 PRECEDING..2 FOLLOWING — bounded at 5 elements, O(1) state) "
        "and the median read from the sorted frame as the DOUBLED "
        "order-statistic sum lo+hi (exact integer, the "
        "anomaly_mad_events trick) — so the output is integer and "
        "hash-exact against DuckDB's windowed median. One Exchange "
        "(user_id) + one Window; ties impossible in the ordering "
        "((ts, event_id) is total)."
    ),
    tags=("timeseries", "window", "stats"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 2)
    )
    frame = F.array_sort(F.collect_list("cents").over(w))
    n = F.size(frame)
    lo = F.element_at(frame, (F.floor((n - 1) / 2) + 1).cast("int"))
    hi = F.element_at(frame, (F.floor(n / 2) + 1).cast("int"))
    return pts.select(
        "event_id", "user_id", (lo + hi).alias("dbl_med_c")
    )


@register(
    "user_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS d
  FROM events
),
grp AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM days
),
streaks AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS len
  FROM grp GROUP BY user_id, g
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS active_days
FROM streaks GROUP BY user_id
""",
    doc=(
        "Daily-activity streaks per user (the engagement metric): "
        "longest run of consecutive active days, streak count, and "
        "total active days. The gaps-and-islands identity — for "
        "consecutive days, day_number minus row_number is constant — "
        "turns run detection into a plain GROUP BY: no self-join, no "
        "iterative chase. Day numbers are integer epoch-days, so "
        "every step is exact; all three shuffles (distinct, window, "
        "rollups) ride the user_id key."
    ),
    tags=("timeseries", "window", "agg"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.floor(F.col("ts").cast("long") / 86400).cast("bigint").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id", "d", (F.col("d") - F.row_number().over(w)).alias("g")
    )
    streaks = grp.groupBy("user_id", "g").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("len").alias("active_days"),
    )


@register(
    "attribution_decay_touch",
    oracle="""
WITH p AS (SELECT event_id AS purchase_id, user_id, ts
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts FROM events
      WHERE event_type = 'click'),
pairs AS (
  SELECT p.purchase_id, c.click_id,
         epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
),
wtd AS (
  SELECT *,
         (32 >> CAST((purchase_us - click_us) // 600000000 AS INT)) AS w,
         row_number() OVER (
           PARTITION BY purchase_id ORDER BY click_us DESC, click_id
         ) AS touch_rank
  FROM pairs
),
based AS (
  SELECT *,
         CAST(1000000 * w // SUM(w) OVER (PARTITION BY purchase_id)
              AS BIGINT) AS base
  FROM wtd
)
SELECT purchase_id, click_id, CAST(touch_rank AS BIGINT) AS touch_rank,
       CAST(w AS BIGINT) AS weight,
       CAST(base + CASE WHEN touch_rank <=
                         1000000 - SUM(base) OVER (PARTITION BY purchase_id)
                        THEN 1 ELSE 0 END AS BIGINT) AS credit_ppm
FROM based
""",
    doc=(
        "Time-decay multi-touch attribution — the second standard "
        "attribution model beside attribution_linear_touch: a click's "
        "share of the conversion credit halves every 10 minutes of age "
        "(weights 32 >> age_bucket over the 1-hour window — dyadic, so "
        "every weight is an exact integer). Credit is integer ppm: "
        "floor(1e6·w/W) per touch plus the remainder distributed +1 to "
        "the MOST RECENT touches (rank orders click_us descending — "
        "recency earns the rounding, matching the model's bias), so "
        "credit sums to exactly 1,000,000 per purchase with zero float "
        "anywhere. Same band-join + purchase_id-window shape as the "
        "linear model; one extra window sum for the weight total."
    ),
    tags=("timeseries", "join", "window"),
)
def attribution_decay_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    pairs = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(
        "purchase_id",
        "click_id",
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("c_ts").alias("click_us"),
    )
    w_rank = Window.partitionBy("purchase_id").orderBy(
        F.desc("click_us"), "click_id"
    )
    wtd = pairs.select(
        "*",
        F.expr(
            "shiftright(32, cast((purchase_us - click_us) div 600000000 as int))"
        ).alias("w"),
        F.row_number().over(w_rank).cast("bigint").alias("touch_rank"),
    )
    wp = Window.partitionBy("purchase_id")
    based = wtd.select(
        "*",
        F.expr("1000000L * w div sum(w) over (partition by purchase_id)")
        .cast("bigint")
        .alias("base"),
    )
    credit = F.col("base") + F.when(
        F.col("touch_rank") <= F.lit(1_000_000) - F.sum("base").over(wp), 1
    ).otherwise(0)
    return based.select(
        "purchase_id",
        "click_id",
        "touch_rank",
        F.col("w").cast("bigint").alias("weight"),
        credit.cast("bigint").alias("credit_ppm"),
    )


@register(
    "revenue_monthly_yoy",
    oracle="""
WITH m AS (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS month,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS HUGEINT)) AS rev_c
  FROM orders GROUP BY 1
)
SELECT month, CAST(rev_c AS BIGINT) AS rev_c,
       CAST(lag(rev_c, 12) OVER (ORDER BY month) AS BIGINT) AS prev_year_c,
       CAST(CAST(rev_c AS DOUBLE)
            / CAST(lag(rev_c, 12) OVER (ORDER BY month) AS DOUBLE) - 1.0
            AS DOUBLE) AS yoy_growth
FROM m
""",
    doc=(
        "Monthly revenue with year-over-year growth — the reporting "
        "staple. Monthly sums are exact integer cents; the YoY ratio "
        "is one identically-shaped double division (NULL for the "
        "first twelve months, both engines). The lag-12 window is "
        "GLOBAL but runs over the already-aggregated month series — "
        "cardinality is months-of-history (~80 here, bounded ~1e3 in "
        "any real system), so the single ordered partition is a "
        "constant-size post-aggregation step, not a data-sized sort."
    ),
    tags=("timeseries", "window", "agg"),
)
def revenue_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")).alias(
            "rev"
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("rev", 12).over(w)
    return m.select(
        "month",
        F.col("rev").cast("bigint").alias("rev_c"),
        prev.cast("bigint").alias("prev_year_c"),
        (F.col("rev").cast("double") / prev.cast("double") - 1.0).alias(
            "yoy_growth"
        ),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
WITH first_click AS (
  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
), conv AS (
  SELECT e.user_id, CAST(e.user_id % 4 AS INT) AS cohort,
         CAST(min(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(fc.t_click))
              AS BIGINT) AS dur_us
  FROM events e JOIN first_click fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > fc.t_click
  GROUP BY e.user_id, cohort
)
SELECT cohort,
       CAST(count(*) AS BIGINT) AS n_converted,
       CAST(round(SUM(dur_us) / count(*) / 1e6, 6) AS DOUBLE) AS mean_s,
       CAST(quantile_cont(CAST(dur_us AS DOUBLE), 0.5) / 1e6 AS DOUBLE) AS p50_s,
       CAST(quantile_cont(CAST(dur_us AS DOUBLE), 0.9) / 1e6 AS DOUBLE) AS p90_s
FROM conv GROUP BY cohort
""",
    doc=(
        "Funnel latency (time-to-convert): per user, microseconds from "
        "FIRST click to the first subsequent purchase, rolled up per "
        "cohort into count, mean, and exact R-7 interpolated p50/p90 "
        "— the duration companion to user_funnel_conversion's "
        "stage-count report. Durations stay integer micros (exact "
        "epoch subtraction); the mean is an exact integer-sum "
        "division; the quantiles reuse the histogram+cumulative-"
        "window order-statistic shape of stats_exact_quantiles "
        "(bounded state, no per-partition value buffering — the "
        "percentile aggregate's 100 TB memory hazard), IEEE-identical "
        "to DuckDB's quantile_cont. Two user-keyed aggregates and one "
        "user-keyed join — everything rides the same user_id "
        "partitioning."
    ),
    tags=("agg", "window", "stats", "timeseries", "funnel"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id", (F.col("user_id") % 4).cast("int").alias("cohort"))
        .agg(
            F.min(F.unix_micros("ts") - F.unix_micros("t_click")).alias("dur_us")
        )
    )
    counts = conv.groupBy("cohort", F.col("dur_us").cast("double").alias("v")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("dur_us").alias("us_part"),
    )
    w = Window.partitionBy("cohort").orderBy("v")
    wn = Window.partitionBy("cohort")
    r = counts.select(
        "cohort",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n"),
        F.sum("us_part").over(wn).alias("sum_us"),
    )

    def quantile(p: float, out: str) -> list:
        idx = (F.col("n") - 1) * F.lit(p)
        lo, hi = F.floor(idx), F.ceil(idx)
        return [
            F.min(F.when(F.col("cum") >= lo + 1, F.col("v"))).alias(f"__lo_{out}"),
            F.min(F.when(F.col("cum") >= hi + 1, F.col("v"))).alias(f"__hi_{out}"),
            F.max(idx - lo).alias(f"__f_{out}"),
        ]

    agg = r.groupBy("cohort").agg(
        F.max("n").alias("n_converted"),
        F.max("sum_us").alias("sum_us"),
        *quantile(0.5, "p50"),
        *quantile(0.9, "p90"),
    )

    def interp(out: str):
        lo, hi, f = F.col(f"__lo_{out}"), F.col(f"__hi_{out}"), F.col(f"__f_{out}")
        return (lo + (hi - lo) * f) / 1e6

    return agg.select(
        "cohort",
        "n_converted",
        F.round(F.col("sum_us") / F.col("n_converted") / 1e6, 6).alias("mean_s"),
        interp("p50").alias("p50_s"),
        interp("p90").alias("p90_s"),
    )


@register(
    "twap_user_value",
    oracle="""
WITH seq AS (
  SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts,
         lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS next_ts
  FROM events
), segs AS (
  SELECT user_id,
         epoch_us(next_ts) - epoch_us(ts) AS dt_us,
         CAST(round(value * (epoch_us(next_ts) - epoch_us(ts)) / 1e6, 4)
              AS DECIMAL(24,4)) AS vdt
  FROM seq WHERE next_ts IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(round(SUM(dt_us) / 1e6, 3) AS DOUBLE) AS span_s,
       CAST(round(CAST(SUM(vdt) AS DOUBLE) / (SUM(dt_us) / 1e6), 6) AS DOUBLE)
         AS twap
FROM segs GROUP BY user_id
""",
    doc=(
        "Time-weighted average value per user (TWAP — the correct "
        "mean for irregularly-sampled step series, where the plain "
        "AVG over-weights bursty periods): each observation holds "
        "until the next one (lead over the user timeline), weight = "
        "holding micros, TWAP = Σ v·Δt / ΣΔt. One user-keyed Exchange "
        "feeds both the lead window and the rollup; v·Δt terms are "
        "rounded to 4 dp into exact decimals before summing "
        "(order-independent — the band's float-sum discipline), "
        "durations stay integer micros. The last observation of each "
        "user has no holding interval and is excluded by definition."
    ),
    tags=("window", "agg", "timeseries", "stats"),
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("user_id", "value", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next_ts", F.lead("ts").over(w)).filter(
        F.col("next_ts").isNotNull()
    )
    dt_us = F.unix_micros("next_ts") - F.unix_micros("ts")
    segs = seq.select(
        "user_id",
        dt_us.alias("dt_us"),
        F.round(F.col("value") * dt_us / 1e6, 4).cast("decimal(24,4)").alias("vdt"),
    )
    return segs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(F.sum("dt_us") / 1e6, 3).alias("span_s"),
        F.round(
            F.sum("vdt").cast("double") / (F.sum("dt_us") / 1e6), 6
        ).alias("twap"),
    )


@register(
    "debounce_events_1h",
    oracle="""
WITH seq AS (
  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_id, user_id, event_type
FROM seq
WHERE prev_ts IS NULL
   OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
""",
    doc=(
        "Debounce filter (the telemetry double-fire / double-click "
        "scrub): an event survives unless the SAME user emitted the "
        "SAME type within the previous hour. (A literal 5 s window is vacuous on the fixture's ~2-day per-(user,type) cadence — every event would survive and the filter would test nothing; 1 h suppresses 184 events at sf0.01, so the rule is exercised.) One (user,type)-keyed lag "
        "window — in-partition sort, single Exchange, no self-join; "
        "the gap compares integer micros (exact). Note the semantics "
        "pinned here are lag-based (gap to the previous RAW event), "
        "not gap-to-previous-SURVIVOR — the two differ on bursts "
        "longer than the window and this form is the one-pass "
        "streaming-friendly one (survivor-relative debounce needs a "
        "session-style running state)."
    ),
    tags=("window", "timeseries", "dedup"),
)
def debounce_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 3_600_000_000)
        )
        .select("event_id", "user_id", "event_type")
    )


@register(
    "window_session_dynamic_gap",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         CASE WHEN event_type = 'error' THEN 300000000
              ELSE 1800000000 END AS gap_us
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts, gap_us,
         CASE WHEN max(epoch_us(ts) + gap_us)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
                OR epoch_us(ts) >=
                   max(epoch_us(ts) + gap_us)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM ev
), numbered AS (
  SELECT user_id, ts, gap_us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id,
       min(ts) AS t_start,
       CAST(max(epoch_us(ts) + gap_us) AS BIGINT) AS t_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, sid
""",
    doc=(
        "Session window with a DYNAMIC per-event gap (Spark's "
        "session_window with an expression gap): error events close "
        "their session after 5 minutes of silence, everything else "
        "after 30 — the per-event-severity sessionization the fixed-"
        "gap builtin can't express. The builtin merges overlapping "
        "[ts, ts+gap) intervals; the oracle replays exactly that "
        "interval-union rule as a running max of interval ends "
        "(a new session starts iff the event's ts clears EVERY "
        "previous end, not just the last one — the subtlety a plain "
        "lag-based gaps-and-islands gets wrong with mixed gaps). One "
        "user-keyed Exchange, in-partition sort, streaming-capable by "
        "construction."
    ),
    tags=("window", "streaming", "timeseries"),
)
def window_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        # session_window requires CalendarIntervalType: string-literal
        # branches (the documented dynamic-gap form), not day-time
        # INTERVAL expressions
        F.when(F.col("event_type") == "error", F.lit("5 minutes"))
        .otherwise(F.lit("30 minutes"))
        .alias("gap"),
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", F.col("gap")).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("t_start"),
            F.unix_micros("sw.end").alias("t_end_us"),
            "n_events",
        )
    )


@register(
    "concurrency_peak_daily",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM flagged
),
sess AS (
  SELECT user_id, session_id,
         epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
  FROM numbered GROUP BY user_id, session_id
),
b AS (
  SELECT s_us AS t_us, 1 AS delta, user_id, session_id FROM sess
  UNION ALL
  SELECT e_us AS t_us, -1 AS delta, user_id, session_id FROM sess
),
c AS (
  SELECT t_us, delta,
         SUM(delta) OVER (ORDER BY t_us, -delta, user_id, session_id) AS conc
  FROM b
),
d AS (
  SELECT t_us // 86400000000 AS dayn,
         max(conc) AS day_max,
         SUM(delta) AS day_delta,
         SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS n_started
  FROM c GROUP BY 1
),
spine AS (
  SELECT unnest(range((SELECT min(dayn) FROM d),
                      (SELECT max(dayn) FROM d) + 1)) AS dayn
),
j AS (
  SELECT s.dayn, d.day_max, coalesce(d.n_started, 0) AS n_started
  FROM spine s LEFT JOIN d USING (dayn)
),
e AS (
  SELECT j.*,
         coalesce((SELECT SUM(d2.day_delta) FROM d d2 WHERE d2.dayn < j.dayn),
                  0) AS entering
  FROM j
)
SELECT CAST(DATE '1970-01-01' + CAST(dayn AS INTEGER) AS DATE) AS day,
       CAST(n_started AS BIGINT) AS n_sessions_started,
       CAST(greatest(coalesce(day_max, entering), entering) AS BIGINT)
         AS peak_concurrent
FROM e
""",
    doc=(
        "Peak concurrent sessions per day — the classic sweep-line "
        "(interval stabbing) aggregate: sessionize (the same 30-min "
        "gap contract as sessionize_events), emit (+1 at start, -1 at "
        "end) boundary events, and the running sum over boundaries in "
        "(time, starts-before-ends) order IS the instantaneous "
        "concurrency; per-day peak = max over the day's boundaries.  "
        "The running sum is boundary-grain (2 rows per session — "
        "unbounded cardinality at 100 TB), so it runs through the "
        "day-bucketed distributed cumsum, never a partition-less "
        "window.  Carry-over is free: the cumsum is GLOBAL, so a "
        "session spanning midnight is still counted in the next day's "
        "boundary concurrencies; days with NO boundaries take the "
        "entering concurrency (prefix sum of day deltas over the "
        "calendar spine — sequence(min,max), not distinct-present "
        "days, so gapped data can't silently skip a day), and a day "
        "whose first boundary is a session END peaks at its entering "
        "value, not at any boundary (greatest handles both).  The "
        "day-grain tail is a broadcast triangular join over calendar "
        "days — bounded by the date range, never by data volume."
    ),
    tags=("timeseries", "window", "agg", "sessionize"),
)
def concurrency_peak_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    DAY_US = 86_400_000_000
    ev = io.load(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    numbered = ev.withColumn(
        "session_id",
        F.sum(is_new)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    sess = numbered.groupBy("user_id", "session_id").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    bounds = sess.select(
        F.col("s_us").alias("t_us"), F.lit(1).alias("delta"), "user_id", "session_id"
    ).unionAll(
        sess.select(
            F.col("e_us").alias("t_us"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_id",
        )
    ).withColumn("dneg", -F.col("delta"))
    cum = global_rank_cumsum(
        bounds,
        ["t_us", "dneg", "user_id", "session_id"],
        [("conc", "delta")],
        rank_col="__cp_rn",
        bucket_expr=F.floor(F.col("t_us") / F.lit(DAY_US)),
    )
    d = cum.groupBy(
        F.floor(F.col("t_us") / F.lit(DAY_US)).alias("dayn")
    ).agg(
        F.max("conc").alias("day_max"),
        F.sum("delta").alias("day_delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_started"),
    )
    spine = (
        d.agg(F.min("dayn").alias("lo"), F.max("dayn").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("dayn"))
    )
    j = spine.join(d, "dayn", "left").select(
        "dayn", "day_max", F.coalesce("n_started", F.lit(0)).alias("n_started")
    )
    prior = d.select(
        F.col("dayn").alias("bdayn"), F.col("day_delta").alias("bdelta")
    )
    e = (
        j.join(F.broadcast(prior), F.col("bdayn") < F.col("dayn"), "left")
        .groupBy("dayn", "day_max", "n_started")
        .agg(F.coalesce(F.sum("bdelta"), F.lit(0)).alias("entering"))
    )
    return e.select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("dayn").cast("int")).alias(
            "day"
        ),
        F.col("n_started").cast("bigint").alias("n_sessions_started"),
        F.greatest(
            F.coalesce("day_max", "entering"), F.col("entering")
        ).cast("bigint").alias("peak_concurrent"),
    )


@register(
    "seasonal_decompose_daily",
    oracle="""
WITH daily0 AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS dayn,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), spine AS (
  SELECT unnest(range((SELECT min(dayn) FROM daily0),
                      (SELECT max(dayn) FROM daily0) + 1)) AS dayn
), daily AS (
  SELECT s.dayn, coalesce(d.cnt, 0) AS cnt
  FROM spine s LEFT JOIN daily0 d USING (dayn)
), tr AS (
  SELECT t.dayn,
         CASE WHEN count(*) = 7 THEN SUM(d.cnt) END AS trend7
  FROM (SELECT dayn, unnest(range(-3, 4)) AS off FROM daily) t
  JOIN daily d ON d.dayn = t.dayn + t.off
  GROUP BY t.dayn
), dev AS (
  SELECT d.dayn, d.cnt, tr.trend7,
         (d.dayn + 4) % 7 AS dow,
         7 * d.cnt - tr.trend7 AS dev7
  FROM daily d JOIN tr ON tr.dayn = d.dayn
), seas AS (
  SELECT dow,
         CAST(SUM(dev7) AS DOUBLE) / CAST(7 * count(*) AS DOUBLE) AS seasonal
  FROM dev WHERE dev7 IS NOT NULL GROUP BY dow
)
SELECT CAST(DATE '1970-01-01' + CAST(d.dayn AS INTEGER) AS DATE) AS day,
       d.cnt AS n_events,
       CAST(d.trend7 AS DOUBLE) / 7.0 AS trend,
       CASE WHEN d.trend7 IS NOT NULL THEN s.seasonal END AS seasonal,
       CASE WHEN d.trend7 IS NOT NULL
            THEN (CAST(d.cnt AS DOUBLE) - CAST(d.trend7 AS DOUBLE) / 7.0)
                 - s.seasonal END AS residual
FROM dev d JOIN seas s ON s.dow = d.dow
""",
    doc=(
        "Classical seasonal decomposition at day grain (STL-lite, the "
        "moving-average form): trend = centered 7-day moving average "
        "of daily event counts, seasonal = day-of-week mean of the "
        "detrended series, residual = observed − trend − seasonal — "
        "the decomposition every traffic-anomaly and capacity model "
        "starts from.  The moving average is an exploded-offset "
        "EQUI-join over the calendar spine (sequence(min,max), so "
        "gapped days count as zero instead of silently shrinking the "
        "window — the sliding_distinct lesson), never a day-ordered "
        "partition-less window; edge days without a full 7-day window "
        "report NULL trend and are excluded from the seasonal means.  "
        "Exactness: trend7 and dev7 = 7·cnt − trend7 stay integer "
        "(the ×7 scale defers division), and floats enter only in "
        "trend7/7, one seasonal mean division, and the final "
        "subtraction chain — identical expression trees both engines, "
        "bit-identical output, no rounding.  Day grain is bounded by "
        "the calendar: every join side here is broadcastable forever."
    ),
    tags=("timeseries", "agg", "stats"),
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    DAY_US = 86_400_000_000
    ev = io.load(spark, sf_dir, "events")
    daily0 = ev.groupBy(
        (F.unix_micros("ts") / F.lit(DAY_US)).cast("bigint").alias("dayn")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    spine = (
        daily0.agg(F.min("dayn").alias("lo"), F.max("dayn").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("dayn"))
    )
    daily = spine.join(daily0, "dayn", "left").select(
        "dayn", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    offs = daily.select(
        "dayn", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("off")
    ).select((F.col("dayn")).alias("tdayn"), (F.col("dayn") + F.col("off")).alias("dayn"))
    tr = (
        offs.join(F.broadcast(daily), "dayn")
        .groupBy(F.col("tdayn").alias("dayn"))
        .agg(
            F.when(F.count(F.lit(1)) == 7, F.sum("cnt")).alias("trend7")
        )
    )
    dev = daily.join(F.broadcast(tr), "dayn").select(
        "dayn",
        "cnt",
        "trend7",
        F.pmod(F.col("dayn") + 4, F.lit(7)).alias("dow"),
        (7 * F.col("cnt") - F.col("trend7")).alias("dev7"),
    )
    seas = (
        dev.filter(F.col("dev7").isNotNull())
        .groupBy("dow")
        .agg(
            (
                F.sum("dev7").cast("double")
                / (7 * F.count(F.lit(1))).cast("double")
            ).alias("seasonal")
        )
    )
    out = dev.join(F.broadcast(seas), "dow")
    has_tr = F.col("trend7").isNotNull()
    trend = F.col("trend7").cast("double") / F.lit(7.0)
    return out.select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("dayn").cast("int")).alias(
            "day"
        ),
        F.col("cnt").alias("n_events"),
        trend.alias("trend"),
        F.when(has_tr, F.col("seasonal")).alias("seasonal"),
        F.when(
            has_tr, (F.col("cnt").cast("double") - trend) - F.col("seasonal")
        ).alias("residual"),
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
WITH h AS (
  SELECT event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), b AS (
  SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM h GROUP BY 1
), spine AS (
  SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM b
), j AS (
  SELECT s.event_type, s.hr, h.n, h.v FROM spine s
  LEFT JOIN h ON h.event_type = s.event_type AND h.hr = s.hr
), w AS (
  SELECT event_type, hr, n, v,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           OVER wp AS ph,
         first_value(v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           OVER wf AS nh
  FROM j
  WINDOW wp AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       make_timestamp(hr * 3600000000) AS hour,
       coalesce(n, 0) AS n_events,
       CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
            ELSE CAST(pv AS DOUBLE)
                 + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                   * (CAST(hr - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
       END AS sum_cents_filled,
       v IS NULL AS is_interpolated
FROM w
""",
    doc=(
        "Linear-interpolation gap fill at hour grain — the second "
        "canonical fill mode next to timeseries_gapfill's LOCF "
        "(TimescaleDB ships exactly this pair: locf() and "
        "interpolate()): missing hours take the straight line between "
        "the nearest present neighbors, v_prev + (v_next−v_prev)·"
        "(h−h_prev)/(h_next−h_prev).  Neighbor discovery is "
        "last_value/first_value IGNORE NULLS over type-keyed windows "
        "whose row count is CALENDAR-bounded (hours in the observed "
        "range — the same bounded-grain contract as the day/month "
        "windows), and the spine spans min..max per type so every "
        "gap is interior: no edge extrapolation case exists by "
        "construction.  Sums are exact integer cents; floats enter "
        "only in the one interpolation expression, identical shape "
        "both engines — hash-exact with no tolerance.  The fixture "
        "leaves 215 of 3600 type-hours empty, so the interpolation "
        "branch is exercised non-vacuously."
    ),
    tags=("timeseries", "window", "agg"),
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    HR_US = 3_600_000_000
    ev = io.load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        (F.unix_micros("ts") / F.lit(HR_US)).cast("bigint").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("v"),
    )
    spine = (
        h.groupBy("event_type")
        .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select("event_type", F.explode(F.sequence("lo", "hi")).alias("hr"))
    )
    j = spine.join(h, ["event_type", "hr"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    mark = F.when(F.col("v").isNotNull(), F.col("hr"))
    w = j.select(
        "event_type",
        "hr",
        "n",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(mark, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(mark, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = F.col("pv").cast("double") + (
        F.col("nv").cast("double") - F.col("pv").cast("double")
    ) * (
        (F.col("hr") - F.col("ph")).cast("double")
        / (F.col("nh") - F.col("ph")).cast("double")
    )
    return w.select(
        "event_type",
        F.timestamp_micros(F.col("hr") * F.lit(HR_US)).alias("hour"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
        .otherwise(interp)
        .alias("sum_cents_filled"),
        F.col("v").isNull().alias("is_interpolated"),
    )


@register(
    "hampel_outliers_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(round(value * 100, 0) AS HUGEINT)) AS BIGINT) AS cents
  FROM events GROUP BY day
),
win AS (
  SELECT a.day, a.cents, list_sort(list(b.cents)) AS vals
  FROM daily a JOIN daily b
    ON b.day >= a.day - INTERVAL 3 DAY AND b.day <= a.day + INTERVAL 3 DAY
  GROUP BY a.day, a.cents
  HAVING count(*) = 7
),
med AS (
  SELECT day, cents, vals, 2 * vals[4] AS med2
  FROM win
),
mad AS (
  SELECT day, cents, med2,
         list_sort(list_transform(vals, x -> abs(2 * x - med2)))[4] AS mad2
  FROM med
)
SELECT day, cents,
       CAST(med2 AS BIGINT) AS med2_7d,
       CAST(mad2 AS BIGINT) AS mad2_7d,
       CAST(abs(2 * cents - med2) > 3 * mad2 AS BOOLEAN) AS is_outlier
FROM mad
""",
    doc=(
        "Hampel filter over the daily revenue series: each day is "
        "compared against the median of its centered 7-day window, "
        "flagged as an outlier when it deviates more than 3 robust "
        "sigmas (3x the window's median absolute deviation — the "
        "despiking filter robust-stats pipelines prefer to the z-score "
        "because one spike can't inflate its own threshold, cf. "
        "anomaly_zscore_events/anomaly_mad_events at population "
        "grain). Exactness: medians of integers are carried DOUBLED "
        "(med2 = a[3]+a[4] collapses to 2*a[3] for odd n=7; MAD "
        "likewise), so every column is an exact integer and the "
        "comparison is integer-only — zero floats, bit-exact hash. "
        "Plan: one events scan -> day rollup; the windowing is a "
        "triangular self-join of the calendar-bounded day spine "
        "(broadcast, row-local sorted-array median), NOT a "
        "partition-less sliding window; partial edge windows drop "
        "(n = 7 exactly)."
    ),
    tags=("timeseries", "analytics", "agg"),
)
def hampel_outliers_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select("ts", "value")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("decimal(20,0)"))
        .cast("bigint")
        .alias("cents")
    )
    a = daily.select(F.col("day").alias("a_day"), F.col("cents").alias("a_cents"))
    b = daily.select(F.col("day").alias("b_day"), F.col("cents").alias("b_cents"))
    win = (
        a.join(
            F.broadcast(b),
            (F.col("b_day") >= F.col("a_day") - F.expr("INTERVAL 3 DAYS"))
            & (F.col("b_day") <= F.col("a_day") + F.expr("INTERVAL 3 DAYS")),
        )
        .groupBy(F.col("a_day").alias("day"), F.col("a_cents").alias("cents"))
        .agg(
            F.sort_array(F.collect_list("b_cents")).alias("vals"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == 7)
    )
    med = win.withColumn("med2", 2 * F.element_at("vals", 4))
    mad = med.withColumn(
        "mad2",
        F.element_at(
            F.array_sort(F.expr("transform(vals, x -> abs(2 * x - med2))")), 4
        ),
    )
    return mad.select(
        "day",
        "cents",
        F.col("med2").cast("bigint").alias("med2_7d"),
        F.col("mad2").cast("bigint").alias("mad2_7d"),
        (F.abs(2 * F.col("cents") - F.col("med2")) > 3 * F.col("mad2"))
        .cast("boolean")
        .alias("is_outlier"),
    )


@register(
    "inventory_floor_balance",
    oracle="""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT)
              ELSE -CAST(round(value * 100, 0) AS BIGINT) END AS delta_c
  FROM events WHERE event_type IN ('purchase', 'error')
),
c1 AS (
  SELECT *, SUM(delta_c) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS s
  FROM ev
),
c2 AS (
  SELECT *, min(s) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS m
  FROM c1
)
SELECT user_id, event_id, delta_c,
       CAST(s - CASE WHEN m < 0 THEN m ELSE 0 END AS BIGINT) AS balance_c
FROM c2
""",
    doc=(
        "Floored running balance (credits accrue on purchases, drain "
        "on errors, and the balance can never go below zero — the "
        "inventory / prepaid-credit / leaky-bucket recursion "
        "b_t = max(0, b_{t-1} + x_t) that folklore says needs "
        "recursive SQL): the reflected-random-walk identity "
        "b_t = S_t - min(0, min_{j<=t} S_j) turns the per-row "
        "recursion into TWO stacked window passes (prefix sum, then "
        "running min of it) — pure integer cents, bit-exact, and the "
        "floor genuinely binds on the fixture (2,019 of 3,995 rows "
        "have a negative raw prefix; probed). The identity itself is "
        "pinned against a literal Python re-execution of the "
        "recursion in tests/test_fingerprint.py. Windows partition "
        "on user_id — a dimension that grows with the corpus, the "
        "scalable window grain."
    ),
    tags=("timeseries", "window", "analytics"),
)
def inventory_floor_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        io.load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            )
            .otherwise(-F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("delta_c"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c1 = ev.withColumn("s", F.sum("delta_c").over(w))
    c2 = c1.withColumn("m", F.min("s").over(w))
    return c2.select(
        "user_id",
        "event_id",
        "delta_c",
        (
            F.col("s")
            - F.when(F.col("m") < 0, F.col("m")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("balance_c"),
    )


@register(
    "max_drawdown_user",
    oracle="""
WITH ev AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100, 0) AS BIGINT)
              ELSE -CAST(round(value * 100, 0) AS BIGINT) END AS delta_c
  FROM events WHERE event_type IN ('purchase', 'error')
),
c1 AS (
  SELECT *, SUM(delta_c) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS s
  FROM ev
),
c2 AS (
  SELECT *, max(s) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) - s AS dd
  FROM c1
),
mx AS (SELECT user_id, max(dd) AS mdd FROM c2 GROUP BY user_id)
SELECT c2.user_id,
       CAST(m.mdd AS BIGINT) AS max_drawdown_c,
       CAST(min(epoch_us(CAST(c2.ts AS TIMESTAMP))) AS BIGINT)
         AS first_trough_us
FROM c2 JOIN mx m ON c2.user_id = m.user_id AND c2.dd = m.mdd
GROUP BY c2.user_id, m.mdd
""",
    doc=(
        "Per-user maximum drawdown of the signed value curve "
        "(purchases up, errors down): the largest peak-to-trough fall "
        "— the quant risk metric, reused here as an account-health "
        "screen. One user-keyed window pass builds the running peak; "
        "drawdown is row-local; the per-user rollup takes the max and "
        "the EARLIEST trough timestamp at that depth (deterministic "
        "tiebreak). Pure integer cents, bit-exact. The oracle takes "
        "the textbook max + join-back argmin; the Spark plan is one "
        "min_by struct aggregate — no second pass over the rows."
    ),
    tags=("timeseries", "window", "analytics", "agg"),
)
def max_drawdown_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        io.load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100, 0).cast("bigint"),
            )
            .otherwise(-F.round(F.col("value") * 100, 0).cast("bigint"))
            .alias("delta_c"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c1 = ev.withColumn("s", F.sum("delta_c").over(w))
    c2 = c1.withColumn("dd", F.max("s").over(w) - F.col("s"))
    return c2.groupBy("user_id").agg(
        F.max("dd").cast("bigint").alias("max_drawdown_c"),
        F.expr("min_by(unix_micros(ts), struct(-dd, unix_micros(ts)))")
        .cast("bigint")
        .alias("first_trough_us"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "ltv_cohort_curve",
    oracle="""
WITH ev AS (
  SELECT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk,
         CASE WHEN event_type = 'purchase'
              THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END AS cents
  FROM events
),
fw AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id),
cs AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort_users
       FROM fw GROUP BY 1),
wkrev AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, e.wk) // 7 AS BIGINT)
           AS week_offset,
         CAST(SUM(e.cents) AS BIGINT) AS rev_cents
  FROM ev e JOIN fw f USING (user_id)
  GROUP BY 1, 2
)
SELECT w.cohort_week, w.week_offset, c.n_cohort_users,
       CAST(SUM(w.rev_cents) OVER (
              PARTITION BY w.cohort_week ORDER BY w.week_offset) AS BIGINT)
         AS cum_revenue_cents,
       CAST(SUM(w.rev_cents) OVER (
              PARTITION BY w.cohort_week ORDER BY w.week_offset)
            // c.n_cohort_users AS BIGINT) AS ltv_cents_per_user
FROM wkrev w JOIN cs c USING (cohort_week)
""",
    doc=(
        "Cohort lifetime-value curve: for each signup cohort (week of "
        "a user's first event) and week offset, the CUMULATIVE "
        "purchase revenue and the per-user LTV — the growth-"
        "accounting readout that retention_cohorts' activity matrix "
        "feeds into when each cell carries money instead of presence. "
        "Integer cents throughout; LTV is exact integer division by "
        "the cohort size. Plan: the user-grain first-week agg and the "
        "per-(user, week) revenue share one user_id shuffle; the "
        "cumulative sum runs on the COHORT-grain aggregate (a few "
        "hundred rows at any scale — cohorts × offsets), partitioned "
        "by cohort_week, never partition-less."
    ),
    tags=("timeseries", "window", "agg"),
)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("wk"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    fw = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    cs = fw.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort_users")
    )
    wkrev = (
        ev.join(fw, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    return (
        wkrev.join(cs, "cohort_week")
        .withColumn(
            "cum_revenue_cents", F.sum("rev_cents").over(w).cast("bigint")
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_cohort_users",
            "cum_revenue_cents",
            F.expr("CAST(cum_revenue_cents DIV n_cohort_users AS BIGINT)").alias(
                "ltv_cents_per_user"
            ),
        )
    )


# ---------------------------------------------------------------------------
# SCD2 incremental maintenance (round-10 widening)
# ---------------------------------------------------------------------------

# cutoff between the "existing dimension" and the "change batch":
# mid-corpus (fixture spans 2024-01; day 15 splits signups ~half/half)
_SCD2_CUTOFF_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z in epoch µs


@register(
    "scd2_apply_changes",
    oracle=f"""
SELECT user_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS feature_k,
       epoch_us(ts) AS valid_from_us,
       lead(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts), event_id
       ) AS valid_to_us
FROM events WHERE event_type = 'signup'
""",
    doc=(
        "Incremental SCD2 maintenance (the MERGE a warehouse runs "
        "nightly): the existing dimension (signups before 2024-01-15, "
        "already in SCD2 form) takes a change batch (signups on/after "
        "the cutoff) WITHOUT rebuilding history — each changed user's "
        "OPEN row is closed at their first change timestamp, batch "
        "rows chain among themselves, untouched rows pass through. "
        "The ORACLE is the full-history rebuild, so the hash check IS "
        "the maintenance-equals-rebuild theorem on the whole fixture "
        "— the property that makes incremental dimension loads "
        "trustworthy. Plan: the dimension and the batch window on the "
        "same user_id key; the close step is one aggregate (min "
        "change ts per user) broadcast against the open rows; no "
        "history rows are rewritten (at 100 TB the closed history is "
        "the immutable bulk — this plan never touches it)."
    ),
    tags=("timeseries", "scd2", "window", "join"),
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.get_json_object("props", "$.k").cast("bigint").alias("feature_k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    # the EXISTING dimension: SCD2 over pre-cutoff signups (what's on
    # disk before tonight's load)
    dim = (
        signups.filter(F.col("ts_us") < _SCD2_CUTOFF_US)
        .withColumn("valid_to_us", F.lead("ts_us").over(w))
        .select(
            "user_id",
            "feature_k",
            F.col("ts_us").alias("valid_from_us"),
            "valid_to_us",
        )
    )
    # tonight's change batch: post-cutoff signups, chained among
    # themselves (lead within the batch)
    batch = (
        signups.filter(F.col("ts_us") >= _SCD2_CUTOFF_US)
        .withColumn("valid_to_us", F.lead("ts_us").over(w))
        .select(
            "user_id",
            "feature_k",
            F.col("ts_us").alias("valid_from_us"),
            "valid_to_us",
        )
    )
    first_change = batch.groupBy("user_id").agg(
        F.min("valid_from_us").alias("close_at_us")
    )
    # MERGE: closed history passes through untouched; open rows of
    # changed users close at the user's first change ts; open rows of
    # unchanged users stay open
    closed_history = dim.filter(F.col("valid_to_us").isNotNull())
    open_rows = dim.filter(F.col("valid_to_us").isNull()).drop("valid_to_us")
    merged_open = open_rows.join(first_change, "user_id", "left").select(
        "user_id",
        "feature_k",
        "valid_from_us",
        F.col("close_at_us").alias("valid_to_us"),
    )
    return closed_history.unionByName(merged_open).unionByName(batch)


# ---------------------------------------------------------------------------
# CDC tombstone compaction (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "cdc_tombstone_compaction",
    oracle="""
SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts
FROM (
  SELECT user_id, event_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1 AND event_type <> 'error'
""",
    doc=(
        "DELETE-aware changelog compaction (the Debezium/Kafka "
        "log-compaction semantics cdc_latest_per_user omits): "
        "'error' events stand in for tombstones — a key whose LATEST "
        "record is a tombstone disappears from the materialized "
        "table entirely, rather than surfacing its previous value "
        "(the bug naive 'latest non-delete per key' compactions "
        "have: they resurrect deleted rows). Same WindowGroupLimit "
        "top-1 plan as the plain compaction, one user-keyed shuffle; "
        "the tombstone test is a filter ON THE SURVIVOR, never a "
        "second pass. 30 of 2000 fixture keys end deleted (probed at "
        "sf0.01) — the oracle is non-vacuous on both the kept and "
        "dropped sides."
    ),
    tags=("timeseries", "window", "cdc"),
)
def cdc_tombstone_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", "event_id", "value", "ts")
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching — MATCH_RECOGNIZE-lite (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "pattern_vshape_user_value",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
         lag(CAST(ROUND(value * 100, 0) AS BIGINT), 1)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
         lag(CAST(ROUND(value * 100, 0) AS BIGINT), 2)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v2
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN v2 > v1 AND v1 < v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_vshapes,
       CAST(count(*) AS BIGINT) AS n_events
FROM seq
GROUP BY user_id
HAVING SUM(CASE WHEN v2 > v1 AND v1 < v THEN 1 ELSE 0 END) >= 3
""",
    doc=(
        "Sequence pattern matching (MATCH_RECOGNIZE / Flink-CEP "
        "lite): count strict V-shapes (down-then-up triples) in each "
        "user's event-time-ordered value sequence, keeping users with "
        ">= 3 — the dip-and-recovery detector fraud/engagement "
        "pipelines run as a CEP rule. A fixed-length pattern over a "
        "per-key ordered sequence is exactly two LAG frames in ONE "
        "user-partitioned window pass (no self-joins, no UDF, no "
        "state machine needed until patterns get variable-length); "
        "values compare as integer cents so the pattern predicate "
        "has no float boundary. One keyed shuffle; the rollup rides "
        "the same partitioning."
    ),
    tags=("timeseries", "window", "cep"),
)
def pattern_vshape_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    seq = ev.select(
        "user_id",
        v.alias("v"),
        F.lag(v, 1).over(w).alias("v1"),
        F.lag(v, 2).over(w).alias("v2"),
    )
    hit = F.when((F.col("v2") > F.col("v1")) & (F.col("v1") < F.col("v")), 1).otherwise(0)
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum(hit).cast("bigint").alias("n_vshapes"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .filter(F.col("n_vshapes") >= 3)
    )


# ---------------------------------------------------------------------------
# Interval coalescing — gaps-and-islands over spans (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "interval_coalesce_user_spans",
    oracle="""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 7200000000 AS e,
         event_id
  FROM events WHERE event_type IN ('view', 'click')
),
flagged AS (
  SELECT user_id, s, e, event_id,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS is_new
  FROM iv
),
grp AS (
  SELECT user_id, s, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
)
SELECT user_id, CAST(g AS BIGINT) AS span_id,
       CAST(min(s) AS BIGINT) AS span_start_us,
       CAST(max(e) AS BIGINT) AS span_end_us,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM grp
GROUP BY user_id, g
""",
    doc=(
        "Interval coalescing (gaps-and-islands over SPANS): each "
        "view/click opens a 2-hour attention window; overlapping or "
        "touching windows per user merge into maximal spans — the "
        "coverage/uptime/exposure primitive (ad exposure stitching, "
        "SLA uptime, on-call coverage) that point-gap sessionization "
        "cannot express (an interval can bridge rows whose STARTS are "
        "far apart). The classic two-window form: a span BREAKS only "
        "where the running max of all PRIOR ends stays below the next "
        "start (ROWS ... 1 PRECEDING), then the break flags integrate "
        "into span ids — both windows ride ONE user-keyed "
        "partitioning, exact epoch-microsecond integers, no "
        "self-join, no pairwise overlap test."
    ),
    tags=("timeseries", "window"),
)
def interval_coalesce_user_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(7_200_000_000)).alias("e"),
        "event_id",
    )
    w_prior = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(F.max("e").over(w_prior) >= F.col("s"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    # Running-sum order MUST match the break-flag window's order
    # exactly: e = s + const gives (s, e) no tiebreak, and a
    # duplicate (user_id, ts) pair whose (is_new=1, is_new=0) rows
    # integrate in the wrong order merges a row into a
    # non-overlapping earlier span. (s, event_id) is total.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grp = flagged.select(
        "user_id", "s", "e", F.sum("is_new").over(w_run).alias("g")
    )
    return grp.groupBy("user_id", F.col("g").cast("bigint").alias("span_id")).agg(
        F.min("s").cast("bigint").alias("span_start_us"),
        F.max("e").cast("bigint").alias("span_end_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
    )


# ---------------------------------------------------------------------------
# Variable-length CEP: decline-run + recovery (round-11 widening)
# ---------------------------------------------------------------------------


@register(
    "pattern_decline_recovery_runs",
    oracle="""
WITH pts AS (
  SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS v, ts, event_id
  FROM events
),
steps AS (
  SELECT user_id, ts, event_id,
         v - lag(v) OVER w AS dv
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
dirs AS (
  SELECT user_id, ts, event_id, dv,
         CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END AS d
  FROM steps WHERE dv IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN d = lag(d) OVER w THEN 0 ELSE 1 END AS is_new
  FROM dirs WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, ts, event_id, dv, d,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
runagg AS (
  SELECT user_id, run_id, MIN(d) AS d,
         CAST(count(*) AS BIGINT) AS len,
         CAST(-SUM(dv) AS BIGINT) AS drop_c
  FROM runs GROUP BY user_id, run_id
),
seq AS (
  SELECT user_id, d, len, drop_c,
         lead(d) OVER (PARTITION BY user_id ORDER BY run_id) AS next_d
  FROM runagg
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(MAX(len) AS BIGINT) AS longest_decline_steps,
       CAST(MAX(drop_c) AS BIGINT) AS max_drop_c
FROM seq
WHERE d = -1 AND len >= 3 AND next_d = 1
GROUP BY user_id
""",
    doc=(
        "VARIABLE-LENGTH sequence pattern (CEP beyond fixed LAGs — "
        "the MATCH_RECOGNIZE class 'A B+ C' the r10 verdict asked "
        "for): per user, a strictly-decreasing run of >= 3 "
        "consecutive steps followed immediately by a recovery step — "
        "the drawdown-then-rebound event shape pattern_vshape's "
        "3-point LAG window cannot express because the decline arm "
        "has unbounded length. Compiled to the repo's run machinery "
        "(interval_coalesce/streaks): per-step direction sign -> "
        "gaps-and-islands run ids (break-flag + running sum, the SAME "
        "(ts, event_id) total order in both windows — the r11 "
        "interval_coalesce tiebreak lesson applied from birth) -> "
        "per-run (direction, length, integer-cent drop) -> one LEAD "
        "over the run sequence to test the recovery. Every value is "
        "an exact BIGINT. Plan: ONE user-keyed shuffle; the step "
        "windows, run rollup, and run-sequence LEAD all ride the "
        "same user partitioning; no self-join, no state machine UDF."
    ),
    tags=("timeseries", "window", "cep"),
)
def pattern_decline_recovery_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100, 0).cast("bigint")
    steps = ev.select(
        "user_id", "ts", "event_id", (v - F.lag(v, 1).over(w)).alias("dv")
    ).filter(F.col("dv").isNotNull())
    d = (
        F.when(F.col("dv") > 0, F.lit(1))
        .when(F.col("dv") < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )
    dirs = steps.select("user_id", "ts", "event_id", "dv", d.alias("d"))
    flagged = dirs.select(
        "user_id",
        "ts",
        "event_id",
        "dv",
        "d",
        F.when(F.col("d") == F.lag("d", 1).over(w), F.lit(0))
        .otherwise(F.lit(1))
        .alias("is_new"),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    runs = flagged.select(
        "user_id", "dv", "d", F.sum("is_new").over(w_run).alias("run_id")
    )
    runagg = runs.groupBy("user_id", "run_id").agg(
        F.min("d").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
        (-F.sum("dv")).cast("bigint").alias("drop_c"),
    )
    w_seq = Window.partitionBy("user_id").orderBy("run_id")
    seq = runagg.select(
        "user_id",
        "d",
        "len",
        "drop_c",
        F.lead("d", 1).over(w_seq).alias("next_d"),
    )
    return (
        seq.filter(
            (F.col("d") == -1) & (F.col("len") >= 3) & (F.col("next_d") == 1)
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.max("len").cast("bigint").alias("longest_decline_steps"),
            F.max("drop_c").cast("bigint").alias("max_drop_c"),
        )
    )
