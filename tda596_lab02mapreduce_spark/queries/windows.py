"""Window-function band of SURVEY.md §2B: ranking, analytic
(lag/lead), aggregate frames (rows + range), distribution functions.

The reference's closest capability is per-key sorted iteration inside
reducef (mr/worker.go:139-148) with no frame semantics. Windows here
shuffle once on the partition key; ordering inside the partition is a
local sort. Determinism: every ORDER BY carries a unique tiebreak
column, and running double sums use the decimal-sum pattern
(queries/relational.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


@register(
    "window_rank",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS BIGINT) AS rn,
       CAST(rank()       OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS BIGINT) AS drnk
FROM lineitem
WHERE l_orderkey <= 1000
""",
    doc="row_number (unique tiebreak) vs rank/dense_rank (tie-stable) per order.",
    tags=("window", "rank"),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w_unique = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_quantity").desc(), F.col("l_linenumber")
    )
    w_ties = Window.partitionBy("l_orderkey").orderBy(F.col("l_quantity").desc())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.row_number().over(w_unique).cast("long").alias("rn"),
        F.rank().over(w_ties).cast("long").alias("rnk"),
        F.dense_rank().over(w_ties).cast("long").alias("drnk"),
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT event_id, user_id, value,
       lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
       CAST(lag(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS prev2_event
FROM events
""",
    doc="lag/lead with offsets over per-user event time.",
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("event_id", 2).over(w).alias("prev2_event"),
    )


@register(
    "window_running_sum",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
       CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nth_order
FROM orders
""",
    doc="Cumulative ROWS frame per customer (decimal accumulation → bit-stable).",
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("nth_order"),
    )


@register(
    "window_sliding_frame",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
            OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS qty_3line
FROM lineitem
WHERE l_orderkey <= 1000
""",
    doc="Bounded sliding ROWS frame (1 preceding .. 1 following).",
    tags=("window", "frame"),
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 1000)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(-1, 1)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("qty_3line"),
    )


@register(
    "window_distribution",
    oracle="""
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
       percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank,
       cume_dist()    OVER (ORDER BY c_acctbal, c_custkey) AS cum_dist
FROM customer
""",
    doc=(
        "Distribution funcs over a global ordering — computed from ONE "
        "distributed exact rank (functions.rank.global_rank_cumsum: "
        "range-partitioned local ranks + broadcast offsets) instead of "
        "a single-partition window. The ORDER BY carries the c_custkey "
        "unique tiebreak, so ranks have no ties and percent_rank = "
        "(r-1)/(n-1), cume_dist = r/n, ntile(4) = the exact bucket "
        "formula — all row-local arithmetic over (rank, broadcast n), "
        "IEEE-identical to the engines' built-ins on a tie-free order."
    ),
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import (
        global_rank_cumsum,
        ntile_from_rank,
    )

    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = global_rank_cumsum(
        cust, ["c_acctbal", "c_custkey"], rank_col="__r"
    )
    tot = ranked.agg(F.max("__r").alias("__n"))
    r, n = F.col("__r"), F.col("__n")
    return ranked.crossJoin(F.broadcast(tot)).select(
        "c_custkey",
        ntile_from_rank(r, n, 4).cast("long").alias("quartile"),
        ((r - 1).cast("double") / (n - 1).cast("double")).alias("pct_rank"),
        (r.cast("double") / n.cast("double")).alias("cum_dist"),
    )


@register(
    "window_first_last",
    oracle="""
SELECT DISTINCT o_custkey,
       first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
       last_value(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
FROM orders
""",
    doc="first_value/last_value with explicit full-partition frame (the classic last_value footgun made explicit).",
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = io.load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
        )
        .distinct()
    )


@register(
    "window_time_range_1h",
    oracle="""
WITH c AS (
  SELECT event_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, event_type,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(cents) OVER w AS BIGINT) AS sum_cents_1h
FROM c
WINDOW w AS (PARTITION BY event_type ORDER BY us
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    doc=(
        "Event-TIME range frame (trailing 1 hour per event type) — the "
        "frame the rows-based sliding window cannot express when event "
        "spacing is irregular. Values fold as exact int64 cents, so "
        "the result is bit-stable at any parallelism. Round 8 "
        "re-planned the physical form: a window partitioned only by "
        "event_type (5 distinct values) caps parallelism at 5 tasks "
        "forever — the keyed cousin of the partition-less-window trap, "
        "visible as the worst 20× scale ratio in BASELINE.md. Now: "
        "trailing agg = inclusive-prefix(t) − prefix(us ≤ t−W−1µs), "
        "both prefixes computed under (event_type, W-wide time CHUNK) "
        "keys — each event also emits a zero-weight PROBE row at its "
        "threshold position, local prefixes use a RANGE frame (peer-"
        "inclusive, matching the original tie semantics), chunk-grain "
        "carry-ins broadcast back, and one event_id regroup pairs "
        "each event with its probe. Parallelism now scales with "
        "types × hours, and every step is integer arithmetic — the "
        "oracle is unchanged and still hash-matches."
    ),
    tags=("window", "timeseries"),
)
def window_time_range_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    W = 3_600_000_000  # frame width == chunk width, epoch micros
    ev = io.load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    data = ev.select(
        "event_type",
        F.col("us").alias("pos"),
        F.lit(0).alias("kind"),
        "event_id",
        "cents",
    )
    # probe at t-W-1: prefix there = events with us < t-W, i.e. the
    # part the trailing [t-W, t] frame must NOT count
    probes = ev.select(
        "event_type",
        (F.col("us") - W - 1).alias("pos"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(0).cast("bigint").alias("cents"),
    )
    m = data.unionByName(probes).withColumn("chunk", F.floor(F.col("pos") / W))
    # local prefix within (type, chunk): RANGE frame so equal-position
    # peers share one prefix (the original window's tie semantics);
    # probes weigh zero, so their interleaving is harmless
    wloc = (
        Window.partitionBy("event_type", "chunk")
        .orderBy("pos")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    is_data = F.col("kind") == 0
    loc = m.select(
        "event_type",
        "chunk",
        "kind",
        "event_id",
        F.sum(F.when(is_data, 1).otherwise(0)).over(wloc).alias("lcnt"),
        F.sum(F.when(is_data, F.col("cents")).otherwise(0))
        .over(wloc)
        .alias("lcents"),
    )
    # chunk-grain carry-ins: EXCLUSIVE prefix of per-chunk totals per
    # type (every chunk present in m gets a row — probe-only chunks
    # carry zero totals, so the exclusive prefix is always defined)
    tot = m.groupBy("event_type", "chunk").agg(
        F.sum(F.when(is_data, 1).otherwise(0)).alias("ccnt"),
        F.sum(F.when(is_data, F.col("cents")).otherwise(0)).alias("ccents"),
    )
    wch = (
        Window.partitionBy("event_type")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = tot.select(
        "event_type",
        "chunk",
        F.coalesce(F.sum("ccnt").over(wch), F.lit(0)).alias("pcnt"),
        F.coalesce(F.sum("ccents").over(wch), F.lit(0)).alias("pcents"),
    )
    g = loc.join(F.broadcast(pre), ["event_type", "chunk"]).select(
        "event_id",
        "kind",
        "event_type",
        (F.col("pcnt") + F.col("lcnt")).alias("cum_cnt"),
        (F.col("pcents") + F.col("lcents")).alias("cum_cents"),
    )
    # one regroup pairs each event with its probe: trailing = cum(t) −
    # cum(threshold)
    k0, k1 = F.col("kind") == 0, F.col("kind") == 1
    return g.groupBy("event_id").agg(
        F.max(F.when(k0, F.col("event_type"))).alias("event_type"),
        (
            F.max(F.when(k0, F.col("cum_cnt")))
            - F.max(F.when(k1, F.col("cum_cnt")))
        ).alias("n_1h"),
        (
            F.max(F.when(k0, F.col("cum_cents")))
            - F.max(F.when(k1, F.col("cum_cents")))
        ).alias("sum_cents_1h"),
    )


@register(
    "topk_per_segment",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
WHERE rn <= 3
""",
    doc=(
        "Per-GROUP top-k (top-3 customers by balance per market "
        "segment) — the grouped twin of the global topk_orders. "
        "row_number + rn<=3 triggers Spark's WindowGroupLimit "
        "(pinned): each partition keeps at most k rows per group "
        "BEFORE and after the shuffle, so the exchange carries "
        "O(groups × k) rows, not the table. Unique custkey tiebreak "
        "makes the cut deterministic on both engines."
    ),
    tags=("window", "topk"),
)
def topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        io.load(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "window_nth_ignore_nulls",
    oracle="""
WITH base AS (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS settled_price
  FROM orders
)
SELECT o_custkey, o_orderkey,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       first_value(settled_price IGNORE NULLS) OVER w AS first_settled,
       lead(settled_price, 1) OVER w AS next_any,
       lead(settled_price, 1 IGNORE NULLS) OVER w AS next_settled
FROM base
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc=(
        "The null-aware window surface: nth_value over the full frame, "
        "first_value IGNORE NULLS, and lead with and without IGNORE "
        "NULLS side by side (open orders carry a NULL settled price, so "
        "the two leads genuinely differ). Ordering is (o_orderdate, "
        "o_orderkey) — the unique tiebreak that makes every windowed "
        "value engine-deterministic, same discipline as the other "
        "window queries. One o_custkey exchange serves the whole frame. "
        "Dialect note: PySpark's F.lead has no ignoreNulls parameter "
        "and the two engines place IGNORE NULLS differently (Spark "
        "after the call, DuckDB inside the argument list), so the "
        "Spark side is spark.sql text rather than the Column API."
    ),
    tags=("window",),
)
def window_nth_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("orders",))
    return spark.sql("""
WITH base AS (
  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
         CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS settled_price
  FROM orders
)
SELECT o_custkey, o_orderkey,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       first_value(settled_price) IGNORE NULLS OVER w AS first_settled,
       lead(settled_price, 1) OVER wl AS next_any,
       lead(settled_price, 1) IGNORE NULLS OVER wl AS next_settled
FROM base
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
       wl AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""")
