"""Advanced relational band (SURVEY.md §2B widening): statistical
aggregates, arg-extremes, ordered string aggregation, exact
percentiles, HAVING, subqueries (EXISTS / NOT IN / scalar), and the
TPC-H-shaped multi-join queries that exercise Catalyst join ordering
+ AQE at scale.

Subqueries matter for the scale story: Catalyst rewrites EXISTS/IN
into left-semi/anti hash joins (never per-row probes), and the scalar
subquery becomes a one-row broadcast — all visible in .explain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register


@register(
    "agg_stats_moments",
    oracle="""
SELECT l_returnflag,
       CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
       CAST(round(stddev_samp(l_quantity), 4) AS DOUBLE) AS sd_qty,
       CAST(round(var_samp(l_quantity), 4) AS DOUBLE) AS var_qty,
       CAST(round(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price,
       CAST(round(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc=(
        "Second-moment statistics (stddev/variance/corr/covar) — all "
        "algebraic, partial+final HashAggregate, O(groups) shuffle. Rounded "
        "on both sides: accumulation order is engine-defined for doubles."
    ),
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
    )


@register(
    "agg_arg_extremes",
    oracle="""
SELECT o_orderstatus,
       arg_min(o_orderpriority, o_orderkey) AS first_priority,
       arg_max(o_custkey, o_orderkey) AS last_custkey,
       CAST(min(o_orderkey) AS BIGINT) AS min_okey,
       CAST(max(o_orderkey) AS BIGINT) AS max_okey
FROM orders
GROUP BY o_orderstatus
""",
    doc=(
        "min_by/max_by (argmin/argmax) — single-pass, no self-join-back or "
        "window needed to fetch the extremal row's payload. Ordering column "
        "is the unique o_orderkey so ties cannot make the result "
        "engine-dependent."
    ),
    tags=("agg",),
)
def agg_arg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
            F.max_by("o_custkey", "o_orderkey").alias("last_custkey"),
            F.min("o_orderkey").alias("min_okey"),
            F.max("o_orderkey").alias("max_okey"),
        )
    )


@register(
    "agg_string_concat",
    oracle="""
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation
GROUP BY n_regionkey
""",
    doc=(
        "Ordered string aggregation (listagg/string_agg): collect_list + "
        "array_sort + array_join — sort is per-group, deterministic on both "
        "engines."
    ),
    tags=("agg", "string"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
    )


@register(
    "percentile_quantiles",
    oracle="""
SELECT l_returnflag,
       CAST(round(median(l_quantity), 4) AS DOUBLE) AS median_qty,
       CAST(round(quantile_cont(l_extendedprice, 0.25), 4) AS DOUBLE) AS p25_price,
       CAST(round(quantile_cont(l_extendedprice, 0.75), 4) AS DOUBLE) AS p75_price,
       CAST(round(quantile_cont(l_extendedprice, 0.95), 4) AS DOUBLE) AS p95_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc=(
        "Exact interpolated percentiles (SQL PERCENTILE_CONT semantics on "
        "both engines). At 100 TB the exact sort-based form gives way to "
        "approx_percentile (KLL/GK sketch) — same API shape, bounded error; "
        "the exact form here is the correctness anchor."
    ),
    tags=("agg", "stats"),
)
def percentile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("p75_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
    )


@register(
    "having_hot_parts",
    oracle="""
SELECT l_partkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_partkey
HAVING count(*) >= 40
""",
    doc="GROUP BY + HAVING: the post-aggregation filter stays above the partial/final agg, never blocks map-side combine.",
    tags=("agg", "filter"),
)
def having_hot_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        io.load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .filter(F.col("n_lines") >= 40)
    )


@register(
    "subquery_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
)
""",
    doc=(
        "Correlated EXISTS — Catalyst rewrites to a left-semi hash join "
        "(one shuffle, no per-row probing). SQL surface over registered "
        "fixture views."
    ),
    tags=("subquery", "sql"),
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
        )
        """
    )


@register(
    "subquery_not_in",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
""",
    doc=(
        "NOT IN (uncorrelated, null-free key) — planned as a left-anti "
        "join. The inner filter prunes before the shuffle."
    ),
    tags=("subquery", "sql"),
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        )
        """
    )


@register(
    "subquery_scalar_avg",
    oracle="""
SELECT p_partkey, p_brand,
       CAST(p_retailprice AS DOUBLE) AS p_retailprice
FROM part
WHERE p_retailprice > 1.05 * (
  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
  FROM part)
""",
    doc=(
        "Scalar subquery: the aggregate runs once and is broadcast into "
        "the filter — a two-job plan, not a join. The threshold goes "
        "through an exact decimal sum so Spark and DuckDB compute the "
        "bit-identical double (summation order cannot drift a row "
        "across the predicate boundary); 1.05x picks a non-empty slice "
        "of the tightly-clustered fixture prices with ~0.05 margin to "
        "the nearest row."
    ),
    tags=("subquery", "sql"),
)
def subquery_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part
        WHERE p_retailprice > 1.05 * (
          SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          FROM part)
        """
    )


@register(
    "multi_join_topk",
    oracle="""
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    doc=(
        "TPC-H Q3 shape: selective dim filter → fact⋈fact join → agg → "
        "top-k. Catalyst pushes both date filters to the scans, AQE turns "
        "the post-filter customer side into a broadcast, and the top-k is "
        "TakeOrderedAndProject (no global sort). Deterministic tiebreak on "
        "o_orderkey."
    ),
    tags=("join", "topk"),
)
def multi_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = io.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = io.widen_if_few_splits(
        io.load(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
        ),
        "l_orderkey",  # the join key: the widening IS the join's exchange
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "regional_revenue",
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
""",
    doc=(
        "TPC-H Q5 shape: 6-way join with a local-supplier predicate "
        "(c_nationkey = s_nationkey). region/nation broadcast; the two "
        "fact joins shuffle on their keys; join *order* is Catalyst's "
        "choice — the declared plan has no imposed ordering."
    ),
    tags=("join",),
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer")
    orders = io.load(spark, sf_dir, "orders")
    li = io.load(spark, sf_dir, "lineitem")
    supp = io.load(spark, sf_dir, "supplier")
    nation = io.load(spark, sf_dir, "nation")
    region = io.load(spark, sf_dir, "region")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "upsert_customer_batch",
    oracle="""
WITH upd AS (
  SELECT c_custkey, 'upd-' || c_name AS c_name, c_nationkey,
         c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'new-' || CAST(c_custkey AS VARCHAR),
         c_nationkey, 0.0, c_mktsegment
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name ELSE b.c_name END AS c_name,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_nationkey ELSE b.c_nationkey END AS c_nationkey,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE b.c_acctbal END AS c_acctbal,
       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment
FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
""",
    doc=(
        "MERGE-style keyed upsert (operators/upsert.py): a "
        "deterministic delta batch (every 10th customer updated "
        "row-wholesale, every 97th inserted under a shifted key) "
        "applied to the base table via full-outer join + matched-wins "
        "projection — the record-level mutation primitive vanilla "
        "Spark lacks without a table format. One keyed shuffle per "
        "side; delta broadcastable when small."
    ),
    tags=("merge",),
)
def upsert_customer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.operators.upsert import upsert

    cust = io.load(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.lit("upd-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        cust.filter(F.col("c_custkey") % 97 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("c_custkey").cast("string")).alias("c_name"),
            "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            "c_mktsegment",
        )
    )
    return upsert(cust, updates, "c_custkey")


@register(
    "stats_approx_quantiles",
    oracle=None,  # GK sketch is engine-specific; accuracy bound pytest-asserted
    doc=(
        "approx_percentile (Greenwald-Khanna sketch, accuracy 10000 ⇒ "
        "rank error ≤ 1/10000) — the 100 TB form of percentile_quantiles: "
        "mergeable partial sketches instead of a per-group sort, so the "
        "agg stays partial+final with bounded state. Rows-only by "
        "contract; tests/test_aggregates.py asserts every sketch "
        "quantile lands within the documented rank-error window of the "
        "exact percentile on the same data, and stats_exact_quantiles "
        "is the hash-checked exact twin of this query."
    ),
    tags=("agg", "stats", "sketch"),
)
def stats_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.25), F.lit(10000)).alias("p25_price"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50_price"),
        F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias("p95_price"),
    )


@register(
    "stats_exact_quantiles",
    # Exact interpolated quantiles match bitwise: both engines use the
    # R-7 definition (idx = (n-1)p, result = a + (b-a)*frac) over the
    # same doubles, so the interpolation arithmetic is IEEE-identical.
    oracle="""
SELECT l_returnflag,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25_price,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS p50_price,
       quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS p95_price
FROM lineitem GROUP BY l_returnflag
""",
    doc=(
        "Exact per-group quantiles — the hash-checked twin of "
        "stats_approx_quantiles. NOT built on the percentile aggregate "
        "(its state buffers every distinct value per partition — a "
        "100 TB memory hazard and 3.2 s at sf0.1): instead a value "
        "histogram (partial+final count on (group, value)) + the "
        "grouped distributed cumsum (functions.rank, price-stripe "
        "buckets — the 3-value returnflag key would otherwise cap the "
        "cumulative pass at 3 tasks over millions of distinct prices) "
        "picks the R-7 floor/ceil order statistics and interpolates "
        "v_lo·(1−frac) + v_hi·frac with the same IEEE arithmetic "
        "DuckDB's quantile_cont uses — bitwise equal. At 100 TB the "
        "GK sketch remains the one to run; this exact form is the "
        "correctness anchor its error bound is asserted against."
    ),
    tags=("agg", "stats"),
)
def stats_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tda596_lab02mapreduce_spark.functions.rank import grouped_rank_cumsum

    li = io.load(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    # cumulative counts via the grouped distributed cumsum: the
    # l_returnflag-keyed window capped parallelism at 3 tasks over the
    # distinct-value table (millions of prices at 100 TB); 4096-unit
    # price stripes are a deterministic monotone bucket
    ntot = counts.groupBy("l_returnflag").agg(F.sum("c").alias("n"))
    r = grouped_rank_cumsum(
        counts,
        ["l_returnflag"],
        ["v"],
        [("cum", "c")],
        rank_col="__q_rn",
        bucket_expr=F.floor(F.col("v") / F.lit(4096.0)),
    ).join(F.broadcast(ntot), "l_returnflag")

    def quantile(p: float, out: str) -> list:
        idx = (F.col("n") - 1) * F.lit(p)  # 0-based R-7 position
        lo, hi = F.floor(idx), F.ceil(idx)
        # v at 1-based rank k = smallest v whose cumulative count ≥ k;
        # frac is group-constant (n is), so max() just carries it out.
        return [
            F.min(F.when(F.col("cum") >= lo + 1, F.col("v"))).alias(f"__lo_{out}"),
            F.min(F.when(F.col("cum") >= hi + 1, F.col("v"))).alias(f"__hi_{out}"),
            F.max(idx - lo).alias(f"__f_{out}"),
        ]

    aggs = []
    for p, out in ((0.25, "p25_price"), (0.5, "p50_price"), (0.95, "p95_price")):
        aggs += quantile(p, out)
    g = r.groupBy("l_returnflag").agg(*aggs)
    # symmetric lerp v_lo·(1−f) + v_hi·f — the formula BOTH engines'
    # built-ins use; a+(b−a)·f differs by an ulp on this data.
    return g.select(
        "l_returnflag",
        *[
            (
                F.col(f"__lo_{out}") * (F.lit(1.0) - F.col(f"__f_{out}"))
                + F.col(f"__hi_{out}") * F.col(f"__f_{out}")
            ).alias(out)
            for out in ("p25_price", "p50_price", "p95_price")
        ],
    )


@register(
    "anomaly_zscore_events",
    oracle="""
WITH c AS (
  SELECT event_id, event_type, value,
         CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS HUGEINT) AS cents
  FROM events
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         sum(cents) AS s1,
         sum(cents * cents) AS s2
  FROM c GROUP BY event_type
)
SELECT event_id, c.event_type, value
FROM c JOIN stats ON c.event_type = stats.event_type
WHERE (n * cents - s1) * (n * cents - s1) > 9 * (n * s2 - s1 * s1)
""",
    doc=(
        "Z-score anomaly detection (|z| > 3 per event_type) computed "
        "ENTIRELY in exact integer arithmetic: values become exact "
        "cents and the condition (x-mean)^2 > 9*var is cleared of "
        "denominators to (n*c - s1)^2 > 9*(n*s2 - s1^2) — no float, "
        "no sqrt, no rounding boundary for engines to disagree on "
        "(the ADVICE r1 double-threshold lesson taken to its "
        "conclusion). The cleared products grow as (n·c)^2, so the "
        "arithmetic runs in 128-bit-class types — Spark DECIMAL(38,0), "
        "DuckDB HUGEINT — not int64, which a single group of ~2e5 "
        "fixture-scale rows already overflows (and Spark 4's default "
        "ANSI mode would turn that into a runtime error). Capacity "
        "envelope: exact while n·max_cents < ~1.7e18 per group, e.g. "
        "1e12 rows/group at values up to $10k — the 100 TB shape; "
        "beyond that, pre-aggregate or shard the group key. Plan: one "
        "partial+final stats aggregate (rows = #event types), "
        "broadcast back onto the scan — the stream never shuffles."
    ),
    tags=("agg", "join"),
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") * 100, 0).cast("decimal(18,0)").alias("cents"),
    )
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("cents").alias("s1"),  # decimal(28,0)
        F.sum(F.col("cents") * F.col("cents")).alias("s2"),  # decimal(38,0)
    )
    dev = F.col("n") * F.col("cents") - F.col("s1")  # decimal(38,0)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(dev * dev > 9 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")))
        .select("event_id", "event_type", "value")
    )


_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.total_bal
FROM region r, LATERAL (
  SELECT n.n_name,
         CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
  FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY total_bal DESC, n.n_name
  LIMIT 2
) t
"""


@register(
    "lateral_top2_per_region",
    oracle=_LATERAL_SQL,
    doc=(
        "Correlated LATERAL subquery: per region, the top-2 nations by "
        "total customer balance — the SAME SQL text runs on Spark "
        "(register_views + spark.sql) and DuckDB, proving the lateral "
        "join surface itself, not a hand-rewritten equivalent. "
        "Catalyst decorrelates the lateral into a join + per-group "
        "window/limit (no per-outer-row re-execution); balances use "
        "the decimal-sum pattern and the ORDER BY carries a name "
        "tiebreak so the LIMIT 2 cut is deterministic on both engines."
    ),
    tags=("join", "subquery"),
)
def lateral_top2_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("region", "nation", "customer"))
    return spark.sql(_LATERAL_SQL)


@register(
    "subquery_global_share",
    oracle="""
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
       (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 1.5
               / COUNT(DISTINCT l_partkey)
        FROM lineitem)
""",
    doc=(
        "TPC-H Q11 shape (adapted to the fixture schema): per-part "
        "value totals kept only when they exceed 1.5× THE AVERAGE "
        "per-part value (global sum × 1.5 / distinct part count) — a "
        "scalar subquery inside HAVING. Catalyst evaluates the global "
        "aggregate once and broadcasts the one-row result into the "
        "post-aggregation filter; at 100 TB that is one extra "
        "reduction, never a per-group rescan. Decimal sums both sides; "
        "the ×1.5 threshold arithmetic happens after the exact decimal "
        "sums are cast to double, identically in both engines."
    ),
    tags=("subquery", "agg"),
)
def subquery_global_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
SELECT l_partkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) >
       (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 1.5
               / COUNT(DISTINCT l_partkey)
        FROM lineitem)
""")


@register(
    "agg_count_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
""",
    doc=(
        "TPC-H Q13 shape: the distribution of per-customer order "
        "counts, INCLUDING zero-order customers — which forces a LEFT "
        "join with the filter in the JOIN CONDITION (moving it to "
        "WHERE would silently drop the zero bucket, the classic "
        "outer-join predicate-placement bug). Two aggregations: "
        "count per customer, then the histogram of those counts — "
        "second shuffle is on the tiny count domain."
    ),
    tags=("join", "agg"),
)
def agg_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer")
    orders = io.load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "subquery_in_agg",
    oracle="""
SELECT c.c_name, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
""",
    doc=(
        "TPC-H Q18 shape (large-volume orders): IN over an AGGREGATED "
        "subquery — membership is decided by a grouped HAVING, not a "
        "base-table predicate. Catalyst plans the subquery as its own "
        "aggregation and the IN as a left-semi join on o_orderkey; the "
        "outer three-way join then re-aggregates only surviving "
        "orders. Decimal quantity sums on both engines."
    ),
    tags=("subquery", "join", "agg"),
)
def subquery_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql("""
SELECT c.c_name, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
""")


@register(
    "join_disjunctive_pred",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_matches,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
""",
    doc=(
        "TPC-H Q19 shape: an OR of predicate conjunctions spanning "
        "BOTH join sides. The equi-join key (p_partkey) must still be "
        "extracted so the join stays hash-partitionable — the OR "
        "lands as a post-join filter with the single-side fragments "
        "(brand/size, quantity ranges) pushed beneath their scans by "
        "CNF conversion. The plan-shape trap this pins: a naive "
        "engine turns disjunctive join predicates into a cartesian."
    ),
    tags=("join",),
)
def join_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    part = io.load(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond1 | cond2)
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "data_quality_audit",
    oracle="""
SELECT 'lineitem_orphan_order' AS rule,
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_violations
UNION ALL
SELECT 'orders_no_lineitems',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                               WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT)
UNION ALL
SELECT 'lineitem_dup_linenumber',
       CAST((SELECT count(*) FROM (SELECT l_orderkey, l_linenumber
                                   FROM lineitem GROUP BY 1, 2
                                   HAVING count(*) > 1)) AS BIGINT)
UNION ALL
SELECT 'lineitem_ship_before_order',
       CAST((SELECT count(*) FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey
             WHERE l.l_shipdate < o.o_orderdate) AS BIGINT)
UNION ALL
SELECT 'lineitem_range_violations',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_discount < 0 OR l_discount > 0.1
                OR l_quantity < 1 OR l_quantity > 50
                OR l_extendedprice <= 0) AS BIGINT)
UNION ALL
SELECT 'lineitem_null_keys',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_orderkey IS NULL OR l_partkey IS NULL
                OR l_suppkey IS NULL) AS BIGINT)
UNION ALL
SELECT 'documents_nchars_mismatch',
       CAST((SELECT count(*) FROM documents
             WHERE n_chars <> length(text)) AS BIGINT)
UNION ALL
SELECT 'events_null_or_nonpositive',
       CAST((SELECT count(*) FROM events
             WHERE ts IS NULL OR user_id IS NULL OR value <= 0) AS BIGINT)
""",
    doc=(
        "Declarative data-quality audit (the dbt-test / Deequ shape): "
        "one report row per rule with its violation count — referential "
        "integrity both directions (anti-join counts), key uniqueness "
        "(grouped HAVING), cross-table temporal consistency (ship date "
        "before order date), and per-table range/null rules FUSED into "
        "one conditional-aggregate scan per table (lineitem's three "
        "scalar rules cost one pass, not three). On this fixture three "
        "rules fire (orphan orders, duplicate line numbers, "
        "ship-before-order — the synthetic generator doesn't correlate "
        "those) and five report zero, so both the detection and the "
        "clean path are oracle-checked. At 100 TB each rule is one "
        "keyed anti/semi join or one scan aggregate — no rule is "
        "row-exploding, and the report itself is O(rules)."
    ),
    tags=("quality", "agg", "join"),
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    orders = io.load(spark, sf_dir, "orders")
    docs = io.load(spark, sf_dir, "documents")
    ev = io.load(spark, sf_dir, "events")

    def report(rule: str, cnt_df: DataFrame) -> DataFrame:
        return cnt_df.select(
            F.lit(rule).alias("rule"), F.col("n").cast("bigint").alias("n_violations")
        )

    orphan_li = report(
        "lineitem_orphan_order",
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    childless_o = report(
        "orders_no_lineitems",
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left_anti").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    dup_line = report(
        "lineitem_dup_linenumber",
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("n")),
    )
    ship_before = report(
        "lineitem_ship_before_order",
        li.select("l_orderkey", "l_shipdate")
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("n")),
    )
    # three scalar rules on lineitem fused into ONE scan
    li_scalar = li.agg(
        F.sum(
            (
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
                | (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
                | (F.col("l_extendedprice") <= 0)
            ).cast("long")
        ).alias("range_n"),
        F.sum(
            (
                F.col("l_orderkey").isNull()
                | F.col("l_partkey").isNull()
                | F.col("l_suppkey").isNull()
            ).cast("long")
        ).alias("null_n"),
    )
    li_range = report("lineitem_range_violations", li_scalar.select(F.col("range_n").alias("n")))
    li_nulls = report("lineitem_null_keys", li_scalar.select(F.col("null_n").alias("n")))
    doc_len = report(
        "documents_nchars_mismatch",
        docs.agg(F.sum((F.col("n_chars") != F.length("text")).cast("long")).alias("n")),
    )
    ev_bad = report(
        "events_null_or_nonpositive",
        ev.agg(
            F.sum(
                (
                    F.col("ts").isNull() | F.col("user_id").isNull()
                    | (F.col("value") <= 0)
                ).cast("long")
            ).alias("n")
        ),
    )
    out = orphan_li
    for part_df in (childless_o, dup_line, ship_before, li_range, li_nulls, doc_len, ev_bad):
        out = out.unionByName(part_df)
    return out


@register(
    "subquery_top_revenue_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                  AS HUGEINT)) AS rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.rev_c AS BIGINT) AS total_revenue_c
FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
WHERE r.rev_c = (SELECT max(rev_c) FROM rev)
""",
    doc=(
        "TPC-H Q15 shape (top supplier view): per-supplier discounted "
        "revenue over a shipdate year, then the supplier(s) whose "
        "revenue EQUALS the maximum — the scalar-subquery-against-an-"
        "aggregate-of-itself pattern, tie-safe by construction (Q15's "
        "own spec). Revenue is per-row ROUND(price·(1−disc)·100) "
        "summed in exact HUGEINT/decimal — the per-row double product "
        "is identically shaped in both engines, and the cross-row "
        "reduction is integer, so no fold-order drift. Catalyst "
        "evaluates the rev CTE once (stage reuse) for both the rows "
        "and the max."
    ),
    tags=("subquery", "agg", "sql"),
)
def subquery_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey AS suppkey,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0)
                          AS DECIMAL(38,0))) AS rev_c
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate < TIMESTAMP '1996-01-01'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, CAST(r.rev_c AS BIGINT) AS total_revenue_c
        FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
        WHERE r.rev_c = (SELECT max(rev_c) FROM rev)
        """
    )


@register(
    "subquery_q22_cntrycode",
    oracle="""
WITH pos AS (
  SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS HUGEINT)) AS HUGEINT)
           AS sum_pos,
         CAST(count(*) AS HUGEINT) AS n_pos
  FROM customer WHERE c_acctbal > 0.0
)
SELECT CAST(c.c_nationkey % 5 AS INT) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS HUGEINT)) AS BIGINT)
         AS totacctbal_c
FROM customer c, pos
WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS HUGEINT) * pos.n_pos > pos.sum_pos
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY 1
""",
    doc=(
        "TPC-H Q22 shape (global sales opportunity): customers with "
        "above-average positive balance and no RECENT (1998+) order — "
        "the original's 7-year dormancy window scaled to the fixture's "
        "date range (the no-orders-ever form is vacuously empty: every "
        "fixture customer orders) — rolled up by "
        "'country code' (nationkey mod 5 — the fixture has no phone "
        "column). The two classic sub-patterns compose: an "
        "uncorrelated scalar aggregate feeding a filter (kept exact by "
        "comparing cents·n_pos > sum_pos — the average never "
        "materializes as a float) and a correlated NOT EXISTS planned "
        "as a left-anti join against orders. Balances in integer "
        "cents throughout."
    ),
    tags=("subquery", "agg", "sql"),
)
def subquery_q22_cntrycode(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        WITH pos AS (
          SELECT SUM(CAST(ROUND(c_acctbal * 100, 0) AS DECIMAL(38,0))) AS sum_pos,
                 CAST(count(*) AS DECIMAL(38,0)) AS n_pos
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT CAST(c.c_nationkey % 5 AS INT) AS cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS DECIMAL(38,0))) AS BIGINT)
                 AS totacctbal_c
        FROM customer c, pos
        WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS DECIMAL(38,0)) * pos.n_pos
                > pos.sum_pos
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1998-01-01')
        GROUP BY 1
        """
    )


@register(
    "skyline_price_quantity",
    oracle="""
WITH pts AS (
  SELECT l_returnflag AS flag, l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p_c,
         CAST(ROUND(l_quantity, 0) AS BIGINT) AS q
  FROM lineitem
),
aug AS (
  SELECT *,
         max(q) OVER (PARTITION BY flag ORDER BY p_c
                      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS qmax_lt,
         max(q) OVER (PARTITION BY flag, p_c) AS qmax_eq
  FROM pts
)
SELECT flag, l_orderkey, l_linenumber, p_c, q
FROM aug
WHERE (qmax_lt IS NULL OR qmax_lt < q) AND qmax_eq = q
""",
    doc=(
        "2-D skyline / Pareto frontier per return flag: line items not "
        "dominated on (minimize price, maximize quantity) — the "
        "multi-objective selection primitive (price-performance "
        "frontiers, data-valuation trade-off sets). Dominance "
        "resolves with TWO keyed windows instead of the naive "
        "quadratic self-join: a row is dominated iff some strictly "
        "cheaper row has >= quantity (running max over RANGE .. 1 "
        "PRECEDING on integer cents — range mode so price TIES are "
        "excluded from 'cheaper') or an equal-price row has strictly "
        "more (per-(flag, price) max). Both maxima are integer "
        "comparisons; both windows ride the flag partitioning. "
        "Equal (price, quantity) pairs are mutually non-dominating "
        "and all survive — the standard skyline convention."
    ),
    tags=("window", "analytics"),
)
def skyline_price_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = io.load(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("p_c"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("q"),
    )
    w_lt = (
        Window.partitionBy("flag")
        .orderBy("p_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("flag", "p_c")
    aug = pts.select(
        "*",
        F.max("q").over(w_lt).alias("qmax_lt"),
        F.max("q").over(w_eq).alias("qmax_eq"),
    )
    return aug.filter(
        (F.col("qmax_lt").isNull() | (F.col("qmax_lt") < F.col("q")))
        & (F.col("qmax_eq") == F.col("q"))
    ).select("flag", "l_orderkey", "l_linenumber", "p_c", "q")


@register(
    "subquery_q17_small_orders",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_quantity, 0) AS HUGEINT)) AS HUGEINT) AS sq,
         CAST(count(*) AS HUGEINT) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS HUGEINT)) AS DOUBLE)
         / 7.0 AS avg_yearly_c,
       CAST(count(*) AS BIGINT) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(ROUND(l.l_quantity, 0) AS HUGEINT) * 5 * pa.n < pa.sq
""",
    doc=(
        "TPC-H Q17 shape (small-quantity-order revenue): line items of "
        "one brand whose quantity is below 20% of that part's average "
        "quantity — the correlated scalar-aggregate subquery, decorrelated "
        "into a pre-aggregated per-part (sum, count) joined back. The "
        "0.2·avg comparison never materializes a float: qty·5·n < sum "
        "is exact integer cross-multiplication (quantities are "
        "integral). Revenue sums exact cents; the /7.0 'yearly average' "
        "is the single final double op. Catalyst evaluates the pa CTE "
        "once; the brand filter prunes the probe before both joins."
    ),
    tags=("subquery", "agg", "join", "sql"),
)
def subquery_q17_small_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(
        """
        WITH pa AS (
          SELECT l_partkey,
                 SUM(CAST(ROUND(l_quantity, 0) AS DECIMAL(38,0))) AS sq,
                 CAST(count(*) AS DECIMAL(38,0)) AS n
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 7.0 AS avg_yearly_c,
               CAST(count(*) AS BIGINT) AS n_small
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#1'
          AND CAST(ROUND(l.l_quantity, 0) AS DECIMAL(38,0)) * 5 * pa.n < pa.sq
        """
    )


def fk_check(name: str, left: DataFrame, lkey: str, right: DataFrame, rkey: str,
             broadcast_right: bool) -> DataFrame:
    """One FK direction: count left rows with no right-side match
    (keys-only left-anti join). Module-level so the dirty-data unit
    test drives the identical shape the clean-fixture oracle checks."""
    r = right.select(rkey)
    if broadcast_right:
        r = F.broadcast(r)
    return (
        left.select(lkey)
        .join(r, left[lkey] == r[rkey], "left_anti")
        .agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )


@register(
    "fk_integrity_audit",
    oracle="""
SELECT 'lineitem_orphans' AS check_name,
       CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders_without_lines',
       CAST(count(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
UNION ALL
SELECT 'orders_orphan_customer',
       CAST(count(*) AS BIGINT)
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'customer_orphan_nation',
       CAST(count(*) AS BIGINT)
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
UNION ALL
SELECT 'lineitem_orphan_part',
       CAST(count(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem_orphan_supplier',
       CAST(count(*) AS BIGINT)
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
""",
    doc=(
        "Referential-integrity audit across the star schema: orphan "
        "counts for every foreign key (lineitem→orders/part/supplier, "
        "orders→customer, customer→nation) plus childless orders — "
        "the pre-flight check every warehouse load runs. Each check "
        "is a LEFT ANTI join counted; dimension-side checks broadcast "
        "the dimension, the two fact-fact checks shuffle on the join "
        "key only (keys-only column pruning — no payload rides the "
        "audit). The complement row (orders_without_lines) uses the "
        "reversed anti join, not a full outer — six independent "
        "branches, each the minimal plan for its direction. All "
        "counts are 0 on the consistent fixtures; the query SHAPE is "
        "what scales — point it at a dirty load and the counts light "
        "up."
    ),
    tags=("join", "anti", "agg", "quality"),
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    orders = io.load(spark, sf_dir, "orders")
    cust = io.load(spark, sf_dir, "customer")
    nation = io.load(spark, sf_dir, "nation")
    part = io.load(spark, sf_dir, "part")
    sup = io.load(spark, sf_dir, "supplier")
    check = fk_check

    # broadcast_right=True only for the grain-BOUNDED nation side (25
    # rows at any SF); catalog-proportional sides (cust/part/sup) rely
    # on stats/AQE so the keys-only anti probe survives a 100 TB catalog
    return (
        check("lineitem_orphans", li, "l_orderkey", orders, "o_orderkey", False)
        .unionAll(check("orders_without_lines", orders, "o_orderkey", li, "l_orderkey", False))
        .unionAll(check("orders_orphan_customer", orders, "o_custkey", cust, "c_custkey", False))
        .unionAll(check("customer_orphan_nation", cust, "c_nationkey", nation, "n_nationkey", True))
        .unionAll(check("lineitem_orphan_part", li, "l_partkey", part, "p_partkey", False))
        .unionAll(check("lineitem_orphan_supplier", li, "l_suppkey", sup, "s_suppkey", False))
    )


@register(
    "allocate_order_totals",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ext_c
  FROM lineitem
),
o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_c
  FROM orders
),
w AS (
  SELECT l_orderkey, CAST(SUM(ext_c) AS BIGINT) AS w_sum,
         CAST(count(*) AS BIGINT) AS n
  FROM li GROUP BY l_orderkey
),
base AS (
  SELECT li.l_orderkey, li.l_linenumber, li.ext_c, o.total_c, w.w_sum,
         (o.total_c * li.ext_c) // w.w_sum AS base_c,
         o.total_c * li.ext_c - ((o.total_c * li.ext_c) // w.w_sum) * w.w_sum
           AS frac_num
  FROM li
  JOIN o ON o.o_orderkey = li.l_orderkey
  JOIN w ON w.l_orderkey = li.l_orderkey
),
rem AS (
  SELECT l_orderkey, CAST(max(total_c) - SUM(base_c) AS BIGINT) AS remainder
  FROM base GROUP BY l_orderkey
),
ranked AS (
  SELECT b.*, r.remainder,
         row_number() OVER (PARTITION BY b.l_orderkey
                            ORDER BY b.frac_num DESC, b.l_linenumber) AS rn
  FROM base b JOIN rem r USING (l_orderkey)
)
SELECT l_orderkey, l_linenumber, ext_c,
       CAST(base_c + CASE WHEN rn <= remainder THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_c
FROM ranked
""",
    doc=(
        "Largest-remainder proration (the financial allocation "
        "primitive): each order's header total is split across its "
        "line items proportionally to extended price, in integer "
        "cents, such that the allocations sum EXACTLY to the header "
        "total — floor division assigns the base cents, and the "
        "remainder cents go to the lines with the largest fractional "
        "parts (deterministic linenumber tiebreak). Naive "
        "round(total*w/W) per line drifts by ±n cents per order and "
        "reconciliation fails; largest-remainder is how billing/"
        "revenue-recognition systems do it (Hamilton apportionment). "
        "All integer arithmetic — floor div + cross-multiplied "
        "remainders — so the hash is bit-exact. Plan: one order-grain "
        "rollup, two keyed probe joins, and an order-keyed window "
        "for the remainder ranks (order grain grows with data — the "
        "scalable window kind)."
    ),
    tags=("analytics", "window", "join", "agg"),
)
def allocate_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = io.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("ext_c"),
    )
    o = io.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("total_c"),
    )
    w = li.groupBy(F.col("l_orderkey").alias("w_okey")).agg(
        F.sum("ext_c").cast("bigint").alias("w_sum")
    )
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(w, li.l_orderkey == F.col("w_okey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "ext_c",
            "total_c",
            "w_sum",
            F.expr("(total_c * ext_c) div w_sum").alias("base_c"),
            F.expr(
                "total_c * ext_c - ((total_c * ext_c) div w_sum) * w_sum"
            ).alias("frac_num"),
        )
    )
    rem = base.groupBy(F.col("l_orderkey").alias("r_okey")).agg(
        (F.max("total_c") - F.sum("base_c")).cast("bigint").alias("remainder")
    )
    wnd = Window.partitionBy("l_orderkey").orderBy(
        F.col("frac_num").desc(), F.col("l_linenumber")
    )
    return (
        base.join(rem, base.l_orderkey == F.col("r_okey"))
        .withColumn("rn", F.row_number().over(wnd))
        .select(
            "l_orderkey",
            "l_linenumber",
            "ext_c",
            (
                F.col("base_c")
                + F.when(F.col("rn") <= F.col("remainder"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_c"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchy subtree rollup via pointer doubling (round-10 widening)
# ---------------------------------------------------------------------------


@register(
    "bom_subtree_rollup",
    oracle="""
WITH anc AS (
  -- ancestor chain by INTEGER powers (literal list: 10 ** k is DOUBLE
  -- in DuckDB and double // is not floor — the theilsen lesson);
  -- powers up to 10^8 = depth 8 ancestors = 9-digit partkeys, the
  -- SAME max depth the Spark pointer-doubling covers (2^3 rounds);
  -- roots are partkey < 10 (self only), so drop the spurious 0 tail
  -- except for node 0 itself
  SELECT p_partkey AS node,
         unnest(list_distinct(list_filter(
           list_transform([1, 10, 100, 1000, 10000, 100000, 1000000,
                           10000000, 100000000],
                          p -> p_partkey // p),
           a -> a >= 1 OR a = p_partkey))) AS anc
  FROM part
)
SELECT a.anc AS ancestor,
       CAST(count(*) AS BIGINT) AS subtree_parts,
       CAST(SUM(CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS subtree_retail_cents
FROM anc a JOIN part p ON p.p_partkey = a.node
GROUP BY 1
""",
    doc=(
        "Bill-of-materials-style SUBTREE rollup over a part hierarchy "
        "(parent = partkey DIV 10 — a deterministic 6-level tree over "
        "the catalog): every ancestor's part count and total retail "
        "cents, self included. The Spark plan is POINTER DOUBLING "
        "(transitive closure in O(log depth) rounds: A' = A ∘ A, 3 "
        "rounds cover depth 8) — the parallel-hierarchy technique the "
        "sequential recursive CTE can't express, and a different "
        "iterative-graph shape from pagerank/LPA/components (closure "
        "GROWS per round instead of state being replaced). The oracle "
        "generates each node's ancestor chain directly (DIV powers), "
        "so the doubling is proven against the closed form. Per "
        "round: one anc-keyed equi-self-join + distinct; the rollup "
        "is one keyed aggregate of integer cents."
    ),
    tags=("graph", "agg", "analytics"),
)
def bom_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = io.load(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint").alias("cents"),
    )
    # A0: self-pairs + parent edges (parent = pk DIV 10, roots pk < 10)
    a = part.select(F.col("p_partkey").alias("node"), F.col("p_partkey").alias("anc")).unionAll(
        part.filter(F.col("p_partkey") >= 10).select(
            F.col("p_partkey").alias("node"),
            F.expr("p_partkey DIV 10").alias("anc"),
        )
    )
    a = a.repartition("anc").localCheckpoint()
    for _ in range(3):  # 2^3 = 8 >= max depth of the DIV-10 tree
        a = (
            a.alias("x")
            .join(a.alias("y"), F.col("x.anc") == F.col("y.node"))
            .select(F.col("x.node").alias("node"), F.col("y.anc").alias("anc"))
            .distinct()
            .localCheckpoint()
        )
    return (
        a.join(part, a.node == part.p_partkey)
        .groupBy(F.col("anc").alias("ancestor"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("subtree_parts"),
            F.sum("cents").cast("bigint").alias("subtree_retail_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Native recursive CTE (round 12) — Spark 4.x WITH RECURSIVE
# ---------------------------------------------------------------------------


@register(
    "recursive_cte_bom_depth",
    oracle="""
WITH RECURSIVE chain(node, anc, depth) AS (
  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM part
  UNION ALL
  SELECT node, anc // 10, depth + 1 FROM chain WHERE anc >= 10
)
SELECT node AS part_id,
       CAST(MAX(depth) AS BIGINT) AS depth,
       CAST(MIN(CASE WHEN anc < 10 THEN anc END) AS BIGINT) AS root_id
FROM chain
GROUP BY node
""",
    doc=(
        "Per-part depth and root ancestor in the DIV-10 BOM tree via "
        "the engine's NATIVE recursive CTE — Spark 4.x's WITH "
        "RECURSIVE (UnionLoop iterative execution), the ANSI SQL "
        "surface the reference's mrsql-style consumers would reach "
        "for first. Complements (does not duplicate) "
        "bom_subtree_rollup: the doubling row computes SUBTREE "
        "rollups in O(log depth) self-join rounds — the parallel "
        "shape for deep hierarchies; this row walks each node's "
        "ancestor CHAIN with the sequential per-level recursion and "
        "outputs what the rollup doesn't (per-node depth + root id). "
        "Both engines run the recursion natively (only the integer-"
        "division token differs: DIV vs //); each level is a filter "
        "+ project of the previous — total rows <= depth * |part|, "
        "terminating at the single-digit roots. SCALE CAP (r15 "
        "closure-band finding): Spark's UnionLoop aborts once TOTAL "
        "recursion rows exceed spark.sql.cteRecursionRowLimit "
        "(default 1e6) — the 10× staged chain table is ~1.9M rows, "
        "so at scale this surface FAILS out of the box and the conf "
        "must be raised deliberately (the band measures it un-capped "
        "at 100×: 5.99×, shape stable); the pointer-doubling twin "
        "needs no knob. At 100 TB the "
        "iteration count is the tree DEPTH (7 here), not data size, "
        "but each level materializes a full intermediate — the "
        "documented reason the pointer-doubling twin exists. Depth "
        "distribution and digit-count equivalence pinned in "
        "tests/test_recursive_cte.py."
    ),
    tags=("sql", "analytics", "agg"),
)
def recursive_cte_bom_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
WITH RECURSIVE chain(node, anc, depth) AS (
  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM part
  UNION ALL
  SELECT node, anc DIV 10, depth + 1 FROM chain WHERE anc >= 10
)
SELECT node AS part_id,
       CAST(MAX(depth) AS BIGINT) AS depth,
       CAST(MIN(CASE WHEN anc < 10 THEN anc END) AS BIGINT) AS root_id
FROM chain
GROUP BY node
"""
    )
