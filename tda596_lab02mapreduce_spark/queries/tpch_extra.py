"""The remaining TPC-H query shapes (SURVEY.md §2B multi-join band,
round-7 widening): Q2, Q4, Q7, Q8, Q9, Q10, Q12, Q14, Q16, Q20, Q21
adapted to the fixture star schema (no partsupp / shipmode /
commitdate columns — each adaptation keeps the query's *shape*: the
correlated-subquery decorrelation, semi/anti rewrite, conditional
aggregation, or nested-aggregate pattern that makes the original
interesting to an optimizer).

Scale notes common to the band: grain-BOUNDED dimension joins
(nation=25, region=5, 1-row scalar aggregates) carry an explicit
``F.broadcast`` hint — those sides are constant-size at any SF.
Catalog-PROPORTIONAL dimensions (part, supplier, customer — 200k/10k/
150k × SF) carry NO hint: plan-time statistics broadcast them below
``spark.sql.autoBroadcastJoinThreshold`` (verified by the plan pins at
fixture scale) and AQE re-plans the regime transition when a 100 TB
catalog outgrows the threshold — an unconditional hint there would
force an executor-OOM broadcast at scale (VERDICT r9 "what's wrong"
#1 discipline). The only shuffles left are the fact-fact
lineitem⋈orders sort-merge joins and the final small-key
aggregations — exactly the plan a 1000-executor cluster wants. The
correlated EXISTS / IN / scalar subqueries are written declaratively
so Catalyst decorrelates them into left-semi / left-anti hash joins
(visible in .explain — no per-row re-scans, SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.registry import register

_REV_DEC = "decimal(18,6)"


def _rev() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_REV_DEC)


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


@register(
    "tpch_q2_min_price_supplier",
    oracle="""
SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
       CAST(l.l_extendedprice AS DOUBLE) AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size < 5
  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                           FROM lineitem l2
                           WHERE l2.l_partkey = p.p_partkey)
""",
    doc=(
        "TPC-H Q2 shape (min-cost supplier, partsupp replaced by the "
        "shipment fact): for each small part, the supplier(s) that "
        "shipped it at the minimum observed price — a correlated MIN "
        "subquery. Spark expresses the decorrelation explicitly: one "
        "per-partkey min aggregate joined back on (partkey, price) — "
        "the exact plan Catalyst rewrites the correlated form into, "
        "one lineitem shuffle on l_partkey reused by both the "
        "aggregate and the join-back. part/supplier are broadcast. "
        "Equality on the double price is safe: both engines compare "
        "the identical stored bits, no arithmetic on the compare key."
    ),
    tags=("join", "subquery", "tpch"),
)
def tpch_q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    minp = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price"))
    part = io.load(spark, sf_dir, "part").filter(F.col("p_size") < 5)
    sup = io.load(spark, sf_dir, "supplier")
    return (
        li.join(minp, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "min_price")
        .distinct()
    )


@register(
    "tpch_q4_priority_late_ship",
    oracle="""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""",
    doc=(
        "TPC-H Q4 shape (order priority checking; commitdate<receiptdate "
        "becomes ship-lag>30d): orders in a half-year window with at "
        "least one slow lineitem, counted by priority. The correlated "
        "EXISTS decorrelates to a LEFT SEMI hash join on o_orderkey "
        "with the lag predicate as the join condition — Catalyst never "
        "re-scans lineitem per order. The date filter lands in "
        "PushedFilters so the semi join probes only the window's "
        "orders; at 100 TB this is one keyed shuffle of the filtered "
        "orders against lineitem."
    ),
    tags=("subquery", "tpch"),
)
def tpch_q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql("""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
""")


@register(
    "tpch_q7_nation_trade_volume",
    oracle=f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE ns.n_nationkey <> nc.n_nationkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
    doc=(
        "TPC-H Q7 shape (volume shipping): cross-border revenue by "
        "(supplier nation, customer nation, year). One fact-fact "
        "sort-merge join (lineitem⋈orders); customer, supplier and "
        "both nation roles broadcast — five joins, ONE shuffle. The "
        "nation-inequality predicate is applied post-broadcast "
        "(map-side), never as a join explosion. 625 nation pairs × "
        "2 years keeps the final aggregate tiny."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = io.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = io.load(spark, sf_dir, "nation")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .filter(F.col("ns_key") != F.col("nc_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
SELECT l_year,
       CAST(round(nation_rev / total_rev, 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(l.l_shipdate) AS INT) AS l_year,
         CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN {_REV_SQL}
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS nation_rev,
         CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l_year
)
""",
    doc=(
        "TPC-H Q8 shape (national market share): within ASIA customers' "
        "purchases, the yearly revenue share supplied by NATION_3 — a "
        "conditional-aggregation ratio, NOT two passes: one scan "
        "computes both the CASE'd numerator and the denominator as "
        "sibling decimal sums (exact), ratio taken in double and "
        "rounded. Six dimension joins all broadcast; the single "
        "shuffle is lineitem⋈orders."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    orders = io.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = io.load(spark, sf_dir, "nation")
    region = io.load(spark, sf_dir, "region")
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("nc_key"))
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast(_REV_DEC)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("nc_key"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero))
            .cast("double")
            .alias("nation_rev"),
            F.sum(_rev()).cast("double").alias("total_rev"),
        )
        .select(
            "l_year",
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
        )
    )


@register(
    "tpch_q9_profit_by_nation_year",
    oracle=f"""
SELECT ns.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_revenue,
       CAST(SUM(CAST(p.p_retailprice * l.l_quantity * 0.6 AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_cost,
       CAST(round(CAST(SUM({_REV_SQL}) AS DOUBLE)
             - CAST(SUM(CAST(p.p_retailprice * l.l_quantity * 0.6 AS DECIMAL(18,6)))
                    AS DOUBLE), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE p.p_name LIKE '%e%'
GROUP BY nation, l_year
""",
    doc=(
        "TPC-H Q9 shape (product-type profit; ps_supplycost proxied as "
        "60% of retail price): per supplier-nation per year, revenue "
        "minus cost over parts matching a name pattern. The LIKE "
        "filter prunes part BEFORE its broadcast; both money series "
        "accumulate as exact decimal sums in ONE aggregate (sibling "
        "partials, single shuffle of small keys), difference taken in "
        "double at the end. No orders join needed — the shape's cost "
        "is the 3-way part/supplier/nation enrichment of the fact."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    part = io.load(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    sup = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = io.load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    cost = (F.col("p_retailprice") * F.col("l_quantity") * 0.6).cast(_REV_DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy("nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(_rev()).cast("double").alias("sum_revenue"),
            F.sum(cost).cast("double").alias("sum_cost"),
        )
        .select(
            "nation",
            "l_year",
            "sum_revenue",
            "sum_cost",
            F.round(F.col("sum_revenue") - F.col("sum_cost"), 2).alias("profit"),
        )
    )


@register(
    "tpch_q10_returned_revenue",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc=(
        "TPC-H Q10 shape (returned-item reporting): top-20 customers "
        "by revenue lost to returns. The returnflag filter reaches the "
        "lineitem scan (PushedFilters); customer and nation broadcast; "
        "the per-customer aggregate shuffles on c_custkey and the "
        "top-20 is TakeOrderedAndProject (per-partition heap, no "
        "global sort) with c_custkey as the deterministic tiebreak on "
        "the exact decimal-summed revenue."
    ),
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = io.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = io.load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = io.load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q12_priority_by_linestatus",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
    doc=(
        "TPC-H Q12 shape (shipping-mode priority counting; shipmode "
        "column absent, grouped by linestatus instead): one year of "
        "shipments split into high/low-priority line counts — dual "
        "conditional COUNT in a single pass. The date range is pushed "
        "to the lineitem scan; the only shuffle is the fact-fact join; "
        "the IN list evaluates map-side post-join."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = io.load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_revenue_share",
    oracle=f"""
SELECT CAST(round(100.0 *
         CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(SUM({_REV_SQL}) AS DOUBLE), 4) AS DOUBLE) AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-06-01'
""",
    doc=(
        "TPC-H Q14 shape (promotion effect): percentage of a quarter's "
        "revenue from PROMO-type parts — the classic conditional-sum "
        "ratio producing ONE row. part broadcasts; numerator and "
        "denominator are sibling exact decimal partials in the same "
        "(grand) aggregate, so the whole query is scan→broadcast-join→"
        "partial agg→one-row final: no wide shuffle at any scale."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
    )
    part = io.load(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast(_REV_DEC)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero))
            .cast("double")
            .alias("promo_rev"),
            F.sum(_rev()).cast("double").alias("total_rev"),
        )
        .select(
            F.round(100.0 * F.col("promo_rev") / F.col("total_rev"), 4).alias(
                "promo_share_pct"
            )
        )
    )


@register(
    "tpch_q16_supplier_count",
    oracle="""
SELECT p.p_brand, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""",
    doc=(
        "TPC-H Q16 shape (parts/supplier relationship): distinct "
        "supplier counts per (brand, size) for selected non-PROMO "
        "sizes, excluding 'complaint' suppliers (negative balance "
        "proxies the original LIKE '%Complaints%'). The NOT IN "
        "decorrelates to a broadcast left-anti join (the excluded set "
        "is tiny and provably non-null, so the NOT IN null-trap "
        "doesn't bite); count(DISTINCT) expands to the standard "
        "two-phase distinct aggregate. part broadcasts into the "
        "lineitem scan with size/type filters applied pre-broadcast."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = io.load(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 5, 9, 13)
    )
    li = io.load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        io.load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_half_quantity_suppliers",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), pt AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM ps
JOIN pt USING (l_partkey)
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
WHERE CAST(ps.supp_qty AS DOUBLE) > 0.12 * CAST(pt.total_qty AS DOUBLE)
""",
    doc=(
        "TPC-H Q20 shape (excess-inventory suppliers; availqty>half-"
        "of-shipped becomes shipped>12%-of-part-total, the dominance "
        "level the synthetic supplier fan-out actually produces): "
        "suppliers who dominate the shipped quantity of some part — "
        "a nested aggregate at two grains of the same fact. The part "
        "grain is a SUM window over the (partkey,suppkey) rollup — "
        "NOT a second groupBy joined back, which Spark plans as a "
        "second full scan+aggregate of lineitem (measured: the "
        "identical Exchange subtrees are not reuse-deduped under "
        "AQE). The window form pins one lineitem scan structurally: "
        "scan → (partkey,suppkey) partial+final agg → partkey-keyed "
        "window → filter → tiny supplier broadcast; asserted in "
        "tests/test_plans.py."
    ),
    tags=("agg", "join", "subquery", "tpch"),
)
def tpch_q20_half_quantity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("decimal(18,2)").alias("qty")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("supp_qty"))
    part_w = Window.partitionBy("l_partkey")
    sup = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ps.withColumn("total_qty", F.sum("supp_qty").over(part_w))
        .filter(
            F.col("supp_qty").cast("double") > 0.12 * F.col("total_qty").cast("double")
        )
        .join(sup, ps.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "tpch_q21_sole_supplier_lines",
    oracle="""
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_linenumber <> l1.l_linenumber)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
""",
    doc=(
        "TPC-H Q21 shape (suppliers who kept orders waiting; the "
        "receipt/commit-date lag becomes pure multi-line structure): "
        "lineitems on multi-line orders where NO other supplier "
        "appears — the signature EXISTS + NOT EXISTS pair over the "
        "same fact. Catalyst plans left-semi then left-anti joins on "
        "l_orderkey (three scans of lineitem, two keyed shuffles, "
        "zero per-row subquery execution); AQE can convert either "
        "side to broadcast if a filter makes it small. Expressed in "
        "SQL so the decorrelation is Catalyst's own."
    ),
    tags=("subquery", "join", "tpch"),
)
def tpch_q21_sole_supplier_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    io.register_views(spark, sf_dir, ("lineitem", "supplier"))
    return spark.sql("""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_linenumber <> l1.l_linenumber)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
""")


# ---------------------------------------------------------------------------
# Round-9: the remaining TPC-H shapes (Q3, Q5, Q6, Q11, Q13, Q15,
# Q17, Q18, Q19, Q22) — with pricing_summary (Q1) and this band the
# full 22-query suite is covered, adapted to the fixture star schema
# where columns are absent (no partsupp / shipmode / container /
# phone; each adaptation keeps the optimizer-relevant shape).
# ---------------------------------------------------------------------------


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
    doc=(
        "TPC-H Q3 (shipping priority; shippriority column absent, "
        "projection drops it): top-10 unshipped BUILDING-segment "
        "orders by revenue at the cutoff date. Segment filter rides "
        "the broadcast customer dim; both date predicates push to "
        "their scans; top-10 is TakeOrderedAndProject on the exact "
        "decimal-summed revenue with orderkey tiebreak."
    ),
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = io.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = io.load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
""",
    doc=(
        "TPC-H Q5 (local supplier volume): revenue by nation for "
        "orders where the customer and the line's supplier share a "
        "nation inside one region-year — the classic snowflake "
        "multi-join with a non-key residual predicate "
        "(c_nationkey = s_nationkey) evaluated post-join. All four "
        "dims broadcast; the only shuffles are the lineitem-orders "
        "fact join and the per-nation rollup (region-bounded grain, "
        "so the final sort is a handful of rows)."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = io.load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = io.load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = io.load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = io.load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc=(
        "TPC-H Q6 (forecasting revenue change): the pure scan-filter-"
        "aggregate — revenue that would have been earned without "
        "discounts in a band. EVERY predicate pushes to the parquet "
        "scan (PushedFilters carries all four); the aggregate is one "
        "exact-decimal partial+final to a single row. The simplest "
        "query in the suite and the purest whole-stage-codegen test."
    ),
    tags=("agg", "tpch"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_REV_DEC))
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q11_important_stock",
    oracle=f"""
WITH v AS (
  SELECT l.l_partkey, SUM({_REV_SQL}) AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS value
FROM v
WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM v)
ORDER BY value DESC, l_partkey
""",
    doc=(
        "TPC-H Q11 shape (important stock identification; partsupp "
        "absent — part value re-derived as one nation's supplied "
        "lineitem revenue): parts whose value exceeds 0.1% of that "
        "nation's total. The scalar subquery over the SAME grouped "
        "relation is the optimizer-relevant bit: Catalyst evaluates v "
        "once, feeds the 1-row global sum back as a literal-like "
        "broadcast, no re-scan (the threshold compare is double-vs-"
        "double with identical shape in both engines; the decimal sum "
        "itself is exact). Shuffles: the supplier-filtered fact join "
        "+ one part-key rollup."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = io.load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    v = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("val"))
    )
    tot = v.agg((F.sum("val").cast("double") * 0.001).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("val").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("l_partkey"))
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc=(
        "TPC-H Q13 (customer order-count distribution): the double "
        "aggregation — count orders per customer INCLUDING zero-order "
        "customers (the LEFT join is the point: count(o_orderkey) "
        "skips NULLs, so inactive customers land in the c_count=0 "
        "bucket), then histogram the counts. Two keyed shuffles "
        "(custkey rollup, count-value rollup); the customer side "
        "broadcasts into the outer join."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = io.load(spark, sf_dir, "customer").select("c_custkey")
    orders = io.load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH r AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_rev
FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM r)
ORDER BY s.s_suppkey
""",
    doc=(
        "TPC-H Q15 (top supplier, the CREATE VIEW + scalar-max "
        "original inlined as a CTE): the quarter's revenue per "
        "supplier, keeping the row(s) equal to the global max. "
        "Equality on the EXACT decimal sum (not the double) keeps the "
        "argmax bit-deterministic; the max is a 1-row broadcast back "
        "into the same grouped relation, evaluated once. One fact "
        "rollup shuffle + a broadcast dim probe."
    ),
    tags=("agg", "subquery", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = io.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    r = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    mx = r.agg(F.max("total_rev").alias("mx"))
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev")
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
WITH pl AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN pl ON pl.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_type = 'SMALL'
  AND 5 * CAST(round(l.l_quantity * 100, 0) AS BIGINT) * pl.n < pl.sq
""",
    doc=(
        "TPC-H Q17 (small-quantity-order revenue; container column "
        "absent — p_type carries the second predicate): lines whose "
        "quantity is below 20% of their part's average. The original "
        "correlated AVG subquery is decorrelated into a part-grain "
        "rollup joined back — and the 0.2·avg comparison is "
        "REARRANGED to pure integers (5·qty_c·n < Σqty_c): a double "
        "avg's summation order could flip boundary rows between "
        "engines, the integer cross-multiplication cannot. One part "
        "rollup + the probe join; the brand/type filter rides the "
        "broadcast part dim; output is one row."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        F.round(F.col("l_quantity") * 100, 0).cast("bigint").alias("qty_c"),
    )
    part = io.load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    pl = li.groupBy(F.col("l_partkey").alias("pl_partkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qty_c").cast("bigint").alias("sq"),
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pl, li.l_partkey == pl.pl_partkey)
        .filter(5 * F.col("qty_c") * F.col("n") < F.col("sq"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(_REV_DEC)).cast("double") / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q18_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
           AS sum_qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) > 30000
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS totalprice_c,
       b.sum_qty_c
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""",
    doc=(
        "TPC-H Q18 (large-volume customers): orders whose total "
        "quantity exceeds 300 units, with their customers — the "
        "GROUP BY + HAVING semi-join shape (the original's IN "
        "(subquery) is already the join here). Quantity sums and the "
        "threshold are exact integer centi-units; the qualifying set "
        "(46 orders at sf0.01) probes the join back against orders "
        "and the broadcast customer dim. One fact rollup + one "
        "keyed probe join."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_quantity") * 100, 0).cast("bigint").alias("qty_c"),
    )
    orders = io.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = io.load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_c").cast("bigint").alias("sum_qty_c"))
        .filter(F.col("sum_qty_c") > 30000)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("totalprice_c"),
            "sum_qty_c",
        )
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 31 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc=(
        "TPC-H Q19 (discounted revenue; container absent — p_size "
        "bands carry the second dimension): the disjunction-of-"
        "conjunctions predicate that exercises OR-pushdown and "
        "join-condition factoring. The part equi-key is common to all "
        "three arms, so the plan is ONE broadcast hash join with the "
        "residual OR evaluated post-join (never three scans, never a "
        "union); 538 rows qualify at sf0.01. Output one exact-decimal "
        "row."
    ),
    tags=("join", "agg", "tpch"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = io.load(spark, sf_dir, "lineitem")
    part = io.load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(16, 30)
        & F.col("l_quantity").between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(31, 50)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
WITH sel AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_c
  FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
),
pos AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos,
         CAST(SUM(bal_c) AS BIGINT) AS sum_pos
  FROM sel WHERE bal_c > 0
),
qual AS (
  SELECT s.c_custkey, s.c_nationkey, s.bal_c
  FROM sel s CROSS JOIN pos p
  WHERE s.bal_c * p.n_pos > p.sum_pos
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = s.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-07-01')
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_c) AS BIGINT) AS totacctbal_c
FROM qual GROUP BY c_nationkey
""",
    doc=(
        "TPC-H Q22 (global sales opportunity; phone column absent — "
        "the country-code IN list becomes a nationkey IN list): "
        "above-average-balance customers in selected countries with "
        "no order since mid-2000 (the fixture's dense order history "
        "makes never-ordered empty — probed; recent-inactivity is the "
        "non-degenerate form, 43 customers qualify), rolled up per "
        "country. The "
        "above-average compare is cross-multiplied to exact integers "
        "(bal_c·n > Σbal_c, positive balances only) so no double avg "
        "can flip boundary customers; the NOT EXISTS decorrelates to "
        "a left-anti hash join against orders. Shuffles: the anti "
        "join on custkey + the 7-row final rollup; the 1-row stats "
        "broadcast."
    ),
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = io.load(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_c"),
    )
    pos = sel.filter(F.col("bal_c") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
        F.sum("bal_c").cast("bigint").alias("sum_pos"),
    )
    orders = io.load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
    ).select("o_custkey")
    qual = (
        sel.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_pos"))
        .join(orders, sel.c_custkey == orders.o_custkey, "left_anti")
    )
    return qual.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("numcust"),
        F.sum("bal_c").cast("bigint").alias("totacctbal_c"),
    )
