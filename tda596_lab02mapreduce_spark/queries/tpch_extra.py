"""The remaining TPC-H query shapes (SURVEY.md §2B multi-join band,
round-7 widening): Q2, Q4, Q7, Q8, Q9, Q10, Q12, Q14, Q16, Q20, Q21
adapted to the fixture star schema (no partsupp / shipmode /
commitdate columns — each adaptation keeps the query's *shape*: the
correlated-subquery decorrelation, semi/anti rewrite, conditional
aggregation, or nested-aggregate pattern that makes the original
interesting to an optimizer).

Scale notes common to the band: every dimension join (part, supplier,
customer, nation, region) is broadcast-able and explicitly
broadcast; the only shuffles left are the fact-fact
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
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
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
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
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
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
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
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
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
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
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
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
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
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
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
        .join(F.broadcast(sup), ps.l_suppkey == sup.s_suppkey)
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
