"""Plan pins for the round-7 TPC-H band (queries/tpch_extra.py):
every docstring's scale claim — broadcasts, single fact-fact
shuffle, decorrelated semi/anti joins, single-scan nested
aggregates — asserted against the executed adaptive plan so a
Catalyst or fixture change that degrades the plan fails here, not
at 100 TB."""

from __future__ import annotations

from tda596_lab02mapreduce_spark import plans
from tda596_lab02mapreduce_spark.registry import get


def _plan(spark, sf, name):
    return plans.final_plan(get(name).spark_fn(spark, sf))


def test_q7_broadcasts_every_dimension(spark, sf_correctness):
    """Five dimension joins all broadcast; the lone shuffle join (or,
    at fixture scale, AQE-converted broadcast) is lineitem⋈orders —
    and never a cartesian."""
    p = _plan(spark, sf_correctness, "tpch_q7_nation_trade_volume")
    assert plans.count_nodes(p, "BroadcastHashJoin") >= 4, p[:2000]
    assert "CartesianProduct" not in p
    assert plans.count_nodes(p, "SortMergeJoin") <= 1, p[:2000]


def test_q8_single_pass_conditional_ratio(spark, sf_correctness):
    """Numerator and denominator are sibling aggregates of ONE pass:
    exactly one grand-total aggregation pair over the joined fact, all
    dimensions broadcast."""
    p = _plan(spark, sf_correctness, "tpch_q8_market_share")
    assert plans.count_nodes(p, "BroadcastHashJoin") >= 5, p[:2000]
    assert "CartesianProduct" not in p


def test_q9_broadcast_only_joins(spark, sf_correctness):
    """Q9 needs no fact-fact join: part (LIKE-pruned pre-broadcast),
    supplier, and nation all broadcast, so the only Exchange is the
    final small-key aggregate."""
    p = _plan(spark, sf_correctness, "tpch_q9_profit_by_nation_year")
    assert plans.count_nodes(p, "BroadcastHashJoin") == 3, p[:2000]
    assert plans.count_nodes(p, "SortMergeJoin") == 0, p[:2000]
    assert plans.count_nodes(p, "Exchange") <= 1, p[:2000]


def test_q10_topk_never_global_sorts(spark, sf_correctness):
    """The top-20 is TakeOrderedAndProject (per-partition heaps), not
    a rangepartitioned global sort; returnflag reaches the scan."""
    df = get("tpch_q10_returned_revenue").spark_fn(spark, sf_correctness)
    p = plans.final_plan(df)
    assert "TakeOrderedAndProject" in p, p[:2000]
    assert "rangepartitioning" not in p.lower(), p[:2000]
    assert "l_returnflag" in plans.pushed_filters(df)


def test_q4_and_q21_decorrelate_to_semi_anti(spark, sf_correctness):
    """The EXISTS / NOT EXISTS subqueries must plan as left-semi /
    left-anti joins — zero per-row subquery re-scans, zero
    cartesians."""
    p4 = _plan(spark, sf_correctness, "tpch_q4_priority_late_ship")
    assert "LeftSemi" in p4, p4[:2000]
    assert "CartesianProduct" not in p4
    p21 = _plan(spark, sf_correctness, "tpch_q21_sole_supplier_lines")
    assert "LeftSemi" in p21 and "LeftAnti" in p21, p21[:2000]
    assert "CartesianProduct" not in p21


def test_q16_anti_join_is_broadcast(spark, sf_correctness):
    """The complaint-supplier exclusion is a broadcast left-anti join
    (the excluded set is tiny); part's size/type filters are applied
    before its broadcast."""
    p = _plan(spark, sf_correctness, "tpch_q16_supplier_count")
    assert "LeftAnti" in p, p[:2000]
    assert plans.count_nodes(p, "BroadcastHashJoin") >= 2, p[:2000]


def test_q20_scans_lineitem_once(spark, sf_correctness):
    """The two-grain nested aggregate must touch lineitem ONCE: the
    part-grain total is a window over the (partkey,suppkey) rollup,
    not a second scan+groupBy joined back (which Spark does NOT
    reuse-dedupe — measured before the window rewrite: 2 scans)."""
    df = get("tpch_q20_half_quantity_suppliers").spark_fn(spark, sf_correctness)
    p = plans.final_plan(df)
    li_scans = sum(
        1 for ln in p.splitlines() if "Scan parquet" in ln
    )
    assert li_scans == 2, p[:2000]  # lineitem once + supplier once
    assert plans.count_nodes(p, "Window") == 1, p[:2000]
    assert "rangepartitioning" not in p.lower(), p[:2000]


def test_q14_is_scan_broadcast_onerow(spark, sf_correctness):
    """Promo share: scan → broadcast part join → grand aggregate; no
    wide shuffle, no second scan of lineitem, date range pushed."""
    df = get("tpch_q14_promo_revenue_share").spark_fn(spark, sf_correctness)
    p = plans.final_plan(df)
    assert plans.count_nodes(p, "BroadcastHashJoin") == 1, p[:2000]
    assert sum(1 for ln in p.splitlines() if "Scan parquet" in ln) == 2, p[:2000]
    assert "l_shipdate" in plans.pushed_filters(df)


def test_q2_minprice_rows_exist_and_no_cartesian(spark, sf_correctness):
    """The decorrelated min-price join-back must produce rows at the
    correctness SF (an empty result would make the oracle pass
    vacuously) and stay cartesian-free."""
    df = get("tpch_q2_min_price_supplier").spark_fn(spark, sf_correctness)
    assert df.count() > 0
    assert not plans.has_operator(df, "CartesianProduct")


def test_band_is_nonempty_at_correctness_sf(spark, sf_correctness):
    """Every query in the band returns rows at sf0.01 — empty results
    pass any oracle comparison vacuously (the q9 LIKE '%1%' lesson:
    fixture part names contain no digits)."""
    for name in [
        "tpch_q4_priority_late_ship",
        "tpch_q7_nation_trade_volume",
        "tpch_q8_market_share",
        "tpch_q9_profit_by_nation_year",
        "tpch_q10_returned_revenue",
        "tpch_q12_priority_by_linestatus",
        "tpch_q14_promo_revenue_share",
        "tpch_q16_supplier_count",
        "tpch_q20_half_quantity_suppliers",
        "tpch_q21_sole_supplier_lines",
    ]:
        assert get(name).spark_fn(spark, sf_correctness).count() > 0, name


# --- round-9 completions (q3, q5, q6, q11, q13, q15, q17, q18, q19, q22) ---


def test_q3_topk_and_pushed_dates(spark, sf_correctness):
    """Top-10 is TakeOrderedAndProject; both date predicates reach
    their scans; the segment filter rides a broadcast."""
    df = get("tpch_q3_shipping_priority").spark_fn(spark, sf_correctness)
    p = plans.final_plan(df)
    assert "TakeOrderedAndProject" in p, p[:2000]
    assert "CartesianProduct" not in p
    assert plans.count_nodes(p, "BroadcastHashJoin") >= 1, p[:2000]
    assert "l_shipdate" in plans.pushed_filters(df)


def test_q6_all_predicates_pushed_single_row(spark, sf_correctness):
    """The pure scan-filter-aggregate: every predicate in
    PushedFilters, no join anywhere, one output row."""
    df = get("tpch_q6_forecast_revenue").spark_fn(spark, sf_correctness)
    p = plans.final_plan(df)
    assert "Join" not in p, p[:2000]
    pushed = plans.pushed_filters(df)
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, pushed
    assert df.count() == 1


def test_q5_broadcasts_all_dims_one_fact_join(spark, sf_correctness):
    """customer/supplier/nation/region broadcast; at most the one
    lineitem⋈orders shuffle join survives; no cartesian."""
    p = _plan(spark, sf_correctness, "tpch_q5_local_supplier_volume")
    assert plans.count_nodes(p, "BroadcastHashJoin") >= 4, p[:2000]
    assert "CartesianProduct" not in p
    assert plans.count_nodes(p, "SortMergeJoin") <= 1, p[:2000]


def test_q17_integer_threshold_no_float_avg(spark, sf_correctness):
    """The decorrelated 0.2·avg compare is integer cross-
    multiplication: no avg() anywhere in the plan, and the part
    filter rides a broadcast."""
    p = _plan(spark, sf_correctness, "tpch_q17_small_quantity_revenue")
    assert "avg(" not in p, p[:2000]
    assert plans.count_nodes(p, "BroadcastHashJoin") >= 1, p[:2000]


def test_q22_anti_join_decorrelates(spark, sf_correctness):
    """NOT EXISTS plans as a left-anti join; the 1-row stats side is
    a broadcast; no per-row subquery."""
    p = _plan(spark, sf_correctness, "tpch_q22_global_sales_opportunity")
    assert "LeftAnti" in p, p[:2000]
    assert "CartesianProduct" not in p


def test_round9_band_nonempty(spark, sf_correctness):
    """Every round-9 TPC-H completion returns rows at the
    correctness SF (q6/q14-style 1-row aggregates included)."""
    for name in (
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q6_forecast_revenue",
        "tpch_q11_important_stock",
        "tpch_q13_customer_distribution",
        "tpch_q15_top_supplier",
        "tpch_q17_small_quantity_revenue",
        "tpch_q18_large_volume_customers",
        "tpch_q19_discounted_revenue",
        "tpch_q22_global_sales_opportunity",
    ):
        assert get(name).spark_fn(spark, sf_correctness).count() >= 1, name
