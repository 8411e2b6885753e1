"""Properties for multi-touch attribution beyond the oracle hash:
integer credit conservation and deterministic remainder placement."""

from __future__ import annotations

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark.registry import get


def test_attribution_credit_conserved_and_ranks_dense(spark, sf_correctness):
    df = get("attribution_linear_touch").spark_fn(spark, sf_correctness)
    rows = df.collect()
    assert rows, "no attributed touches at sf0.01"
    per_p: dict[int, list] = {}
    for r in rows:
        per_p.setdefault(r.purchase_id, []).append(r)
    for pid, rs in per_p.items():
        rs.sort(key=lambda r: r.touch_rank)
        n = rs[0].n_touches
        assert len(rs) == n
        assert [r.touch_rank for r in rs] == list(range(1, n + 1))
        assert sum(r.credit_ppm for r in rs) == 1_000_000
        # remainder goes to the EARLIEST touches: credits non-increasing
        credits = [r.credit_ppm for r in rs]
        assert credits == sorted(credits, reverse=True)
        # every touch inside the 1h window, before the purchase
        for r in rs:
            assert 0 <= r.purchase_us - r.click_us < 3_600_000_000


def test_attribution_rerun_deterministic(spark, sf_correctness):
    fn = get("attribution_linear_touch").spark_fn
    a = sorted(tuple(r) for r in fn(spark, sf_correctness).collect())
    b = sorted(tuple(r) for r in fn(spark, sf_correctness).collect())
    assert a == b


def test_decay_attribution_credit_conserved_and_decays(spark, sf_correctness):
    """Time-decay model: ppm credit sums to exactly 1e6 per purchase,
    weights are the dyadic ladder 32 >> bucket, and an OLDER touch
    never outweighs a newer one (weights non-increasing in rank, which
    orders by recency)."""
    df = get("attribution_decay_touch").spark_fn(spark, sf_correctness)
    rows = df.collect()
    assert rows, "no attributed touches at sf0.01"
    per_p: dict[int, list] = {}
    for r in rows:
        per_p.setdefault(r.purchase_id, []).append(r)
    for pid, rs in per_p.items():
        rs.sort(key=lambda r: r.touch_rank)
        assert [r.touch_rank for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.credit_ppm for r in rs) == 1_000_000
        weights = [r.weight for r in rs]
        assert all(w in (1, 2, 4, 8, 16, 32) for w in weights)
        assert weights == sorted(weights, reverse=True)


def test_ltv_curve_monotone(spark, sf_correctness):
    """Cumulative revenue is non-decreasing in week offset within each
    cohort, and LTV is the exact integer division by cohort size."""
    from tda596_lab02mapreduce_spark.registry import get

    rows = get("ltv_cohort_curve").spark_fn(spark, sf_correctness).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
        assert (
            r["ltv_cents_per_user"]
            == r["cum_revenue_cents"] // r["n_cohort_users"]
        )
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r["week_offset"])
        cums = [r["cum_revenue_cents"] for r in curve]
        assert cums == sorted(cums)
