"""Poisson-bootstrap CI semantics (statml.py:bootstrap_ci_order_revenue).

The hash gate proves both engines compute the same numbers; these pin
what a hash can't — the FROZEN thresholds really are Poisson(1) tails,
the md5 weights really behave like Poisson(1) draws (mean ~ 1, max <=
9), every replica materialized, and the interval is a real one (lo <
point < hi, positive width)."""

from __future__ import annotations

import math

from tda596_lab02mapreduce_spark.queries.statml import (
    _BOOT_B,
    _POIS1_TAIL_U,
    bootstrap_ci_order_revenue,
)


def test_frozen_thresholds_are_poisson1_tails():
    """Recompute floor(1e6 * P(Pois(1) >= k)) and compare to the frozen
    literals — the contract that lets both engines skip exp/factorial."""
    cum = 0.0
    expect = []
    for k in range(1, len(_POIS1_TAIL_U) + 1):  # tails for k = 1..9
        cum += math.exp(-1) / math.factorial(k - 1)
        expect.append(math.floor(1e6 * (1.0 - cum)))
    assert tuple(expect) == _POIS1_TAIL_U
    # and the k=10 tail would round to zero — the weight cap is total
    cum += math.exp(-1) / math.factorial(len(_POIS1_TAIL_U))
    assert math.floor(1e6 * (1.0 - cum)) == 0


def test_bootstrap_ci_brackets_point_estimate(spark, sf_correctness):
    rows = bootstrap_ci_order_revenue(spark, sf_correctness).collect()
    assert len(rows) == 5  # one per order priority
    for r in rows:
        assert int(r["b_replicas"]) == _BOOT_B  # every replica present
        lo, mid, hi = r["ci_lo_cents"], r["mean_cents"], r["ci_hi_cents"]
        assert lo < hi  # a real interval
        assert lo < mid < hi  # percentile CI brackets the point estimate
        # width sanity: ~ +-2 se of a ~3k-row mean, far below 20% of it
        assert (hi - lo) < 0.2 * mid


def test_poisson_weights_mean_one(spark):
    """The md5-draw weights must act like Poisson(1): empirical mean
    within 2% of 1.0 over 100k draws, max weight <= 9 (the contracted
    cap), and >30% zeros (P(X=0) = e^-1 ~ 0.368)."""
    from pyspark.sql import functions as F

    df = spark.range(100_000).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h")
    )
    draw = F.col("h") % F.lit(1000000)
    w = None
    for t in _POIS1_TAIL_U:
        term = F.when(draw < F.lit(t), F.lit(1)).otherwise(F.lit(0))
        w = term if w is None else w + term
    agg = df.select(w.alias("w")).agg(
        F.avg("w").alias("m"),
        F.max("w").alias("mx"),
        F.avg((F.col("w") == 0).cast("int")).alias("z"),
    ).collect()[0]
    assert abs(agg["m"] - 1.0) < 0.02
    assert agg["mx"] <= 9
    assert 0.33 < agg["z"] < 0.41
