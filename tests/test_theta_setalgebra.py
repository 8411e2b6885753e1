"""Theta-sketch set algebra (statml.py:audience_setalgebra_sketch).

The sweep's bound-check (tools/sweep_config_free.py) grades estimate
accuracy against exact DuckDB set sizes; these pin what the bound
can't — the ALGEBRAIC consistency of the estimators on the shared KMV
samples: union = aNotB + bNotA + both (inclusion-exclusion holds
because all four scale the SAME common-theta counts), every pair is
present, and all estimates are non-negative."""

from __future__ import annotations

from tda596_lab02mapreduce_spark.queries.statml import (
    audience_overlap_sketch,
    audience_setalgebra_sketch,
)


def test_setalgebra_inclusion_exclusion_identity(spark, sf_correctness):
    alg = {
        r["pair_key"]: r
        for r in audience_setalgebra_sketch(spark, sf_correctness).collect()
    }
    both = {
        r["pair_key"]: r
        for r in audience_overlap_sketch(spark, sf_correctness).collect()
    }
    assert set(both) <= set(alg)  # overlap pairs all present in algebra
    assert len(alg) == 10  # C(5,2) event-type pairs on the fixture
    for key, r in alg.items():
        assert r["est_union"] >= 0
        assert r["est_a_not_b"] >= 0
        assert r["est_b_not_a"] >= 0
        if key in both:
            # same samples, same common theta: the three parts must
            # re-assemble the union up to 3 truncating integer
            # divisions (one per estimator)
            parts = (
                r["est_a_not_b"] + r["est_b_not_a"] + both[key]["est_both"]
            )
            assert abs(r["est_union"] - parts) <= 3
            # identical n_common on both sides of the refactor
            assert r["sample_common"] == both[key]["sample_common"]


def test_setalgebra_union_at_least_each_side(spark, sf_correctness):
    """est_union >= each difference estimate + shared part is implied;
    the cheaper sanity here: union >= max(aNotB, bNotA) strictly when
    the other side is non-empty (all fixture segments are)."""
    for r in audience_setalgebra_sketch(spark, sf_correctness).collect():
        assert r["est_union"] > r["est_a_not_b"]
        assert r["est_union"] > r["est_b_not_a"]
