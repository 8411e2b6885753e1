"""Rank-2 ALS semantics (operators/als.py).

The hash gate (recsys_als_rank2 vs the 4-half-round unrolled CTE
oracle) proves cross-engine trajectory equality; these pin what a
hash can't — that the Cramer solve is a REAL least-squares step
(training SSE strictly decreases over rounds), that the integer
algebra matches an independent pure-Python replay on a toy matrix,
and that the learned factorization is genuinely rank 2 (second
components vary and matter)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark.operators.als import (
    ALS_CLAMP,
    ALS_LAMBDA_Q,
    ALS_S,
    _half_round,
    _init_item_factors,
    als_rank2_factors,
    als_ratings,
    als_sse,
    als_user_factors,
)


def _py_solve(rows, lam=ALS_LAMBDA_Q, s=ALS_S, clamp=ALS_CLAMP):
    """Independent pure-Python replay of one solve: rows =
    [(f1, f2, r), ...] for one key."""

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    n = len(rows)
    s11 = sum(f1 * f1 for f1, _, _ in rows)
    s12 = sum(f1 * f2 for f1, f2, _ in rows)
    s22 = sum(f2 * f2 for _, f2, _ in rows)
    sb1 = sum(r * f1 for f1, _, r in rows)
    sb2 = sum(r * f2 for _, f2, r in rows)
    a11 = s11 // n + lam
    a22 = s22 // n + lam
    a12 = tdiv(s12, n)
    b1 = tdiv(sb1, n)
    b2 = tdiv(sb2, n)
    det = a11 * a22 - a12 * a12
    dpos = det // (s * s)
    x1 = tdiv(a22 * b1 - a12 * b2, dpos)
    x2 = tdiv(a11 * b2 - a12 * b1, dpos)
    cl = lambda v: max(-clamp, min(clamp, v))  # noqa: E731
    return cl(x1), cl(x2)


def test_als_half_round_matches_python_replay(spark):
    """One user solve over a constructed 3-item rating row set must
    reproduce the independent integer replay exactly — including a
    NEGATIVE s12/sb2 path (the sign-decomposed trunc-div)."""
    ratings = spark.createDataFrame(
        [(1, "A", 4), (1, "B", 1), (1, "C", 3),
         (2, "A", 2), (2, "B", 5)],
        "u bigint, i string, r bigint",
    )
    fac = spark.createDataFrame(
        [("A", 1000, -750), ("B", 1000, 250), ("C", 1000, 500)],
        "i string, y1 bigint, y2 bigint",
    )
    out = {
        r["u"]: (r["x1"], r["x2"])
        for r in _half_round(
            ratings, fac, join_key="i", group_key="u",
            f1="y1", f2="y2", broadcast_factors=True,
        ).collect()
    }
    yv = {"A": (1000, -750), "B": (1000, 250), "C": (1000, 500)}
    expect1 = _py_solve([(yv[i][0], yv[i][1], r) for i, r in
                         [("A", 4), ("B", 1), ("C", 3)]])
    expect2 = _py_solve([(yv[i][0], yv[i][1], r) for i, r in
                         [("A", 2), ("B", 5)]])
    assert out == {1: expect1, 2: expect2}


def test_als_training_loss_decreases(spark, sf_correctness):
    """ALS monotonically decreases the (regularized) objective; in the
    quantized replay the plain SSE must still strictly drop from the
    zero-model baseline through both rounds on the fixture."""
    sse0 = als_sse(spark, sf_correctness, rounds=0)
    sse1 = als_sse(spark, sf_correctness, rounds=1)
    sse2 = als_sse(spark, sf_correctness, rounds=2)
    assert sse0 > sse1 > sse2
    # round 1 must be a big drop (a real fit, not numerical drift)
    assert sse1 < sse0 // 2


def test_als_factors_nondegenerate(spark, sf_correctness):
    rows = als_rank2_factors(spark, sf_correctness).collect()
    assert len(rows) == 25  # the brand domain
    y1s = {r["y1_q"] for r in rows}
    y2s = {r["y2_q"] for r in rows}
    # a real factorization: components vary across brands
    assert len(y1s) > 5 and len(y2s) > 5
    # nothing saturated at the clamp (the solve is in its linear
    # regime on the fixture — the clamp is a scale contract, not a
    # load-bearing truncation here)
    for r in rows:
        assert abs(r["y1_q"]) < ALS_CLAMP
        assert abs(r["y2_q"]) < ALS_CLAMP
        assert r["n_ratings"] > 0
    # genuinely rank 2: second components spread on the user side too
    x = als_user_factors(spark, sf_correctness)
    nz = x.filter(F.abs(F.col("x2")) > 0).count()
    assert nz > x.count() // 4


def test_als_recommend_excludes_purchased_and_ranks(spark, sf_correctness):
    """The serve half: at most k=3 recs per customer, never a brand
    the customer already purchased, ranks contiguous from 1 in
    strictly non-increasing score order (ties broken by brand ASC)."""
    from tda596_lab02mapreduce_spark.operators.als import als_recommend_topk

    recs = als_recommend_topk(spark, sf_correctness).collect()
    rated = {
        (r["u"], r["i"])
        for r in als_ratings(spark, sf_correctness).collect()
    }
    by_user: dict = {}
    for r in recs:
        by_user.setdefault(r["cust_id"], []).append(r)
        assert (r["cust_id"], r["brand"]) not in rated
    assert by_user  # non-empty serve
    for u, rows in by_user.items():
        rows.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        for a, b in zip(rows, rows[1:]):
            assert (a["score_q"], ) >= (b["score_q"], )
            if a["score_q"] == b["score_q"]:
                assert a["brand"] < b["brand"]
