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


def test_als_heldout_error_exceeds_train_per_rating(spark):
    """The EVAL member's substance: per-rating held-out error must be
    >= per-rating train error (the model was optimized on train), and
    the md5 fold must actually split (both folds non-empty, ~1/5 in
    test, disjoint by construction: n_train + n_test = all ratings)."""
    from tda596_lab02mapreduce_spark.operators.als import (
        als_heldout_eval,
        als_ratings,
    )

    sf = "/root/testdata/sf0.001"
    row = als_heldout_eval(spark, sf).collect()[0]
    n_all = als_ratings(spark, sf).count()
    assert int(row["n_train"]) + int(row["n_test"]) == n_all
    frac = int(row["n_test"]) / n_all
    assert 0.15 < frac < 0.25, frac  # md5 % 5 == 0
    per_train = int(row["sse_train_mq"]) / int(row["n_train"])
    per_test = int(row["sse_test_mq"]) / int(row["n_test"])
    assert per_test >= per_train, (per_test, per_train)
    # MAE consistency: mean |resid| <= sqrt(mean resid^2) (Jensen)
    mae = int(row["mae_test_mu"]) / int(row["n_test"])
    assert mae * mae <= per_test
    assert int(row["n_cold_test"]) >= 0


def test_als_heldout_cold_start_scores_zero(spark):
    """A test pair whose user appears ONLY in the test fold must take
    the COALESCE(0) prediction — resid = r*S^2 div S = r*S exactly —
    and be counted in n_cold_test. Constructed directly against the
    shared loop + the same residual algebra on a toy ratings frame."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark.operators.als import (
        ALS_S,
        _resid_mu,
        _train_loop,
    )

    train = spark.createDataFrame(
        [(1, "A", 4), (1, "B", 1), (2, "A", 2), (2, "B", 5)],
        "u long, i string, r long",
    )
    test = spark.createDataFrame([(99, "A", 3)], "u long, i string, r long")
    x, y = _train_loop(train, 2)
    te = (
        test.join(y.select("i", "y1", "y2"), "i", "left")
        .join(x.select("u", "x1", "x2"), "u", "left")
        .select(
            "r",
            (F.col("x1").isNull() | F.col("y1").isNull()).alias("cold"),
            F.coalesce("x1", F.lit(0)).alias("cx1"),
            F.coalesce("x2", F.lit(0)).alias("cx2"),
            F.coalesce("y1", F.lit(0)).alias("cy1"),
            F.coalesce("y2", F.lit(0)).alias("cy2"),
        )
    )
    r = te.select(
        "cold", F.expr(_resid_mu("div", "cx1", "cy1")).alias("resid")
    ).collect()[0]
    assert bool(r["cold"]) is True
    assert int(r["resid"]) == 3 * ALS_S  # prediction exactly 0
