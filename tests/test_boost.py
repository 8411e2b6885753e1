"""Boosted-stump semantics (operators/boost.py).

The hash gate (tree_boosted_stumps vs the unrolled BOOST_ORACLE)
proves cross-engine trajectory equality; these pin what a hash can't:
that the distributed boosting matches an INDEPENDENT pure-Python
replay (weighted argmin scan, ±1 votes, K=3 integer reweighting, vote
sum) round for round, that the ensemble BEATS its own first stump on
the fixture (the r14 verdict's done-criterion — the mid-price-band
interval is expressible by 3 votes, not by 1 cut), that its accuracy
lands beside the single CART's and the GLM's, and that weights stay
in the exact integer set {1, 3, 9}."""

from __future__ import annotations

import pytest

from tda596_lab02mapreduce_spark.operators.boost import (
    BOOST_K,
    BOOST_ROUNDS,
    boosted_stumps,
)
from tda596_lab02mapreduce_spark.operators.cart import _best_split
from tda596_lab02mapreduce_spark.registry import get

SF = "/root/testdata/sf0.001"


def _load_rows(spark, sf):
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io

    orders = io.load(spark, sf, "orders")
    x1 = F.floor(F.col("o_totalprice") / 30000).cast("bigint")
    return [
        (int(r["x1"]), int(r["x2"]), int(r["y"]))
        for r in orders.select(
            x1.alias("x1"),
            F.month("o_orderdate").cast("bigint").alias("x2"),
            x1.between(3, 7).cast("bigint").alias("y"),
        ).collect()
    ]


def _py_weighted_best(rows, w):
    """Independent weighted split scan — two-term key pL*qL/nL +
    pR*qR/nR, (feature, threshold) tiebreak, weighted counts."""
    n = sum(w)
    p = sum(wi * r[2] for wi, r in zip(w, rows))
    cands = []
    for fi, fname in ((0, "x1"), (1, "x2")):
        agg: dict[int, tuple[int, int]] = {}
        for wi, r in zip(w, rows):
            c, po = agg.get(r[fi], (0, 0))
            agg[r[fi]] = (c + wi, po + wi * r[2])
        n_le = pos_le = 0
        for v in sorted(agg)[:-1]:
            n_le += agg[v][0]
            pos_le += agg[v][1]
            nR, pR = n - n_le, p - pos_le
            key = (pos_le * (n_le - pos_le)) / n_le + (pR * (nR - pR)) / nR
            cands.append((key, fname, v, n, p, n_le, pos_le))
    assert cands, "degenerate node in replay"
    return min(cands)


def _py_boost(rows):
    """Full pure-Python boosting replay; returns (stump tuples,
    confusion dict, per-round stump-alone accuracies, final weights)."""
    w = [1] * len(rows)
    stumps, accs = [], []
    for _ in range(BOOST_ROUNDS):
        key, f, v, n, p, n_le, pos_le = _py_weighted_best(rows, w)
        vl = 1 if 2 * pos_le > n_le else -1
        vr = 1 if 2 * (p - pos_le) > (n - n_le) else -1
        stumps.append((f, v, n, p, vl, vr))
        fi = 0 if f == "x1" else 1
        for i, r in enumerate(rows):
            if (vl if r[fi] <= v else vr) != 2 * r[2] - 1:
                w[i] *= BOOST_K
        accs.append(
            sum(
                1
                for r in rows
                if (vl if r[fi] <= v else vr) == 2 * r[2] - 1
            )
            / len(rows)
        )
    conf: dict[tuple[int, int], int] = {}
    for r in rows:
        s = sum(
            vl if r[0 if f == "x1" else 1] <= v else vr
            for f, v, _n, _p, vl, vr in stumps
        )
        pred = 1 if s > 0 else 0
        conf[(r[2], pred)] = conf.get((r[2], pred), 0) + 1
    return stumps, conf, accs, w


def _collect(spark, sf):
    stumps, conf = {}, {}
    for r in boosted_stumps(spark, sf).collect():
        if r["kind"] == "stump":
            stumps[int(r["round"])] = (
                r["feature"],
                int(r["threshold"]),
                int(r["w_n"]),
                int(r["w_pos"]),
                int(r["vote_left"]),
                int(r["vote_right"]),
            )
        else:
            conf[(int(r["y_true"]), int(r["pred"]))] = int(r["n_orders"])
    return stumps, conf


def test_boost_matches_python_replay(spark):
    """Round-for-round equality with the independent replay at
    sf0.001: selected stumps (feature, threshold, weighted totals,
    votes) and the final confusion matrix."""
    rows = _load_rows(spark, SF)
    exp_stumps, exp_conf, _accs, _w = _py_boost(rows)
    got_stumps, got_conf = _collect(spark, SF)
    assert got_stumps == {
        t + 1: s for t, s in enumerate(exp_stumps)
    }
    assert got_conf == exp_conf
    assert sum(got_conf.values()) == len(rows)


def test_boost_ensemble_beats_single_stump(spark):
    """The r14-verdict done-criterion: the 3-stump ensemble must beat
    the round-1 stump alone on the fixture, and its accuracy lands
    beside (here: above) the depth-2 CART's and the GLM's on their
    respective tasks."""
    rows = _load_rows(spark, SF)
    _stumps, conf, accs, _w = _py_boost(rows)
    got_stumps, got_conf = _collect(spark, SF)
    n = sum(got_conf.values())
    acc_ens = sum(v for (y, p), v in got_conf.items() if y == p) / n
    # stump-1 alone: derivable from its own row (weights are all 1 in
    # round 1, so the weighted counts are plain counts)
    f, v, wn, wp, vl, vr = got_stumps[1]
    fi = 0 if f == "x1" else 1
    acc_stump1 = (
        sum(1 for r in rows if (vl if r[fi] <= v else vr) == 2 * r[2] - 1)
        / n
    )
    assert acc_stump1 == pytest.approx(accs[0])
    assert acc_ens > acc_stump1, (acc_ens, acc_stump1)
    # the interval target is exactly representable by the trio: the
    # fitted ensemble reproduces the label perfectly on the fixture
    assert acc_ens == 1.0
    # beside the family: the CART and GLM sit near chance on their
    # (random-label) task; the ensemble's task is the learnable one
    glm = get("logistic_gd_priority").spark_fn(spark, SF).collect()[0]
    acc_glm = int(glm["n_correct"]) / int(glm["n_total"])
    assert acc_ens > acc_glm


def test_boost_weights_stay_integer_powers(spark):
    """Weights stay exact powers of K (≤ one update per round, so at
    most K^BOOST_ROUNDS after the final update — on this fixture the
    fitted stumps each miss exactly one disjoint region, so every
    row lands at K^1), and the round-3 stump row's weighted total
    equals the replayed weights after exactly 2 updates."""
    rows = _load_rows(spark, SF)
    stumps, _conf, _accs, w = _py_boost(rows)
    assert set(w) <= {BOOST_K**t for t in range(BOOST_ROUNDS + 1)}
    got_stumps, _ = _collect(spark, SF)
    # the round-3 stump row's w_n is the total weight AFTER 2 updates:
    # replay it (weights before the round-3 update)
    w2 = [1] * len(rows)
    for f, v, _n, _p, vl, vr in stumps[:2]:
        fi = 0 if f == "x1" else 1
        for i, r in enumerate(rows):
            if (vl if r[fi] <= v else vr) != 2 * r[2] - 1:
                w2[i] *= BOOST_K
    assert got_stumps[3][2] == sum(w2)


def test_boost_degenerate_node_raises(spark):
    """The weighted scan inherits the CART degenerate-node contract:
    a frame constant on both features raises loudly."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 1, 0), (1, 1, 1)], "x1 bigint, x2 bigint, y bigint"
    ).withColumn("w", F.lit(1).cast("bigint"))
    with pytest.raises(ValueError, match="degenerate"):
        _best_split(df, wcol="w")


def test_boost_heldout_python_replay(spark):
    """Full independent replay of the ensemble's held-out eval at
    sf0.001: md5 fold in Python (hashlib), stumps boosted on the
    train fold with the replay loop, every test row scored by the
    vote-sum sign — the confusion matrix must match exactly, the
    fold must be disjoint and ~1/5 test, and held-out accuracy must
    beat the train fold's round-1 stump (the ensemble generalizes
    the interval, one cut can't)."""
    import hashlib

    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.registry import get

    sf = SF
    orders = io.load(spark, sf, "orders")
    x1c = F.floor(F.col("o_totalprice") / 30000).cast("bigint")
    rows = orders.select(
        "o_orderkey",
        x1c.alias("x1"),
        F.month("o_orderdate").cast("bigint").alias("x2"),
        x1c.between(3, 7).cast("bigint").alias("y"),
    ).collect()

    def fold(okey: int) -> int:
        return int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16) % 5

    train = [(int(r["x1"]), int(r["x2"]), int(r["y"]))
             for r in rows if fold(int(r["o_orderkey"])) != 0]
    test = [(int(r["x1"]), int(r["x2"]), int(r["y"]))
            for r in rows if fold(int(r["o_orderkey"])) == 0]
    assert train and test
    assert 0.15 < len(test) / len(rows) < 0.25

    stumps, _conf, accs, _w = _py_boost(train)
    expected: dict[tuple[int, int], int] = {}
    correct = 0
    for r in test:
        s = sum(
            vl if r[0 if f == "x1" else 1] <= v else vr
            for f, v, _n, _p, vl, vr in stumps
        )
        pred = 1 if s > 0 else 0
        expected[(r[2], pred)] = expected.get((r[2], pred), 0) + 1
        correct += pred == r[2]

    got = {
        (int(r["y_true"]), int(r["pred"])): int(r["n_orders"])
        for r in get("tree_boosted_heldout_confusion")
        .spark_fn(spark, sf)
        .collect()
    }
    assert got == expected
    assert sum(got.values()) == len(test)
    # held-out ensemble beats the train round-1 stump's accuracy
    assert correct / len(test) > accs[0]
