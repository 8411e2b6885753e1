"""Depth-2 CART growth semantics (operators/cart.py).

The hash gate (tree_depth2_priority vs the unrolled CART_ORACLE)
proves cross-engine growth equality; these pin what a hash can't —
that the grown tree matches an INDEPENDENT pure-Python CART replay
(same argmin rule: double-key Gini + (feature, threshold) tiebreak),
that majority-class leaves beat the majority baseline by
construction and land beside the GLM's accuracy on the same
features, and that degenerate nodes raise loudly instead of silently
desynchronizing from the oracle."""

from __future__ import annotations

import pytest

from tda596_lab02mapreduce_spark.operators.cart import (
    _best_split,
    cart_depth2_tree,
)
from tda596_lab02mapreduce_spark.registry import get

SF = "/root/testdata/sf0.001"


def _py_best_split(rows):
    """Independent pure-Python split scan: rows = [(x1, x2, y), ...].
    Returns (f, v, n, p, gini_num, gini_den) under the exact rule the
    engines use — ORDER BY the two-term key pL*qL/nL + pR*qR/nR (two
    IEEE divisions of int64 operands + one add; r15 overflow-safe key,
    operators/cart.py module docstring), then (f, v).  The RECORDED
    num/den stay the full O(n³) fraction, now DECIMAL(38,0) in the
    engines."""
    n = len(rows)
    p = sum(y for _, _, y in rows)
    cands = []
    for fi, fname in ((0, "x1"), (1, "x2")):
        vals = sorted({r[fi] for r in rows})
        for v in vals[:-1]:  # n_le < n excludes the top value
            n_le = sum(1 for r in rows if r[fi] <= v)
            pos_le = sum(y for *x, y in rows if x[fi] <= v)
            nR, pR = n - n_le, p - pos_le
            qL, qR = n_le - pos_le, nR - pR
            num = nR * (n_le * n_le - pos_le * pos_le - qL * qL) + n_le * (
                nR * nR - pR * pR - qR * qR
            )
            den = n * n_le * nR
            key = (pos_le * qL) / n_le + (pR * qR) / nR
            cands.append((key, fname, v, n, p, num, den))
    assert cands, "degenerate node in replay"
    key, f, v, n, p, num, den = min(cands)
    return f, v, n, p, num, den


def _py_grow(rows):
    """Grow the full depth-2 tree in pure Python; returns the 7-row
    table as a dict node_id -> tuple."""
    out = {}
    b1 = _py_best_split(rows)
    out[1] = ("split", b1[0], b1[1], b1[2], b1[3], b1[4], b1[5], None)
    sel = lambda r, b: (r[0] if b[0] == "x1" else r[1]) <= b[1]  # noqa: E731
    left = [r for r in rows if sel(r, b1)]
    right = [r for r in rows if not sel(r, b1)]
    b2, b3 = _py_best_split(left), _py_best_split(right)
    out[2] = ("split", b2[0], b2[1], b2[2], b2[3], b2[4], b2[5], None)
    out[3] = ("split", b3[0], b3[1], b3[2], b3[3], b3[4], b3[5], None)
    for base, node_rows, b in ((4, left, b2), (6, right, b3)):
        for off, leaf_rows in (
            (0, [r for r in node_rows if sel(r, b)]),
            (1, [r for r in node_rows if not sel(r, b)]),
        ):
            n = len(leaf_rows)
            pos = sum(y for _, _, y in leaf_rows)
            pred = 1 if 2 * pos > n else 0
            out[base + off] = ("leaf", None, None, n, pos, None, None, pred)
    return out


def _collect_tree(spark, sf):
    return {
        int(r["node_id"]): (
            r["kind"],
            r["feature"],
            None if r["threshold"] is None else int(r["threshold"]),
            int(r["n"]),
            int(r["pos"]),
            None if r["gini_num"] is None else int(r["gini_num"]),
            None if r["gini_den"] is None else int(r["gini_den"]),
            None if r["pred"] is None else int(r["pred"]),
        )
        for r in cart_depth2_tree(spark, sf).collect()
    }


def _feature_rows(spark, sf):
    """The CART feature frame collected as Python tuples."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io

    orders = io.load(spark, sf, "orders")
    return [
        (int(r["x1"]), int(r["x2"]), int(r["y"]))
        for r in orders.select(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("x1"),
            F.month("o_orderdate").cast("bigint").alias("x2"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .cast("bigint")
            .alias("y"),
        ).collect()
    ]


def test_cart_matches_python_replay(spark):
    """The distributed growth must reproduce the independent Python
    CART — argmin selection, child partitions, and leaf majorities —
    node for node at sf0.001."""
    rows = _feature_rows(spark, SF)
    expected = _py_grow(rows)
    got = _collect_tree(spark, SF)
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    assert got == expected


def test_cart_tree_is_nondegenerate_and_consistent(spark):
    """Structural invariants the oracle hash also relies on: children
    partition the parent (counts and positives add up), every split
    has a real Gini fraction, and all three splits exist at the gate
    SF too (the fixture non-degeneracy contract)."""
    for sf in (SF, "/root/testdata/sf0.01"):
        t = _collect_tree(spark, sf)
        assert set(t) == {1, 2, 3, 4, 5, 6, 7}
        for nid, (kind, *_rest) in t.items():
            assert kind == ("split" if nid <= 3 else "leaf")
        # parent/child count + positive conservation
        assert t[1][3] == t[2][3] + t[3][3]
        assert t[1][4] == t[2][4] + t[3][4]
        assert t[2][3] == t[4][3] + t[5][3]
        assert t[3][3] == t[6][3] + t[7][3]
        assert t[2][4] == t[4][4] + t[5][4]
        assert t[3][4] == t[6][4] + t[7][4]
        for nid in (1, 2, 3):
            num, den = t[nid][5], t[nid][6]
            assert den > 0 and 0 <= num <= den  # impurity in [0, 1]


def test_cart_accuracy_beside_the_glm(spark):
    """Majority-class leaves can never lose to the majority baseline
    (resubstitution), and the tree's training accuracy should land in
    the same near-chance band as the GLM trained on the SAME features
    (the fixture's priorities are random — both models are graded on
    algebra, not lift)."""
    t = _collect_tree(spark, SF)
    n_total = t[1][3]
    n_correct_tree = sum(
        max(t[nid][4], t[nid][3] - t[nid][4]) for nid in (4, 5, 6, 7)
    )
    baseline = max(t[1][4], n_total - t[1][4])
    assert n_correct_tree >= baseline
    glm = get("logistic_gd_priority").spark_fn(spark, SF).collect()[0]
    acc_tree = n_correct_tree / n_total
    acc_glm = int(glm["n_correct"]) / int(glm["n_total"])
    # same features, same label, same near-chance fixture: both models
    # sit in the near-chance band (the 4-round GD can land BELOW the
    # majority baseline — it optimizes the surrogate loss, not 0/1;
    # the tree's majority leaves cannot, which the >= above pins)
    assert 0.30 < acc_glm < 0.75, acc_glm
    assert baseline / n_total <= acc_tree < 0.75, (acc_tree, acc_glm)


def test_cart_degenerate_node_raises(spark):
    """A node constant on BOTH features has no candidate threshold;
    the contract is a loud ValueError, never a silent engine-only
    leaf fallback (which would desynchronize from the oracle)."""
    df = spark.createDataFrame(
        [(1, 1, 0), (1, 1, 1)], "x1 bigint, x2 bigint, y bigint"
    )
    with pytest.raises(ValueError, match="degenerate"):
        _best_split(df)


def test_cart_depth3_matches_python_replay(spark):
    """The depth-3 growth (r14 verdict #5) must reproduce the
    independent Python CART one level deeper: 7 argmin splits grown
    recursively, 8 majority leaves, with parent/child conservation —
    and the fixture must stay non-degenerate at depth 3 at the gate
    SFs (the loud-raise contract's precondition)."""
    from tda596_lab02mapreduce_spark.operators.cart import cart_depth3_tree

    rows = _feature_rows(spark, SF)

    def grow(node_rows, nid, depth, out):
        b = _py_best_split(node_rows)
        out[nid] = ("split", b[0], b[1], b[2], b[3], b[4], b[5], None)
        sel = lambda r: (r[0] if b[0] == "x1" else r[1]) <= b[1]  # noqa: E731
        left = [r for r in node_rows if sel(r)]
        right = [r for r in node_rows if not sel(r)]
        for child_rows, cid in ((left, 2 * nid), (right, 2 * nid + 1)):
            if depth == 3:
                n = len(child_rows)
                pos = sum(y for _, _, y in child_rows)
                out[cid] = (
                    "leaf", None, None, n, pos, None, None,
                    1 if 2 * pos > n else 0,
                )
            else:
                grow(child_rows, cid, depth + 1, out)
        return out

    expected = grow(rows, 1, 1, {})
    got = {
        int(r["node_id"]): (
            r["kind"],
            r["feature"],
            None if r["threshold"] is None else int(r["threshold"]),
            int(r["n"]),
            int(r["pos"]),
            None if r["gini_num"] is None else int(r["gini_num"]),
            None if r["gini_den"] is None else int(r["gini_den"]),
            None if r["pred"] is None else int(r["pred"]),
        )
        for r in cart_depth3_tree(spark, SF).collect()
    }
    assert set(got) == set(range(1, 16))
    assert got == expected
    # conservation at every level
    for nid in range(1, 8):
        assert got[nid][3] == got[2 * nid][3] + got[2 * nid + 1][3]
        assert got[nid][4] == got[2 * nid][4] + got[2 * nid + 1][4]


def test_cart_heldout_python_replay(spark):
    """Full independent replay of the held-out eval at sf0.001: md5
    fold in Python (hashlib), tree grown on the train fold with the
    replay CART, every test row routed to its train-leaf majority —
    the resulting confusion matrix must equal the query's exactly,
    and the fold must be disjoint and ~1/5 test."""
    import hashlib

    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.registry import get

    sf = "/root/testdata/sf0.001"
    orders = io.load(spark, sf, "orders")
    rows = orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("x1"),
        F.month("o_orderdate").cast("bigint").alias("x2"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("bigint")
        .alias("y"),
    ).collect()

    def fold(okey: int) -> int:
        return int(hashlib.md5(str(okey).encode()).hexdigest()[:8], 16) % 5

    train = [(int(r["x1"]), int(r["x2"]), int(r["y"]))
             for r in rows if fold(int(r["o_orderkey"])) != 0]
    test = [(int(r["x1"]), int(r["x2"]), int(r["y"]))
            for r in rows if fold(int(r["o_orderkey"])) == 0]
    assert train and test
    assert 0.15 < len(test) / len(rows) < 0.25

    tree = _py_grow(train)
    b1 = ("split", tree[1][1], tree[1][2])
    b2 = ("split", tree[2][1], tree[2][2])
    b3 = ("split", tree[3][1], tree[3][2])

    def leaf(r):
        sel = lambda b: (r[0] if b[1] == "x1" else r[1]) <= b[2]  # noqa: E731
        if sel(b1):
            return 4 if sel(b2) else 5
        return 6 if sel(b3) else 7

    expected: dict[tuple[int, int], int] = {}
    for r in test:
        pred = tree[leaf(r)][7]
        expected[(r[2], pred)] = expected.get((r[2], pred), 0) + 1

    got = {
        (int(r["y_true"]), int(r["pred"])): int(r["n_orders"])
        for r in get("tree_depth2_heldout_confusion")
        .spark_fn(spark, sf)
        .collect()
    }
    assert got == expected
    assert sum(got.values()) == len(test)


def test_batched_level_splits_equal_sequential_per_node(spark):
    """r16 optimization pin: the level-batched split scan
    (_best_splits_level — one tagged job per tree level) must return,
    per node, the IDENTICAL Row the sequential per-node _best_split
    job returns — same (feature, threshold), same counts, same exact
    DECIMAL(38,0) impurity fraction. This is the unit-level
    equivalence the hash gate proves only end-to-end."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark.operators.cart import (
        _best_splits_level,
        _cart_feat,
        _goes_left,
    )

    feat = _cart_feat(spark, SF)
    b1 = _best_split(feat)
    left = feat.filter(_goes_left(b1))
    right = feat.filter(~_goes_left(b1))
    seq = {2: _best_split(left), 3: _best_split(right)}
    nid_col = F.when(_goes_left(b1), F.lit(2)).otherwise(F.lit(3))
    batched = _best_splits_level(feat, nid_col, (2, 3))
    fields = ("f", "v", "n", "p", "n_le", "pos_le", "gini_num", "gini_den")
    for nid in (2, 3):
        got = tuple(batched[nid][k] for k in fields)
        want = tuple(seq[nid][k] for k in fields)
        assert got == want, (nid, got, want)


def test_batched_level_splits_degenerate_node_raises(spark):
    """A level containing a node constant on BOTH features must raise
    the same loud degenerate error as the sequential scan — never
    silently omit the node."""
    from pyspark.sql import functions as F

    from tda596_lab02mapreduce_spark.operators.cart import _best_splits_level

    # node 2: two distinct x1 values (splittable); node 3: constant on
    # both features (degenerate)
    df = spark.createDataFrame(
        [(1, 1, 0), (2, 1, 1), (9, 9, 0), (9, 9, 1)],
        "x1 bigint, x2 bigint, y bigint",
    )
    nid_col = F.when(F.col("x1") < 5, F.lit(2)).otherwise(F.lit(3))
    with pytest.raises(ValueError, match="degenerate"):
        _best_splits_level(df, nid_col, (2, 3))
