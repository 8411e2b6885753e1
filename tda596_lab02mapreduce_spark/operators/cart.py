"""Fixed-depth-2 CART classifier — the TREE member of the trained-model
family (logistic GD = discriminative GLM, NB = generative, kmeans =
centroidal, BPE = tokenizer, ALS = factorization; r13 verdict #1).

The tree is grown from the same machinery as ``decision_split_gain``
(queries/statml.py): per node, EVERY candidate threshold of every
feature gets its weighted-Gini impurity as an exact integer fraction
(num/den BIGINT) from one value-grain aggregate + one per-feature
prefix cumsum — the classic sorted-prefix-sum split finder, never a
per-threshold pass.  What this module adds is the GROWTH: argmin
split at the root, one more split scan per child, majority-class
leaves.

Cross-engine exactness (the perceptron/logistic/ALS discipline):

- Features are integer buckets (price bucket = FLOOR(o_totalprice /
  50000), order month), the label is the urgent/high indicator — all
  BIGINT, so every impurity numerator/denominator is an exact integer
  in both engines.
- The recorded impurity fraction gini_num/gini_den is O(n³) in the
  node row count, so it is computed in DECIMAL(38,0) on BOTH engines
  (Spark decimal arithmetic; DuckDB window cumsums are HUGEINT, cast
  to DECIMAL(38,0)) — exact to nodes of ~5.8e12 rows, where BIGINT
  would silently wrap in Spark at ~3e6 rows while DuckDB raised
  (ADVICE r14 medium).
- The argmin ORDER BY key is NOT the O(n³) fraction: it is the
  algebraically equivalent two-term form pL·qL/nL + pR·qR/nR
  (= gini_num/gini_den · n/2 — same argmin, same exact-tie set for a
  fixed node).  Each term is one IEEE division of int64 operands and
  int64→double conversion is correctly rounded in both engines for
  EVERY int64 (no 2^53 caveat), so the three double ops give
  bit-identical keys in Spark (JVM) and DuckDB (C++) whenever the
  products pX·qX fit int64 — guarded below.  Ties (including two
  distinct rationals rounding to the same double) break
  deterministically on (feature, threshold), so both engines select
  the SAME split even when the minimum is not unique.
- The ROOT's best split is a ``TakeOrderedAndProject`` (orderBy +
  limit 1); deeper LEVELS are batched (optimization r16,
  ``_best_splits_level``): all siblings of one level share a single
  tagged scan and a per-node ``row_number`` argmin over the identical
  (key, feature, threshold) total order — same selected rows, fewer
  sequential jobs.  Exactly 2^depth − 1 driver rows are collected for
  the whole tree (3 at depth 2), bounded by construction (the NB
  V + V×C discipline).  Leaves are one distributed aggregate over the
  original feature frame; no per-row driver work anywhere.

Degenerate nodes (no candidate threshold with n_le < n, i.e. a child
whose rows are constant on BOTH features) raise loudly: the fixture
guarantees non-degeneracy at every SF (pinned in tests/test_cart.py),
and a silent leaf-fallback here would desynchronize from the unrolled
oracle.

At 100 TB: the melt is a map-side projection (2 rows per input row at
feature-value grain before the combine), the per-feature cumsum runs
over the DOMAIN-BOUNDED (feature, value) aggregate (≤ 24 rows on this
feature grid — the conformal bounded-histogram posture: the scan
grows, the state doesn't), and the 3 collected rows are O(1).  The
design limit is the key's int64 product bound: nodes up to
``_EXACT_KEY_MAX_N`` = 6.0e9 rows (pL·qL ≤ n²/4 < 2^63) get the
bit-exact key guarantee; beyond it ``_best_split`` RAISES loudly
(the stage_dbscan REPLICAS-guard discipline) instead of silently
wrapping — on the DuckDB side the key's products are CAST AS BIGINT
so the oracle raises there too.  Past the guard a user partitions or
samples the node first; the recorded DECIMAL(38,0) fraction itself
stays exact three orders of magnitude further.

Reference parity: the reference engine (mr/worker.go MapReduce) has no
model training; this extends SURVEY.md §2C's trained-model band.
"""

from __future__ import annotations

from decimal import Decimal as _Dec

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io

CART_FEATURES = ("x1", "x2")

# Largest node row count (or weighted row count, for the boosted
# stumps that reuse this scan) for which the two-term argmin key's
# int64 products pX·qX ≤ n²/4 cannot overflow: n ≤ 2·floor(sqrt(2^63)).
_EXACT_KEY_MAX_N = 6_000_000_000


def _cart_feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The logistic band's integer feature frame (x1 = price bucket,
    x2 = order month, y = urgent/high ∈ {0,1})."""
    orders = io.load(spark, sf_dir, "orders")
    return orders.select(
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("x1"),
        F.month("o_orderdate").cast("bigint").alias("x2"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("bigint")
        .alias("y"),
    ).localCheckpoint(eager=False)


def _split_candidates(
    node: DataFrame, *, nid_col=None, wcol: str | None = None
) -> DataFrame:
    """The SHARED split-scan algebra (ADVICE r16: one copy, not two):
    melt → (feature, value)-grain counts → per-feature prefix cumsum →
    exact DECIMAL(38,0) impurity fraction + two-term double argmin key,
    one row per candidate threshold with n_le < n.  With ``nid_col``
    every grouping/window/total key is prefixed by ``__nid`` (the
    level-batched growth); with ``wcol`` (an integer sample-weight
    column — the boosted-stumps reuse, operators/boost.py) every count
    becomes Σw and every positive count Σw·y.  The algebra, key,
    tiebreak columns, and overflow posture are identical in every
    combination; callers add their own argmin (orderBy+limit or
    per-node row_number) so plan shapes stay as measured."""
    from pyspark.sql.window import Window

    grp: list = []
    cols = [F.expr("stack(2, 'x1', x1, 'x2', x2) AS (f, v)"), F.col("y")]
    if nid_col is not None:
        grp = ["__nid"]
        cols.insert(0, nid_col.cast("int").alias("__nid"))
    if wcol is not None:
        cols.append(F.col(wcol).alias("__w"))
    melt = node.select(*cols)
    if wcol is None:
        cnt_agg = F.count(F.lit(1)).alias("cnt")
        pos_agg = F.sum("y").alias("pos")
        tot_aggs = (
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("p"),
        )
    else:
        cnt_agg = F.sum("__w").alias("cnt")
        pos_agg = F.sum(F.col("__w") * F.col("y")).alias("pos")
        tot_aggs = (
            F.sum(wcol).cast("bigint").alias("n"),
            F.sum(F.col(wcol) * F.col("y")).cast("bigint").alias("p"),
        )
    bv = melt.groupBy(*grp, "f", "v").agg(cnt_agg, pos_agg)
    w = Window.partitionBy(*grp, "f").orderBy("v")
    cum = bv.select(
        *grp,
        "f",
        "v",
        F.sum("cnt").over(w).alias("n_le"),
        F.sum("pos").over(w).alias("pos_le"),
    )
    if nid_col is None:
        tot = F.broadcast(node.agg(*tot_aggs))
        j = cum.crossJoin(tot)
    else:
        tot = node.groupBy(nid_col.cast("int").alias("__nid")).agg(*tot_aggs)
        j = cum.join(F.broadcast(tot), "__nid")
    j = j.filter(F.col("n_le") < F.col("n"))
    nL, pL = F.col("n_le"), F.col("pos_le")
    nR = F.col("n") - nL
    pR = F.col("p") - pL
    qL = nL - pL
    qR = nR - pR
    # recorded fraction: DECIMAL(38,0) so the O(n³) products never
    # wrap (BIGINT wraps silently under ANSI-off at ~3e6-row nodes
    # while DuckDB's HUGEINT cumsums don't — ADVICE r14 medium)
    dec = "decimal(38,0)"
    nLd, pLd = nL.cast(dec), pL.cast(dec)
    nd, pd = F.col("n").cast(dec), F.col("p").cast(dec)
    nRd, pRd = nd - nLd, pd - pLd
    qLd, qRd = nLd - pLd, nRd - pRd
    num = nRd * (nLd * nLd - pLd * pLd - qLd * qLd) + nLd * (
        nRd * nRd - pRd * pRd - qRd * qRd
    )
    den = nd * nLd * nRd
    # argmin key: the equivalent two-term form with int64 products —
    # bit-identical cross-engine for every int64 (module docstring)
    key = (pL * qL).cast("double") / nL.cast("double") + (
        pR * qR
    ).cast("double") / nR.cast("double")
    return j.select(
        *grp,
        "f",
        F.col("v").cast("bigint").alias("v"),
        "n",
        "p",
        nL.cast("bigint").alias("n_le"),
        pL.cast("bigint").alias("pos_le"),
        num.cast(dec).alias("gini_num"),
        den.cast(dec).alias("gini_den"),
        key.alias("gini"),
    )


def _degenerate_error() -> ValueError:
    return ValueError(
        "cart_depth2: degenerate node (constant on both features) — "
        "the fixture contract guarantees a valid split at every "
        "depth-2 node; a different dataset needs a leaf-fallback "
        "grown in BOTH engines"
    )


def _check_overflow_guard(row: Row) -> None:
    if int(row["n"]) > _EXACT_KEY_MAX_N:
        raise ValueError(
            f"cart: node holds {int(row['n'])} (weighted) rows > "
            f"_EXACT_KEY_MAX_N={_EXACT_KEY_MAX_N}; the argmin key's "
            "int64 products pX*qX can overflow past n^2/4 = 2^63 — "
            "partition or sample the node before growing (module "
            "docstring: design limit is loud, never silent wrap)"
        )


def _best_split(node: DataFrame, wcol: str | None = None) -> Row:
    """The argmin weighted-Gini split of ``node`` over both features:
    the shared candidate scan (_split_candidates) followed by
    orderBy(double-key, f, v) limit 1 (TakeOrderedAndProject; ONE
    collected row).  Returns Row(f, v, n, p, n_le, pos_le, gini_num,
    gini_den)."""
    rows = (
        _split_candidates(node, wcol=wcol)
        .orderBy("gini", "f", "v")
        .limit(1)
        .collect()
    )
    if not rows:
        raise _degenerate_error()
    _check_overflow_guard(rows[0])
    return rows[0]


def _goes_left(best: Row):
    """The split predicate column for a collected best-split row."""
    return F.col(best["f"]) <= F.lit(int(best["v"]))


def _best_splits_level(feat: DataFrame, nid_col, nids: tuple[int, ...]) -> dict[int, Row]:
    """The argmin splits of EVERY node of one tree level in ONE job
    (optimization r16, guide §2.4: sibling nodes partition the same
    parent frame, so their split scans are one tagged scan — the
    shared candidate algebra of _split_candidates with ``__nid``
    prepended to every key, and the per-node argmin is the same
    (gini, f, v) total order taken as row_number 1 per node instead
    of N sequential TakeOrderedAndProject jobs).  Returns {nid: Row}
    with exactly _best_split's Row fields (plus __nid); raises the
    identical degenerate/overflow errors per node."""
    from pyspark.sql.window import Window

    aw = Window.partitionBy("__nid").orderBy("gini", "f", "v")
    rows = (
        _split_candidates(feat, nid_col=nid_col)
        .withColumn("__rn", F.row_number().over(aw))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    )
    best = {int(r["__nid"]): r for r in rows}
    for nid in nids:
        if nid not in best:
            raise _degenerate_error()
        _check_overflow_guard(best[nid])
    return best


def _grow(feat: DataFrame) -> tuple[Row, Row, Row]:
    """Grow the three splits on a feature frame (root, left child,
    right child) — 3 collected rows total, TWO jobs: the root argmin,
    then both children batched level-wise (was 3 sequential jobs)."""
    b1 = _best_split(feat)
    lvl = _best_splits_level(
        feat, F.when(_goes_left(b1), F.lit(2)).otherwise(F.lit(3)), (2, 3)
    )
    return b1, lvl[2], lvl[3]


def _leaf_id(b1: Row, b2: Row, b3: Row):
    """The heap leaf id (4-7) column for a row under the grown tree."""
    return F.when(
        _goes_left(b1),
        F.when(_goes_left(b2), F.lit(4)).otherwise(F.lit(5)),
    ).otherwise(F.when(_goes_left(b3), F.lit(6)).otherwise(F.lit(7)))


def cart_depth2_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grow the depth-2 CART and return the 7-row tree table (heap
    numbering: 1 = root, 2/3 = children, 4-7 = leaves).  Split rows
    carry (feature, threshold, n, pos, gini_num, gini_den); leaf rows
    carry (n, pos, pred = majority class, ties → 0)."""
    feat = _cart_feat(spark, sf_dir)
    b1, b2, b3 = _grow(feat)

    schema = (
        "node_id bigint, kind string, feature string, threshold bigint, "
        "n bigint, pos bigint, gini_num decimal(38,0), "
        "gini_den decimal(38,0), pred bigint"
    )
    splits = spark.createDataFrame(
        [
            (
                nid,
                "split",
                b["f"],
                int(b["v"]),
                int(b["n"]),
                int(b["p"]),
                _Dec(b["gini_num"]),
                _Dec(b["gini_den"]),
                None,
            )
            for nid, b in ((1, b1), (2, b2), (3, b3))
        ],
        schema,
    )
    leaves = (
        feat.groupBy(_leaf_id(b1, b2, b3).cast("bigint").alias("node_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
        .select(
            "node_id",
            F.lit("leaf").alias("kind"),
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("bigint").alias("threshold"),
            "n",
            "pos",
            F.lit(None).cast("decimal(38,0)").alias("gini_num"),
            F.lit(None).cast("decimal(38,0)").alias("gini_den"),
            F.when(2 * F.col("pos") > F.col("n"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("pred"),
        )
    )
    return splits.unionByName(leaves)


# ---------------------------------------------------------------------------
# DuckDB oracle: the unrolled tree growth
# ---------------------------------------------------------------------------

# DuckDB window cumsums are HUGEINT, so the O(n³) fraction is exact;
# CAST AS DECIMAL(38,0) mirrors Spark's decimal arithmetic (module
# docstring: BIGINT here wrapped/raised divergently — ADVICE r14).
_GINI_NUM = (
    "((n - n_le) * (n_le * n_le - pos_le * pos_le"
    " - (n_le - pos_le) * (n_le - pos_le))"
    " + n_le * ((n - n_le) * (n - n_le)"
    " - (p - pos_le) * (p - pos_le)"
    " - ((n - n_le) - (p - pos_le)) * ((n - n_le) - (p - pos_le))))"
)
_GINI_DEN = "(n * n_le * (n - n_le))"
# the two-term argmin key; the products are CAST AS BIGINT so DuckDB
# raises loudly exactly where Spark's _EXACT_KEY_MAX_N guard does
_KEY_SQL = (
    "CAST(CAST(pos_le * (n_le - pos_le) AS BIGINT) AS DOUBLE)"
    " / CAST(n_le AS DOUBLE)"
    " + CAST(CAST((p - pos_le) * ((n - n_le) - (p - pos_le)) AS BIGINT)"
    " AS DOUBLE) / CAST(n - n_le AS DOUBLE)"
)


def _node_scan_sql(k: int, node: str) -> str:
    """The per-node split-scan CTE chain: melt{k}, bv{k}, cum{k},
    tot{k}, best{k} — identical algebra to _best_split."""
    return f"""melt{k} AS (
  SELECT 'x1' AS f, x1 AS v, y FROM {node}
  UNION ALL
  SELECT 'x2' AS f, x2 AS v, y FROM {node}
),
bv{k} AS (
  SELECT f, v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM melt{k} GROUP BY f, v
),
cum{k} AS (
  SELECT f, v,
         SUM(cnt) OVER (PARTITION BY f ORDER BY v) AS n_le,
         SUM(pos) OVER (PARTITION BY f ORDER BY v) AS pos_le
  FROM bv{k}
),
tot{k} AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS p
  FROM {node}
),
best{k} AS (
  SELECT f, CAST(v AS BIGINT) AS v, n, p,
         CAST({_GINI_NUM} AS DECIMAL(38,0)) AS gini_num,
         CAST({_GINI_DEN} AS DECIMAL(38,0)) AS gini_den
  FROM cum{k} CROSS JOIN tot{k}
  WHERE n_le < n
  ORDER BY {_KEY_SQL}, f, v
  LIMIT 1
)"""


def _side(b: str, cmp: str) -> str:
    """Split predicate rendered in SQL for best-row alias ``b``."""
    return f"(CASE WHEN {b}.f = 'x1' THEN t.x1 ELSE t.x2 END) {cmp} {b}.v"


_FEAT_SQL = """
  SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS x1,
         CAST(month(o_orderdate) AS BIGINT) AS x2,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders"""

# the heap leaf id of a row aliased ``t`` under the grown tree
_LEAF_ID_SQL = (
    f"CASE WHEN {_side('b1', '<=')}"
    f" THEN CASE WHEN {_side('b2', '<=')} THEN 4 ELSE 5 END"
    f" ELSE CASE WHEN {_side('b3', '<=')} THEN 6 ELSE 7 END END"
)


def _growth_sql(prefix_ctes: str) -> str:
    """The shared growth prefix: ``prefix_ctes`` must define a CTE
    named ``feat`` (the training rows); appends the three node scans,
    the child partitions, and the train-leaf aggregate."""
    return (
        "WITH "
        + prefix_ctes
        + ",\n"
        + _node_scan_sql(1, "feat")
        + f""",
node2 AS (
  SELECT t.x1, t.x2, t.y FROM feat t CROSS JOIN best1 b
  WHERE {_side('b', '<=')}
),
node3 AS (
  SELECT t.x1, t.x2, t.y FROM feat t CROSS JOIN best1 b
  WHERE {_side('b', '>')}
),
"""
        + _node_scan_sql(2, "node2")
        + ",\n"
        + _node_scan_sql(3, "node3")
        + f""",
leaves AS (
  SELECT {_LEAF_ID_SQL} AS node_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(t.y) AS BIGINT) AS pos
  FROM feat t CROSS JOIN best1 b1 CROSS JOIN best2 b2 CROSS JOIN best3 b3
  GROUP BY 1
)"""
    )


CART_ORACLE = (
    _growth_sql(f"feat AS MATERIALIZED ({_FEAT_SQL}\n)")
    + """
SELECT CAST(1 AS BIGINT) AS node_id, 'split' AS kind, f AS feature,
       v AS threshold, n, p AS pos, gini_num, gini_den,
       CAST(NULL AS BIGINT) AS pred
FROM best1
UNION ALL
SELECT CAST(2 AS BIGINT), 'split', f, v, n, p, gini_num, gini_den,
       CAST(NULL AS BIGINT)
FROM best2
UNION ALL
SELECT CAST(3 AS BIGINT), 'split', f, v, n, p, gini_num, gini_den,
       CAST(NULL AS BIGINT)
FROM best3
UNION ALL
SELECT CAST(node_id AS BIGINT), 'leaf', CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), n, pos, CAST(NULL AS DECIMAL(38,0)),
       CAST(NULL AS DECIMAL(38,0)),
       CAST(CASE WHEN 2 * pos > n THEN 1 ELSE 0 END AS BIGINT)
FROM leaves
"""
)


# ---------------------------------------------------------------------------
# Depth-3 growth (r14 verdict #5: the growth loop generalizes — 2^k−1
# collected split rows, same argmin rule, same unrolled oracle shape)
# ---------------------------------------------------------------------------


def cart_depth3_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grow the depth-3 CART on the same feature frame and return the
    15-row tree table (heap numbering: 1 = root, 2-3 depth-1 splits,
    4-7 depth-2 splits, 8-15 leaves).  Exactly 7 collected split rows
    (2^3 − 1) — the depth-2 discipline, one more level: per node one
    TakeOrderedAndProject argmin, children as filters on the parent
    frame, leaves one distributed aggregate.  The fixture is
    non-degenerate at depth 3 for every gate SF (pinned in
    tests/test_cart.py); a degenerate grandchild raises loudly like
    every other node."""
    feat = _cart_feat(spark, sf_dir)
    b: dict[int, Row] = {1: _best_split(feat)}
    # level-batched growth (guide §2.4 via _best_splits_level): depth-1
    # siblings in one job, depth-2 siblings in one job — 3 split jobs
    # total instead of 7 sequential TakeOrderedAndProject jobs, with
    # per-node algebra/tiebreak identical by construction
    lvl2_nid = F.when(_goes_left(b[1]), F.lit(2)).otherwise(F.lit(3))
    b.update(_best_splits_level(feat, lvl2_nid, (2, 3)))
    lvl3_nid = F.when(
        _goes_left(b[1]),
        F.when(_goes_left(b[2]), F.lit(4)).otherwise(F.lit(5)),
    ).otherwise(F.when(_goes_left(b[3]), F.lit(6)).otherwise(F.lit(7)))
    b.update(_best_splits_level(feat, lvl3_nid, (4, 5, 6, 7)))

    def leaf_col():
        def walk(nid: int, depth: int):
            if depth == 3:
                return F.lit(nid)
            return F.when(
                _goes_left(b[nid]), walk(2 * nid, depth + 1)
            ).otherwise(walk(2 * nid + 1, depth + 1))

        return walk(1, 0)

    schema = (
        "node_id bigint, kind string, feature string, threshold bigint, "
        "n bigint, pos bigint, gini_num decimal(38,0), "
        "gini_den decimal(38,0), pred bigint"
    )
    splits = spark.createDataFrame(
        [
            (
                nid,
                "split",
                b[nid]["f"],
                int(b[nid]["v"]),
                int(b[nid]["n"]),
                int(b[nid]["p"]),
                _Dec(b[nid]["gini_num"]),
                _Dec(b[nid]["gini_den"]),
                None,
            )
            for nid in sorted(b)
        ],
        schema,
    )
    leaves = (
        feat.groupBy(leaf_col().cast("bigint").alias("node_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
        .select(
            "node_id",
            F.lit("leaf").alias("kind"),
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("bigint").alias("threshold"),
            "n",
            "pos",
            F.lit(None).cast("decimal(38,0)").alias("gini_num"),
            F.lit(None).cast("decimal(38,0)").alias("gini_den"),
            F.when(2 * F.col("pos") > F.col("n"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("pred"),
        )
    )
    return splits.unionByName(leaves)


def _leaf_id3_sql() -> str:
    """The heap leaf id (8-15) of row alias ``t`` under best1..best7."""

    def walk(nid: int, depth: int) -> str:
        if depth == 3:
            return str(nid)
        return (
            f"CASE WHEN {_side(f'b{nid}', '<=')} "
            f"THEN {walk(2 * nid, depth + 1)} "
            f"ELSE {walk(2 * nid + 1, depth + 1)} END"
        )

    return walk(1, 0)


def _cart3_oracle_sql() -> str:
    """The depth-3 unrolled growth: 7 node scans, 6 child partitions,
    one leaf aggregate, all chained CTEs."""
    parts = [f"WITH feat AS MATERIALIZED ({_FEAT_SQL}\n)"]
    parts.append(_node_scan_sql(1, "feat"))
    node_name = {1: "feat"}
    for nid in (2, 3, 4, 5, 6, 7):
        parent = nid // 2
        cmp = "<=" if nid % 2 == 0 else ">"
        node_name[nid] = f"node{nid}"
        parts.append(
            f"""node{nid} AS (
  SELECT t.x1, t.x2, t.y FROM {node_name[parent]} t
  CROSS JOIN best{parent} b WHERE {_side('b', cmp)}
)"""
        )
        parts.append(_node_scan_sql(nid, f"node{nid}"))
    parts.append(
        f"""leaves AS (
  SELECT {_leaf_id3_sql()} AS node_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(t.y) AS BIGINT) AS pos
  FROM feat t CROSS JOIN best1 b1 CROSS JOIN best2 b2
  CROSS JOIN best3 b3 CROSS JOIN best4 b4 CROSS JOIN best5 b5
  CROSS JOIN best6 b6 CROSS JOIN best7 b7
  GROUP BY 1
)"""
    )
    selects = [
        f"""SELECT CAST({nid} AS BIGINT) AS node_id, 'split' AS kind,
       f AS feature, v AS threshold, n, p AS pos, gini_num, gini_den,
       CAST(NULL AS BIGINT) AS pred
FROM best{nid}"""
        for nid in range(1, 8)
    ]
    selects.append(
        """SELECT CAST(node_id AS BIGINT), 'leaf', CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), n, pos, CAST(NULL AS DECIMAL(38,0)),
       CAST(NULL AS DECIMAL(38,0)),
       CAST(CASE WHEN 2 * pos > n THEN 1 ELSE 0 END AS BIGINT)
FROM leaves"""
    )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\n"


CART3_ORACLE = _cart3_oracle_sql()


# ---------------------------------------------------------------------------
# Held-out evaluation (the EVAL member — the recsys_als_heldout_sse /
# roc_auc_logistic_score symmetry applied to the tree)
# ---------------------------------------------------------------------------

CART_EVAL_FOLDS = 5  # deterministic md5 fold on o_orderkey: 0 = test

_FOLD_SPARK = (
    "pmod(conv(substring(md5(cast(o_orderkey AS STRING)), 1, 8), 16, 10), "
    f"{CART_EVAL_FOLDS})"
)
_FOLD_DUCK = (
    "(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) "
    f"% {CART_EVAL_FOLDS})"
)


def cart_heldout_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the depth-2 CART on the md5 TRAIN fold of orders (fold ≠ 0
    of CART_EVAL_FOLDS on o_orderkey) and score the UNSEEN test fold
    through the grown tree: each test row routes to its leaf, takes
    the TRAIN leaf's majority class, and the result rolls up to the
    held-out confusion matrix (y_true, pred, n_orders) — ≤ 4 rows,
    all exact BIGINT counts.  The leaf predictions stay IN-PLAN (the
    4-row train-leaf aggregate broadcast-joins the routed test rows);
    only the 3 split rows are ever collected."""
    orders = io.load(spark, sf_dir, "orders")
    folded = orders.select(
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("x1"),
        F.month("o_orderdate").cast("bigint").alias("x2"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("bigint")
        .alias("y"),
        F.expr(_FOLD_SPARK).cast("bigint").alias("fold"),
    ).localCheckpoint(eager=False)
    train = folded.filter(F.col("fold") != 0).drop("fold")
    test = folded.filter(F.col("fold") == 0).drop("fold")
    b1, b2, b3 = _grow(train)
    leaves = train.groupBy(
        _leaf_id(b1, b2, b3).cast("bigint").alias("node_id")
    ).agg(
        F.when(2 * F.sum("y") > F.count(F.lit(1)), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pred")
    )
    routed = test.select(
        "y", _leaf_id(b1, b2, b3).cast("bigint").alias("node_id")
    )
    return (
        routed.join(F.broadcast(leaves), "node_id")
        .groupBy(F.col("y").alias("y_true"), "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


CART_HELDOUT_ORACLE = (
    _growth_sql(
        f"""featall AS MATERIALIZED (
  SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS x1,
         CAST(month(o_orderdate) AS BIGINT) AS x2,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         {_FOLD_DUCK} AS fold
  FROM orders
),
feat AS (SELECT x1, x2, y FROM featall WHERE fold <> 0),
te AS (SELECT x1, x2, y FROM featall WHERE fold = 0)"""
    )
    + f""",
lp AS (
  SELECT node_id,
         CAST(CASE WHEN 2 * pos > n THEN 1 ELSE 0 END AS BIGINT) AS pred
  FROM leaves
),
routed AS (
  -- materialize the leaf id BEFORE the lp join: mixing comma joins
  -- with a JOIN..ON that references them is implicit-lateral syntax
  -- only some parsers accept (ADVICE r14 low)
  SELECT t.y, {_LEAF_ID_SQL} AS node_id
  FROM te t CROSS JOIN best1 b1 CROSS JOIN best2 b2 CROSS JOIN best3 b3
)
SELECT r.y AS y_true, lp.pred,
       CAST(count(*) AS BIGINT) AS n_orders
FROM routed r JOIN lp ON lp.node_id = r.node_id
GROUP BY 1, 2
"""
)
