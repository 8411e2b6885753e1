"""Boosted depth-1 stumps — the ENSEMBLE member of the trained-model
family (r14 verdict #1; CART = single tree, logistic = GLM, NB =
generative, kmeans = centroidal, BPE = tokenizer, ALS =
factorization).

``BOOST_ROUNDS`` = 3 rounds of boosting-by-integer-reweighting over
the CART split machinery (operators/cart.py:_best_split with a weight
column — each round is ONE weighted value-grain cumsum + argmin, one
collected row): round t selects the argmin weighted-Gini stump on the
current integer weights, its two leaves vote ±1 (weighted majority,
ties → −1, mirroring the CART leaf ties → 0 convention), and every
misclassified row's weight multiplies by ``BOOST_K`` = 3.  The final
classifier is the SIGN of the 3-stump ±1 vote sum (odd count — never
0), exactly the shape the r14 verdict prescribed: integer weights so
the full trajectory replays in the unrolled-CTE oracle, leaves = ±1
votes, classifier = sign of the integer vote sum.

Target choice (honesty note): the synthetic fixture has NO
cross-column signal (priority, price, dates, and lineitem counts are
mutually independent — measured corr ≈ −0.014), so no natural label
admits boosting lift.  The label here is the MID-PRICE BAND indicator
y = [3 ≤ FLOOR(o_totalprice/30000) ≤ 7] — an interval of the price
feature, the canonical target a single threshold stump provably
CANNOT express (one cut ⇒ one side constant) while a 3-stump vote
can (two cuts + a constant corrector).  On the fixture the single
stump reads ~0.82 train accuracy and the boosted trio reads 1.0 at
every SF, so the "ensemble beats its first stump" contract is real
and pinned in tests/test_boost.py.  As everywhere in the trained
band, the gate grades the BOOSTING ALGEBRA — weighted split scan,
integer reweight trajectory, vote sum — not the data.

Cross-engine exactness: weights are exact integers (w ∈ {1, 3, 9}
after ≤ 2 updates), so every weighted count is BIGINT and the argmin
key is cart.py's two-term int64-division form — bit-identical in
Spark and DuckDB, (feature, threshold) tiebreak, loud
``_EXACT_KEY_MAX_N`` guard on the WEIGHTED node total (w ≤ 9 ⇒ raw
rows ≤ ~6.7e8 per fit at the guard; partition/sample beyond).
Exactly 3 rows are ever collected (one per round); the confusion
rollup and every weight update stay in-plan.

At 100 TB: each round's melt is map-side at (feature, value) grain
(≤ ~30 rows on this grid — the bounded-histogram posture), the
weight update is a map-only projection against a 1-row broadcast
(the collected stump), and driver traffic is O(rounds).

Reference parity: the reference engine (mr/worker.go MapReduce) has
no model training; this extends SURVEY.md §2C's trained-model band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.operators.cart import _best_split

BOOST_ROUNDS = 3
BOOST_K = 3  # integer weight multiplier for misclassified rows


def _boost_feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer feature frame: x1 = fine price bucket, x2 = order
    month, y = mid-price-band indicator (module docstring)."""
    orders = io.load(spark, sf_dir, "orders")
    x1 = F.floor(F.col("o_totalprice") / 30000).cast("bigint")
    return orders.select(
        x1.alias("x1"),
        F.month("o_orderdate").cast("bigint").alias("x2"),
        x1.between(3, 7).cast("bigint").alias("y"),
    ).localCheckpoint(eager=False)


def _stump_votes(b: Row) -> tuple[int, int]:
    """±1 leaf votes of a collected weighted-best-split row: weighted
    majority per side, ties → −1."""
    n, p = int(b["n"]), int(b["p"])
    n_le, p_le = int(b["n_le"]), int(b["pos_le"])
    v_left = 1 if 2 * p_le > n_le else -1
    v_right = 1 if 2 * (p - p_le) > (n - n_le) else -1
    return v_left, v_right


def _h(b: Row, v_left: int, v_right: int):
    """The stump's ±1 prediction column for feature row columns."""
    side = F.col(b["f"]) <= F.lit(int(b["v"]))
    return F.when(side, F.lit(v_left)).otherwise(F.lit(v_right))


def _fit_stumps(train: DataFrame) -> list[tuple[Row, int, int]]:
    """The 3-round boosting loop on a (x1, x2, y) frame: per round
    one weighted argmin scan (1 collected row), votes derived from
    that same row, misclassified weights ×K in-plan."""
    df = train.withColumn("w", F.lit(1).cast("bigint"))
    stumps: list[tuple[Row, int, int]] = []
    for t in range(BOOST_ROUNDS):
        b = _best_split(df, wcol="w")
        v_left, v_right = _stump_votes(b)
        stumps.append((b, v_left, v_right))
        if t == BOOST_ROUNDS - 1:
            # no reweight after the final round: the frame would never
            # be scanned, and building it anyway both wasted a plan
            # node and made the docstring's "w ∈ {1,3,9}" hold only
            # for scanned frames (ADVICE r15 low)
            break
        wrong = _h(b, v_left, v_right) != (2 * F.col("y") - 1)
        df = df.withColumn(
            "w",
            F.when(wrong, F.col("w") * F.lit(BOOST_K)).otherwise(
                F.col("w")
            ),
        ).localCheckpoint(eager=False)
    return stumps


def boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the 3-round boosted stumps and return one table: 3 stump
    rows (round, feature, threshold, weighted totals, ±1 votes) plus
    the ≤4-row UNWEIGHTED training confusion matrix of the final
    sign-of-vote-sum classifier."""
    feat = _boost_feat(spark, sf_dir)
    stumps = _fit_stumps(feat)

    schema = (
        "round bigint, kind string, feature string, threshold bigint, "
        "w_n bigint, w_pos bigint, vote_left bigint, vote_right bigint, "
        "y_true bigint, pred bigint, n_orders bigint"
    )
    stump_rows = spark.createDataFrame(
        [
            (
                t + 1,
                "stump",
                b["f"],
                int(b["v"]),
                int(b["n"]),
                int(b["p"]),
                vl,
                vr,
                None,
                None,
                None,
            )
            for t, (b, vl, vr) in enumerate(stumps)
        ],
        schema,
    )
    vote_sum = sum(
        (_h(b, vl, vr) for b, vl, vr in stumps), F.lit(0)
    )
    confusion = (
        feat.select(
            "y",
            F.when(vote_sum > 0, F.lit(1)).otherwise(F.lit(0)).alias("pred"),
        )
        .groupBy("y", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            F.lit(None).cast("bigint").alias("round"),
            F.lit("confusion").alias("kind"),
            F.lit(None).cast("string").alias("feature"),
            F.lit(None).cast("bigint").alias("threshold"),
            F.lit(None).cast("bigint").alias("w_n"),
            F.lit(None).cast("bigint").alias("w_pos"),
            F.lit(None).cast("bigint").alias("vote_left"),
            F.lit(None).cast("bigint").alias("vote_right"),
            F.col("y").cast("bigint").alias("y_true"),
            F.col("pred").cast("bigint").alias("pred"),
            "n_orders",
        )
    )
    return stump_rows.unionByName(confusion)


# ---------------------------------------------------------------------------
# DuckDB oracle: the unrolled boosting trajectory
# ---------------------------------------------------------------------------

_BOOST_FEAT_SQL = """
  SELECT CAST(FLOOR(o_totalprice / 30000) AS BIGINT) AS x1,
         CAST(month(o_orderdate) AS BIGINT) AS x2,
         CASE WHEN FLOOR(o_totalprice / 30000) BETWEEN 3 AND 7
              THEN 1 ELSE 0 END AS y,
         CAST(1 AS BIGINT) AS w
  FROM orders"""

# cart.py's two-term argmin key over the WEIGHTED cumsums (same
# int64-product CASTs: DuckDB raises exactly where Spark's guard does)
_WKEY_SQL = (
    "CAST(CAST(pos_le * (n_le - pos_le) AS BIGINT) AS DOUBLE)"
    " / CAST(n_le AS DOUBLE)"
    " + CAST(CAST((p - pos_le) * ((n - n_le) - (p - pos_le)) AS BIGINT)"
    " AS DOUBLE) / CAST(n - n_le AS DOUBLE)"
)


def _wscan_sql(k: int, node: str) -> str:
    """Weighted per-round stump scan + ±1 leaf votes: melt{k}, bv{k},
    cum{k}, tot{k}, vote{k} — identical algebra to _best_split(wcol)
    + _stump_votes."""
    return f"""melt{k} AS (
  SELECT 'x1' AS f, x1 AS v, y, w FROM {node}
  UNION ALL
  SELECT 'x2' AS f, x2 AS v, y, w FROM {node}
),
bv{k} AS (
  SELECT f, v, CAST(SUM(w) AS BIGINT) AS cnt,
         CAST(SUM(w * y) AS BIGINT) AS pos
  FROM melt{k} GROUP BY f, v
),
cum{k} AS (
  SELECT f, v,
         SUM(cnt) OVER (PARTITION BY f ORDER BY v) AS n_le,
         SUM(pos) OVER (PARTITION BY f ORDER BY v) AS pos_le
  FROM bv{k}
),
tot{k} AS (
  SELECT CAST(SUM(w) AS BIGINT) AS n, CAST(SUM(w * y) AS BIGINT) AS p
  FROM {node}
),
vote{k} AS (
  SELECT f, CAST(v AS BIGINT) AS v, n, p,
         CAST(n_le AS BIGINT) AS n_le, CAST(pos_le AS BIGINT) AS pos_le,
         CASE WHEN 2 * pos_le > n_le THEN 1 ELSE -1 END AS v_left,
         CASE WHEN 2 * (p - pos_le) > (n - n_le) THEN 1 ELSE -1 END
           AS v_right
  FROM cum{k} CROSS JOIN tot{k}
  WHERE n_le < n
  ORDER BY {_WKEY_SQL}, f, v
  LIMIT 1
)"""


def _h_sql(b: str) -> str:
    """The ±1 stump prediction of vote-row alias ``b`` for feature
    row alias ``t``."""
    return (
        f"CASE WHEN (CASE WHEN {b}.f = 'x1' THEN t.x1 ELSE t.x2 END)"
        f" <= {b}.v THEN {b}.v_left ELSE {b}.v_right END"
    )


def _reweight_sql(k: int, node: str) -> str:
    """feat{k+1}: the integer weight update after round k."""
    return f"""feat{k + 1} AS (
  SELECT t.x1, t.x2, t.y,
         t.w * CASE WHEN {_h_sql("b")} <> 2 * t.y - 1
                    THEN {BOOST_K} ELSE 1 END AS w
  FROM {node} t CROSS JOIN vote{k} b
)"""


BOOST_ORACLE = (
    f"WITH feat1 AS MATERIALIZED ({_BOOST_FEAT_SQL}\n),\n"
    + _wscan_sql(1, "feat1")
    + ",\n"
    + _reweight_sql(1, "feat1")
    + ",\n"
    + _wscan_sql(2, "feat2")
    + ",\n"
    + _reweight_sql(2, "feat2")
    + ",\n"
    + _wscan_sql(3, "feat3")
    + f""",
scored AS (
  SELECT t.y,
         {_h_sql("b1")} + {_h_sql("b2")} + {_h_sql("b3")} AS s
  FROM feat1 t CROSS JOIN vote1 b1 CROSS JOIN vote2 b2 CROSS JOIN vote3 b3
),
conf AS (
  SELECT y AS y_true, CASE WHEN s > 0 THEN 1 ELSE 0 END AS pred,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM scored GROUP BY 1, 2
)
SELECT CAST(1 AS BIGINT) AS round, 'stump' AS kind, f AS feature,
       v AS threshold, n AS w_n, p AS w_pos,
       CAST(v_left AS BIGINT) AS vote_left,
       CAST(v_right AS BIGINT) AS vote_right,
       CAST(NULL AS BIGINT) AS y_true, CAST(NULL AS BIGINT) AS pred,
       CAST(NULL AS BIGINT) AS n_orders
FROM vote1
UNION ALL
SELECT CAST(2 AS BIGINT), 'stump', f, v, n, p,
       CAST(v_left AS BIGINT), CAST(v_right AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM vote2
UNION ALL
SELECT CAST(3 AS BIGINT), 'stump', f, v, n, p,
       CAST(v_left AS BIGINT), CAST(v_right AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
FROM vote3
UNION ALL
SELECT CAST(NULL AS BIGINT), 'confusion', CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(y_true AS BIGINT), CAST(pred AS BIGINT), n_orders
FROM conf
"""
)


# ---------------------------------------------------------------------------
# Held-out evaluation (fit/EVAL symmetry — the cart_heldout_confusion /
# recsys_als_heldout_sse discipline applied to the ensemble)
# ---------------------------------------------------------------------------


def boosted_heldout_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fit the 3 boosted stumps on the md5 TRAIN fold of orders
    (cart.py's CART_EVAL_FOLDS fold on o_orderkey, fold 0 = test) and
    score the UNSEEN test fold with the sign of the 3-stump vote sum,
    rolled up to the held-out confusion matrix (y_true, pred,
    n_orders) — ≤ 4 rows, exact BIGINT counts.  The stump literals
    are the 3 collected fit rows; test scoring is a pure map-side
    projection (no per-row driver work)."""
    from tda596_lab02mapreduce_spark.operators.cart import _FOLD_SPARK

    orders = io.load(spark, sf_dir, "orders")
    x1 = F.floor(F.col("o_totalprice") / 30000).cast("bigint")
    folded = orders.select(
        x1.alias("x1"),
        F.month("o_orderdate").cast("bigint").alias("x2"),
        x1.between(3, 7).cast("bigint").alias("y"),
        F.expr(_FOLD_SPARK).cast("bigint").alias("fold"),
    ).localCheckpoint(eager=False)
    train = folded.filter(F.col("fold") != 0).drop("fold")
    test = folded.filter(F.col("fold") == 0).drop("fold")
    stumps = _fit_stumps(train)
    vote_sum = sum((_h(b, vl, vr) for b, vl, vr in stumps), F.lit(0))
    return (
        test.select(
            F.col("y").alias("y_true"),
            F.when(vote_sum > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("pred"),
        )
        .groupBy("y_true", "pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


def _boost_heldout_oracle_sql() -> str:
    from tda596_lab02mapreduce_spark.operators.cart import _FOLD_DUCK

    return (
        f"""WITH featall AS MATERIALIZED (
  SELECT CAST(FLOOR(o_totalprice / 30000) AS BIGINT) AS x1,
         CAST(month(o_orderdate) AS BIGINT) AS x2,
         CASE WHEN FLOOR(o_totalprice / 30000) BETWEEN 3 AND 7
              THEN 1 ELSE 0 END AS y,
         {_FOLD_DUCK} AS fold
  FROM orders
),
feat1 AS (
  SELECT x1, x2, y, CAST(1 AS BIGINT) AS w FROM featall WHERE fold <> 0
),
te AS (SELECT x1, x2, y FROM featall WHERE fold = 0),
"""
        + _wscan_sql(1, "feat1")
        + ",\n"
        + _reweight_sql(1, "feat1")
        + ",\n"
        + _wscan_sql(2, "feat2")
        + ",\n"
        + _reweight_sql(2, "feat2")
        + ",\n"
        + _wscan_sql(3, "feat3")
        + f""",
scored AS (
  SELECT t.y,
         {_h_sql("b1")} + {_h_sql("b2")} + {_h_sql("b3")} AS s
  FROM te t CROSS JOIN vote1 b1 CROSS JOIN vote2 b2 CROSS JOIN vote3 b3
)
SELECT y AS y_true,
       CAST(CASE WHEN s > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred,
       CAST(count(*) AS BIGINT) AS n_orders
FROM scored GROUP BY 1, 2
"""
    )


BOOST_HELDOUT_ORACLE = _boost_heldout_oracle_sql()
