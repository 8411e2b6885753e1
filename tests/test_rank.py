"""functions/rank.py — the distributed exact rank/cumsum/ntile that
replaced the single-partition WindowExec family (VERDICT r7 "what's
wrong" #1).  Contract: bit-identical results to the partition-less
window formulation, at ANY partition count, with ZERO partition-less
WindowExec nodes in the plan."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tda596_lab02mapreduce_spark import plans
from tda596_lab02mapreduce_spark.functions.rank import (
    global_ntile,
    global_rank_cumsum,
    small_df_rank,
)
from tda596_lab02mapreduce_spark.registry import get


def _skewed_df(spark, n=20011):
    # non-uniform key distribution (quadratic clustering) so range
    # partitions are unevenly sized — the offsets must still be exact
    return spark.range(n).select(
        ((F.col("id") * F.col("id")) % 977).alias("v"),
        F.col("id").alias("k"),
        (F.col("id") % 7 + 1).alias("c"),
    )


def test_global_rank_cumsum_matches_window(spark):
    df = _skewed_df(spark)
    got = (
        global_rank_cumsum(
            df, [F.col("v").desc(), "k"], [("cum_c", "c")], rank_col="r"
        )
        .orderBy("r")
        .collect()
    )
    w = Window.orderBy(F.col("v").desc(), "k")
    exp = (
        df.select(
            "v",
            "k",
            F.row_number().over(w).alias("r"),
            F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
                "cum_c"
            ),
        )
        .orderBy("r")
        .collect()
    )
    assert [(g.v, g.k, g.r, g.cum_c) for g in got] == [
        (e.v, e.k, e.r, e.cum_c) for e in exp
    ]


def test_global_rank_partition_count_invariance(spark):
    """Exactness cannot depend on the partition count — 1, 5, and 64
    range partitions must produce identical ranks (64 > row-groups,
    so empty partitions are exercised too)."""
    df = _skewed_df(spark, n=997)
    base = None
    for n_parts in (1, 5, 64):
        rows = sorted(
            (r.v, r.k, r.r)
            for r in global_rank_cumsum(
                df, ["v", "k"], rank_col="r", num_partitions=n_parts
            ).collect()
        )
        if base is None:
            base = rows
        else:
            assert rows == base, f"rank drift at num_partitions={n_parts}"


def test_global_ntile_matches_builtin(spark):
    df = _skewed_df(spark, n=5003)
    for k in (4, 16, 10007):  # 10007 > n: every row its own bucket
        got = {
            (r.v, r.k): r.b
            for r in global_ntile(df, ["v", "k"], k, bucket_col="b").collect()
        }
        exp = {
            (r.v, r.k): r.b
            for r in df.select(
                "v", "k", F.ntile(k).over(Window.orderBy("v", "k")).alias("b")
            ).collect()
        }
        assert got == exp, f"ntile({k}) mismatch"


def test_global_rank_plan_is_distributed(spark):
    """The point of the helper: no partition-less WindowExec, and the
    heavy path goes through a rangepartitioning exchange."""
    df = _skewed_df(spark)
    out = global_rank_cumsum(df, ["v", "k"], [("cum_c", "c")])
    assert plans.partitionless_window_count(out) == 0
    plan = str(out._jdf.queryExecution().executedPlan())
    # the range shuffle is pinned behind the localCheckpoint (its
    # ExistingRDD scan IS the evidence it ran exactly once); the local
    # window repartitions by the partition id, never globally
    assert "Scan ExistingRDD" in plan
    assert "hashpartitioning(__rank_pid" in plan


def test_small_df_rank_matches_window(spark):
    df = spark.createDataFrame(
        [("b", 3), ("a", 3), ("c", 1), ("d", 9), ("e", 1)], "w string, c int"
    )
    got = {
        (r.w, r.c): r.rnk
        for r in small_df_rank(df, [("c", "desc"), ("w", "asc")]).collect()
    }
    exp = {
        (r.w, r.c): r.rnk
        for r in df.select(
            "w",
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "w"))
            .cast("bigint")
            .alias("rnk"),
        ).collect()
    }
    assert got == exp
    assert plans.partitionless_window_count(
        small_df_rank(df, [("c", "desc"), ("w", "asc")])
    ) == 0


def test_rewired_queries_have_no_partitionless_windows(spark, sf_correctness):
    """The full round-8 rewire set: every query the r7 verdict flagged
    as perf-weak (plus the bench-path and bounded-frame conversions)
    now plans zero partition-less WindowExec nodes."""
    for name in [
        "histogram_equidepth_price",
        "pareto_revenue_concentration",
        "gini_revenue_concentration",
        "ks_value_drift",
        "psi_value_drift_qbins",
        "zipf_token_fit",
        "vocab_encode_topk",
        "bpe_top_merges",
        "approx_topk_tokens",
        "window_distribution",
        "stats_chi2_type_hour",
        "benford_first_digit",
        "rollup_share_of_parent",
        "mutual_information_type_hour",
        "psi_value_drift",
    ]:
        df = get(name).spark_fn(spark, sf_correctness)
        n = plans.partitionless_window_count(df)
        assert n == 0, f"{name}: {n} partition-less windows"


def test_grouped_rank_cumsum_matches_keyed_window(spark):
    """Per-group distributed ranks must equal the ordinary keyed
    window bit-for-bit — including on skewed group sizes."""
    from tda596_lab02mapreduce_spark.functions.rank import grouped_rank_cumsum

    df = spark.range(6007).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 131) % 1009).alias("v"),
        F.col("id").alias("k"),
        (F.col("id") % 5 + 1).alias("c"),
    ).filter((F.col("g") != "2") | (F.col("id") < 500))  # skewed groups
    got = {
        (r.g, r.v, r.k): (r.r, r.cum_c)
        for r in grouped_rank_cumsum(
            df, ["g"], ["v", "k"], [("cum_c", "c")], rank_col="r"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "k")
    exp = {
        (r.g, r.v, r.k): (r.r, r.cum_c)
        for r in df.select(
            "g",
            "v",
            "k",
            F.row_number().over(w).cast("bigint").alias("r"),
            F.sum("c")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum_c"),
        ).collect()
    }
    assert got == exp


def test_bucketed_fast_path_matches_sampled_path(spark):
    """bucket_expr (deterministic monotone buckets) must produce the
    identical ranks/cumsums as the sampled-range path — exercised with
    an intentionally unbalanced stripe width so several buckets are
    empty and several hold many rows."""
    from tda596_lab02mapreduce_spark.functions.rank import grouped_rank_cumsum

    df = spark.range(3001).select(
        (F.col("id") % 2).alias("g"),
        ((F.col("id") * F.col("id")) % 977).alias("v"),
        F.col("id").alias("k"),
        F.lit(1).alias("c"),
    )
    kw = dict(rank_col="r")
    a = grouped_rank_cumsum(df, ["g"], ["v", "k"], [("cum", "c")], **kw)
    b = grouped_rank_cumsum(
        df,
        ["g"],
        ["v", "k"],
        [("cum", "c")],
        bucket_expr=F.floor(F.col("v") / F.lit(100)),
        **kw,
    )
    ra = sorted((r.g, r.v, r.k, r.r, r.cum) for r in a.collect())
    rb = sorted((r.g, r.v, r.k, r.r, r.cum) for r in b.collect())
    assert ra == rb
    from tda596_lab02mapreduce_spark import plans

    assert plans.partitionless_window_count(b) == 0


def test_signed_summand_cumsum_exact(spark):
    """Running sums of SIGNED summands (sweep-line ±1 deltas) must be
    exact: the per-partition total is the prefix at the LAST row, not
    the max prefix — with alternating signs the two differ on every
    partition, so this pins the max_by form on both paths."""
    from tda596_lab02mapreduce_spark.functions.rank import global_rank_cumsum

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        # +1/-1 alternating with a drift so prefixes dip negative
        F.when(F.col("id") % 3 == 0, -1).otherwise(1).alias("d"),
    )
    expected = []
    acc = 0
    for i in range(n):
        acc += -1 if i % 3 == 0 else 1
        expected.append((i, acc))
    for kwargs in (
        {},
        {"bucket_expr": F.floor(F.col("k") / F.lit(97))},
    ):
        out = global_rank_cumsum(
            df, ["k"], [("cum", "d")], rank_col="r", **kwargs
        )
        got = sorted((r.k, r.cum) for r in out.collect())
        assert got == expected, f"signed cumsum wrong for {kwargs or 'sampled'}"
