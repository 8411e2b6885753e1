"""PageRank over an undirected candidate-pair graph.

Second member of the iterative-graph family next to
``operators/components.py`` (same reference gap: the reference's
pipeline has no iteration at all — its one job is a single
map→shuffle→reduce pass, mr/coordinator.go:120-140). Over a near-dup
similarity graph, rank identifies the *hub* documents — templates and
boilerplate sources connected to many near-copies — which is how a
training-data pipeline picks cluster canonicals or flags machine-
generated spam families.

Algorithm (Page et al., "The PageRank Citation Ranking", 1999; the
public power-iteration form): rank'(v) = (1-d) + d * Σ_{u~v}
rank(u)/deg(u), run a FIXED number of rounds — deterministic output,
no float-threshold convergence test for engines to disagree on.

Scale notes (100 TB posture, mirrors components.py):
- the symmetric edge list is cached pre-partitioned on the join key,
  so every round reuses one shuffle layout;
- degrees are computed once and carried WITH the rank rows (joined a
  single time up front), so each round is join+agg, not join+join;
- ranks are ``localCheckpoint``ed per round — no lineage stacking;
- a fixed iteration count means zero driver-side convergence actions
  in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 10,
    damping: float = 0.85,
    id_out: str = "id",
    rank_out: str = "rank",
) -> DataFrame:
    """Rank nodes of an undirected edge list by power iteration.

    Returns one row per node appearing in ``edges`` with its rank
    after ``iters`` rounds (initial rank 1.0; ranks sum to ~|V|).
    Singletons are absent by construction (their rank is the constant
    ``1 - damping``); callers union them back for total coverage.
    Every node present has degree >= 1, so there are no dangling-mass
    corrections to apply.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.repartition("src").persist()

    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (id, deg, rank) rides as one frame: one up-front join, none in the loop.
    state = deg.select(
        F.col("src").alias("id"), "deg", F.lit(1.0).alias("rank")
    ).localCheckpoint()

    for _ in range(iters):
        contribs = (
            sym.join(
                state.select(
                    F.col("id").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("share").alias("in_mass"))
        )
        state = (
            state.select("id", "deg")
            .join(contribs, "id")
            .select(
                "id",
                "deg",
                (F.lit(1.0 - damping) + F.lit(damping) * F.col("in_mass")).alias(
                    "rank"
                ),
            )
            .localCheckpoint()
        )

    sym.unpersist()
    return state.select(F.col("id").alias(id_out), F.col("rank").alias(rank_out))
