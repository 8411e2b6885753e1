"""HITS (hubs & authorities) over a directed / bipartite edge list.

Third member of the iterative-graph family (components, pagerank,
hits — the reference's engine has no iteration at all: its one job is
a single map→shuffle→reduce pass, mr/coordinator.go:120-140).
Kleinberg's HITS ("Authoritative sources in a hyperlinked
environment", JACM 1999) is the directed complement of PageRank: a
node is a good HUB if it points at good authorities, a good AUTHORITY
if good hubs point at it. On a bipartite interaction graph
(customer→part, user→document) this is the classic co-HITS
recommendation primitive: authority = items endorsed by broad
customers, hub = customers whose baskets concentrate on endorsed
items.

Cross-engine determinism (the pagerank.py discipline): the whole
power iteration runs in exact integer micro-units. Scores are BIGINT
in 1e-6 units on the hot aggregate path (DECIMAL(38) only inside the
tiny per-node normalize product); each half-round is an integer-sum
aggregate followed by max-normalization via integer division
((1e6·s) div max_s — max-norm is the standard alternative to the L2
norm and keeps the fixpoint direction identical). No floating point
exists anywhere in the loop, so a fixed iteration count is
bit-identical at any parallelism and in any engine — the registered
query carries a full unrolled-CTE DuckDB hash oracle.

Scale notes (100 TB posture, mirrors pagerank.py):
- the edge list is cached pre-partitioned once per join side; every
  round reuses the two shuffle layouts;
- the per-round max is a 1-row aggregate crossJoin-broadcast — it
  stays INSIDE the plan (no driver-side collect in the loop);
- fixed iteration count, scores localCheckpoint'ed per round — no
  lineage stacking, zero driver decisions in the loop;
- integer sums are order-independent, so AQE/skew-split re-plans
  cannot change the result.

Retention note (ADVICE r16): the lazily-checkpointed frames created
here (the deduped edge list, the per-half-round raw sums) are NOT
unpersisted before return — the consuming action runs after this
function returns (the query-builder contract), so no caller boundary
exists inside it. The blocks are score/edge-sized, bounded per query,
and evicted LRU by the block manager; a long-lived session that wants
them gone eagerly can unpersist the returned frame's lineage or cycle
the session. The explicit persist() layers (e_src/e_dst) ARE released
before return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hits"]

_UNIT = 1_000_000


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Run ``iters`` HITS rounds on the directed edge list.

    One round is: authority(d) = Σ_{s→d} hub(s), max-normalized to
    1e6; then hub(s) = Σ_{s→d} authority(d), max-normalized to 1e6.
    Hubs start at 1e6. Returns the union frame
    ``(node_type ∈ {'hub','auth'}, node_id, score_u)`` with scores in
    exact integer micro-units (max node of each side scores exactly
    1e6). Nodes absent from ``edges`` are absent from the output.
    """
    # Scores are BIGINT micro-units on the hot aggregate path (sum ≤
    # 1e6·max_degree, so bigint is safe while max_degree < 9e12); the
    # normalize expression alone widens to DECIMAL(38) for the 1e6·s
    # product (safe while max_degree < 1e6 even in bigint, unbounded
    # in decimal). Same integers either way — the r9 tuning measured
    # DECIMAL sums as the single largest cost (14.8 s → 11 s at
    # sf0.1 after this + the raw-frame checkpoint below).
    norm = f"CAST((CAST({_UNIT} AS DECIMAL(38,0)) * s) div m AS BIGINT)"
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    # Materialize the deduped edge list ONCE before deriving the two
    # layouts: each persist() below triggers its own materialization
    # job, and without the checkpoint both jobs re-ran the full
    # upstream join + distinct (optimization r16, guide §1.2 — jobs do
    # not share un-materialized subplans).
    e = e.localCheckpoint(eager=False)
    # Two cached layouts, one per join direction: irrelevant while the
    # score side broadcasts (fixture scale), load-bearing at the scale
    # where it doesn't — the SMJ then reuses the edge layout instead
    # of re-exchanging the full edge list every half-round.
    e_src = e.repartition("src").persist()
    e_dst = e.repartition("dst").persist()
    hub = e_src.select("src").distinct().select(
        "src", F.lit(_UNIT).cast("bigint").alias("hu")
    ).localCheckpoint()
    auth = None
    for it in range(iters):
        # the raw sums are referenced TWICE (max branch + normalize
        # branch): without the checkpoint the join+agg would run twice
        # per half-round (measured — the other half of the r9 tuning)
        a_raw = (
            e_src.join(hub, "src")
            .groupBy("dst")
            .agg(F.sum("hu").alias("s"))
            .localCheckpoint(eager=False)
        )
        a_max = a_raw.agg(F.max("s").alias("m"))
        auth = a_raw.crossJoin(F.broadcast(a_max)).select(
            "dst", F.expr(norm).alias("au")
        )
        h_raw = (
            e_dst.join(auth.withColumnRenamed("au", "hu"), "dst")
            .groupBy("src")
            .agg(F.sum("hu").alias("s"))
            .localCheckpoint(eager=False)
        )
        h_max = h_raw.agg(F.max("s").alias("m"))
        hub = h_raw.crossJoin(F.broadcast(h_max)).select(
            "src", F.expr(norm).alias("hu")
        )
        # eager hub checkpoint every 2 rounds (round-10 sweep, the
        # pagerank-cadence method applied per VERDICT r9 #2, measured
        # at sf0.1: per-half-round-only lazy checkpoints 8.8-10.6 s,
        # score cadence 1 → 6.3-6.7 s, cadence 2 → 6.3-6.6 s, cadence
        # 3 → 6.0-7.0 s, no cadence with unhinted max 7.5-19.8 s
        # (unstable: the chained 2-joins-per-half-round plan stacks).
        # Cadence 2 picked as the stable optimum; like pagerank, the
        # bounded lineage also caps lost-partition recompute at
        # cluster scale. Placement is semantics-free (pure integer
        # plan — sweep hashes all agreed).
        if checkpoint_every and it != iters - 1 and (
            it % checkpoint_every == checkpoint_every - 1
        ):
            hub = hub.localCheckpoint()
    e_src.unpersist()
    e_dst.unpersist()
    return hub.select(
        F.lit("hub").alias("node_type"),
        F.col("src").alias("node_id"),
        F.col("hu").cast("bigint").alias("score_u"),
    ).unionByName(
        auth.select(
            F.lit("auth").alias("node_type"),
            F.col("dst").alias("node_id"),
            F.col("au").cast("bigint").alias("score_u"),
        )
    )


def hits_oracle_sql(edge_cte: str, iters: int = 5) -> str:
    """Unrolled DuckDB replay of :func:`hits` (the pagerank oracle
    discipline): ``edge_cte`` must define a relation ``e(src, dst)``
    (already distinct). Every round is the identical integer-sum +
    integer-division max-normalization, so the replay hashes
    bit-exactly against the Spark plan."""
    # Every *r stage is referenced TWICE (the normalize join and its
    # max scalar subquery): without MATERIALIZED, DuckDB inlines CTEs,
    # so the reference fan-out compounds exponentially across rounds —
    # 5 unrolled rounds hang. MATERIALIZED pins each stage to one
    # evaluation (the CTE analogue of the Spark plan's localCheckpoint).
    parts = [
        edge_cte,
        "h0 AS MATERIALIZED (SELECT DISTINCT src,"
        " CAST(1000000 AS HUGEINT) AS hu FROM e)",
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts.append(
            f"a{i}r AS MATERIALIZED (SELECT e.dst, SUM({prev_h}.hu) AS s "
            f"FROM e JOIN {prev_h} USING (src) GROUP BY e.dst)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT dst,"
            f" (1000000 * s) // (SELECT max(s) FROM a{i}r)"
            f" AS au FROM a{i}r)"
        )
        parts.append(
            f"h{i}r AS MATERIALIZED (SELECT e.src, SUM(a{i}.au) AS s "
            f"FROM e JOIN a{i} USING (dst) GROUP BY e.src)"
        )
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT src,"
            f" (1000000 * s) // (SELECT max(s) FROM h{i}r)"
            f" AS hu FROM h{i}r)"
        )
        prev_h = f"h{i}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT 'hub' AS node_type, src AS node_id, CAST(hu AS BIGINT) AS score_u
FROM h{iters}
UNION ALL
SELECT 'auth', dst, CAST(au AS BIGINT) FROM a{iters}
"""
    )
