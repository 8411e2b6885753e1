"""Similarity search over embedding columns (SURVEY.md §2C).

Two paths:
- brute-force cosine top-k: correctness baseline. The query set is
  broadcast (never corpus×corpus); per-query top-k via window. Cost
  O(|corpus|·|queries|) — fine when queries are bounded.
- LSH (random-hyperplane) bucketed top-k: the scale path. Corpus is
  sign-bucketed once (row-local signature), probing only matching
  buckets; recall traded via number of hyperplanes / probe distance.

Hyperplanes are deterministic pseudo-random vectors derived from
xxhash64(seed, dim-index) — reproducible across runs without shipping
any state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tda596_lab02mapreduce_spark.functions.vector import cosine_sim


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors per query row.

    Returns (query_id, neighbor_id, cosine, nbr_rank). Self-matches
    are excluded. Deterministic tiebreak on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("__qvec"), F.col("__cvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("nbr_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("nbr_rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> F.Column:
    """Deterministic pseudo-random hyperplane as an array<double> column
    expression: component j = centered xxhash64(plane_idx, j)."""
    return F.array(
        *[
            (
                (F.xxhash64(F.lit(plane_idx), F.lit(j)) % 10007).cast("double") / 10007.0
            )
            for j in range(dim)
        ]
    )


def lsh_bucket(vec_col: F.Column, dim: int, n_planes: int, *, table: int = 0) -> F.Column:
    """Random-hyperplane signature: n_planes sign bits packed into a
    long. Row-local; one pass over the vector per plane. ``table``
    selects an independent hyperplane family."""
    v = vec_col.cast("array<double>")
    bits = []
    for p in range(n_planes):
        h = _hyperplane(dim, table * 1009 + p)
        d = F.aggregate(
            F.zip_with(v, h, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate cosine top-k with OR-construction: n_tables
    independent hyperplane tables; a corpus row is a candidate if it
    shares a bucket with the query in ANY table (explode tables →
    equi-join on (table, bucket) → dedup → score). Recall rises with
    n_tables at linear candidate cost — the standard LSH tradeoff.
    Same output shape as brute_force_topk; recall measured in tests."""

    def with_buckets(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.col(vecc),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            lsh_bucket(
                                F.col(vecc), dim, n_planes, table=t
                            ).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("tb"),
        ).select(F.col(idc), F.col(vecc), "tb.tbl", "tb.bucket")

    q = with_buckets(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
        ),
        "query_id",
        "__qvec",
    )
    c = with_buckets(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
        ),
        "neighbor_id",
        "__cvec",
    )
    candidates = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__qvec", "__cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        cosine_sim(F.col("__qvec"), F.col("__cvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("nbr_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("nbr_rank") <= k)
    )
