"""DBSCAN semantics (operators/dbscan.py).

The hash gate (dbscan_embedding_clusters vs the brute-force +
WITH RECURSIVE oracle) proves grid blocking is lossless on the
fixture; these pin the semantics on constructed geometry — the star
shape (isolated core, borders), the two-blob separation, the noise
gate — and the fixture's non-degeneracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.operators.dbscan import (
    EPS_Q,
    MINPTS,
    Q_SCALE,
    dbscan_roles,
)


def _emb(spark, pts):
    """Build an embeddings-shaped frame from integer-quantized 2-D
    points (xq, yq) — inverse of the query's quantization."""
    rows = [
        (i, [xq / Q_SCALE + 1e-9, yq / Q_SCALE + 1e-9])
        for i, (xq, yq) in enumerate(pts)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_star_isolated_core_and_borders(spark):
    """A center with 4 leaves at distance 0.9*eps on the axes: each
    leaf-leaf distance is >= sqrt(2)*0.9*eps > eps, so a leaf sees only
    itself + the center (2 < minPts) -> border, while the center sees 5
    -> core. No core-core edge exists, so the center is the
    ISOLATED-core singleton path — its cluster is its own id, and every
    leaf inherits it."""
    r = (EPS_Q * 9) // 10
    pts = [(0, 0), (r, 0), (-r, 0), (0, r), (0, -r)]
    out = {x["vec_id"]: (x["role"], x["cluster_id"])
           for x in dbscan_roles(_emb(spark, pts)).collect()}
    assert out[0] == ("core", 0)
    for i in range(1, 5):
        assert out[i] == ("border", 0)


def test_two_blobs_separate_and_noise(spark):
    """Two 5-point tight blobs farther apart than eps never merge; a
    lone far point is noise."""
    far = 10 * EPS_Q
    blob_a = [(dx, 0) for dx in range(0, 5 * (EPS_Q // 8), EPS_Q // 8)]
    blob_b = [(far + dx, 0) for dx in range(0, 5 * (EPS_Q // 8), EPS_Q // 8)]
    lone = [(5 * far, 5 * far)]
    out = dbscan_roles(_emb(spark, blob_a + blob_b + lone)).collect()
    roles = {r["vec_id"]: r["role"] for r in out}
    clusters = {r["vec_id"]: r["cluster_id"] for r in out}
    assert roles[10] == "noise" and clusters[10] == -1
    a_ids = {clusters[i] for i in range(5)}
    b_ids = {clusters[i] for i in range(5, 10)}
    assert a_ids == {0} and b_ids == {5}  # min-id labels, never merged


def test_fixture_nondegenerate(spark, sf_correctness):
    emb = io.load(spark, sf_correctness, "embeddings")
    out = dbscan_roles(emb)
    stats = {r["role"]: r["n"] for r in
             out.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert stats["core"] > 0 and stats["border"] > 0 and stats["noise"] > 0
    n_clusters = (
        out.filter(F.col("role") == "core")
        .select("cluster_id").distinct().count()
    )
    assert n_clusters >= 2  # real multi-cluster structure, not one blob
    # total coverage: every point labelled exactly once
    assert sum(stats.values()) == emb.count()


def test_minpts_gate(spark):
    """minPts-1 mutually-close points are ALL noise (no core forms)."""
    pts = [(i * (EPS_Q // 10), 0) for i in range(MINPTS - 1)]
    out = dbscan_roles(_emb(spark, pts)).collect()
    assert {r["role"] for r in out} == {"noise"}
