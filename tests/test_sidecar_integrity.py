"""Sidecar integrity spot-checks (VERDICT r16 next-round #8).

The kmeans / pca / IVF / PQ serve queries read committed `.models/`
sidecars keyed on the fixture dir (fit-once/serve-many, documented in
their registrations). That contract is only honest while the committed
sidecar EQUALS what a refit from the fixture produces — a stale
sidecar once slipped through in r15. Each test here refits the model
from the sf0.001 fixture (into a THROWAWAY model dir, so the committed
sidecar is never rewritten by the test) and asserts field-for-field
equality with the committed artifact. NB already self-checks via
``refit=True`` in its own tests; these four extend the spot-check to
the remaining sidecar families.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture
def tmp_model_dir(tmp_path, monkeypatch):
    """Redirect sidecar writes of the refit to a throwaway dir AFTER
    the committed model has been loaded (the committed load happens
    inside each test before this is applied via ``redirect``)."""

    def redirect():
        monkeypatch.setenv("SPARK_GRAFT_MODEL_DIR", str(tmp_path))

    return redirect


def test_kmeans_sidecar_matches_refit(spark, tmp_model_dir):
    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.operators import kmeans as km

    emb = io.load(spark, SF, "embeddings")
    committed = km.kmeans_fit(emb, dataset_key=SF)
    tmp_model_dir()
    km._KMEANS_MODEL_CACHE.clear()
    refit = km.kmeans_fit(emb, dataset_key=SF, refit=True)
    assert refit == committed
    km._KMEANS_MODEL_CACHE.clear()


def test_pca_sidecar_matches_refit(spark, tmp_model_dir):
    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.operators import pca as pc

    emb = io.load(spark, SF, "embeddings")
    committed = pc.pca_fit(emb, dataset_key=SF)
    tmp_model_dir()
    pc._PCA_MODEL_CACHE.clear()
    refit = pc.pca_fit(emb, dataset_key=SF, refit=True)
    assert refit == committed
    pc._PCA_MODEL_CACHE.clear()


def test_ivf_sidecar_matches_refit(spark, tmp_model_dir):
    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.operators import similarity as sim

    emb = io.load(spark, SF, "embeddings")
    committed = sim.ivf_fit(
        emb, n_cells=8, kmeans_iters=3, train_fraction=0.2, dataset_key=SF
    )
    tmp_model_dir()
    sim._IVF_MODEL_CACHE.clear()
    refit = sim.ivf_fit(
        emb,
        n_cells=8,
        kmeans_iters=3,
        train_fraction=0.2,
        dataset_key=SF,
        refit=True,
    )
    assert [list(map(float, c)) for _, c in refit] == [
        list(map(float, c)) for _, c in committed
    ]
    assert [c for c, _ in refit] == [c for c, _ in committed]
    sim._IVF_MODEL_CACHE.clear()


def test_pq_sidecar_matches_refit(spark, tmp_model_dir):
    from tda596_lab02mapreduce_spark import io
    from tda596_lab02mapreduce_spark.operators import similarity as sim

    emb = io.load(spark, SF, "embeddings")
    committed = sim.pq_fit(
        emb, m=16, k=16, iters=8, n_train=4096, dataset_key=SF
    )
    tmp_model_dir()
    sim._PQ_MODEL_CACHE.clear()
    refit = sim.pq_fit(
        emb, m=16, k=16, iters=8, n_train=4096, dataset_key=SF, refit=True
    )
    assert refit == committed
    sim._PQ_MODEL_CACHE.clear()
