"""k-fold CV semantics (statml.py:cv_logistic_fold_accuracy).

The hash gate replays all five GD trajectories; these pin the CV
protocol itself — folds partition the data, each fold's model is a
genuinely different training (weights differ across folds), and the
per-fold accuracy is consistent with the full-data model's ballpark
(the folds see 80% of the same synthetic data)."""

from __future__ import annotations

from tda596_lab02mapreduce_spark import io
from tda596_lab02mapreduce_spark.queries.statml import (
    _CV_FOLDS,
    cv_logistic_fold_accuracy,
)


def test_cv_folds_partition_and_models_differ(spark, sf_correctness):
    rows = cv_logistic_fold_accuracy(spark, sf_correctness).collect()
    assert len(rows) == _CV_FOLDS
    assert sorted(int(r["fold"]) for r in rows) == list(range(_CV_FOLDS))
    # folds partition the orders table: test sizes sum to every row
    n_orders = io.load(spark, sf_correctness, "orders").count()
    assert sum(int(r["n_test"]) for r in rows) == n_orders
    # each fold is a real split (~1/5 each, within 3 sigma)
    for r in rows:
        assert abs(int(r["n_test"]) - n_orders / _CV_FOLDS) < 4 * (
            n_orders**0.5
        )
    # genuinely distinct trainings: the weight triples are not all equal
    weights = {(r["w0_us"], r["w1_us"], r["w2_us"]) for r in rows}
    assert len(weights) >= 2
    # accuracy is a real number in (0, 1), never degenerate 0 or 1
    for r in rows:
        acc = int(r["n_correct"]) / int(r["n_test"])
        assert 0.3 < acc < 0.9
