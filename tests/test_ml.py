"""Training-side dataflow: split, stratified folds, GBT + calibration +
threshold tuning on separable synthetic churn-shaped data."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.ml.training import (
    evaluate,
    fit_pipeline,
    predict,
    stratified_folds,
    train_test_split,
    tune_threshold,
)


@pytest.fixture(scope="module")
def churn_data(spark):
    """~16% positive rate like the training file (FIXTURES.md F1),
    separable on two of three features."""
    rng = random.Random(42)
    rows = []
    for _ in range(1050):
        y = 1 if rng.random() < 0.163 else 0
        f1 = rng.gauss(3 if y else 0, 1)
        f2 = rng.gauss(-2 if y else 0, 1)
        f3 = rng.gauss(0, 1)  # noise
        rows.append((f1, f2, f3, y))
    return spark.createDataFrame(rows, ["f1", "f2", "f3", "churn"])


FEATS = ["f1", "f2", "f3"]


def test_train_test_split_sizes(churn_data):
    train, test = train_test_split(churn_data)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 1050
    assert 0.15 < n_test / 1050 < 0.25


def test_stratified_folds_preserve_ratio(churn_data):
    folded = stratified_folds(churn_data, k=3)
    stats = (
        folded.groupBy("fold")
        .agg(F.avg("churn").alias("pos_rate"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(stats) == 3
    overall = churn_data.agg(F.avg("churn")).first()[0]
    for r in stats:
        assert abs(r["pos_rate"] - overall) < 0.01  # ntile stratification
        assert 300 <= r["n"] <= 400


def test_fit_evaluate_quality(churn_data):
    train, test = train_test_split(churn_data)
    tm = fit_pipeline(train, FEATS, max_iter=20)
    assert 0.1 <= tm.threshold <= 0.9
    scores = evaluate(tm, test)
    # separable data → strong scores (reference holdout was P/R/F1
    # 0.92/0.81/0.86 on real churn data, BASELINE.md)
    assert scores["f1score"] > 0.8
    assert scores["accuracy"] > 0.9


def test_predict_output_contract(churn_data):
    tm = fit_pipeline(churn_data, FEATS, max_iter=5)
    out = predict(tm, churn_data)
    assert "churn_prediction" in out.columns
    assert dict(out.dtypes)["churn_prediction"] == "int"
    vals = {r["churn_prediction"] for r in out.select("churn_prediction").distinct().collect()}
    assert vals <= {0, 1}


def test_tune_threshold_grid(spark):
    # perfectly calibrated fake: proba == label noise-free → best t low
    rows = [(0.9, 1)] * 20 + [(0.2, 0)] * 80 + [(0.6, 1)] * 10
    df = spark.createDataFrame(rows, ["proba", "churn"])
    t, f1 = tune_threshold(df)
    assert 0.2 < t <= 0.6
    assert f1 == pytest.approx(1.0)


def test_cross_validate_parallel_matches_serial(spark, churn_like_df=None):
    import random

    from churn_model_evaluation_platform_spark.ml.training import cross_validate_f1
    from churn_model_evaluation_platform_spark.schema import NUMERICAL_COLUMNS

    rng = random.Random(17)
    rows = []
    for _ in range(150):
        feats = [rng.uniform(0, 10) for _ in NUMERICAL_COLUMNS]
        rows.append(tuple(feats) + (int(feats[0] + feats[1] > 10),))
    df = spark.createDataFrame(rows, NUMERICAL_COLUMNS + ["churn"])
    serial = cross_validate_f1(df, k=2, max_iter=5)
    par = cross_validate_f1(df, k=2, parallel=True, max_iter=5)
    assert par == pytest.approx(serial, abs=1e-9)
