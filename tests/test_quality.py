"""Confusion-matrix quality scores on hand-computable frames."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.quality import (
    classification_scores,
    confusion_matrix,
    per_label_scores,
)


@pytest.fixture
def scored(spark):
    # tp=2 fp=1 fn=1 tn=3 (actual, predicted)
    rows = [(1, 1), (1, 1), (0, 1), (1, 0), (0, 0), (0, 0), (0, 0)]
    return spark.createDataFrame(rows, ["churn", "churn_prediction"])


def test_confusion_matrix(scored):
    r = confusion_matrix(scored).first()
    assert (r["tp"], r["fp"], r["fn"], r["tn"], r["n"]) == (2, 1, 1, 3, 7)


def test_classification_scores(scored):
    m = {r["metric_name"]: r["value"] for r in classification_scores(scored).collect()}
    assert m["accuracy"] == pytest.approx(5 / 7)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["f1score"] == pytest.approx(2 / 3)


def test_per_label_scores_transpose(scored):
    m = {r["metric_name"]: r["value"] for r in per_label_scores(scored).collect()}
    # label 1 == positive-class scores
    assert m["precisionbylabel_1"] == pytest.approx(2 / 3)
    assert m["recallbylabel_1"] == pytest.approx(2 / 3)
    # label 0: precision = tn/(tn+fn) = 3/4, recall = tn/(tn+fp) = 3/4
    assert m["precisionbylabel_0"] == pytest.approx(3 / 4)
    assert m["recallbylabel_0"] == pytest.approx(3 / 4)
    assert m["f1bylabel_0"] == pytest.approx(3 / 4)


def test_degenerate_all_negative_predictions(spark):
    df = spark.createDataFrame([(1, 0), (0, 0)], ["churn", "churn_prediction"])
    m = {r["metric_name"]: r["value"] for r in classification_scores(df).collect()}
    # zero-division → 0.0 (sklearn zero_division=0 semantics)
    assert m["precision"] == 0.0
    assert m["recall"] == 0.0
    assert m["f1score"] == 0.0
    assert m["accuracy"] == 0.5
