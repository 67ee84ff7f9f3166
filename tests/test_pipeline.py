"""Flagship monitoring pipeline: metrics completeness + alert routing
(reference flow churn_prediction_pipeline.py:813-905)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.plans.pipeline import monitoring_run


@pytest.fixture
def batches(spark):
    rng = random.Random(13)

    def mk(shift: float, flip: float, shift_b: float = 0.0):
        rows = []
        for _ in range(400):
            a = rng.gauss(0 + shift, 1)
            b = rng.gauss(5 + shift_b, 2)
            actual = 1 if a + rng.gauss(0, 0.3) > 0 else 0
            pred = actual if rng.random() > flip else 1 - actual
            rows.append((a, b, actual, pred))
        return spark.createDataFrame(rows, ["a", "b", "churn", "churn_prediction"])

    return mk


def test_no_drift_good_scores(batches):
    ref = batches(0.0, 0.05)
    cur = batches(0.0, 0.05)
    alerts = []
    res = monitoring_run(
        cur, ref.select("a", "b"), ["a", "b"],
        alert_sink=lambda s, m: alerts.append(s),
    )
    assert res.drifted is False
    assert res.scores_alert is False
    assert alerts == []
    names = {r["metric_name"] for r in res.metrics.collect()}
    assert {
        "accuracy", "precision", "recall", "f1score",
        "f1bylabel_0", "f1bylabel_1",
        "valuedrift_a", "valuedrift_b",
        "driftedcolumnscount[count]", "driftedcolumnscount[share]",
    } <= names
    assert res.metrics.columns == ["metric_name", "value", "created_at"]


def test_drift_alert_fires_when_both_columns_drift(batches):
    ref = batches(0.0, 0.05)
    cur = batches(2.5, 0.05, shift_b=4.0)  # both features shifted
    alerts = []
    res = monitoring_run(
        cur, ref.select("a", "b"), ["a", "b"],
        alert_sink=lambda s, m: alerts.append((s, m)),
    )
    assert res.drifted is True  # share 1.0 > 0.5
    assert res.n_drifted_columns == 2
    assert res.drifted_columns == ["a", "b"]
    assert any("drift" in s.lower() for s, _ in alerts)


def test_drift_share_strictly_greater(batches, spark):
    # exactly half the columns drifted → share == 0.5 → no dataset alert
    ref = batches(0.0, 0.05)
    cur = batches(2.5, 0.05)
    res = monitoring_run(
        cur, ref.select("a", "b"), ["a", "b"], alert_sink=lambda s, m: None
    )
    assert res.n_drifted_columns == 1
    assert res.drifted_columns == ["a"]
    assert res.drifted is False  # 0.5 is NOT > 0.5


def test_score_alert_threshold(batches):
    ref = batches(0.0, 0.05)
    cur = batches(0.0, 0.45)  # ~45% labels flipped → scores < 0.70
    alerts = []
    res = monitoring_run(
        cur, ref.select("a", "b"), ["a", "b"],
        alert_sink=lambda s, m: alerts.append(s),
    )
    assert res.scores_alert is True
    assert any("scores below threshold" in a.lower() for a in alerts)
    assert all(v < 0.70 for _, v in res.failing_scores)
