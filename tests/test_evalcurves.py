"""ROC/PR/AUC evaluation artifacts: closed-form small cases."""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.evalcurves import (
    auc_roc,
    roc_pr_points,
)


@pytest.fixture
def scored(spark):
    # scores: pos at {0.9, 0.8, 0.4}, neg at {0.8, 0.3, 0.1}
    rows = [
        (1, 0.9),
        (1, 0.8),
        (0, 0.8),
        (1, 0.4),
        (0, 0.3),
        (0, 0.1),
    ]
    return spark.createDataFrame(rows, ["churn", "proba"])


def test_roc_points_sweep(scored):
    pts = {
        r["threshold"]: r for r in roc_pr_points(scored, "churn", "proba").collect()
    }
    assert set(pts) == {0.9, 0.8, 0.4, 0.3, 0.1}
    # threshold 0.9: only the top row predicted positive
    assert (pts[0.9]["tp"], pts[0.9]["fp"]) == (1, 0)
    assert pts[0.9]["precision"] == pytest.approx(1.0)
    # threshold 0.8 (tie: one pos + one neg at 0.8 both included)
    assert (pts[0.8]["tp"], pts[0.8]["fp"]) == (2, 1)
    # lowest threshold: everything predicted positive
    assert (pts[0.1]["tp"], pts[0.1]["fp"]) == (3, 3)
    assert pts[0.1]["tpr"] == pytest.approx(1.0)
    assert pts[0.1]["fpr"] == pytest.approx(1.0)
    # tp + fn and fp + tn are the class totals at every threshold
    for r in pts.values():
        assert r["tp"] + r["fn"] == 3 and r["fp"] + r["tn"] == 3


def test_auc_hand_computed(scored):
    # pairs (pos, neg): 3*3 = 9. Wins: 0.9 beats all three (3);
    # 0.8 ties 0.8 (0.5) and beats 0.3, 0.1 (2); 0.4 beats 0.3, 0.1 (2)
    # → U = 7.5, AUC = 7.5/9.
    auc = auc_roc(scored, "churn", "proba").first()["auc"]
    assert auc == pytest.approx(7.5 / 9)


def test_auc_perfect_and_reversed(spark):
    rows = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
    df = spark.createDataFrame(rows, ["churn", "proba"])
    assert auc_roc(df).first()["auc"] == pytest.approx(1.0)
    flipped = df.selectExpr("1 - churn AS churn", "proba")
    assert auc_roc(flipped).first()["auc"] == pytest.approx(0.0)
