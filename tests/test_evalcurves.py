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


def test_calibration_curve_bins(spark):
    rows = [(1, 0.95), (0, 0.92), (1, 0.55), (0, 0.52), (0, 0.05), (1, 1.0)]
    df = spark.createDataFrame(rows, ["churn", "proba"])
    from churn_model_evaluation_platform_spark.operators.evalcurves import (
        calibration_curve,
    )

    by_bin = {r["bin"]: r for r in calibration_curve(df).collect()}
    assert set(by_bin) == {9, 5, 0}  # score 1.0 closes into the top bin
    assert by_bin[9]["n"] == 3
    assert by_bin[9]["fraction_positive"] == pytest.approx(2 / 3)
    assert by_bin[9]["mean_predicted"] == pytest.approx((0.95 + 0.92 + 1.0) / 3)
    assert by_bin[5]["fraction_positive"] == pytest.approx(0.5)
    assert by_bin[0]["fraction_positive"] == 0.0


def test_lift_curve_two_buckets(spark):
    # 4 rows, 2 buckets: top half captures both positives
    rows = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
    df = spark.createDataFrame(rows, ["churn", "proba"])
    from churn_model_evaluation_platform_spark.operators.evalcurves import (
        lift_curve,
    )

    out = {r["bucket"]: r for r in lift_curve(df, n_buckets=2).collect()}
    assert set(out) == {1, 2}
    assert out[1]["positives"] == 2 and out[1]["n"] == 2
    assert out[1]["gain"] == pytest.approx(1.0)  # all positives in top half
    assert out[1]["lift"] == pytest.approx(2.0)  # 100% rate vs 50% base
    assert out[2]["gain"] == pytest.approx(1.0)
    assert out[2]["lift"] == pytest.approx(1.0)  # whole population
