"""Model-quality parity on the reference's own data (VERDICT r1 #1).

The reference publishes holdout precision/recall/F1 = 0.92/0.81/0.86
for its Optuna-tuned XGBoost on customer_churn_0.csv
(churn_model_training.ipynb cell 19).  The engine's GBT path will not
match bit-for-bit (GBT != XGB, randomSplit != sklearn split), so the
contract is a floor: P >= 0.90, R >= 0.75, F1 >= 0.86 (raised from
0.85/0.75/0.80 in r8 when threshold selection gained the validation
precision-SLO constraint, VERDICT r7 #5).  Actuals at the pinned
defaults: P 0.92 / R 0.92 / F1 0.92 (2026-08-14) — published precision
matched exactly.
"""

from __future__ import annotations

import os

import pytest

from churn_model_evaluation_platform_spark.ml.parity import (
    PUBLISHED,
    REFERENCE_CHURN_CSV,
    load_reference_churn,
    train_eval_reference,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CHURN_CSV),
    reason="reference churn CSV not present",
)

FLOORS = {"precision": 0.90, "recall": 0.75, "f1score": 0.86}


def test_load_reference_churn_shape(spark):
    df = load_reference_churn(spark)
    assert df.count() == 1050  # customer_churn_0.csv is 1050 rows + header
    assert df.columns[-1] == "churn"
    assert len(df.columns) == 12  # 11 features + target
    assert df.schema["churn"].dataType.simpleString() == "int"


def test_holdout_scores_meet_floor(spark):
    scores = train_eval_reference(spark)
    for metric, floor in FLOORS.items():
        assert scores[metric] >= floor, (
            f"{metric} {scores[metric]:.4f} below floor {floor} "
            f"(published {PUBLISHED[metric]})"
        )
    # the tuned threshold must come from the validation slice and be a
    # real probability cut, not a degenerate end of the grid
    assert 0.1 <= scores["threshold"] <= 0.9


def test_tune_threshold_precision_floor(spark):
    # Synthetic probas where unconstrained F1 picks a low threshold
    # (high recall, P=0.6) but the floor forces the high-precision cut;
    # an unreachable floor falls back to the unconstrained pick.
    from churn_model_evaluation_platform_spark.ml.training import tune_threshold

    rows = (
        [(0.95, 1)] * 6            # confident true churners
        + [(0.30, 1)] * 4          # churners only a low cut catches
        + [(0.30, 0)] * 6          # ...at the cost of these FPs
        + [(0.05, 0)] * 10
    )
    df = spark.createDataFrame(rows, "proba double, churn int")
    t_free, _ = tune_threshold(df)
    t_floor, _ = tune_threshold(df, precision_floor=0.9)
    assert t_free <= 0.3            # unconstrained: recall-heavy cut
    assert t_floor > 0.3            # floor: only the confident slice
    t_fallback, _ = tune_threshold(df, precision_floor=1.01)  # unreachable
    assert t_fallback == t_free
