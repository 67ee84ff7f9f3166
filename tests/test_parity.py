"""Model-quality parity on the reference's own data (VERDICT r1 #1).

The reference publishes holdout precision/recall/F1 = 0.92/0.81/0.86
for its Optuna-tuned XGBoost on customer_churn_0.csv
(churn_model_training.ipynb cell 19).  The engine's GBT path will not
match bit-for-bit (GBT != XGB, randomSplit != sklearn split), so the
contract is a floor: P >= 0.85, R >= 0.75, F1 >= 0.80.  Actuals at the
pinned defaults: P 0.885 / R 0.92 / F1 0.902 (2026-08-13).
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

FLOORS = {"precision": 0.85, "recall": 0.75, "f1score": 0.80}


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
