"""Gated-dependency tier (VERDICT r7 #9): execute the xgboost / mlflow
branches wherever those packages exist, so the fallbacks' parity claims
stop being untested code. In this sandbox both imports fail and every
test here SKIPS (visible in the -q tally as 's'); a CI image with the
packages installed turns them into recorded green runs with zero code
changes.

The guards these exercise:
- ml/training.py train_gbt: SparkXGBClassifier when importable, MLlib
  GBTClassifier otherwise — this tier proves the xgboost path fits and
  scores on the same frame the fallback is proven on.
- ml/registry.py _require_mlflow: models:/<name>@<alias> transport —
  this tier proves register → alias → spark_udf roundtrips against a
  local file-backed tracking store.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def churn_frame(spark):
    # 200-row deterministic frame, separable on f1.
    return spark.range(200).select(
        (F.col("id") % 10).cast("double").alias("f1"),
        ((F.col("id") * 7) % 13).cast("double").alias("f2"),
        ((F.col("id") % 10) >= 5).cast("int").alias("churn"),
    )


def test_xgb_branch_fits_and_scores(churn_frame):
    pytest.importorskip("xgboost", reason="xgboost not installed")
    from churn_model_evaluation_platform_spark.ml.training import (
        assemble,
        train_gbt,
    )

    model = train_gbt(churn_frame, ["f1", "f2"], max_iter=5)
    # The gated import resolved → the model must BE the xgboost one.
    assert "xgb" in type(model).__name__.lower()
    scored = model.transform(assemble(churn_frame, ["f1", "f2"]))
    preds = scored.select("prediction").distinct().collect()
    assert {int(r["prediction"]) for r in preds} <= {0, 1}
    # Separable data → near-perfect training accuracy.
    acc = scored.where(
        F.col("prediction").cast("int") == F.col("churn")
    ).count() / 200.0
    assert acc >= 0.95


def test_mlflow_transport_roundtrip(spark, tmp_path):
    mlflow = pytest.importorskip("mlflow", reason="mlflow not installed")
    from churn_model_evaluation_platform_spark.ml.registry import (
        fetch_model_udf,
        promote_alias,
    )

    mlflow.set_tracking_uri(f"file://{tmp_path}/mlruns")
    mlflow.set_registry_uri(f"file://{tmp_path}/mlruns")

    import numpy as np
    from sklearn.linear_model import LogisticRegression as SkLR

    X = np.array([[0.0], [1.0], [2.0], [3.0]])
    y = np.array([0, 0, 1, 1])
    sk = SkLR().fit(X, y)
    name = "gated_tier_model"
    with mlflow.start_run():
        mlflow.sklearn.log_model(sk, "model", registered_model_name=name)
    promote_alias(name, 1, "staging")

    udf = fetch_model_udf(spark, name, "staging")
    out = (
        spark.createDataFrame([(0.0,), (3.0,)], "x double")
        .withColumn("pred", udf(F.col("x")))
        .collect()
    )
    assert [int(r["pred"]) for r in out] == [0, 1]
