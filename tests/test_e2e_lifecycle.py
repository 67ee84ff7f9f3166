"""Whole-lifecycle end-to-end: train → register → promote → fetch by
alias → score a file-drop stream → metrics store + alerts.

This is the reference's full deployment story in one test
(churn_model_training.py train/promote + churn_prediction_pipeline
fetch_model/scoring/monitoring), running entirely on the engine's
local surfaces: ml/training, ml/registry.LocalModelRegistry,
streaming/monitor.monitoring_stream."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.ml.registry import LocalModelRegistry
from churn_model_evaluation_platform_spark.ml.training import (
    TrainedModel,
    fit_pipeline,
    predict,
    train_test_split,
)
from churn_model_evaluation_platform_spark.schema import NUMERICAL_COLUMNS
from churn_model_evaluation_platform_spark.streaming.monitor import (
    monitoring_stream,
)


@pytest.mark.slow
def test_full_lifecycle(spark, tmp_path):
    rng = random.Random(17)

    # -- 1. train on a learnable synthetic frame --------------------------
    rows = []
    for _ in range(300):
        feats = [rng.uniform(0, 10) for _ in NUMERICAL_COLUMNS]
        rows.append(tuple(feats) + (int(feats[0] + feats[1] > 10),))
    df = spark.createDataFrame(rows, NUMERICAL_COLUMNS + ["churn"])
    train, holdout = train_test_split(df)
    tm = fit_pipeline(train, val_df=holdout, max_iter=10, max_depth=3)

    # -- 2. register + promote ------------------------------------------
    reg = LocalModelRegistry(spark, str(tmp_path / "registry"))
    version = reg.register(
        tm.model,
        "churn_model",
        calibrator=tm.calibrator,
        threshold=tm.threshold,
        feature_cols=tm.feature_cols,
        reference_df=train.select(*NUMERICAL_COLUMNS),
    )
    reg.set_alias("churn_model", "production", version)

    # -- 3. fetch by alias (a fresh consumer, like the pipeline would) ---
    model, calibrator, meta = reg.load("churn_model", alias="production")
    fetched = TrainedModel(
        model, calibrator, meta["threshold"], 0.0, meta["feature_cols"]
    )
    reference = reg.load_reference("churn_model", version)

    # -- 4. drop a CSV and run the monitoring stream ---------------------
    input_dir = tmp_path / "drops"
    input_dir.mkdir()
    lines = [",".join(NUMERICAL_COLUMNS)]
    for _ in range(80):
        lines.append(",".join(f"{rng.uniform(0, 10):.4f}" for _ in NUMERICAL_COLUMNS))
    (input_dir / "batch1.csv").write_text("\n".join(lines))

    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType([StructField(c, DoubleType()) for c in NUMERICAL_COLUMNS])
    alerts: list[str] = []
    metrics_path = str(tmp_path / "metrics")

    def score_fn(batch):
        scored = predict(fetched, batch)
        # no ground truth in a scoring drop: the reference monitors
        # prediction quality against the prediction itself only for
        # drift; supply predicted as actual so quality metrics compute
        return scored.withColumn("churn", F.col("churn_prediction"))

    q = monitoring_stream(
        spark,
        str(input_dir),
        schema,
        reference,
        NUMERICAL_COLUMNS,
        score_fn=score_fn,
        metrics_path=metrics_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        alert_sink=lambda s, m: alerts.append(s),
    )
    q.awaitTermination(300)

    # -- 5. metrics landed; drift vs the attached baseline computed ------
    metrics = spark.read.parquet(metrics_path)
    names = {r["metric_name"] for r in metrics.collect()}
    assert "f1score" in names
    assert any(n.startswith("valuedrift_") for n in names)
    # same-distribution drop: the drift-share alert must NOT fire
    assert "Data drift detected" not in alerts
