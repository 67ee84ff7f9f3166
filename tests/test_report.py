"""HTML dashboard renderer: panel inventory parity with the reference
Grafana dashboard (churn-model-evaluation.json) over a real
monitoring_run metrics store."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.report import (
    render_dashboard_html,
)
from churn_model_evaluation_platform_spark.plans.pipeline import monitoring_run


def _metrics(spark):
    ref = spark.range(0, 300).select(
        (F.col("id") % 100).cast("double").alias("value"),
        (F.col("id") % 2).cast("int").alias("churn"),
        (F.col("id") % 2).cast("int").alias("churn_prediction"),
    )
    cur = ref.withColumn("value", F.col("value") * 10 + 500)
    res = monitoring_run(
        cur, ref.select("value"), ["value"], alert_sink=lambda s, m: None
    )
    return res.metrics


def test_dashboard_panels_and_table(spark, tmp_path):
    doc = render_dashboard_html(
        _metrics(spark), path=str(tmp_path / "report.html")
    )
    # section headers mirror the dashboard's three text panels
    assert "Latest Prediction Scores" in doc
    assert "Drift Summary Metrics" in doc
    assert "Metric Drift p-Values" in doc
    # stat tiles for all 4 scores with a status word (never color alone)
    for t in ("F1 Score", "Precision", "Recall", "Accuracy"):
        assert t in doc
    assert ("good" in doc) or ("warning" in doc) or ("critical" in doc)
    # per-column p-value panel with the 0.05 threshold rule
    assert "value (KS p-value)" in doc and "p=0.05" in doc
    # accessibility: table view present with the raw rows
    assert "Table view" in doc and "valuedrift_value" in doc
    # self-contained file written
    assert (tmp_path / "report.html").read_text().startswith("<!DOCTYPE html>")


def test_status_thresholds_follow_dashboard():
    from churn_model_evaluation_platform_spark.operators.report import _status_of

    assert _status_of(0.9)[0] == "good"
    assert _status_of(0.7)[0] == "good"
    assert _status_of(0.69)[0] == "warning"
    assert _status_of(0.5)[0] == "warning"
    assert _status_of(0.49)[0] == "critical"


def test_flat_series_renders(spark):
    # constant metric (vmax == vmin) must not divide by zero
    m = spark.createDataFrame(
        [("f1score", 0.8, "2024-01-01"), ("f1score", 0.8, "2024-01-02")],
        ["metric_name", "value", "created_at"],
    )
    doc = render_dashboard_html(m)
    assert "F1 Score" in doc
