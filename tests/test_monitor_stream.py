"""Turnkey monitoring_stream: good drops produce metrics, invalid drops
route to errored/ with an audit line and never stall the stream."""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from churn_model_evaluation_platform_spark.sources.lifecycle import read_log
from churn_model_evaluation_platform_spark.streaming.monitor import monitoring_stream

COLS = ["a", "b"]
SCHEMA = StructType(
    [StructField(c, DoubleType()) for c in COLS]
    + [StructField("churn", IntegerType())]
)


def _write_good(path, rng, n=120):
    lines = ["a,b,churn"]
    for _ in range(n):
        x, y = rng.uniform(0, 10), rng.uniform(0, 10)
        lines.append(f"{x},{y},{int(x + y > 10)}")
    path.write_text("\n".join(lines))


def test_monitoring_stream_routes_and_monitors(spark, tmp_path):
    rng = random.Random(31)
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    _write_good(input_dir / "good.csv", rng)
    # the "bad" drop MISSES column b in its real header — the declared
    # stream schema would mask this, so the wrapper checks the file header
    (input_dir / "bad.csv").write_text("a,churn\n1.0,0\n")

    reference = spark.createDataFrame(
        [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(120)],
        "a double, b double",
    )
    alerts: list[str] = []
    metrics_path = str(tmp_path / "metrics")
    errored = str(tmp_path / "errored")

    q = monitoring_stream(
        spark,
        str(input_dir),
        SCHEMA,
        reference,
        COLS,
        score_fn=lambda b: b.withColumn(
            "churn_prediction", (F.col("a") + F.col("b") > 10).cast("int")
        ),
        metrics_path=metrics_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
        errored_dir=errored,
        alert_sink=lambda s, m: alerts.append(s),
    )
    q.awaitTermination(300)

    # good drop produced one metrics set
    metrics = spark.read.parquet(metrics_path)
    names = {r["metric_name"] for r in metrics.collect()}
    assert {"f1score", "valuedrift_a", "driftedcolumnscount[share]"} <= names

    # bad drop routed to errored/ with an audit line + alert
    assert os.path.isdir(errored)
    log = read_log(spark, f"{errored}/_logs/bad.csv.log")
    assert len(log) == 1 and "expected structure" in log[0].lower()
    assert "Invalid input file" in alerts


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill/restart semantics (the reference's move-to-folder state
    machine equivalence, churn_prediction_pipeline.py:642-680): a
    restart from the same checkpoint must not re-score already-consumed
    drops — each file contributes its metric set exactly once."""
    rng = random.Random(7)
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    _write_good(input_dir / "drop1.csv", rng)

    reference = spark.createDataFrame(
        [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(120)],
        "a double, b double",
    )
    metrics_path = str(tmp_path / "metrics")
    kwargs = dict(
        schema=SCHEMA,
        reference=reference,
        feature_cols=COLS,
        score_fn=lambda b: b.withColumn(
            "churn_prediction", (F.col("a") + F.col("b") > 10).cast("int")
        ),
        metrics_path=metrics_path,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    q1 = monitoring_stream(spark, str(input_dir), **kwargs)
    q1.awaitTermination(300)  # availableNow: consumes drop1 then stops

    metrics = spark.read.parquet(metrics_path)
    assert metrics.where(F.col("metric_name") == "f1score").count() == 1

    # stream is down; a second file drops; restart from the checkpoint
    _write_good(input_dir / "drop2.csv", rng)
    q2 = monitoring_stream(spark, str(input_dir), **kwargs)
    q2.awaitTermination(300)

    metrics = spark.read.parquet(metrics_path)
    # exactly one metric set per file: drop1 NOT reprocessed after restart
    assert metrics.where(F.col("metric_name") == "f1score").count() == 2

    # idempotent restart with nothing new: no further appends
    q3 = monitoring_stream(spark, str(input_dir), **kwargs)
    q3.awaitTermination(300)
    metrics = spark.read.parquet(metrics_path)
    assert metrics.where(F.col("metric_name") == "f1score").count() == 2
