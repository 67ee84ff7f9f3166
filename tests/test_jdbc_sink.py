"""JDBC metrics sink against embedded Derby (ships in Spark's jars):
create-if-absent DDL, append, and retry idempotency — the live-database
behaviors of churn_prediction_pipeline.py:529-530,628-636 that parquet
tests can't cover."""

from __future__ import annotations

import datetime

import pytest

from churn_model_evaluation_platform_spark.operators.metrics import (
    append_metrics_jdbc,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/metricsdb;create=true"
    props = {"driver": DRIVER}
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
    except Exception:
        pytest.skip("embedded Derby driver not on the classpath")
    return url, props


def _metrics(spark, names, ts):
    rows = [
        (n, float(i) / 10, datetime.datetime(2026, 1, 1, 12, 0, ts))
        for i, n in enumerate(names)
    ]
    return spark.createDataFrame(
        rows, "metric_name string, value double, created_at timestamp"
    )


def test_append_creates_table_and_roundtrips(spark, derby):
    url, props = derby
    df = _metrics(spark, ["accuracy", "f1score"], ts=1)
    append_metrics_jdbc(df, url, "drift_metrics_plain", props)
    back = spark.read.jdbc(url, "drift_metrics_plain", properties=props)
    assert back.count() == 2
    got = {r["metric_name"]: r["value"] for r in back.collect()}
    assert got == {"accuracy": 0.0, "f1score": 0.1}
    # second append accumulates (plain append has no batch key)
    append_metrics_jdbc(df, url, "drift_metrics_plain", props)
    assert spark.read.jdbc(url, "drift_metrics_plain", properties=props).count() == 4


def test_batch_append_is_idempotent_under_retry(spark, derby):
    url, props = derby
    df = _metrics(spark, ["accuracy", "f1score", "recall"], ts=2)
    append_metrics_jdbc(df, url, "drift_metrics_b", props, batch_id=7)
    # a retry of the SAME batch replaces, never duplicates
    append_metrics_jdbc(df, url, "drift_metrics_b", props, batch_id=7)
    append_metrics_jdbc(df, url, "drift_metrics_b", props, batch_id=7)
    back = spark.read.jdbc(url, "drift_metrics_b", properties=props)
    assert back.count() == 3
    # a NEW batch appends
    append_metrics_jdbc(df, url, "drift_metrics_b", props, batch_id=8)
    back = spark.read.jdbc(url, "drift_metrics_b", properties=props)
    assert back.count() == 6
    by_batch = {
        r["batch_id"]: r["cnt"]
        for r in back.groupBy("batch_id").count().withColumnRenamed("count", "cnt").collect()
    }
    assert by_batch == {7: 3, 8: 3}


def test_partial_batch_replaced_on_retry(spark, derby):
    """Simulate a half-written batch: write a 1-row 'partial attempt'
    under batch 9, then 'retry' with the full 3-row frame — the final
    table holds exactly the full frame for that batch."""
    url, props = derby
    partial = _metrics(spark, ["accuracy"], ts=3)
    append_metrics_jdbc(partial, url, "drift_metrics_p", props, batch_id=9)
    full = _metrics(spark, ["accuracy", "f1score", "recall"], ts=3)
    append_metrics_jdbc(full, url, "drift_metrics_p", props, batch_id=9)
    back = spark.read.jdbc(url, "drift_metrics_p", properties=props)
    assert back.count() == 3
    assert {r["metric_name"] for r in back.collect()} == {
        "accuracy",
        "f1score",
        "recall",
    }


def test_streaming_metrics_to_jdbc_exactly_once(spark, derby, tmp_path):
    """monitoring_stream -> JDBC: metrics land keyed by micro-batch id;
    restarting from the checkpoint (and re-running an already-committed
    batch id) never duplicates database rows."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    from churn_model_evaluation_platform_spark.streaming.monitor import (
        monitoring_stream,
    )

    url, props = derby
    rng = random.Random(3)
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    lines = ["a,b,churn"]
    for _ in range(60):
        x, y = rng.uniform(0, 10), rng.uniform(0, 10)
        lines.append(f"{x},{y},{int(x + y > 10)}")
    (input_dir / "d1.csv").write_text("\n".join(lines))

    schema = StructType(
        [StructField(c, DoubleType()) for c in ("a", "b")]
        + [StructField("churn", IntegerType())]
    )
    reference = spark.createDataFrame(
        [(rng.uniform(0, 10), rng.uniform(0, 10)) for _ in range(60)],
        "a double, b double",
    )
    kwargs = dict(
        schema=schema,
        reference=reference,
        feature_cols=["a", "b"],
        score_fn=lambda b: b.withColumn(
            "churn_prediction", (F.col("a") + F.col("b") > 10).cast("int")
        ),
        metrics_path=str(tmp_path / "metrics"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        metrics_jdbc_url=url,
        metrics_jdbc_table="stream_metrics",
        metrics_jdbc_properties=props,
    )

    q = monitoring_stream(spark, str(input_dir), **kwargs)
    q.awaitTermination(300)
    back = spark.read.jdbc(url, "stream_metrics", properties=props)
    n_first = back.count()
    assert n_first > 0

    # restart with nothing new: no duplicate rows
    q2 = monitoring_stream(spark, str(input_dir), **kwargs)
    q2.awaitTermination(300)
    assert spark.read.jdbc(url, "stream_metrics", properties=props).count() == n_first

    # second drop appends under a new batch id
    (input_dir / "d2.csv").write_text("\n".join(lines))
    q3 = monitoring_stream(spark, str(input_dir), **kwargs)
    q3.awaitTermination(300)
    back = spark.read.jdbc(url, "stream_metrics", properties=props)
    assert back.count() == 2 * n_first
    assert back.select("batch_id").distinct().count() == 2
