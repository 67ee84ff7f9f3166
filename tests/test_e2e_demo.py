"""The README-walkthrough demo (tools/e2e_demo.py) runs end-to-end:
drops → streaming monitoring → partitioned store → dashboard HTML."""

from __future__ import annotations

import importlib.util
import os


def _load_demo():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "e2e_demo.py",
    )
    spec = importlib.util.spec_from_file_location("e2e_demo", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_e2e_demo_walkthrough(spark, tmp_path):
    demo = _load_demo()
    out = str(tmp_path / "demo")
    summary = demo.run_demo(spark, "/root/testdata/sf0.001", out, drops=2)

    # the demo self-asserts the pipeline legs; verify the artifacts from
    # the OUTSIDE too: store partitioned by date, dashboard on disk with
    # the panel inventory, bad drop quarantined.
    assert summary["rows_scored"] > 0
    assert summary["metrics_rows"] >= summary["metric_names"] > 5
    assert summary["partitions"], "metrics store is not date-partitioned"
    html = open(summary["dashboard"]).read()
    assert "Latest Prediction Scores" in html and "Drift" in html
    assert os.path.isdir(os.path.join(out, "errored"))
    # second run over the same checkpoint reprocesses nothing (the store
    # row count is unchanged) — exactly-once across restarts.
    n_before = summary["metrics_rows"]
    q = None
    try:
        from churn_model_evaluation_platform_spark.streaming.monitor import (
            monitoring_stream,
        )
        from pyspark.sql import functions as F
        from pyspark.sql.types import (
            DoubleType,
            IntegerType,
            StructField,
            StructType,
        )

        schema = StructType(
            [StructField(c, DoubleType()) for c in ("value", "user_id")]
            + [StructField("churn", IntegerType())]
        )
        ref = spark.createDataFrame([(1.0, 1.0)], "value double, user_id double")
        q = monitoring_stream(
            spark,
            os.path.join(out, "input"),
            schema,
            ref,
            ["value", "user_id"],
            score_fn=lambda b: b.withColumn("churn_prediction", F.lit(0)),
            metrics_path=os.path.join(out, "metrics"),
            checkpoint_dir=os.path.join(out, "ckpt"),
            partition_metrics_by_date=True,
        )
        q.awaitTermination(300)
    finally:
        if q is not None and q.isActive:
            q.stop()
    assert spark.read.parquet(os.path.join(out, "metrics")).count() == n_before
