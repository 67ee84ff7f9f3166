"""One-command end-to-end demo: CSV file drops → checkpointed streaming
monitoring → partitioned metrics store → static HTML dashboard.

The Spark analog of the reference README's deployment walkthrough
(upload_simulation_script.py drops files to S3 → Lambda/Prefect pipeline
→ Postgres → Grafana): here the drops land in a local input dir, the
pipeline is ``monitoring_stream`` (validate → prepare → score → quality
+ drift → metrics append, exactly-once per file), the store is a
date-partitioned parquet metrics table, and the dashboard is
``render_dashboard_html``'s self-contained 25-panel page.

    python tools/e2e_demo.py [--sf-dir /root/testdata/sf0.1] \
        [--out /tmp/churnspark_demo] [--drops 3]

Prints a one-line JSON summary and writes ``<out>/dashboard.html``.
The demo validates itself: it asserts the good drops produced metrics,
the bad drop routed to errored/ with an audit line + alert, and the
dashboard carries the score/drift panels.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = ["value", "user_id"]


def run_demo(spark, sf_dir: str, out_dir: str, drops: int = 3) -> dict:
    """Execute the full walkthrough; returns a summary dict (also used
    by tests/test_e2e_demo.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from churn_model_evaluation_platform_spark.operators.report import (
        render_dashboard_html,
    )
    from churn_model_evaluation_platform_spark.sources.alerts import (
        file_alert_sink,
        retrying,
    )
    from churn_model_evaluation_platform_spark.sources.lifecycle import read_log
    from churn_model_evaluation_platform_spark.sources.testdata import load_table
    from churn_model_evaluation_platform_spark.streaming.monitor import (
        monitoring_stream,
    )

    shutil.rmtree(out_dir, ignore_errors=True)
    input_dir = os.path.join(out_dir, "input")
    os.makedirs(input_dir)

    # --- 1. simulate the reference's upload script: N CSV drops derived
    # from the events table (value/user_id features, value>50 label),
    # plus ONE invalid drop whose header misses a feature column.
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        F.col("value").cast("double").alias("value"),
        F.col("user_id").cast("double").alias("user_id"),
        (F.col("value") > 50).cast("int").alias("churn"),
    )
    n_rows = 0
    for i in range(drops):
        pdf = (
            ev.where(F.col("event_id") % drops == i)
            .select(*FEATURES, "churn")
            .toPandas()
        )
        n_rows += len(pdf)
        pdf.to_csv(os.path.join(input_dir, f"drop_{i}.csv"), index=False)
    with open(os.path.join(input_dir, "bad_drop.csv"), "w") as f:
        f.write("value,churn\n1.0,0\n")  # user_id missing → must route

    # --- 2. the reference slice (training snapshot analog): click events.
    reference = (
        load_table(spark, "events", sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("value").cast("double").alias("value"),
            F.col("user_id").cast("double").alias("user_id"),
        )
    )

    # --- 3. one call deploys the whole flow over the drop dir.
    schema = StructType(
        [StructField(c, DoubleType()) for c in FEATURES]
        + [StructField("churn", IntegerType())]
    )
    metrics_path = os.path.join(out_dir, "metrics")
    errored_dir = os.path.join(out_dir, "errored")
    alert_log = os.path.join(out_dir, "alerts.log")
    q = monitoring_stream(
        spark,
        input_dir,
        schema,
        reference,
        FEATURES,
        # deterministic stand-in for registry-model scoring (the demo is
        # about the dataflow; swap in LocalModelRegistry.load + predict)
        score_fn=lambda b: b.withColumn(
            "churn_prediction",
            ((F.col("value") + F.col("user_id") % 7) > 50).cast("int"),
        ),
        metrics_path=metrics_path,
        checkpoint_dir=os.path.join(out_dir, "ckpt"),
        errored_dir=errored_dir,
        alert_sink=retrying(file_alert_sink(alert_log)),
        partition_metrics_by_date=True,  # the 100 TB store layout
    )
    q.awaitTermination(600)

    # --- 4. store → dashboard (the Grafana analog).
    metrics = spark.read.parquet(metrics_path)
    dashboard_path = os.path.join(out_dir, "dashboard.html")
    html = render_dashboard_html(metrics, path=dashboard_path)

    # --- 5. self-check: every leg of the walkthrough actually happened.
    def check(ok: bool, msg: str) -> None:
        # RuntimeError, not assert: the CLI's self-validation must survive
        # `python -O` (asserts are stripped under optimization).
        if not ok:
            raise RuntimeError(f"e2e demo self-check failed: {msg}")

    names = {r["metric_name"] for r in metrics.select("metric_name").distinct().collect()}
    expected = {"f1score", "valuedrift_value", "driftedcolumnscount[share]"}
    check(expected <= names, f"metrics store missing {expected - names}")
    audit = read_log(spark, f"{errored_dir}/_logs/bad_drop.csv.log")
    check(bool(audit), "bad drop produced no audit line")
    check(os.path.exists(alert_log), "alert transport never fired")
    for marker in ("Latest Prediction Scores", "F1 Score", "Drift"):
        check(marker in html, f"dashboard missing panel marker {marker!r}")

    return {
        "drops": drops,
        "rows_scored": n_rows,
        "metrics_rows": metrics.count(),
        "metric_names": len(names),
        "partitions": sorted(
            d for d in os.listdir(metrics_path) if d.startswith("metric_date=")
        ),
        "errored_audit_lines": len(audit),
        "dashboard": dashboard_path,
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/churnspark_demo")
    ap.add_argument("--drops", type=int, default=3)
    args = ap.parse_args()

    from churn_model_evaluation_platform_spark.session import get_spark

    spark = get_spark(app_name="churnspark-e2e-demo")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_demo(spark, args.sf_dir, args.out, args.drops)))


if __name__ == "__main__":
    main()
