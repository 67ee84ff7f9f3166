"""Alert transports: webhook against a live local HTTP server, file log,
retry policy, and the reference's message composition
(churn_prediction_pipeline.py:700-767)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from churn_model_evaluation_platform_spark.sources.alerts import (
    compose_drift_alert,
    compose_scores_alert,
    file_alert_sink,
    retrying,
    smtp_alert_sink,
    webhook_alert_sink,
)


@pytest.fixture
def http_server():
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(
                (self.path, json.loads(self.rfile.read(n).decode()))
            )
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # silence test output
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/alerts", received
    srv.shutdown()


def test_webhook_sink_posts_json(http_server):
    url, received = http_server
    sink = webhook_alert_sink(url)
    sink("Data drift detected", "2 drifted column(s): value, user_id")
    assert received == [
        (
            "/alerts",
            {
                "subject": "Data drift detected",
                "message": "2 drifted column(s): value, user_id",
            },
        )
    ]


def test_file_sink_appends_json_lines(tmp_path):
    p = str(tmp_path / "alerts.log")
    sink = file_alert_sink(p)
    sink("a", "m1")
    sink("b", "m2")
    lines = [json.loads(line) for line in open(p)]
    assert [entry["subject"] for entry in lines] == ["a", "b"]


def test_retrying_succeeds_after_transient_failures():
    calls = []

    def flaky(subject, message):
        calls.append(subject)
        if len(calls) < 3:
            raise OSError("transient")

    retrying(flaky, retries=3, delay_s=0)("s", "m")
    assert len(calls) == 3


def test_retrying_raises_after_exhaustion():
    def dead(subject, message):
        raise OSError("down")

    with pytest.raises(OSError):
        retrying(dead, retries=2, delay_s=0)("s", "m")


def test_compose_matches_reference_shapes():
    subj, msg = compose_drift_alert(2, ["value", "user_id"], "batch_7.csv")
    assert subj == "Customer Data Drift Alert: 2 Column(s) Drifted"
    assert "Filename: batch_7.csv." in msg
    assert "- value\n- user_id\n" in msg

    subj2, msg2 = compose_scores_alert([("f1score", 0.6512)], "batch_7.csv")
    assert subj2 == "Customer Prediction Scores Alert: 1 Score(s) Below Threshold"
    assert "- f1score: 0.651\n" in msg2


def test_pipeline_fires_webhook_on_drift(spark, http_server):
    # End-to-end: monitoring_run with a drifted batch delivers through a
    # REAL HTTP transport.
    url, received = http_server
    from pyspark.sql import functions as F

    from churn_model_evaluation_platform_spark.plans.pipeline import monitoring_run

    ref = spark.range(0, 300).select(
        (F.col("id") % 100).cast("double").alias("value"),
        (F.col("id") % 2).cast("int").alias("churn"),
        (F.col("id") % 2).cast("int").alias("churn_prediction"),
    )
    cur = ref.withColumn("value", F.col("value") * 10 + 500)
    result = monitoring_run(cur, ref.select("value"), ["value"])
    # run again through the webhook transport
    result = monitoring_run(
        cur,
        ref.select("value"),
        ["value"],
        alert_sink=webhook_alert_sink(url),
    )
    assert result.drifted is True
    assert any(p["subject"] == "Data drift detected" for _, p in received)


def test_smtp_sink_builds_without_network():
    # construction only — no SMTP server in the container; delivery shape
    # is covered by the webhook test (same AlertSink contract).
    sink = smtp_alert_sink("localhost", "a@b", ["c@d"])
    assert callable(sink)
