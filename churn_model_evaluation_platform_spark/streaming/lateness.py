"""Watermark / late-data observability: per-batch accounting of rows a
watermarked stateful operator DROPPED as too late, plus the watermark
trajectory — the numbers an on-call engineer needs when a dashboard
window undercounts (is the data late, or lost?).

Spark exposes these in each micro-batch's progress
(`stateOperators[].numRowsDroppedByWatermark`, `eventTime.watermark`);
this module collects them per batch from `query.recentProgress` into a
DataFrame so lateness becomes a QUERYABLE metrics table instead of
something scraped from logs. With a file-per-batch replay the batch
boundaries — and therefore every drop count — are deterministic, which
is how tests/test_lateness.py pins exact numbers.

Scale: the audit reads driver-side progress JSON (O(batches), not
O(rows)); production jobs attach it inside foreachBatch or a
StreamingQueryListener and append to the metrics store like any other
long-format metric (operators/metrics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROGRESS_SCHEMA = (
    "batch_id long, input_rows long, dropped_by_watermark long, "
    "watermark string"
)


def lateness_report(spark: SparkSession, query) -> DataFrame:
    """Collect per-batch lateness stats from a (finished or running)
    streaming query's ``recentProgress``."""
    rows = []
    for p in query.recentProgress:
        state = p.get("stateOperators") or []
        dropped = sum(
            int(s.get("numRowsDroppedByWatermark", 0)) for s in state
        )
        rows.append(
            (
                int(p["batchId"]),
                int(p.get("numInputRows", 0)),
                dropped,
                (p.get("eventTime") or {}).get("watermark", ""),
            )
        )
    return spark.createDataFrame(rows, PROGRESS_SCHEMA)
