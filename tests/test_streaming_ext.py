"""Round-2 streaming surfaces: event-time session windows and
watermark-bounded streaming deduplication."""

from __future__ import annotations

import datetime

import pytest


def _drip(spark, tmp_path, rows, schema):
    """Write rows as one parquet drop and open it as a file stream."""
    src = tmp_path / "stream_src"
    # one part-file → one deterministic micro-batch (multiple files would
    # race the watermark against the flush row)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))
    static = spark.read.parquet(str(src))
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, 1, 10, minute)


def test_session_window_gap_semantics(spark, tmp_path):
    """F.session_window merges events whose gap <= 10 min: user A has
    two sessions (10:00-10:05 cluster, 10:30 single); user B one."""
    from pyspark.sql import functions as F

    rows = [
        ("a", _ts(0)),
        ("a", _ts(5)),
        ("a", _ts(30)),
        ("b", _ts(1)),
        # far-future flush row advances the watermark past every real
        # session so append mode emits them all before availableNow stops
        ("zz", datetime.datetime(2026, 1, 2, 0, 0)),
    ]
    stream = _drip(spark, tmp_path, rows, "user_id string, ts timestamp")
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        agg.select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
        .writeStream.format("memory")
        .queryName("session_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"].minute): r["n_events"]
        for r in spark.table("session_result").collect()
        if r["user_id"] != "zz"
    }
    assert got == {("a", 0): 2, ("a", 30): 1, ("b", 1): 1}


def test_drop_duplicates_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark delay are suppressed; the state holds keys only as long
    as the watermark requires (the 100 TB dedup-state contract)."""
    rows = [
        (1, _ts(0)),
        (1, _ts(1)),  # duplicate inside the delay → suppressed
        (2, _ts(2)),
        (3, datetime.datetime(2026, 1, 1, 12, 0)),  # watermark flush
    ]
    stream = _drip(spark, tmp_path, rows, "k int, ts timestamp")
    dedup = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["k"]
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("dedup_wm_result")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(r["k"] for r in spark.table("dedup_wm_result").collect())
    assert got == [1, 2, 3]
