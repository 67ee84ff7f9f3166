"""Watermark semantics: an event arriving AFTER the watermark has passed
its window is dropped (append mode) — the late-data bound that keeps
streaming state finite at scale. Files are dripped while the query runs
so batch order (and thus watermark advancement) is deterministic."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def test_late_event_beyond_watermark_is_dropped(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def mk(ts_strings):
        return spark.createDataFrame(
            [(s,) for s in ts_strings], "ts_s string"
        ).select(F.to_timestamp("ts_s").alias("ts"))

    schema = mk(["2026-01-01 00:00:00"]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_watermark")
        .outputMode("append")  # append emits a window only once, when final
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # batch 1: 10:05 and 14:00 → after it, watermark = 13:00, so the
        # 10:00-11:00 window is finalized (emitted with n=1).
        mk(["2026-01-01 10:05:00", "2026-01-01 14:00:00"]).coalesce(
            1
        ).write.mode("append").parquet(in_dir)
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("t_watermark").count() >= 1:
                break
            time.sleep(0.3)
        # batch 2: a LATE event for the finalized 10:00 window — must be
        # dropped, not re-emitted / double-counted.
        mk(["2026-01-01 10:30:00"]).coalesce(1).write.mode("append").parquet(
            in_dir
        )
        time.sleep(5)  # give the late batch a few triggers to process
    finally:
        q.stop()

    got = {str(r["ws"]): r["n"] for r in spark.table("t_watermark").collect()}
    assert got.get("2026-01-01 10:00:00") == 1
