"""Drip-feed cadence (upload_simulation_script.py:23-35): files arriving
over time are each processed as their own micro-batch by a CONTINUOUS
processing-time trigger — the reference's always-on deployment mode
(scaled from its 30 s drip to sub-second for the test)."""

from __future__ import annotations

import time

from pyspark.sql.types import DoubleType, StructField, StructType

from churn_model_evaluation_platform_spark.streaming.file_stream import (
    read_file_stream,
)

SCHEMA = StructType([StructField("v", DoubleType())])


def test_drip_fed_files_each_get_a_batch(spark, tmp_path):
    input_dir = tmp_path / "input"
    input_dir.mkdir()
    (input_dir / "f0.csv").write_text("v\n1.0\n2.0\n")

    seen: list[tuple[int, int]] = []  # (batch_id, row_count)

    stream = read_file_stream(spark, str(input_dir), SCHEMA)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, bid: seen.append((bid, b.count())) if not b.isEmpty() else None
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # drip two more files while the query is live
        deadline = time.time() + 60
        while not seen and time.time() < deadline:
            time.sleep(0.2)
        (input_dir / "f1.csv").write_text("v\n3.0\n")
        while len(seen) < 2 and time.time() < deadline:
            time.sleep(0.2)
        (input_dir / "f2.csv").write_text("v\n4.0\n5.0\n6.0\n")
        while len(seen) < 3 and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()

    assert len(seen) >= 3
    # one batch per drop (maxFilesPerTrigger=1): row counts identify files
    assert [n for _, n in seen[:3]] == [2, 1, 3]
    # batch ids strictly increase — each drop is its own run
    assert [b for b, _ in seen] == sorted({b for b, _ in seen})
