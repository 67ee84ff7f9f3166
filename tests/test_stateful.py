"""Stateful streaming: applyInPandasWithState running aggregates must
accumulate ACROSS micro-batches (the property a batch GROUP BY cannot
show)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.streaming.stateful import running_user_stats


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    # Two parquet files → maxFilesPerTrigger=1 → two micro-batches.
    # user 1 appears in both batches; its final state must be the total.
    in_dir = str(tmp_path / "in")
    b1 = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "user_id long, value double"
    )
    b2 = spark.createDataFrame(
        [(1, 30.0), (3, 7.0)], "user_id long, value double"
    )
    b1.coalesce(1).write.parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("t_stateful")

    # Update mode emits one row per key per batch it appeared in; the
    # LAST emission per key is the running total over everything seen.
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in out.orderBy("n_events").collect()
    }
    totals = {1: (3, 60.0), 2: (1, 5.0), 3: (1, 7.0)}
    assert final == totals
    # user 1 must have emitted an intermediate state too (proof the fold
    # ran per-batch, not once over the union).
    u1_rows = out.where(F.col("user_id") == 1).count()
    assert u1_rows == 2
    shutil.rmtree(in_dir, ignore_errors=True)
