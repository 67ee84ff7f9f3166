"""Streaming drift panel parity (VERDICT r7 #3): the windowed PSI drift
TIMESERIES computed by a Structured Streaming drain must equal the
batch plan bit-for-bit — the stream_ohlc proof pattern applied to the
monitoring domain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.drift import (
    binned_ref_counts,
    binned_window_counts,
    psi_from_binned,
    value_drift_psi_by_window,
)

SF_DIR = "/root/testdata/sf0.001"


def _key(rows):
    return sorted((r["window_start"], r["column_name"], r["psi"]) for r in rows)


def test_stream_drain_equals_batch_bit_for_bit(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext11 import (
        q_stream_value_drift,
        q_value_drift_psi_window,
    )

    batch = q_value_drift_psi_window(spark, SF_DIR).collect()
    drained = q_stream_value_drift(spark, SF_DIR).collect()
    assert len(batch) > 0
    assert _key(drained) == _key(batch)


def test_psi_sensitivity_and_null_drift(spark):
    # Identical distributions → psi 0 in every window; the mock 1.25x
    # scale shift must register strictly positive drift on 'value'.
    from churn_model_evaluation_platform_spark.sources.testdata import load_table

    ev = load_table(spark, "events", SF_DIR)
    ref = ev.select("value", F.col("user_id").cast("double").alias("user_id"))
    cols = {"value": 25.0, "user_id": 10.0}
    # A single window whose multiset IS the reference → p_cur == p_ref
    # bin-for-bin → psi exactly 0.0. (Per-WEEK slices of the same corpus
    # legitimately drift a little vs the pooled reference — sampling
    # noise — so the zero check needs the exact-replica construction.)
    pinned_ts = F.to_timestamp(F.lit("2024-03-04 12:00:00"))
    cur_same = ev.select(
        pinned_ts.alias("ts"),
        "value",
        F.col("user_id").cast("double").alias("user_id"),
    )
    zero = value_drift_psi_by_window(ref, cur_same, cols, "ts", "week")
    rows = zero.collect()
    assert len(rows) == 2 and all(r["psi"] == 0.0 for r in rows)

    cur_shift = ev.select(
        pinned_ts.alias("ts"),
        (F.col("value") * 1.25).alias("value"),
        F.col("user_id").cast("double").alias("user_id"),
    )
    shifted = value_drift_psi_by_window(ref, cur_shift, cols, "ts", "week")
    by_col = {r["column"]: r["psi"] for r in shifted.collect()}
    assert by_col["value"] > 0.0  # the 1.25x scale shift registers
    assert by_col["user_id"] == 0.0  # untouched column stays silent


def test_psi_finish_handles_disjoint_bins(spark):
    # cur-only bins (ref count 0) and ref-only bins (cur count 0) both
    # survive the full-outer finish with epsilon floors — no NULL/NaN.
    ref_bins = spark.createDataFrame(
        [("x", 0, 50), ("x", 1, 50)], "column string, bin long, n_ref long"
    )
    import datetime

    w = datetime.datetime(2024, 1, 1)
    cur_bins = spark.createDataFrame(
        [(w, "x", 1, 30), (w, "x", 2, 70)],
        "window_start timestamp, column string, bin long, n_cur long",
    )
    out = psi_from_binned(ref_bins, cur_bins).collect()
    assert len(out) == 1
    assert out[0]["psi"] is not None and out[0]["psi"] > 0


def test_binned_counts_shared_by_batch_and_stream_paths(spark):
    # The batch operator is literally binned counts + the shared finish.
    from churn_model_evaluation_platform_spark.sources.testdata import load_table

    ev = load_table(spark, "events", SF_DIR)
    ref = ev.select("value", F.col("user_id").cast("double").alias("user_id"))
    cur = ev.select(
        "ts", "value", F.col("user_id").cast("double").alias("user_id")
    )
    cols = {"value": 25.0}
    direct = value_drift_psi_by_window(ref, cur, cols, "ts", "week").collect()
    composed = psi_from_binned(
        binned_ref_counts(ref, cols), binned_window_counts(cur, cols, "ts", "week")
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, composed))


def test_append_mode_variant_bounded_state(spark, tmp_path):
    # The r8-review fix: date_trunc grouping can't run append-mode (no
    # watermark propagation) -- Spark rejects it -- while the tumbling
    # F.window variant is accepted, drains with eviction, and its
    # closed windows match the batch computation exactly.
    from pyspark.sql.utils import AnalysisException

    from churn_model_evaluation_platform_spark.operators.drift import (
        binned_window_counts,
        binned_window_counts_append,
    )
    from churn_model_evaluation_platform_spark.sources.testdata import (
        normalize_event_ts,
    )

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    cols = {"value": 25.0}

    def stream():
        s = (
            spark.readStream.schema(raw.schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return normalize_event_ts(s).select("ts", "value").withWatermark(
            "ts", "1 hour"
        )

    # 1) calendar (date_trunc) shape: append mode must be REJECTED.
    with pytest.raises(AnalysisException):
        (
            binned_window_counts(stream(), cols, "ts", "week")
            .writeStream.format("memory")
            .queryName("psi_trunc_append")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
        )

    # 2) tumbling-window shape: append mode runs, state evicted.
    q = (
        binned_window_counts_append(stream(), cols, "ts", "7 days")
        .writeStream.format("memory")
        .queryName("psi_window_append")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    drained = {
        (r["window_start"], r["column"], r["bin"]): r["n_cur"]
        for r in spark.table("psi_window_append").collect()
    }
    batch_cur = normalize_event_ts(raw).select("ts", "value")
    batch = {
        (r["window_start"], r["column"], r["bin"]): r["n_cur"]
        for r in binned_window_counts_append(
            batch_cur, cols, "ts", "7 days"
        ).collect()
    }
    import datetime

    max_ts = batch_cur.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(hours=1)
    # every drained (closed) window matches batch exactly...
    assert drained and all(batch[k] == v for k, v in drained.items())
    # ...and anything missing is an un-closed window at the watermark
    for k in set(batch) - set(drained):
        window_end = k[0] + datetime.timedelta(days=7)
        assert window_end > horizon
