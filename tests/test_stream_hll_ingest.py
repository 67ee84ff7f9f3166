"""Streaming HLL maintenance through the txn table (round 12):
writeStream -> foreachBatch{hll_registers(batch) ->
TxnTable.append(batch_id=epoch)} -> max-merge all persisted partials.
Pins: merged-streamed-partials == one-shot across a RESTART, a
replayed epoch is a no-op (claimed batch ids), and — the property the
CMS does NOT have — even a genuinely DOUBLE-DELIVERED partial (fresh
batch_id, so the exactly-once guard can't catch it) leaves the
estimate unchanged, because register max-merge is idempotent."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from churn_model_evaluation_platform_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable

SCHEMA = T.StructType([T.StructField("user_id", T.LongType())])


def _drop(df, drops: str, name: str, mtime: int) -> None:
    tmp = f"{drops}/{name}_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{drops}/{name}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(f"{drops}/{name}.parquet", (mtime, mtime))


def _drain(spark, drops: str, ckpt: str, ingest) -> None:
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _estimate(table: TxnTable) -> float:
    return hll_estimate(
        hll_merge(table.scan().select("bucket", "rho"))
    ).collect()[0]["hll_estimate"]


def test_stream_restart_resumes_and_matches_oneshot(spark, tmp_path):
    base = str(tmp_path)
    drops, ckpt = f"{base}/drops", f"{base}/ckpt"
    os.makedirs(drops, exist_ok=True)
    ids = spark.range(0, 3000).select(F.col("id").alias("user_id"))
    _drop(ids.where("user_id < 1000"), drops, "b0", 1_700_000_000)
    _drop(
        ids.where("user_id >= 500 AND user_id < 2000"),  # overlapping set
        drops,
        "b1",
        1_700_000_001,
    )
    table = TxnTable(spark, f"{base}/regs")

    def ingest(batch_df, batch_id):
        table.append(hll_registers(batch_df, "user_id"), batch_id=batch_id)

    _drain(spark, drops, ckpt, ingest)
    v_after_two = table.latest_version()

    # restart with a NEW file: only the new epoch ingests
    _drop(ids.where("user_id >= 2000"), drops, "b2", 1_700_000_002)
    _drain(spark, drops, ckpt, ingest)
    assert table.latest_version() == v_after_two + 1

    oneshot = hll_distinct(ids, "user_id").collect()[0]["hll_estimate"]
    assert _estimate(table) == oneshot


def test_replayed_epoch_is_noop_and_double_delivery_harmless(
    spark, tmp_path
):
    base = str(tmp_path)
    table = TxnTable(spark, f"{base}/regs")
    ids = spark.range(0, 800).select(F.col("id").alias("user_id"))
    regs = hll_registers(ids, "user_id")
    table.append(regs, batch_id=0)
    v = table.latest_version()
    est = _estimate(table)

    # replayed epoch (same batch_id): claimed — no new commit
    table.append(regs, batch_id=0)
    assert table.latest_version() == v
    # genuine double delivery (fresh batch_id): a commit lands, but
    # max-merge idempotence keeps the estimate identical
    table.append(regs, batch_id=1)
    assert table.latest_version() == v + 1
    assert _estimate(table) == est
