"""stream_hll_sink: register partials through the NATIVE
writeStream.format("txnlog") sink (the r12 verdict's symmetry gap),
plus the streaming KMV / histogram merge-semantics contrast that was
missing next to the HLL/CMS pair:

- HLL max-merge and KMV min-merge are IDEMPOTENT → at-least-once
  delivery of partials cannot change the estimate;
- histogram (and CMS) sum-merge is NOT → a replayed partial double
  counts, which is why those partials REQUIRE the exactly-once
  transport (the txn sink's sinkId:batchId key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from churn_model_evaluation_platform_spark.operators.sketch import (
    bottomk_merge,
    bottomk_sketch,
    hist_merge,
    hist_registers,
    hll_estimate,
    hll_merge,
    hll_registers,
    hll_stream_partials,
    kmv_estimate,
)


def _drops(spark, base: str, frames) -> None:
    from churn_model_evaluation_platform_spark.plans.registry_ext18 import (
        write_drop_files,
    )

    write_drop_files(frames, f"{base}/drops")


@pytest.fixture()
def sink_run(spark, tmp_path):
    """Drain two user_id drop files through hll_stream_partials into
    the native sink; returns (base, all_ids_df)."""
    from churn_model_evaluation_platform_spark.plans.registry import (
        drain_stream,
    )
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    base = str(tmp_path / "hllsink")
    a = spark.range(0, 600).select(F.col("id").alias("user_id"))
    b = spark.range(400, 1000).select(F.col("id").alias("user_id"))
    _drops(spark, base, [a, b])
    schema = T.StructType([T.StructField("user_id", T.LongType())])
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/drops")
    )
    q = (
        hll_stream_partials(sdf, "user_id")
        .writeStream.format("txnlog")
        .option("path", f"{base}/regs")
        .option("checkpointLocation", f"{base}/ckpt")
        .option("sinkId", "t")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return base, a.unionByName(b)


def test_sink_partials_merge_to_one_shot(spark, sink_run):
    from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable

    base, all_ids = sink_run
    table = TxnTable(spark, f"{base}/regs")
    merged = {
        (r["bucket"], r["rho"])
        for r in hll_merge(
            table.scan().select("bucket", "rho")
        ).collect()
    }
    one_shot = {
        (r["bucket"], r["rho"])
        for r in hll_registers(all_ids, "user_id").collect()
    }
    assert merged == one_shot
    est = hll_estimate(
        hll_merge(table.scan().select("bucket", "rho"))
    ).collect()[0]
    want = hll_estimate(hll_registers(all_ids, "user_id")).collect()[0]
    assert est["hll_estimate"] == want["hll_estimate"]


def test_sink_partials_at_least_once_safe(spark, sink_run):
    """Delivering every persisted partial TWICE (at-least-once) must
    not move the estimate — max-merge idempotency end-to-end."""
    from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable

    base, _ = sink_run
    regs = TxnTable(spark, f"{base}/regs").scan().select("bucket", "rho")
    once = hll_estimate(hll_merge(regs)).collect()[0]["hll_estimate"]
    twice = hll_estimate(
        hll_merge(regs.unionByName(regs))
    ).collect()[0]["hll_estimate"]
    assert once == twice


def test_sink_ingest_plan_has_no_shuffle(spark, sink_run):
    """The partial path itself is map-only: Catalyst projection +
    mapInArrow, no Exchange before the sink."""
    df = spark.range(100).select(F.col("id").alias("user_id"))
    plan = hll_stream_partials(
        df, "user_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_partials_bounded_per_partition(spark):
    df = (
        spark.range(0, 20000)
        .select(F.col("id").alias("user_id"))
        .repartition(4)
    )
    out = hll_stream_partials(df, "user_id")
    # ≤ m rows per partition (p=10 → m=1024), 4 partitions
    assert out.count() <= 4 * 1024
    # and merging them reproduces the full aggregate exactly
    merged = {
        (r["bucket"], r["rho"]) for r in hll_merge(out).collect()
    }
    want = {
        (r["bucket"], r["rho"])
        for r in hll_registers(df, "user_id").collect()
    }
    assert merged == want


def test_kmv_min_merge_idempotent(spark):
    """The missing KMV contrast: bottom-k min-merge is idempotent —
    re-delivered sketch partials change nothing."""
    df = spark.range(0, 3000).select(F.col("id").cast("string").alias("u"))
    sk = bottomk_sketch(df, "u")
    once = kmv_estimate(bottomk_merge(sk)).collect()[0]
    twice = kmv_estimate(bottomk_merge(sk.unionByName(sk))).collect()[0]
    assert tuple(once) == tuple(twice)


def test_hist_sum_merge_needs_exactly_once(spark):
    """The histogram contrast: sum-merge DOUBLE COUNTS a replayed
    partial — total mass doubles, which is why histogram partials ride
    the exactly-once txn transport, never an at-least-once one."""
    df = spark.createDataFrame(
        [(float(v),) for v in range(100)], "v double"
    )
    regs = hist_registers(df, "v", lo=0.0, hi=100.0, nbins=10)
    once = hist_merge(regs).agg(F.sum("c")).collect()[0][0]
    replayed = hist_merge(regs.unionByName(regs)).agg(
        F.sum("c")
    ).collect()[0][0]
    assert once == 100 and replayed == 200
