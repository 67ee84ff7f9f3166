"""The native txnlog WRITERS (df.write / writeStream.format("txnlog")):
pure-Python conditional-put commits from the sink worker, library-format
stats parity, exactly-once streaming, schema governance, column-mapped
writes, and the guard rails (constraints / partitioned tables)."""

from __future__ import annotations

import math
import os
import shutil

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable
from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
    register_txnlog_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txnlog_source(spark)


def _frame(spark):
    # every stats-relevant atomic type incl. a NaN and a null
    rows = [
        (1, 1.5, "alpha", True, "2024-01-03 10:00:00", "2024-01-03"),
        (2, float("nan"), "beta", False, "2024-01-05 11:30:00", "2024-01-05"),
        (3, None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, ["k", "x", "s", "b", "ts_raw", "d_raw"]
    )
    return df.select(
        "k",
        "x",
        "s",
        "b",
        F.col("ts_raw").cast("timestamp").alias("ts"),
        F.col("d_raw").cast("date").alias("d"),
    )


def test_batch_append_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(10).select("id").write.format("txnlog").mode("append").save(p)
    t = TxnTable(spark, p)
    assert t.snapshot().count() == 10 and t.versions() == [1]
    spark.range(10, 15).select("id").write.format("txnlog").mode(
        "append"
    ).save(p)
    assert t.snapshot().count() == 15
    spark.range(3).select("id").write.format("txnlog").mode(
        "overwrite"
    ).save(p)
    assert t.snapshot().count() == 3 and len(t.versions()) == 3
    assert t.snapshot(version=2).count() == 15  # time travel intact


def test_stats_parity_with_library_write(spark, tmp_path):
    lib_t = TxnTable(spark, str(tmp_path / "lib"))
    lib_t.append(_frame(spark).coalesce(1))
    _frame(spark).coalesce(1).write.format("txnlog").mode("append").save(
        str(tmp_path / "sink")
    )
    sink_t = TxnTable(spark, str(tmp_path / "sink"))
    (lib_rel, lib_st), = lib_t._state()["stats"].items()
    (sink_rel, sink_st), = sink_t._state()["stats"].items()
    assert lib_st["rows"] == sink_st["rows"] == 3
    assert set(lib_st["cols"]) == set(sink_st["cols"])
    for c in lib_st["cols"]:
        a, b = lib_st["cols"][c], sink_st["cols"][c]
        assert a == b, (c, a, b)


def test_sink_written_files_prune(spark, tmp_path):
    p = str(tmp_path / "prune")
    for lo in (0, 100, 200):
        spark.range(lo, lo + 50).select("id").coalesce(1).write.format(
            "txnlog"
        ).mode("append").save(p)
    t = TxnTable(spark, p)
    rep = t.prune_report([("id", ">=", 200)])
    assert rep == {"total": 3, "kept": 1, "pruned": 2}


def test_streaming_exactly_once_and_restart(spark, tmp_path):
    src_p, dst_p, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "dst"),
        str(tmp_path / "ckpt"),
    )
    src = TxnTable(spark, src_p)
    src.append(spark.range(10).select("id").coalesce(1), batch_id=0)

    def drain():
        q = (
            spark.readStream.format("txnlog")
            .option("startVersion", 0)
            .load(src_p)
            .writeStream.format("txnlog")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start(dst_p)
        )
        q.awaitTermination(180)

    drain()
    dst = TxnTable(spark, dst_p)
    assert dst.snapshot().count() == 10 and len(dst.versions()) == 1
    # the exactly-once key derives from the checkpointLocation (two
    # independent streams must never collide on a constant default)
    (bid,) = dst.batch_ids()
    assert bid.endswith(":0") and bid.startswith("ckpt-")
    drain()  # restart with nothing new: no commit, no duplicates
    assert dst.snapshot().count() == 10 and len(dst.versions()) == 1
    src.append(spark.range(10, 15).select("id").coalesce(1), batch_id=1)
    drain()
    assert dst.snapshot().count() == 15 and len(dst.versions()) == 2
    assert sorted(r["id"] for r in dst.snapshot().collect()) == list(
        range(15)
    )


def test_schema_governance(spark, tmp_path):
    p = str(tmp_path / "gov")
    spark.range(5).select("id").write.format("txnlog").mode("append").save(p)
    # exact mode (default): a new column is refused
    with pytest.raises(Exception, match="schema"):
        spark.range(5).select(
            "id", F.lit(1.0).alias("extra")
        ).write.format("txnlog").mode("append").save(p)
    # additive mode evolves
    spark.range(5, 8).select(
        "id", F.lit(1.0).alias("extra")
    ).write.format("txnlog").option("schemaMode", "additive").mode(
        "append"
    ).save(p)
    t = TxnTable(spark, p)
    assert t.snapshot().columns == ["id", "extra"]
    assert t.snapshot().where("extra IS NULL").count() == 5


def test_constraints_enforced_not_refused(spark, tmp_path):
    # r11 (VERDICT r10 next #3): the sink VALIDATES check constraints
    # in its commit worker instead of refusing the table outright
    p = str(tmp_path / "cons")
    t = TxnTable(spark, p)
    t.append(spark.range(5).select("id").coalesce(1))
    t.add_constraint("pos", "id >= 0")
    # a passing batch lands
    spark.range(5, 8).select("id").write.format("txnlog").mode(
        "append"
    ).save(p)
    assert TxnTable(spark, p).snapshot().count() == 8
    # a violating batch raises and NOTHING lands
    v = t.latest_version()
    with pytest.raises(Exception, match="pos"):
        spark.range(-3, 0).select("id").write.format("txnlog").mode(
            "append"
        ).save(p)
    assert t.latest_version() == v
    assert TxnTable(spark, p).snapshot().count() == 8


def test_partitioned_append_adopts_layout(spark, tmp_path):
    # r11: the sink fans rows out Hive-style into the layout the log
    # records — library reads, pruning, and DML all keep working
    p2 = str(tmp_path / "part")
    tp = TxnTable(spark, p2, partition_by=["g"])
    tp.append(
        spark.range(6).select("id", (F.col("id") % 2).alias("g"))
    )
    spark.range(6, 10).select(
        "id", (F.col("id") % 2).alias("g")
    ).write.format("txnlog").mode("append").save(p2)
    snap = TxnTable(spark, p2).snapshot()
    assert snap.count() == 10
    assert snap.where("g = 1").count() == 5
    # sink files landed under the Hive directories with exact bounds:
    # a g=0 scan prunes every g=1 file, including the sink-written ones
    rep = tp.prune_report([("g", "=", 0)])
    assert rep["pruned"] >= 2  # one library file + one sink file per g
    assert (
        tp.scan([("g", "=", 0)]).count() == 5
    )


def test_column_mapped_write(spark, tmp_path):
    p = str(tmp_path / "cmap")
    t = TxnTable(spark, p)
    t.append(
        spark.range(3).select("id", F.lit(1.0).alias("value")).coalesce(1)
    )
    t.rename_column("value", "amount")
    # the sink resolves the map at query start and writes PHYSICAL names
    spark.range(3, 6).select(
        "id", F.lit(2.0).alias("amount")
    ).write.format("txnlog").mode("append").save(p)
    snap = TxnTable(spark, p).snapshot()
    assert snap.columns == ["id", "amount"]
    assert snap.where("amount = 2.0").count() == 3
    assert snap.where("amount = 1.0").count() == 3


def test_vacuum_reclaims_staging_leftovers(spark, tmp_path):
    p = str(tmp_path / "vac")
    spark.range(5).select("id").write.format("txnlog").mode("append").save(p)
    stray = os.path.join(p, "data", ".sinktmp-dead")
    os.makedirs(stray)
    with open(os.path.join(stray, "orphan.parquet"), "wb") as f:
        f.write(b"x")
    t = TxnTable(spark, p)
    removed = t.vacuum(retention_seconds=0)
    assert removed >= 1 and not os.path.exists(stray)
    assert t.snapshot().count() == 5  # referenced data untouched


# -- timestampAsOf through the format (r10: Delta's read option)


def test_format_timestamp_as_of(spark, tmp_path):
    import time

    p = str(tmp_path / "tsfmt")
    spark.range(0, 3).select("id").write.format("txnlog").mode(
        "append"
    ).save(p)
    mid = time.time()
    time.sleep(0.05)
    spark.range(3, 6).select("id").write.format("txnlog").mode(
        "append"
    ).save(p)

    assert (
        spark.read.format("txnlog")
        .option("timestampAsOf", str(mid))
        .load(p)
        .count()
        == 3
    )
    assert spark.read.format("txnlog").load(p).count() == 6
    with pytest.raises(Exception, match="not both"):
        spark.read.format("txnlog").option("version", 1).option(
            "timestampAsOf", str(mid)
        ).load(p).count()
    with pytest.raises(Exception, match="at-or-before"):
        spark.read.format("txnlog").option(
            "timestampAsOf", str(mid - 3600)
        ).load(p).count()
