"""format("txnlog") — the Spark-native read surface of the
transactional table (sources/txnlog_datasource.py, PySpark 4 Python
DataSource API): batch snapshot + time travel, Catalyst filter
pushdown translated into commit-log file pruning, and the streaming
change feed through Spark's own offset/checkpoint machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable
from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
    register_txnlog_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txnlog_source(spark)


def _frame(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    for lo in range(0, 60, 10):
        t.append(_frame(spark, lo, lo + 10))  # 6 id-ranged files
    return t


def test_batch_snapshot_matches_table(spark, table):
    got = spark.read.format("txnlog").load(table.path)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, table.snapshot().collect())
    )


def test_time_travel_option(spark, table):
    v2 = spark.read.format("txnlog").option("version", 2).load(table.path)
    assert v2.count() == 20
    with pytest.raises(Exception, match="does not exist"):
        spark.read.format("txnlog").option("version", 99).load(
            table.path
        ).collect()


def test_pushdown_prunes_files(spark, table):
    base = spark.read.format("txnlog").load(table.path)
    assert base.rdd.getNumPartitions() == 6  # one per live file
    filtered = base.where("id >= 23 and id < 41")
    # files 20s, 30s, 40s survive the stats envelope
    assert filtered.rdd.getNumPartitions() == 3
    assert sorted(r["id"] for r in filtered.collect()) == list(range(23, 41))
    # the predicate is still applied row-exactly (pruning is file-level)
    assert base.where("id = 7").count() == 1


def test_additive_evolution_null_backfill(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ev"), schema_mode="additive")
    t.append(_frame(spark, 0, 3))
    t.append(
        spark.range(3, 5)
        .select(
            F.col("id"), (F.col("id") * 2.0).alias("v"), F.lit("x").alias("tag")
        )
        .coalesce(1)
    )
    got = {r["id"]: r["tag"] for r in
           spark.read.format("txnlog").load(t.path).collect()}
    assert got[0] is None and got[4] == "x"


def _drain_cdc(spark, path, name, start_version=0):
    from churn_model_evaluation_platform_spark.plans.registry import drain_stream

    q = (
        spark.readStream.format("txnlog")
        .option("readChangeFeed", "true")
        .option("startVersion", start_version)
        .load(path)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name)


def test_stream_cdc_equals_table_changes(spark, table, tmp_path):
    table.delete([("id", ">=", 55)])
    got = _drain_cdc(spark, table.path, "cdc_eq_batch")
    want = table.table_changes(0)
    key = ["_commit_version", "_change_type", "id"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


def test_stream_start_version(spark, table):
    got = _drain_cdc(spark, table.path, "cdc_from4", start_version=4)
    assert {r["_commit_version"] for r in got.collect()} == {5, 6}


def test_plain_stream_is_append_data(spark, tmp_path):
    from churn_model_evaluation_platform_spark.plans.registry import drain_stream

    t = TxnTable(spark, str(tmp_path / "plain"))
    t.append(_frame(spark, 0, 5))
    t.append(_frame(spark, 5, 8))
    q = (
        spark.readStream.format("txnlog")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("plain_feed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    out = spark.table("plain_feed")
    assert out.columns == ["id", "v"]  # no change-feed columns
    assert sorted(r["id"] for r in out.collect()) == list(range(8))


def test_plain_stream_raises_on_rewrites_unless_ignored(spark, tmp_path):
    from churn_model_evaluation_platform_spark.plans.registry import drain_stream

    t = TxnTable(spark, str(tmp_path / "rw"))
    t.append(_frame(spark, 0, 10))
    t.delete([("id", ">=", 5)])  # rewrite: plain stream can't express it
    q = (
        spark.readStream.format("txnlog")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("rw_feed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="readChangeFeed|StreamingQueryException"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()
    # ignoreChanges emits the rewritten file's rows instead
    q2 = (
        spark.readStream.format("txnlog")
        .option("ignoreChanges", "true")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("rw_feed_ok")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q2)
    got = sorted(r["id"] for r in spark.table("rw_feed_ok").collect())
    # v1's 10 rows + v2's rewritten survivors (0..4 repeated) — Delta's
    # documented ignoreChanges duplication
    assert got == sorted(list(range(10)) + list(range(5)))


def test_compaction_invisible_to_stream(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "cp"))
    t.append(_frame(spark, 0, 5))
    t.append(_frame(spark, 5, 10))
    t.compact(1)  # data_change=false
    got = _drain_cdc(spark, t.path, "cdc_compact")
    assert {r["_change_type"] for r in got.collect()} == {"insert"}
    assert got.count() == 10
