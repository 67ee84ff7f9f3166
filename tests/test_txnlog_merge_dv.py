"""merge_dv — merge-on-read MERGE via deletion vectors: content parity
with the CoW merge (cdc_apply semantics), zero files rewritten, the
change feed's row-level delete + insert emission, and OPTIMIZE
materializing the vectors away."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.cdc import cdc_apply
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _snap_frame(spark):
    # 6 keyed rows with a snapshot-only column, spread over 3 files
    rows = [(k, float(k * 10), f"seg{k % 2}") for k in range(1, 7)]
    return spark.createDataFrame(
        rows, ["k", "bal", "seg"]
    ).repartition(3)


def _changes_frame(spark):
    # latest-per-key resolution matters: key 2 gets an older D then a
    # newer U; key 3 deletes; key 9 is a pure insert; key 1 updates
    rows = [
        (1, "U", 1, 111.0),
        (2, "D", 1, 0.0),
        (2, "U", 2, 222.0),
        (3, "D", 5, 0.0),
        (9, "U", 1, 999.0),
    ]
    return spark.createDataFrame(rows, ["k", "op", "seq", "bal"])


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "mergedv"))
    t.append(_snap_frame(spark), batch_id=0)
    return t


def _content(df):
    return sorted(
        (r["k"], r["bal"], r["seg"]) for r in df.select("k", "bal", "seg").collect()
    )


def test_content_matches_cow_merge(spark, table):
    expect = _content(
        cdc_apply(
            _snap_frame(spark),
            _changes_frame(spark),
            keys=["k"],
            order_cols=["seq"],
        )
    )
    rep = table.merge_dv(_changes_frame(spark), keys=["k"], order_cols=["seq"])
    assert _content(table.snapshot()) == expect
    assert rep["files_rewritten"] == 0
    assert rep["rows_deleted"] == 3  # keys 1, 2, 3 matched
    assert rep["rows_appended"] == 3  # U for 1, 2, 9
    # inserted key 9 NULL-backfills the snapshot-only column
    ins = table.snapshot().where("k = 9").collect()
    assert len(ins) == 1 and ins[0]["seg"] is None and ins[0]["bal"] == 999.0


def test_no_data_file_rewritten(spark, table):
    before = set(table.files())
    table.merge_dv(_changes_frame(spark), keys=["k"], order_cols=["seq"])
    after = set(table.files())
    assert before <= after  # every original file still live
    assert len(after) > len(before)  # plus the appended row versions


def test_change_feed_emits_dv_deletes_and_inserts(spark, table):
    v0 = table.latest_version()
    table.merge_dv(_changes_frame(spark), keys=["k"], order_cols=["seq"])
    feed = table.table_changes(v0).select("k", "_change_type").collect()
    deleted = sorted(r["k"] for r in feed if r["_change_type"] == "delete")
    inserted = sorted(r["k"] for r in feed if r["_change_type"] == "insert")
    assert deleted == [1, 2, 3]  # superseded row versions, row-level
    assert inserted == [1, 2, 9]  # the appended post-merge versions


def test_optimize_materializes_dv_away(spark, table):
    table.merge_dv(_changes_frame(spark), keys=["k"], order_cols=["seq"])
    expect = _content(table.snapshot())
    table.optimize(small_threshold=1 << 40)  # everything is 'small'
    assert table._state().get("dv") in ({}, None)
    assert _content(table.snapshot()) == expect


def test_pure_insert_changelog(spark, table):
    ch = spark.createDataFrame(
        [(100, "U", 1, 1.0), (101, "U", 1, 2.0)], ["k", "op", "seq", "bal"]
    )
    rep = table.merge_dv(ch, keys=["k"], order_cols=["seq"])
    assert rep["rows_deleted"] == 0 and rep["files_with_dv"] == 0
    assert rep["rows_appended"] == 2
    assert table.snapshot().count() == 8


def test_pure_delete_changelog(spark, table):
    ch = spark.createDataFrame([(1, "D", 1, 0.0)], ["k", "op", "seq", "bal"])
    rep = table.merge_dv(ch, keys=["k"], order_cols=["seq"])
    assert rep["rows_deleted"] == 1 and rep["rows_appended"] == 0
    assert table.snapshot().where("k = 1").count() == 0
    assert table.snapshot().count() == 5


def test_snapshot_isolation_time_travel(spark, table):
    v0 = table.latest_version()
    before = _content(table.snapshot())
    table.merge_dv(_changes_frame(spark), keys=["k"], order_cols=["seq"])
    assert _content(table.snapshot(version=v0)) == before


# -- TIMESTAMP AS OF (r10: version_at_timestamp / snapshot(timestamp=))


def test_timestamp_time_travel(spark, tmp_path):
    import time

    t = TxnTable(spark, str(tmp_path / "ts"))
    t.append(spark.range(0, 3).coalesce(1))
    between_1_2 = time.time()
    time.sleep(0.05)
    t.append(spark.range(3, 6).coalesce(1))
    time.sleep(0.05)
    t.append(spark.range(6, 9).coalesce(1))
    after_all = time.time()

    assert t.version_at_timestamp(between_1_2) == 1
    assert t.version_at_timestamp(after_all) == 3
    assert t.snapshot(timestamp=between_1_2).count() == 3
    assert t.snapshot(timestamp=after_all).count() == 9
    # datetime and ISO-string forms resolve identically
    import datetime as dt

    as_dt = dt.datetime.fromtimestamp(between_1_2)
    assert t.version_at_timestamp(as_dt) == 1
    assert t.version_at_timestamp(as_dt.isoformat()) == 1
    with pytest.raises(ValueError, match="at-or-before"):
        t.version_at_timestamp(between_1_2 - 3600)
    with pytest.raises(ValueError, match="not both"):
        t.snapshot(version=1, timestamp=after_all)


# -- REORG ... APPLY (PURGE) (r10: purge_dv)


def test_purge_dv_rewrites_only_dv_carriers(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "purge"))
    for lo in (0, 100, 200):  # 3 settled files, disjoint id ranges
        t.append(spark.range(lo, lo + 50).coalesce(1))
    t.delete_dv([("id", ">=", 200), ("id", "<", 210)])  # DV on file 3 only
    before = set(t.files())
    rep = t.purge_dv()
    assert rep["files_rewritten"] == 1 and rep["files_kept"] == 2
    assert t._state().get("dv") in ({}, None)  # vectors materialized away
    # the two DV-free files were re-referenced, not rewritten
    assert len(before & set(t.files())) == 2
    assert t.snapshot().count() == 140
    # DV-free table: purge is a no-op that burns no version
    v = t.latest_version()
    rep2 = t.purge_dv()
    assert rep2["files_rewritten"] == 0 and t.latest_version() == v
