"""Deletion vectors — merge-on-read DELETE (round 10, VERDICT r9 next
#2; Delta's DV model with a position-list parquet sidecar): a
``delete_dv`` rewrites ZERO data files, every read path anti-joins the
sidecar, the change feed emits row-level deletes for the addressed
positions, restore resurrects them, and OPTIMIZE / copy-on-write DML
materialize them away."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _frame(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id"),
            (F.col("id") % 5).cast("double").alias("v"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.col("id") % 3)
            .cast("long")
            .alias("maybe"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_frame(spark, 0, 50), batch_id=0)
    t.append(_frame(spark, 50, 100), batch_id=1)
    return t


def test_dv_delete_rewrites_no_files(spark, table):
    pre_files = set(table.files())
    rep = table.delete_dv([("id", ">=", 10), ("id", "<", 20)])
    assert rep["files_rewritten"] == 0
    assert rep["rows_deleted"] == 10
    assert rep["files_with_dv"] == 1  # ids 10..19 live in file one
    assert set(table.files()) == pre_files  # same data files, new head
    assert table.snapshot().count() == 90
    assert table.snapshot().where("id >= 10 and id < 20").count() == 0


def test_dv_rel_addresses_match_log(spark, tmp_path):
    # the lineage relpath derivation must reproduce the log's keys
    # EXACTLY — including on a Hive-partitioned table whose files nest
    # under __p_<col>=<val>/ directories
    t = TxnTable(spark, str(tmp_path / "part"), partition_by=["p"])
    df = spark.range(0, 40).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    )
    t.append(df.coalesce(1))
    st = t._state()
    got = {
        r["__rel"]
        for r in t._read_files(st, st["live"], with_lineage=True)
        .select("__rel")
        .distinct()
        .collect()
    }
    assert got == set(st["live"])


def test_dv_on_partitioned_table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "part"), partition_by=["p"])
    df = spark.range(0, 40).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    )
    t.append(df.coalesce(1))
    rep = t.delete_dv([("id", "=", 7)])
    assert rep["rows_deleted"] == 1 and rep["files_rewritten"] == 0
    assert t.snapshot().count() == 39
    # partition pruning still composes with the DV read
    assert t.scan([("p", "=", 1)]).count() == 19


def test_dv_cumulative_and_never_readdressed(spark, table):
    table.delete_dv([("id", ">=", 10), ("id", "<", 15)])
    # overlapping second delete: already-dead rows must not be
    # re-addressed (the feed relies on disjoint position sets)
    rep = table.delete_dv([("id", ">=", 12), ("id", "<", 18)])
    assert rep["rows_deleted"] == 3  # 15, 16, 17
    assert table.snapshot().count() == 92
    st = table._state()
    entry = next(iter(st["dv"].values()))
    assert entry["n"] == 8 and len(entry["fs"]) == 2


def test_dv_null_predicate_rows_kept(spark, table):
    # SQL DELETE semantics: predicate-NULL rows survive
    n_null = table.snapshot().where("maybe IS NULL").count()
    rep = table.delete_dv([("maybe", ">=", 0)])
    assert table.snapshot().count() == n_null
    assert rep["rows_deleted"] == 100 - n_null


def test_dv_no_match_is_noop(spark, table):
    head = table.latest_version()
    rep = table.delete_dv([("id", ">=", 10_000)])
    assert rep == {
        "version": head,
        "files_rewritten": 0,
        "files_with_dv": 0,
        "rows_deleted": 0,
    }
    assert table.latest_version() == head


def test_dv_time_travel_and_restore_resurrect(spark, table):
    v_pre = table.latest_version()
    table.delete_dv([("id", "<", 5)])
    v_dv = table.latest_version()
    table.delete_dv([("id", ">=", 95)])
    assert table.snapshot(version=v_pre).count() == 100
    assert table.snapshot(version=v_dv).count() == 95
    assert table.snapshot().count() == 90
    # restore to the mid-DV version resurrects the second delete only
    table.restore(v_dv)
    assert table.snapshot().count() == 95
    assert table.snapshot().where("id >= 95").count() == 5


def test_dv_change_feed_emits_row_deletes(spark, table):
    v0 = table.latest_version()
    table.delete_dv([("id", ">=", 10), ("id", "<", 13)])
    feed = table.table_changes(v0).collect()
    got = sorted((r["_change_type"], r["id"]) for r in feed)
    assert got == [("delete", 10), ("delete", 11), ("delete", 12)]
    assert {r["_commit_version"] for r in feed} == {v0 + 1}


def test_dv_change_feed_restore_resurrects(spark, table):
    v0 = table.latest_version()
    table.delete_dv([("id", "=", 3)])
    v1 = table.latest_version()
    table.delete_dv([("id", "=", 4)])
    table.restore(v1)  # same file set, SHRUNK dv chain for the file
    feed = table.table_changes(v1).collect()
    got = sorted((r["_commit_version"], r["_change_type"], r["id"]) for r in feed)
    assert got == [(v1 + 1, "delete", 4), (v1 + 2, "insert", 4)]


def test_dv_removed_file_excludes_dead_rows(spark, table):
    # CoW delete removes a DV'd file: the feed's file-level delete rows
    # must EXCLUDE positions the DV already deleted (no double delete)
    v0 = table.latest_version()
    table.delete_dv([("id", "=", 20)])
    rep = table.delete([("id", "<", 50)])  # CoW: rewrites file one
    assert rep["files_rewritten"] == 1
    feed = table.table_changes(v0)
    deletes = feed.where("_change_type = 'delete'").select("id").collect()
    ids = sorted(r["id"] for r in deletes)
    # version v0+1 deletes id 20 (row-level); the CoW then deletes the
    # 49 remaining live rows of the file — 20 appears exactly ONCE
    assert ids.count(20) == 1
    assert len(ids) == 50


def test_dv_cow_update_applies_and_materializes(spark, table):
    table.delete_dv([("id", "=", 30)])
    table.update([("id", "<", 50)], {"v": F.lit(99.0)})
    snap = table.snapshot()
    assert snap.count() == 99  # dead row stays dead through the rewrite
    assert snap.where("id = 30").count() == 0
    assert table._state()["dv"] == {}  # rewrite materialized the DV


def test_dv_optimize_purges(spark, table):
    table.delete_dv([("id", "<", 3)])
    rep = table.optimize(target_bytes=10**9)
    assert rep["files_rewritten"] == 2
    assert table._state()["dv"] == {}
    assert table.snapshot().count() == 97
    # row-preserving: the feed skips the optimize commit
    feed = table.table_changes(rep["version"] - 1)
    assert feed.count() == 0


def test_dv_vacuum_keeps_sidecars(spark, table):
    table.delete_dv([("id", "=", 1)])
    removed = table.vacuum(retention_seconds=0)
    assert removed == 0
    assert table.snapshot().count() == 99  # sidecar still readable


def test_dv_stats_aggregate_refuses(spark, table):
    table.delete_dv([("id", "=", 1)])
    with pytest.raises(ValueError, match="deletion vector"):
        table.stats_aggregate(["v"])
    # after OPTIMIZE the metadata answer is exact again
    table.optimize(target_bytes=10**9)
    row = table.stats_aggregate(["id"]).first()
    assert row["n_rows"] == 99 and row["id_min"] == 0


def test_dv_requires_predicate(spark, table):
    with pytest.raises(ValueError, match="predicate"):
        table.delete_dv([])


def test_dv_history_shows_commit(spark, table):
    table.delete_dv([("id", "=", 1)])
    last = table.history().orderBy(F.desc("version")).first()
    assert last["action"] == "dvdelete" and last["n_files"] == 0
