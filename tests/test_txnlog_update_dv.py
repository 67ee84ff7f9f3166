"""Merge-on-read UPDATE via deletion vectors (round 11, VERDICT r10
next #5): ``update_dv`` supersedes matching rows by DV address and
appends their updated versions in ONE atomic commit — zero data files
rewritten, change feed emits delete+insert pairs, semantics identical
to the CoW ``update`` on every axis (predicate NULLs, type coercion,
constraints, column mapping, time travel)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    ConstraintViolation,
    TxnTable,
)


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


def test_update_dv_rewrites_no_files(spark, table):
    pre_files = set(table.files())
    rep = table.update_dv(
        [("id", ">=", 10), ("id", "<", 20)], {"v": F.lit(-1.0)}
    )
    assert rep["files_rewritten"] == 0
    assert rep["rows_updated"] == 10
    assert rep["files_with_dv"] == 1  # ids 10..19 live in file one
    # the pre-update files all survive; new files appended
    assert pre_files < set(table.files())
    snap = table.snapshot()
    assert snap.count() == 100  # row count unchanged — it's an UPDATE
    assert snap.where("id >= 10 and id < 20 and v = -1.0").count() == 10
    assert snap.where("id >= 10 and id < 20 and v <> -1.0").count() == 0
    assert snap.where("(id < 10 or id >= 20) and v = -1.0").count() == 0


def test_update_dv_matches_cow_update_exactly(spark, tmp_path):
    a = TxnTable(spark, str(tmp_path / "cow"))
    b = TxnTable(spark, str(tmp_path / "dv"))
    for t in (a, b):
        t.append(_frame(spark, 0, 80), batch_id=0)
    where = [("maybe", ">=", 1)]  # NULL maybe rows must pass through
    sets = {"v": F.col("v") * 10 + F.col("id")}
    a.update(where, sets)
    b.update_dv(where, sets)
    rows_a = sorted(map(tuple, a.snapshot().collect()))
    rows_b = sorted(map(tuple, b.snapshot().collect()))
    assert rows_a == rows_b
    assert a.snapshot().schema == b.snapshot().schema


def test_update_dv_expression_and_literal_sets(spark, table):
    rep = table.update_dv(
        [("id", "<", 5)], {"v": 99.0, "maybe": F.col("id") * 2}
    )
    assert rep["rows_updated"] == 5
    got = {
        r["id"]: (r["v"], r["maybe"])
        for r in table.snapshot().where("id < 5").collect()
    }
    assert got == {i: (99.0, i * 2) for i in range(5)}


def test_update_dv_no_match_burns_no_version(table):
    v0 = table.latest_version()
    rep = table.update_dv([("id", ">=", 1000)], {"v": F.lit(0.0)})
    assert rep == {
        "version": v0,
        "files_rewritten": 0,
        "files_with_dv": 0,
        "rows_updated": 0,
    }
    assert table.latest_version() == v0


def test_update_dv_requires_predicate_and_set(table):
    with pytest.raises(ValueError, match="requires a predicate"):
        table.update_dv([], {"v": F.lit(0.0)})
    with pytest.raises(ValueError, match="SET column"):
        table.update_dv([("id", "<", 5)], {})
    with pytest.raises(ValueError, match="unknown columns"):
        table.update_dv([("id", "<", 5)], {"nope": F.lit(1)})


def test_update_dv_change_feed_emits_delete_insert_pairs(spark, table):
    v0 = table.latest_version()
    table.update_dv([("id", ">=", 95)], {"v": F.lit(-5.0)})
    ch = table.table_changes(v0).orderBy("id", "_change_type")
    rows = [
        (r["id"], r["v"], r["_change_type"]) for r in ch.collect()
    ]
    expect = []
    for i in range(95, 100):
        expect.append((i, float(i % 5), "delete"))
        expect.append((i, -5.0, "insert"))
    assert sorted(rows) == sorted(expect)


def test_update_dv_time_travel_and_restore(spark, table):
    table.update_dv([("id", "<", 3)], {"v": F.lit(7.0)})
    v_upd = table.latest_version()
    pre = table.snapshot(version=v_upd - 1)
    assert pre.where("id < 3 and v = 7.0").count() == 0
    table.restore(v_upd - 1)
    assert table.snapshot().where("v = 7.0").count() == 0
    # and the update's own version still reads post-update
    assert (
        table.snapshot(version=v_upd).where("id < 3 and v = 7.0").count()
        == 3
    )


def test_update_dv_validates_constraints(spark, table):
    table.add_constraint("v_nonneg", "v >= 0")
    v0 = table.latest_version()
    with pytest.raises(ConstraintViolation, match="v_nonneg"):
        table.update_dv([("id", "<", 5)], {"v": F.lit(-1.0)})
    assert table.latest_version() == v0  # nothing landed
    # a passing update still lands
    rep = table.update_dv([("id", "<", 5)], {"v": F.lit(1.5)})
    assert rep["rows_updated"] == 5


def test_update_dv_on_column_mapped_table(spark, table):
    table.rename_column("v", "amount")
    rep = table.update_dv([("amount", ">=", 4.0)], {"amount": F.lit(0.25)})
    assert rep["files_rewritten"] == 0
    snap = table.snapshot()
    assert "amount" in snap.columns and "v" not in snap.columns
    assert snap.where("amount >= 4.0").count() == 0
    assert snap.where("amount = 0.25").count() == rep["rows_updated"]


def test_update_dv_then_optimize_materializes(spark, table):
    table.update_dv([("id", "<", 10)], {"v": F.lit(3.25)})
    before = sorted(map(tuple, table.snapshot().collect()))
    table.optimize()
    st = table._state()
    assert not st["dv"]  # optimize materialized the DVs away
    assert sorted(map(tuple, table.snapshot().collect())) == before


def test_update_dv_second_update_addresses_new_rows(spark, table):
    # updated rows live in NEW files; a second update matching them
    # must address the new copies, not the dead originals
    table.update_dv([("id", "<", 5)], {"v": F.lit(50.0)})
    rep2 = table.update_dv([("v", ">=", 50.0)], {"v": F.lit(60.0)})
    assert rep2["rows_updated"] == 5
    snap = table.snapshot()
    assert snap.where("v = 60.0").count() == 5
    assert snap.where("v = 50.0").count() == 0
    assert snap.count() == 100


def test_update_dv_streams_through_format_cdf(spark, table):
    # the updatedv commit must reach format("txnlog") CDF consumers as
    # row-level delete+insert pairs, same as the library change feed
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    v0 = table.latest_version()
    table.update_dv([("id", ">=", 97)], {"v": F.lit(-9.0)})
    feed = (
        spark.read.format("txnlog")
        .option("readChangeFeed", "true")
        .option("startVersion", v0)
        .load(table.path)
    )
    got = sorted(
        (r["_change_type"], r["id"], r["v"]) for r in feed.collect()
    )
    want = sorted(
        [("delete", i, float(i % 5)) for i in range(97, 100)]
        + [("insert", i, -9.0) for i in range(97, 100)]
    )
    assert got == want


def test_update_dv_simultaneous_assignment(spark, table):
    # r11 review: a SET that rewrites a predicate column must not
    # starve later SET columns — all assignments evaluate against the
    # ORIGINAL row (SQL UPDATE semantics), on BOTH update paths
    dv = table
    rep = dv.update_dv(
        [("v", ">=", 4.0)], {"v": F.lit(0.0), "maybe": F.lit(9)}
    )
    assert rep["rows_updated"] == 20  # ids with id % 5 == 4
    snap = dv.snapshot()
    assert snap.where("v >= 4.0").count() == 0  # first SET applied
    # the second SET must have applied to exactly the SAME rows: every
    # matched id (id % 5 == 4) carries maybe = 9, nothing else does
    assert snap.where("maybe = 9 and id % 5 = 4").count() == 20
    assert snap.where("maybe = 9").count() == 20


def test_update_cow_simultaneous_assignment(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "cow2"))
    t.append(_frame(spark, 0, 50), batch_id=0)
    t.update([("v", ">=", 4.0)], {"v": F.lit(0.0), "maybe": F.lit(9)})
    snap = t.snapshot()
    assert snap.where("v >= 4.0").count() == 0  # first SET applied
    assert snap.where("maybe = 9 and id % 5 = 4").count() == 10
    assert snap.where("maybe = 9").count() == 10
    # and a value-swap SET reads both sides from the original row
    t2 = TxnTable(spark, str(tmp_path / "swap"))
    t2.append(
        spark.range(4)
        .select("id", (F.col("id") * 1.0).alias("a"), (F.col("id") * 10.0).alias("b"))
        .coalesce(1)
    )
    t2.update([("id", ">=", 0)], {"a": F.col("b"), "b": F.col("a")})
    got = sorted((r["id"], r["a"], r["b"]) for r in t2.snapshot().collect())
    assert got == [(i, i * 10.0, i * 1.0) for i in range(4)]
