"""Change feed OUT of the TxnTable (round 9, VERDICT r8 next #2):
``table_changes(from, to)`` reconstructed from the commit log's file
diffs, ``data_change=false`` on row-preserving rewrites, and the
pull-based ``ChangeFeedReader`` whose drained output equals the batch
feed bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    ChangeFeedReader,
    TxnTable,
)


def _frame(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


@pytest.fixture()
def table(spark, tmp_path):
    return TxnTable(spark, str(tmp_path / "tbl"))


def _feed(df):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in df.collect()
    )


def test_appends_are_inserts(spark, table):
    table.append(_frame(spark, 0, 5))
    table.append(_frame(spark, 5, 8))
    got = _feed(table.table_changes(0))
    want = [(1, "insert", i) for i in range(5)] + [
        (2, "insert", i) for i in range(5, 8)
    ]
    assert got == sorted(want)


def test_from_version_bounds_the_window(spark, table):
    table.append(_frame(spark, 0, 5))
    table.append(_frame(spark, 5, 8))
    table.append(_frame(spark, 8, 10))
    got = _feed(table.table_changes(2))
    assert got == [(3, "insert", 8), (3, "insert", 9)]
    got = _feed(table.table_changes(1, 2))
    assert got == [(2, "insert", i) for i in range(5, 8)]


def test_overwrite_emits_delete_then_insert(spark, table):
    table.append(_frame(spark, 0, 5))
    table.overwrite(_frame(spark, 100, 102))
    got = _feed(table.table_changes(1))
    want = [(2, "delete", i) for i in range(5)] + [
        (2, "insert", 100),
        (2, "insert", 101),
    ]
    assert got == sorted(want)


def test_cow_delete_is_file_granular(spark, table):
    table.append(_frame(spark, 0, 10))   # file A
    table.append(_frame(spark, 10, 20))  # file B
    table.delete([("id", ">=", 15)])     # rewrites only file B
    got = _feed(table.table_changes(2))
    want = [(3, "delete", i) for i in range(10, 20)] + [
        (3, "insert", i) for i in range(10, 15)
    ]
    assert got == sorted(want)


def test_row_preserving_rewrites_are_invisible(spark, table):
    table.append(_frame(spark, 0, 5))
    table.append(_frame(spark, 5, 10))
    table.compact(1)  # v3 (optimize() would no-op on a single file)
    assert _feed(table.table_changes(2)) == []
    # but the feed STILL works across them: later commits diff against
    # the post-compaction file set
    table.append(_frame(spark, 10, 12))  # v4
    got = _feed(table.table_changes(2))
    assert got == [(4, "insert", 10), (4, "insert", 11)]


def test_restore_emits_the_reverting_diff(spark, table):
    table.append(_frame(spark, 0, 5))    # v1
    table.overwrite(_frame(spark, 9, 10))  # v2
    table.restore(1)                     # v3: back to ids 0..4
    got = _feed(table.table_changes(2))
    want = [(3, "delete", 9)] + [(3, "insert", i) for i in range(5)]
    assert got == sorted(want)


def test_feed_replay_reproduces_snapshot(spark, table):
    """Applying the full feed (deletes then inserts, per version) must
    reproduce the final table exactly."""
    table.append(_frame(spark, 0, 10))
    table.delete([("id", "between", (3, 6))])
    table.append(_frame(spark, 20, 25))
    table.update([("id", "=", 22)], {"v": F.lit(-1.0)})
    ch = table.table_changes(0).collect()
    state: dict[int, float] = {}
    for r in sorted(
        ch, key=lambda r: (r["_commit_version"], r["_change_type"] != "delete")
    ):
        if r["_change_type"] == "delete":
            state.pop(r["id"], None)
        else:
            state[r["id"]] = r["v"]
    snap = {r["id"]: r["v"] for r in table.snapshot().collect()}
    assert state == snap


def test_unknown_versions_raise(spark, table):
    table.append(_frame(spark, 0, 3))
    with pytest.raises(ValueError, match="from_version"):
        table.table_changes(7)
    with pytest.raises(ValueError, match="to_version"):
        table.table_changes(0, 9)
    with pytest.raises(ValueError, match="<"):
        table.table_changes(1, 0)


def test_empty_window_returns_empty_frame_with_schema(spark, table):
    table.append(_frame(spark, 0, 3))
    ch = table.table_changes(table.latest_version())
    assert ch.count() == 0
    assert ch.columns == ["id", "v", "_change_type", "_commit_version"]


def test_reader_drain_equals_batch_feed(spark, table):
    """The streaming-shaped consumer (poll per commit) and the batch
    feed must agree bit-for-bit — the drain==batch contract every
    streaming surface in this repo holds."""
    reader = ChangeFeedReader(table, start_version=0)
    assert reader.poll() == (None, 0)  # empty table: no change
    drained: list = []
    table.append(_frame(spark, 0, 5))
    df, v = reader.poll()
    drained += _feed(df)
    assert v == 1
    table.append(_frame(spark, 5, 8))
    table.delete([("id", "<", 2)])
    df, v = reader.poll()  # one poll covering TWO commits
    drained += _feed(df)
    assert v == 3 and reader.poll() == (None, 3)
    assert sorted(drained) == _feed(table.table_changes(0))


def test_feed_pins_final_schema_over_evolution(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ev"), schema_mode="additive")
    t.append(_frame(spark, 0, 3))
    t.append(
        spark.range(3, 5)
        .select(
            F.col("id"),
            (F.col("id") * 2.0).alias("v"),
            F.lit("x").alias("tag"),
        )
        .coalesce(1)
    )
    ch = t.table_changes(0)
    assert "tag" in ch.columns
    rows = {r["id"]: r["tag"] for r in ch.collect()}
    assert rows[0] is None and rows[4] == "x"
