"""Partitioned TxnTable (round 9): Hive-style ``__p_<col>=<val>/``
layout, path-derived partition stats, the parquet file-index
checkpoint, and distributed (Spark-filter) pruning — VERDICT r8 next
item #1: "partition columns + stats-as-DataFrame pruning so scan
pruning is a Spark filter, not a driver-side Python loop"."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    _FILE_INDEX_SCHEMA,
    TxnTable,
    _file_keep_expr,
)


def _frame(spark, lo, hi, nparts=4):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id"),
            (F.col("id") % 4).alias("b"),
            (F.col("id") * 1.5).alias("v"),
            F.concat(F.lit("u"), (F.col("id") % 3)).alias("cat"),
        )
        .repartition(nparts)
    )


@pytest.fixture()
def ptable(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ptbl"), partition_by=["b"])
    t.append(_frame(spark, 0, 200))
    return t


def test_layout_is_hive_style(ptable):
    rels = ptable._state()["live"]
    assert rels and all("/__p_b=" in rel for rel in rels)
    values = {rel.split("/__p_b=")[1].split("/")[0] for rel in rels}
    assert values == {"0", "1", "2", "3"}


def test_partition_column_stays_in_data(spark, ptable):
    # leaf-file reads under the pinned schema see the real column
    snap = ptable.snapshot()
    assert "b" in snap.columns and "__p_b" not in snap.columns
    assert snap.count() == 200
    assert snap.where("b = 3").count() == 50


def test_partition_equality_prunes_without_data_io(ptable):
    rep = ptable.prune_report([("b", "=", 2)])
    assert rep["kept"] < rep["total"]
    kept_rels = [
        rel
        for rel in ptable._state()["live"]
        if "/__p_b=2/" in rel
    ]
    assert rep["kept"] == len(kept_rels)


def test_partition_pruning_outside_stats_cap(spark, tmp_path):
    """A partition column excluded from stats_columns still prunes —
    its bound comes from the PATH, not the data aggregation."""
    t = TxnTable(
        spark,
        str(tmp_path / "cap"),
        partition_by=["b"],
        stats_columns=["v"],  # b deliberately untracked
    )
    t.append(_frame(spark, 0, 100))
    rep = t.prune_report([("b", "=", 1)])
    assert rep["pruned"] > 0
    got = sorted(r["id"] for r in t.scan([("b", "=", 1)]).collect())
    want = sorted(range(1, 100, 4))
    assert got == want


def test_scan_equals_filter_on_partitioned_table(spark, ptable):
    for where, sql in [
        ([("b", "=", 2)], "b = 2"),
        ([("b", "in", (0, 3))], "b in (0, 3)"),
        ([("b", ">=", 2), ("v", "<", 90.0)], "b >= 2 and v < 90.0"),
        ([("cat", "=", "u1")], "cat = 'u1'"),
    ]:
        got = sorted(r["id"] for r in ptable.scan(where).collect())
        want = sorted(
            r["id"] for r in ptable.snapshot().where(sql).collect()
        )
        assert got == want, where


def test_distributed_prune_matches_driver_prune(spark, ptable):
    """Same results, and the distributed path never prunes MORE than
    the driver path (it may keep extra files at the exact-boundary ULP
    margin — documented conservatism of the text→double round-trip)."""
    exact = [
        [("b", "=", 2)],
        [("b", "in", (0, 3))],
        [("b", "between", (1, 2))],
        [("v", ">", 200.0)],
        [("b", "<=", 1), ("v", ">=", 30.0)],
        [("cat", "=", "u2")],
    ]
    boundary = [[("id", "<", 10)]]  # a file min sits exactly on 10
    for where in exact + boundary:
        drv = ptable.prune_report(where)
        dst = ptable.prune_report(where, distributed=True)
        assert dst["kept"] >= drv["kept"], where
        if where in exact:
            assert drv == dst, where
        got = sorted(
            r["id"]
            for r in ptable.scan(where, distributed=True).collect()
        )
        want = sorted(r["id"] for r in ptable.scan(where).collect())
        assert got == want, where


def test_file_index_matches_state(spark, ptable):
    st = ptable._state()
    rows = {r["relpath"]: r for r in ptable.file_index().collect()}
    assert set(rows) == set(st["live"])
    for rel, e in st["stats"].items():
        assert rows[rel]["rows"] == e["rows"]
        assert rows[rel]["bytes"] == e["bytes"]


def test_file_index_uses_parquet_checkpoint(spark, tmp_path):
    t = TxnTable(
        spark, str(tmp_path / "ck"), partition_by=["b"], checkpoint_interval=2
    )
    t.append(_frame(spark, 0, 50))
    t.append(_frame(spark, 50, 100))  # v2 → parquet index checkpoint
    _, _, pq = t._log_listing()
    assert pq == [2]
    t.append(_frame(spark, 100, 120))  # v3 tail folds onto the index
    assert t.file_index().count() == len(t._state()["live"])
    # and time travel reads the index AT the target version
    assert t.file_index(version=2).count() == len(
        t._state(version=2)["live"]
    )


def test_file_index_after_overwrite_supersedes_checkpoint(spark, tmp_path):
    t = TxnTable(
        spark, str(tmp_path / "ow"), partition_by=["b"], checkpoint_interval=2
    )
    t.append(_frame(spark, 0, 50))
    t.append(_frame(spark, 50, 100))  # v2 checkpoint
    t.overwrite(_frame(spark, 0, 20))  # v3 replaces everything
    idx = {r["relpath"] for r in t.file_index().collect()}
    assert idx == set(t._state()["live"])


def test_new_handle_adopts_layout_and_conflict_raises(spark, tmp_path):
    path = str(tmp_path / "adopt")
    t = TxnTable(spark, path, partition_by=["b"])
    t.append(_frame(spark, 0, 40))
    t2 = TxnTable(spark, path)
    assert t2.partition_by == ["b"]
    t2.append(_frame(spark, 40, 80))  # lands partitioned
    assert all("/__p_b=" in rel for rel in t2._state()["live"])
    # conflict resolution is lazy (construction is log-read-free, r9
    # review): the raise lands on first partition_by access / first use
    conflicted = TxnTable(spark, path, partition_by=["cat"])
    with pytest.raises(ValueError, match="partitioned by"):
        conflicted.partition_by


def test_append_missing_partition_column_raises(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "mp"), partition_by=["b"])
    with pytest.raises(ValueError, match="partition columns"):
        t.append(spark.range(5).select("id"))


def test_null_partition_values_prune_correctly(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "np"), partition_by=["cat"])
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], ["id", "cat"]
    ).coalesce(1)
    t.append(df)
    rels = t._state()["live"]
    assert any("__HIVE_DEFAULT_PARTITION__" in rel for rel in rels)
    # a comparison predicate prunes the all-null partition file
    rep = t.prune_report([("cat", "=", "a")])
    assert rep["kept"] == 1
    assert sorted(r["id"] for r in t.scan([("cat", "=", "a")]).collect()) == [
        1,
        2,
    ]
    # nulls are preserved in the data itself
    assert t.snapshot().where(F.col("cat").isNull()).count() == 1


def test_rewrites_preserve_partition_layout(spark, ptable):
    ptable.delete([("id", "between", (10, 19))])  # CoW through partitions
    ptable.optimize(target_bytes=1 << 20)  # bin-pack the small files
    rels = ptable._state()["live"]
    assert rels and all("/__p_b=" in rel for rel in rels)
    assert ptable.snapshot().count() == 190
    rep = ptable.prune_report([("b", "=", 0)])
    assert rep["kept"] < rep["total"]


def test_timestamp_partition_values(spark, tmp_path):
    import datetime as dt

    t = TxnTable(spark, str(tmp_path / "ts"), partition_by=["day"])
    df = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1)),
            (2, dt.date(2024, 1, 2)),
            (3, dt.date(2024, 1, 3)),
        ],
        ["id", "day"],
    )
    t.append(df)
    rep = t.prune_report([("day", "=", dt.date(2024, 1, 2))])
    assert rep["kept"] == 1
    got = [r["id"] for r in t.scan([("day", ">=", dt.date(2024, 1, 2))]).collect()]
    assert sorted(got) == [2, 3]


def test_keep_expr_conservative_on_missing_stats(spark):
    """Files with NULL stats_json (pre-stats commits) always survive
    the distributed filter."""
    idx = spark.createDataFrame(
        [
            ("f1", None, None, None, None),
            (
                "f2",
                10,
                100,
                '{"x": {"kind": "num", "min": 5, "max": 9, "nulls": 0}}',
                None,
            ),
        ],
        _FILE_INDEX_SCHEMA,
    )
    kept = {
        r["relpath"]
        for r in idx.where(
            _file_keep_expr([("x", ">", 100)], {"x": "num"})
        ).collect()
    }
    assert kept == {"f1"}  # f2 provably cannot match; f1 unknown → kept
