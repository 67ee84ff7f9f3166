"""Data skipping on the transactional table (sources/txnlog.py):
per-file column stats in the commit log, conservative driver-side
pruning, and OPTIMIZE ZORDER BY. The invariant under test everywhere:
``scan(where)`` ≡ ``snapshot().filter(where)`` — pruning is an
optimization, never the filter — plus quantitative floors proving the
pruning actually happens for layouts that should support it."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    TxnTable,
    _enc_stat,
    _file_may_match,
)


def _ranged(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") * 2.0).alias("v"),
        F.concat(F.lit("k"), F.format_string("%04d", "id")).alias("s"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    # three appends with disjoint tight id ranges -> three prunable files
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 200).coalesce(1))
    t.append(_ranged(spark, 200, 300).coalesce(1))
    return t


def test_stats_recorded_per_file(table):
    st_ = table._state()
    assert len(st_["live"]) == 3
    assert set(st_["stats"]) == set(st_["live"])
    mins = sorted(e["cols"]["id"]["min"] for e in st_["stats"].values())
    maxs = sorted(e["cols"]["id"]["max"] for e in st_["stats"].values())
    assert mins == [0, 100, 200]
    assert maxs == [99, 199, 299]
    for e in st_["stats"].values():
        assert e["rows"] == 100
        assert e["cols"]["id"]["nulls"] == 0
        # string stats tracked too
        assert e["cols"]["s"]["min"].startswith("k")


@pytest.mark.parametrize(
    "where,kept",
    [
        ([("id", "<", 100)], 1),
        ([("id", "<=", 100)], 2),
        ([("id", ">", 199)], 1),
        ([("id", ">=", 199)], 2),
        ([("id", "=", 150)], 1),
        ([("id", "between", (50, 150))], 2),
        ([("id", ">=", 50), ("id", "<", 150)], 2),
        ([("s", ">=", "k0250")], 1),  # string bounds prune as well
        ([("id", ">", 1000)], 0),
        (None, 3),
    ],
)
def test_prune_counts_and_equivalence(spark, table, where, kept):
    assert table.prune_report(where)["kept"] == kept
    got = sorted(r["id"] for r in table.scan(where).collect())
    full = table.snapshot()
    from churn_model_evaluation_platform_spark.sources.txnlog import (
        _residual_filter,
        _validate_where,
    )

    cond = _residual_filter(_validate_where(where))
    want = sorted(
        r["id"] for r in (full.filter(cond) if cond is not None else full).collect()
    )
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    op=st.sampled_from(["<", "<=", ">", ">=", "="]),
    v=st.integers(min_value=-50, max_value=350),
)
def test_scan_equals_filter_property(spark, shared_skip_table, op, v):
    """Random single-predicate scans over the shared 3-file table:
    pruned scan and plain filter agree exactly, and pruning never keeps
    fewer files than contain matching rows."""
    t = shared_skip_table
    where = [("id", op, v)]
    got = sorted(r["id"] for r in t.scan(where).collect())
    cmp = {
        "<": F.col("id") < v,
        "<=": F.col("id") <= v,
        ">": F.col("id") > v,
        ">=": F.col("id") >= v,
        "=": F.col("id") == v,
    }[op]
    want = sorted(r["id"] for r in t.snapshot().filter(cmp).collect())
    assert got == want


@pytest.fixture(scope="module")
def shared_skip_table(spark, tmp_path_factory):
    t = TxnTable(spark, str(tmp_path_factory.mktemp("skiptbl") / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 200).coalesce(1))
    t.append(_ranged(spark, 200, 300).coalesce(1))
    return t


def test_all_null_file_pruned(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [Row(id=i, v=None) for i in range(5)], "id long, v double"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [Row(id=i, v=float(i)) for i in range(5, 10)], "id long, v double"
        ).coalesce(1)
    )
    # comparison on v can never match the all-null file
    assert t.prune_report([("v", ">=", 0.0)])["kept"] == 1
    assert t.scan([("v", ">=", 0.0)]).count() == 5


def test_nan_keeps_upper_bound_unusable(spark, tmp_path):
    """A float file containing NaN must stay unprunable for >-style
    predicates: Spark orders NaN above every value, so the recorded
    finite max understates the file's true upper bound."""
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [Row(v=1.0), Row(v=2.0), Row(v=float("nan"))], "v double"
        ).coalesce(1)
    )
    (entry,) = t._state()["stats"].values()
    assert entry["cols"]["v"].get("nan") is True
    # recorded max is 2.0 (or unusable) but the file MUST be kept:
    # Spark's NaN > 100.0 evaluates true, so the row is reachable
    assert t.prune_report([("v", ">", 100.0)])["kept"] == 1
    assert t.scan([("v", ">", 100.0)]).count() == t.snapshot().filter(
        F.col("v") > 100.0
    ).count()
    # ...while the min side stays usable for pruning
    assert t.prune_report([("v", "<", 0.5)])["kept"] == 0


def test_stats_disabled_and_mixed_history(spark, tmp_path):
    """stats_columns=[] writes no stats; a later handle with default
    stats still scans the mixed history correctly — pre-stats files are
    simply unprunable, never wrong."""
    path = str(tmp_path / "tbl")
    legacy = TxnTable(spark, path, stats_columns=[])
    legacy.append(_ranged(spark, 0, 100).coalesce(1))
    t = TxnTable(spark, path)  # default stats posture
    t.append(_ranged(spark, 100, 200).coalesce(1))
    rep = t.prune_report([("id", ">=", 150)])
    assert rep == {"total": 2, "kept": 2, "pruned": 0}  # legacy file kept
    rep2 = t.prune_report([("id", "<", 50)])
    assert rep2["kept"] == 1  # stats-bearing file pruned, legacy kept
    assert sorted(r["id"] for r in t.scan([("id", ">=", 150)]).collect()) == list(
        range(150, 200)
    )


def test_checkpoint_carries_stats(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), checkpoint_interval=2)
    for b in range(4):
        t.append(_ranged(spark, b * 100, (b + 1) * 100).coalesce(1))
    # fresh handle resolves from the v4 checkpoint; pruning must still
    # see every file's stats
    t2 = TxnTable(spark, str(tmp_path / "tbl"), checkpoint_interval=2)
    assert t2.prune_report([("id", "<", 100)])["kept"] == 1
    assert t2.scan([("id", "<", 100)]).count() == 100


def test_compact_rebuilds_stats(spark, table):
    table.compact(partitions=2)
    st_ = table._state()
    assert len(st_["live"]) <= 2
    assert set(st_["stats"]) == set(st_["live"])
    assert table.scan([("id", "<", 100)]).count() == 100


def test_time_travel_scan(spark, table):
    assert t_ids(table.scan([("id", "<", 250)], version=1)) == list(range(100))
    assert t_ids(table.scan([("id", ">=", 250)], version=1)) == []


def t_ids(df):
    return sorted(r["id"] for r in df.collect())


def test_predicate_validation(table):
    with pytest.raises(ValueError, match="unknown predicate op"):
        table.scan([("id", "!=", 3)])
    with pytest.raises(ValueError, match="NULL literal"):
        table.scan([("id", "=", None)])
    with pytest.raises(ValueError, match="between"):
        table.scan([("id", "between", (1, 2, 3))])


def test_cross_type_predicate_is_conservative(table):
    # string literal against an int column: prune layer must keep the
    # file (TypeError -> maybe); the residual filter then applies
    # Spark's own cast semantics
    assert table.prune_report([("id", ">", "x")])["kept"] == 3


def test_enc_stat_order_preserving():
    import datetime as dt
    from decimal import Decimal

    a = _enc_stat(dt.datetime(2024, 1, 8, 0, 0, 7))
    b = _enc_stat(dt.datetime(2024, 1, 8, 0, 0, 7, 500000))
    c = _enc_stat(dt.datetime(2024, 1, 8, 0, 0, 8))
    assert a < b < c  # ISO strings sort chronologically
    assert _enc_stat(float("inf")) is None
    assert _enc_stat(float("nan")) is None
    # decimal widening only loosens the envelope
    x = Decimal("1.1")
    assert _enc_stat(x, round_min=True) <= float(x) <= _enc_stat(
        x, round_max=True
    )


def test_file_may_match_missing_stats():
    assert _file_may_match(None, [("id", "=", 1)]) is True
    assert (
        _file_may_match({"rows": 5, "cols": {}}, [("id", "=", 1)]) is True
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order the (x, y) grid into 16 range files; a box predicate on
    either single dimension must prune at least half the files, and box
    scans stay exact."""
    n = 1 << 12
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / F.lit(64)).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.overwrite(df)
    # scale 0..63 -> 16-bit so the interleave sees high bits
    t.optimize_zorder(
        F.shiftleft(F.col("x"), 10), F.shiftleft(F.col("y"), 10), partitions=16
    )
    assert len(t.files()) == 16
    box = [("x", "between", (0, 15)), ("y", "between", (0, 15))]
    rep = t.prune_report(box)
    assert rep["total"] == 16
    assert rep["kept"] <= 4, rep  # a quarter-quadrant box stays local
    for dim in ("x", "y"):
        rep1 = t.prune_report([(dim, "<", 16)])
        assert rep1["kept"] <= 8, (dim, rep1)
    got = sorted(r["payload"] for r in t.scan(box).collect())
    want = sorted(
        r["payload"]
        for r in df.filter(
            F.col("x").between(0, 15) & F.col("y").between(0, 15)
        ).collect()
    )
    assert got == want


def test_zorder_preserves_content(spark, table):
    before = sorted(r["id"] for r in table.snapshot().collect())
    table.optimize_zorder("id", F.floor(F.col("v")).cast("long"), partitions=4)
    after = sorted(r["id"] for r in table.snapshot().collect())
    assert before == after
    assert math.isclose(
        table.snapshot().agg(F.sum("v")).first()[0],
        sum(2.0 * i for i in range(300)),
    )


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 200).coalesce(1))
    t.append(_ranged(spark, 200, 300).coalesce(1))
    rep = t.delete([("id", "between", (120, 180))])
    assert rep["files_rewritten"] == 1 and rep["files_untouched"] == 2
    ids = sorted(r["id"] for r in t.snapshot().collect())
    assert ids == [i for i in range(300) if not (120 <= i <= 180)]
    # untouched files are re-referenced, not rewritten: still prunable
    assert t.prune_report([("id", "<", 100)])["kept"] == 1
    # time travel still sees the pre-delete table
    assert t.snapshot(version=3).count() == 300
    # no-op delete: nothing may match -> version unchanged, no rewrite
    v = t.latest_version()
    rep2 = t.delete([("id", ">", 10_000)])
    assert rep2 == {
        "version": v,
        "files_rewritten": 0,
        "files_untouched": 3,
    }


def test_delete_keeps_null_predicate_rows(spark, tmp_path):
    from pyspark.sql import Row

    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [Row(id=1, v=5.0), Row(id=2, v=None), Row(id=3, v=50.0)],
            "id long, v double",
        )
    )
    t.delete([("v", ">", 10.0)])
    got = sorted(r["id"] for r in t.snapshot().collect())
    assert got == [1, 2]  # NULL-predicate row KEPT (SQL DELETE semantics)


def test_update_where(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 200).coalesce(1))
    rep = t.update(
        [("id", "<", 50)], {"v": F.col("v") * 10, "s": F.lit("bumped")}
    )
    assert rep["files_rewritten"] == 1 and rep["files_untouched"] == 1
    rows = {r["id"]: (r["v"], r["s"]) for r in t.snapshot().collect()}
    assert rows[10] == (200.0, "bumped")  # 10*2.0*10
    assert rows[60] == (120.0, "k0060")  # same file, untouched row
    assert rows[150] == (300.0, "k0150")  # untouched file
    with pytest.raises(ValueError, match="unknown columns"):
        t.update([("id", "<", 5)], {"nope": 1})
    with pytest.raises(ValueError, match="requires a predicate"):
        t.delete([])


def test_value_set_prunes_categorical_equality(spark, tmp_path):
    """Range stats cannot prune event_type = 'a' when every file spans
    'a'..'z'; a complete per-file value set can."""
    t = TxnTable(spark, str(tmp_path / "tbl"), set_columns=["cat"])
    for cats in (("a", "b"), ("c", "d"), ("e", "f")):
        t.append(
            spark.range(100)
            .select(
                F.col("id"),
                F.element_at(
                    F.array(*[F.lit(c) for c in cats]),
                    (F.col("id") % 2 + 1).cast("int"),
                ).alias("cat"),
            )
            .coalesce(1)
        )
    assert t.prune_report([("cat", "=", "c")])["kept"] == 1
    assert t.prune_report([("cat", "in", ("a", "f"))])["kept"] == 2
    assert t.prune_report([("cat", "=", "zz")])["kept"] == 0
    assert t.scan([("cat", "=", "c")]).count() == 50
    assert t.scan([("cat", "in", ("a", "f"))]).count() == 100
    # IN range-prunes via min/max even without a set (id has no set)
    assert t.prune_report([("id", "in", (5000, 6000))])["kept"] == 0


def test_value_set_cap_is_conservative(spark, tmp_path):
    t = TxnTable(
        spark, str(tmp_path / "tbl"), set_columns=["s"], set_cap=4
    )
    t.append(_ranged(spark, 0, 100).coalesce(1))  # 100 distinct s values
    (entry,) = t._state()["stats"].values()
    assert "set" not in entry["cols"]["s"]  # over cap: no set recorded
    # equality still prunes via RANGE stats where they help
    assert t.prune_report([("s", "=", "zzz")])["kept"] == 0  # > max
    assert t.prune_report([("s", "=", "k0050")])["kept"] == 1


def test_in_predicate_validation(table):
    with pytest.raises(ValueError, match="non-empty"):
        table.scan([("id", "in", ())])
    with pytest.raises(ValueError, match="NULL in an IN list"):
        table.scan([("id", "in", (1, None))])


def test_partial_rewrite_cannot_change_schema(spark, tmp_path):
    """UPDATE that retypes a column while other files keep the old
    physical type must be rejected — the log schema would break every
    later read of the untouched files."""
    from churn_model_evaluation_platform_spark.sources.txnlog import (
        SchemaMismatch,
    )

    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 200).coalesce(1))
    # CASE WHEN coercion widens id (long) to double -> a type change
    with pytest.raises(SchemaMismatch, match="partial copy-on-write"):
        t.update([("id", "<", 50)], {"id": F.lit(0.5)})
    # table unharmed
    assert t.snapshot().count() == 200
    assert t.snapshot().schema["id"].dataType.simpleString() == "bigint"
    # a FULL rewrite (every file touched) may redefine, like overwrite
    t2 = TxnTable(spark, str(tmp_path / "tbl2"))
    t2.append(_ranged(spark, 0, 100).coalesce(1))
    t2.update([("id", ">=", 0)], {"id": F.lit(0.5)})
    assert t2.snapshot().schema["id"].dataType.simpleString() == "double"


def test_zero_row_file_always_pruned(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 0, 0).coalesce(1))  # empty ingest slice
    assert len(t.files()) >= 1
    rep = t.prune_report([("id", ">=", 0)])
    assert rep["kept"] == 1  # the empty file can never match anything
    assert t.scan([("id", ">=", 0)]).count() == 100


def test_tz_aware_literal_is_conservative(spark, tmp_path):
    """A tz-aware datetime literal has no defined order against the
    naive session-local stats: every file must be KEPT (the residual
    filter still applies Spark's own semantics)."""
    import datetime as dt

    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [(dt.datetime(2024, 1, d, 12, 0), float(d)) for d in (1, 2, 3)],
            "ts timestamp, v double",
        ).coalesce(1)
    )
    aware = dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc)
    assert t.prune_report([("ts", ">=", aware)])["kept"] == 1  # kept
    got = t.scan([("ts", ">=", aware)]).count()
    want = t.snapshot().filter(F.col("ts") >= F.lit(aware)).count()
    assert got == want


def test_date_column_boundary_literals(spark, tmp_path):
    """DateType stats vs datetime / bare-date-string literals: the
    day-start anchoring keeps the exact-boundary file and never prunes
    a file whose rows the residual filter would match (r8 review)."""
    import datetime as dt

    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [(dt.date(2024, 1, d),) for d in (1, 5, 8)], "d date"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(dt.date(2024, 1, d),) for d in (9, 12, 15)], "d date"
        ).coalesce(1)
    )
    # datetime literal exactly at the first file's max day start
    lit = dt.datetime(2024, 1, 8, 0, 0, 0)
    assert t.prune_report([("d", ">=", lit)])["kept"] == 2  # boundary kept
    assert t.scan([("d", ">=", lit)]).count() == 4
    # bare date STRING equality: must not be pruned away
    assert t.prune_report([("d", "=", "2024-01-08")])["kept"] >= 1
    assert t.scan([("d", "=", "2024-01-08")]).count() == 1
    # and genuinely out-of-range dates still prune
    assert t.prune_report([("d", "<", dt.date(2024, 1, 1))])["kept"] == 0


def test_string_column_ignores_dateish_anchoring(spark, tmp_path):
    """A STRING column whose values happen to look like dates keeps
    plain string comparison semantics — the date anchoring applies
    only to date/timestamp-kind stats."""
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [("2024-01-05",), ("2024-01-08",)], "s string"
        ).coalesce(1)
    )
    assert t.prune_report([("s", "=", "2024-01-08")])["kept"] == 1
    assert t.scan([("s", "=", "2024-01-08")]).count() == 1
    assert t.prune_report([("s", "=", "2024-01-09")])["kept"] == 0


def test_restore_is_pointer_only_rollback(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 200).coalesce(1))
    pre = sorted(r["id"] for r in t.snapshot().collect())
    pre_files = set(t.files())
    t.delete([("id", "between", (50, 150))])
    assert t.snapshot().count() == 99  # 101 ids removed, inclusive ends
    v = t.restore(2)
    assert v == 4  # a NEW head; the delete stays in history
    assert sorted(r["id"] for r in t.snapshot().collect()) == pre
    assert set(t.files()) == pre_files  # pure re-reference, no copy
    # stats rode along: pruning still works on the restored head
    assert t.prune_report([("id", "<", 100)])["kept"] == 1
    # the deleted state remains time-travelable
    assert t.snapshot(version=3).count() == 99
    # no-op restore doesn't burn a version
    assert t.restore(4) == 4
    with pytest.raises(ValueError, match="does not exist"):
        t.restore(99)


def test_restore_reverts_additive_schema(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"), schema_mode="additive")
    t.append(_ranged(spark, 0, 10).coalesce(1))
    t.append(_ranged(spark, 10, 20).withColumn("tag", F.lit("x")).coalesce(1))
    assert "tag" in t.snapshot().columns
    t.restore(1)
    assert t.snapshot().columns == ["id", "v", "s"]  # schema as of v1


def test_stats_aggregate_metadata_only(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 100).coalesce(1))
    t.append(_ranged(spark, 100, 250).coalesce(1))
    (r,) = t.stats_aggregate(["id", "s"]).collect()
    assert r["n_rows"] == 250
    assert (r["id_min"], r["id_max"], r["id_nulls"]) == (0, 249, 0)
    assert (r["s_min"], r["s_max"]) == ("k0000", "k0249")
    # version-pinned metadata answer
    (r1,) = t.stats_aggregate(["id"], version=1).collect()
    assert (r1["n_rows"], r1["id_max"]) == (100, 99)
    # strictness: NaN-bearing float column refuses
    t.append(
        spark.createDataFrame(
            [Row(id=1, v=float("nan"), s="x")], "id long, v double, s string"
        ).coalesce(1)
    )
    with pytest.raises(ValueError, match="contains NaN"):
        t.stats_aggregate(["v"])
    # ...but untainted columns still answer
    (r2,) = t.stats_aggregate(["id"]).collect()
    assert r2["n_rows"] == 251


def test_stats_aggregate_refuses_statless_history(spark, tmp_path):
    path = str(tmp_path / "tbl")
    legacy = TxnTable(spark, path, stats_columns=[])
    legacy.append(_ranged(spark, 0, 10).coalesce(1))
    t = TxnTable(spark, path)
    with pytest.raises(ValueError, match="no stats recorded"):
        t.stats_aggregate(["id"])


def test_optimize_rewrites_only_small_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 5000).coalesce(1))  # the settled big file
    for lo in range(5000, 5400, 100):  # four tiny ingest files
        t.append(_ranged(spark, lo, lo + 100).coalesce(1))
    st_ = t._state()
    sizes = sorted(e["bytes"] for e in st_["stats"].values())
    assert all(b is not None for b in sizes)
    big = max(sizes)
    rep = t.optimize(target_bytes=10 * big, small_threshold=big)
    assert rep["files_rewritten"] == 4
    assert rep["files_kept"] == 1
    assert rep["files_written"] == 1  # four tinies packed into one
    assert len(t.files()) == 2
    assert t.snapshot().count() == 5400  # rows preserved bit-for-bit
    # the kept big file's stats survived: still prunable
    assert t.prune_report([("id", "<", 5000)])["kept"] == 1
    # idempotent: a second optimize has at most one small file left
    v = t.latest_version()
    rep2 = t.optimize(target_bytes=10 * big, small_threshold=big)
    assert rep2["files_rewritten"] == 0 and rep2["version"] == v


def test_optimize_single_small_file_is_noop(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_ranged(spark, 0, 10).coalesce(1))
    v = t.latest_version()
    rep = t.optimize()
    assert rep == {
        "version": v,
        "files_rewritten": 0,
        "files_kept": 1,
        "files_written": 0,
    }
