"""Protocol versioning + reader feature guard (round 11, VERDICT r10
missing #1 / next #1): a commit whose ``min_reader`` /
``reader_features`` / ``action`` this build does not implement must
RAISE on every read path — never fold as an append (which would
silently resurrect DV-deleted rows or misname mapped columns) — while
``history()`` still surfaces what the table requires, versions BEFORE
the foreign commit stay time-travelable, and incomprehensible
checkpoints degrade to full replay."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources import protocol
from churn_model_evaluation_platform_spark.sources.protocol import (
    ProtocolError,
    required_features,
    stamp,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 5).cast("double").alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl"))
    t.append(_frame(spark, 0, 50).coalesce(1), batch_id=0)
    t.append(_frame(spark, 50, 100).coalesce(1), batch_id=1)
    return t


def _log_dir(t: TxnTable) -> str:
    return f"{t.path}/_txnlog"


def _write_commit(t: TxnTable, version: int, payload: dict) -> None:
    with open(os.path.join(_log_dir(t), f"{version:020d}.json"), "w") as f:
        json.dump(payload, f)


def _future_commit(version: int, **over) -> dict:
    base = {
        "version": version,
        "action": "quantum_merge",  # an action from a future build
        "added": [],
        "batch_id": None,
        "committed_at": 0.0,
        "stats": {},
        "table_schema": None,
        "constraints": {},
        "properties": {},
        "column_map": {},
        "dropped_physical": [],
        "partition_by": None,
        "data_change": True,
        "min_reader": 99,
        "reader_features": ["teleport"],
    }
    base.update(over)
    return base


# -- stamping ---------------------------------------------------------------


def test_every_commit_is_stamped(table):
    for c in table._commits():
        assert c["min_reader"] == 1
        assert c["reader_features"] == []


def test_row_level_features_bump_min_reader(table):
    table.delete_dv([("id", ">=", 10), ("id", "<", 12)])
    table.rename_column("v", "val")
    commits = table._commits()
    dv_c = next(c for c in commits if c["action"] == "dvdelete")
    assert dv_c["min_reader"] == 2
    assert "dv" in dv_c["reader_features"]
    ren_c = next(c for c in commits if c.get("column_map"))
    assert ren_c["min_reader"] == 2
    assert "column_map" in ren_c["reader_features"]


def test_advisory_features_stay_reader_v1(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "p"), partition_by=["p"])
    t.append(
        spark.range(0, 20)
        .select(F.col("id"), (F.col("id") % 2).alias("p"))
        .coalesce(1)
    )
    t.add_constraint("id_nonneg", "id >= 0")
    for c in t._commits():
        assert c["min_reader"] == 1  # partitions/constraints: advisory
        assert set(c["reader_features"]) <= {"partitions", "constraints"}


def test_required_features_derivation():
    assert required_features({"action": "append"}) == []
    assert required_features({"action": "dvdelete"}) == ["dv"]
    assert required_features(
        {"action": "append", "column_map": {"a": "b"}}
    ) == ["column_map"]
    p = stamp({"action": "mergedv", "dv": {"f": {}}})
    assert p["min_reader"] == 2 and p["reader_features"] == ["dv"]


# -- refusal on every read path ----------------------------------------------


def test_future_min_reader_refused_on_all_read_paths(spark, table):
    _write_commit(
        table, 3, _future_commit(3, action="append", reader_features=[])
    )
    for op in (
        lambda: table.files(),
        lambda: table.snapshot().count(),
        lambda: table.table_changes(0).count(),
        lambda: table.scan([("id", ">=", 10)]).count(),
    ):
        with pytest.raises(ProtocolError, match="reader protocol 99"):
            op()


def test_unknown_action_refused_even_without_stamp(table):
    # a foreign writer that predates the guard: no min_reader key at
    # all, but an action this build cannot fold — must raise, never
    # append-fold (the exact silent-resurrection path of VERDICT r10)
    c = _future_commit(3)
    del c["min_reader"], c["reader_features"]
    _write_commit(table, 3, c)
    with pytest.raises(ProtocolError, match="unknown action"):
        table.snapshot().count()


def test_unknown_feature_refused(table):
    _write_commit(
        table,
        3,
        _future_commit(3, action="append", min_reader=2),
    )
    with pytest.raises(ProtocolError, match="teleport"):
        table.files()


def test_time_travel_below_future_commit_still_works(table):
    _write_commit(table, 3, _future_commit(3))
    # versions <= 2 fold only comprehensible commits: still readable
    assert table.snapshot(version=2).count() == 100
    assert table.snapshot(version=1).count() == 50
    with pytest.raises(ProtocolError):
        table.snapshot().count()  # latest includes the foreign commit


def test_history_surfaces_requirements_without_folding(table):
    _write_commit(table, 3, _future_commit(3))
    h = {r["version"]: r for r in table.history().collect()}
    assert h[3]["action"] == "quantum_merge"
    assert h[3]["min_reader"] == 99
    assert h[3]["reader_features"] == "teleport"
    assert h[1]["min_reader"] == 1 and h[1]["reader_features"] == ""


def test_datasource_read_refused(spark, table):
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    _write_commit(table, 3, _future_commit(3))
    with pytest.raises(Exception, match="quantum_merge|reader protocol"):
        spark.read.format("txnlog").load(table.path).count()
    # pinned to a pre-guard version the datasource still reads fine
    assert (
        spark.read.format("txnlog")
        .option("version", 2)
        .load(table.path)
        .count()
        == 100
    )


def test_writer_refuses_to_append_past_future_commit(table, spark):
    # _commit re-resolves state per attempt; resolving state over the
    # foreign commit raises before any new version could land on top
    _write_commit(table, 3, _future_commit(3))
    with pytest.raises(ProtocolError):
        table.append(_frame(spark, 100, 110).coalesce(1))


# -- checkpoints ---------------------------------------------------------------


def test_future_checkpoint_degrades_to_replay(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ck"), checkpoint_interval=2)
    t.append(_frame(spark, 0, 30).coalesce(1), batch_id=0)
    t.append(_frame(spark, 30, 60).coalesce(1), batch_id=1)  # writes .ckpt
    ck_path = os.path.join(_log_dir(t), f"{2:020d}.ckpt")
    assert os.path.exists(ck_path)
    ck = json.load(open(ck_path))
    ck["min_reader"] = 99
    os.remove(ck_path)
    with open(ck_path, "w") as f:
        json.dump(ck, f)
    # checkpoint now refuses; all commits are v1 → full replay succeeds
    assert t.snapshot().count() == 60
    assert t.files()  # state fold fell back gracefully


def test_checkpoint_is_stamped(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ck2"), checkpoint_interval=2)
    t.append(_frame(spark, 0, 10).coalesce(1))
    t.delete_dv([("id", "<", 2)])  # v2 commit → .ckpt at version 2
    ck = json.load(open(os.path.join(_log_dir(t), f"{2:020d}.ckpt")))
    assert ck["min_reader"] == 2
    assert "dv" in ck["reader_features"]


def test_reader_version_covers_known_surface():
    # the build's own constants stay self-consistent: every row-level
    # feature is known, and the version floor is sane
    assert protocol.ROW_LEVEL_FEATURES <= protocol.KNOWN_FEATURES
    assert protocol.READER_VERSION >= 2


def test_timestamp_as_of_below_future_commit_still_works(spark, table):
    # r11 review: TIMESTAMP AS OF reads only committed_at during
    # resolution — it must behave exactly like VERSION AS OF when the
    # resolved version predates a foreign commit
    import time as _time

    ts_v2 = json.load(
        open(os.path.join(_log_dir(table), f"{2:020d}.json"))
    )["committed_at"]
    _write_commit(
        table, 3, _future_commit(3, committed_at=_time.time() + 9999)
    )
    assert table.snapshot(timestamp=ts_v2).count() == 100
    # the datasource's timestampAsOf agrees
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    got = (
        spark.read.format("txnlog")
        .option("timestampAsOf", str(ts_v2))
        .load(table.path)
        .count()
    )
    assert got == 100
    # resolving INTO the foreign commit still refuses (the fold checks)
    with pytest.raises(ProtocolError):
        table.snapshot(timestamp=_time.time() + 99999).count()
