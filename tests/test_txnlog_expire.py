"""Commit-log retention (sources/txnlog.py TxnTable.expire_log,
Delta's logRetentionDuration): delete the log prefix strictly older
than the newest out-of-retention checkpoint. Invariants: current state
and every version at-or-after the anchor are bit-identical before and
after; versions before the anchor raise loudly (never resolve to a
wrong prefix); exactly-once batch ids survive through the checkpoint;
a truncated log with no readable checkpoint REFUSES to replay instead
of silently folding the tail; vacuum reclaims files only expired
versions referenced.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable


def _r(spark, lo, hi):
    return spark.range(lo, hi).select(
        "id", (F.col("id") * 1.0).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(12):  # checkpoints land at v5 and v10
        t.append(_r(spark, i * 10, (i + 1) * 10).coalesce(1), batch_id=i)
    return t


def test_expire_keeps_state_and_recent_time_travel(spark, table):
    before = sorted(r["id"] for r in table.snapshot().collect())
    v10_before = table.snapshot(version=10).count()
    removed = table.expire_log(retention_seconds=0.0)
    assert removed > 0
    assert table.versions()[0] == 10  # anchor checkpoint v10
    after = sorted(r["id"] for r in table.snapshot().collect())
    assert after == before
    assert table.snapshot(version=10).count() == v10_before
    assert table.snapshot(version=11).count() == 110
    # expired versions raise — they are no longer reconstructible
    with pytest.raises(ValueError, match="does not exist"):
        table.snapshot(version=3)
    # a fresh handle resolves through the anchor checkpoint
    fresh = TxnTable(spark, table.path)
    assert fresh.snapshot().count() == 120


def test_exactly_once_survives_expiry(spark, table):
    table.expire_log(retention_seconds=0.0)
    # batch_id 2 landed in the expired prefix; the checkpoint carries it
    v = table.append(_r(spark, 0, 5).coalesce(1), batch_id=2)
    assert v == table.latest_version()
    assert table.snapshot().count() == 120  # replay was a no-op


def test_expire_is_noop_inside_retention(table):
    assert table.expire_log(retention_seconds=3600.0) == 0
    assert table.versions()[0] == 1


def test_expire_noop_without_checkpoint(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=100)
    t.append(_r(spark, 0, 10).coalesce(1))
    assert t.expire_log(retention_seconds=0.0) == 0


def test_truncated_log_without_checkpoint_refuses(spark, table):
    import glob
    import os

    table.expire_log(retention_seconds=0.0)
    # simulate checkpoint corruption/loss after expiry
    for p in glob.glob(f"{table.path}/_txnlog/*.ckpt"):
        os.remove(p)
    fresh = TxnTable(spark, table.path)
    with pytest.raises(ValueError, match="prefix expired"):
        fresh._state()
    # the format planner refuses identically
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        _replay,
    )

    with pytest.raises(ValueError, match="prefix expired"):
        _replay(table.path, 12)


def test_format_reader_works_after_expiry(spark, table):
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        register_txnlog_source,
    )

    register_txnlog_source(spark)
    table.expire_log(retention_seconds=0.0)
    df = spark.read.format("txnlog").load(table.path)
    assert df.count() == 120


def test_vacuum_reclaims_only_expired_version_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(7):
        t.append(_r(spark, i * 10, (i + 1) * 10).coalesce(1))
    t.overwrite(_r(spark, 0, 30).coalesce(1))  # v8 drops v1-7's files
    for i in range(4):
        t.append(_r(spark, 100 + i, 101 + i).coalesce(1))  # v9..v12
    content = sorted(r["id"] for r in t.snapshot().collect())
    assert t.expire_log(retention_seconds=0.0) > 0
    assert t.versions()[0] == 10
    # v1-7's data dirs are referenced by NO surviving commit
    reclaimed = t.vacuum(retention_seconds=0.0)
    assert reclaimed >= 7
    assert sorted(r["id"] for r in t.snapshot().collect()) == content
    # surviving time travel reads fine post-vacuum
    assert t.snapshot(version=10).count() == len(content) - 2


def test_vacuum_aborts_on_unreadable_surviving_checkpoint(
    spark, tmp_path
):
    """After expire_log the anchor checkpoint is the ONLY reference
    record for pre-anchor live files; a vacuum that shrugged off a
    checkpoint read failure would delete data the current snapshot
    still reads (ADVICE r11 medium). It must abort loudly instead —
    and a later vacuum with the checkpoint restored must succeed."""
    t = TxnTable(spark, str(tmp_path / "t"), checkpoint_interval=5)
    for i in range(7):
        t.append(_r(spark, i * 10, (i + 1) * 10).coalesce(1))
    t.expire_log(retention_seconds=0.0)
    ckpts = sorted(
        (tmp_path / "t" / "_txnlog").glob("*.ckpt")
    )
    assert ckpts, "fixture needs a surviving checkpoint"
    body = ckpts[-1].read_bytes()
    ckpts[-1].write_bytes(b"{torn json")
    with pytest.raises(IOError, match="vacuum aborted"):
        t.vacuum(retention_seconds=0.0)
    # nothing was deleted: the snapshot still reads in a fresh handle
    # once the checkpoint is restored
    ckpts[-1].write_bytes(body)
    fresh = TxnTable(spark, t.path, checkpoint_interval=5)
    assert fresh.snapshot().count() == 70
    fresh.vacuum(retention_seconds=0.0)  # readable again: no raise
    assert fresh.snapshot().count() == 70
