"""Transactional parquet table (sources/txnlog.py): commit-log
semantics the reference's append-only metrics store lacks — snapshot
isolation, time travel, atomic overwrite/compaction/MERGE, optimistic
concurrency, exactly-once batch-id appends."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.sources.txnlog import (
    CommitConflict,
    TxnTable,
)


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )


@pytest.fixture()
def table(spark, tmp_path):
    return TxnTable(spark, str(tmp_path / "tbl"))


def test_append_and_versions(spark, table):
    v1 = table.append(_frame(spark, 0, 5))
    v2 = table.append(_frame(spark, 5, 8))
    assert (v1, v2) == (1, 2)
    assert table.versions() == [1, 2]
    assert table.snapshot().count() == 8
    assert sorted(r["id"] for r in table.snapshot(version=1).collect()) == list(
        range(5)
    )


def test_snapshot_isolation_pins_file_set(spark, table):
    table.append(_frame(spark, 0, 5))
    snap = table.snapshot()  # resolved NOW
    table.append(_frame(spark, 5, 100))
    table.overwrite(_frame(spark, 0, 1))
    assert snap.count() == 5  # unaffected by later commits
    assert table.snapshot().count() == 1


def test_overwrite_and_compact_preserve_rows(spark, table):
    for lo in range(0, 20, 5):
        table.append(_frame(spark, lo, lo + 5).repartition(3))
    before = sorted(map(tuple, table.snapshot().collect()))
    n_files_before = len(table.files())
    v = table.compact(partitions=1)
    assert len(table.files()) == 1 < n_files_before
    assert sorted(map(tuple, table.snapshot().collect())) == before
    # time travel still sees the pre-compaction table
    assert len(table.files(version=v - 1)) == n_files_before


def test_exactly_once_batch_ids(spark, table):
    v1 = table.append(_frame(spark, 0, 5), batch_id=7)
    v_replay = table.append(_frame(spark, 0, 5), batch_id=7)  # crash replay
    assert v_replay == v1 and table.snapshot().count() == 5
    table.append(_frame(spark, 5, 6), batch_id=8)
    assert table.snapshot().count() == 6


def test_optimistic_concurrency_retries_past_claimed_version(spark, table):
    table.append(_frame(spark, 0, 3))
    # A rival writer claims version 2 directly in the log.
    rival = table._log_path(2)
    out = table._fs.create(rival, False)
    out.write(
        bytearray(
            json.dumps(
                {"version": 2, "action": "append", "added": [], "batch_id": None}
            ).encode()
        )
    )
    out.close()
    v = table.append(_frame(spark, 3, 6))
    assert v == 3  # lost v2, retried, landed at 3
    assert table.snapshot().count() == 6


def test_commit_conflict_surfaces_after_retries(spark, tmp_path):
    # A rival that wins EVERY race (create always loses) must surface
    # CommitConflict rather than spin forever. (A rival's *committed*
    # version never triggers this — the loop re-reads the log and lands
    # on the next free version, test above.)
    t = TxnTable(spark, str(tmp_path / "tbl2"), max_retries=2)
    t.append(_frame(spark, 0, 2))
    t._try_commit = lambda version, payload: False
    with pytest.raises(CommitConflict):
        t.append(_frame(spark, 2, 4))


def test_merge_is_atomic_snapshot_swap(spark, table):
    table.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, v double"
        )
    )
    changes = spark.createDataFrame(
        [(2, "b2", 25.0, 1, "U"), (3, "c", 30.0, 2, "U"), (1, None, None, 3, "D")],
        "k long, name string, v double, seq long, op string",
    )
    pre = table.snapshot()
    table.merge(changes, keys=["k"], order_cols=["seq"])
    got = {r["k"]: (r["name"], r["v"]) for r in table.snapshot().collect()}
    assert got == {2: ("b2", 25.0), 3: ("c", 30.0)}
    assert pre.count() == 2  # the pinned pre-merge snapshot is intact


def test_vacuum_removes_only_orphans(spark, table, tmp_path):
    table.append(_frame(spark, 0, 5))
    # Simulate a failed commit: data written, pointer never landed.
    orphan_rel, _stats = table._write_data(_frame(spark, 99, 100))
    # Default retention protects the young dir (it could be in-flight)…
    assert table.vacuum() == 0
    # …and retention 0 (no active writers) reclaims it.
    assert table.vacuum(retention_seconds=0) == 1
    assert table.snapshot().count() == 5  # referenced data untouched
    assert table.vacuum(retention_seconds=0) == 0  # idempotent
    # every remaining data dir is referenced
    assert orphan_rel[0].split("/")[1] not in {
        f.split("/")[-2] for f in table.files()
    }


def test_rmw_conflict_forces_recompute_not_lost_update(spark, table):
    # An append that lands between compact()'s snapshot resolve and its
    # overwrite commit must survive: the conditional commit detects the
    # advance and recomputes from the NEW snapshot.
    table.append(_frame(spark, 0, 5))
    real_commit = table._commit
    interleaved = {"done": False}

    def racing_commit(action, added, **kw):
        if not interleaved["done"]:
            interleaved["done"] = True
            # rival append lands AFTER the snapshot was resolved
            rival = _frame(spark, 100, 103)
            rival_added, rival_stats = table._write_data(rival)
            real_commit(
                "append", rival_added, stats=rival_stats, df_schema=rival.schema
            )
        return real_commit(action, added, **kw)

    table._commit = racing_commit
    table.compact(partitions=1)
    table._commit = real_commit
    # the interleaved rows survived the compaction
    ids = {r["id"] for r in table.snapshot().collect()}
    assert {100, 101, 102} <= ids and ids >= set(range(5))


def test_unknown_version_raises(spark, table):
    table.append(_frame(spark, 0, 3))
    with pytest.raises(ValueError, match="version 99 does not exist"):
        table.snapshot(version=99)


def test_torn_log_entries_impossible(spark, table):
    # In-flight commits live as hidden .tmp-* files the log reader
    # never parses; only fully-written renamed entries are visible.
    table.append(_frame(spark, 0, 3))
    tmp = table._jpath(f"{table.path}/_txnlog/.tmp-deadbeef")
    out = table._fs.create(tmp, True)
    out.write(bytearray(b"{ not json"))
    out.close()
    assert table.versions() == [1]  # reader unaffected by the tmp file
    assert table.snapshot().count() == 3


def test_empty_table_raises(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tbl3"))
    with pytest.raises(ValueError, match="no committed data"):
        t.snapshot()


def test_streaming_foreach_batch_sink(spark, tmp_path):
    from churn_model_evaluation_platform_spark.sources.testdata import (
        normalize_event_ts,
    )
    from churn_model_evaluation_platform_spark.sources.txnlog import (
        foreach_batch_appender,
    )

    sf_dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    t = TxnTable(spark, str(tmp_path / "stream_tbl"))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    q = (
        normalize_event_ts(stream)
        .select("event_id", "event_type", "value")
        .writeStream.foreachBatch(foreach_batch_appender(t))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert t.snapshot().count() == raw.count()
    # every commit carries its epoch id -> replays would be skipped
    assert t.batch_ids() and all(b is not None for b in t.batch_ids())
    # manual crash-replay of epoch 0: must be a no-op
    before = t.snapshot().count()
    t.append(spark.range(3).selectExpr("id AS event_id"), batch_id=0)
    assert t.snapshot().count() == before


def test_log_checkpoint_accelerates_and_preserves_semantics(spark, tmp_path):
    # 25 commits with checkpoint_interval=10: .ckpt files land at v10
    # and v20, state resolution replays only the post-checkpoint
    # suffix, and every answer (latest, time travel before/at/after a
    # checkpoint, batch_ids across an overwrite) matches the full
    # replay of a checkpoint-free twin.
    t = TxnTable(spark, str(tmp_path / "ck"), checkpoint_interval=10)
    plain = TxnTable(spark, str(tmp_path / "plain"), checkpoint_interval=10**9)
    for i in range(12):
        f = _frame(spark, i * 2, i * 2 + 2)
        t.append(f, batch_id=i)
        plain.append(f, batch_id=i)
    t.overwrite(_frame(spark, 0, 4)); plain.overwrite(_frame(spark, 0, 4))
    for i in range(12):
        f = _frame(spark, 100 + i, 101 + i)
        t.append(f, batch_id=100 + i)
        plain.append(f, batch_id=100 + i)

    ckpts = t._log_listing()[1]
    assert ckpts == [10, 20]
    assert plain._log_listing()[1] == []
    assert t.latest_version() == plain.latest_version() == 25
    for v in (5, 10, 13, 20, 25):  # before/at/between/after checkpoints
        assert sorted(map(tuple, t.snapshot(version=v).collect())) == sorted(
            map(tuple, plain.snapshot(version=v).collect())
        )
    assert t.batch_ids() == plain.batch_ids()
    # replay of a pre-overwrite batch id is still recognized
    assert t.append(_frame(spark, 0, 2), batch_id=3) == 25
    # an unreadable checkpoint degrades to full replay, not wrong data
    bad = t._fs.create(t._ckpt_path(20), True)
    bad.write(bytearray(b"{ corrupted")); bad.close()
    assert sorted(map(tuple, t.snapshot().collect())) == sorted(
        map(tuple, plain.snapshot().collect())
    )


def test_history_metadata_only(spark, table):
    table.append(_frame(spark, 0, 5), batch_id="b0")
    table.append(_frame(spark, 5, 8))
    table.compact(partitions=1)
    h = {r["version"]: r for r in table.history().collect()}
    assert set(h) == {1, 2, 3}
    assert (h[1]["action"], h[1]["rows_added"], h[1]["batch_id"]) == (
        "append",
        5,
        "b0",
    )
    assert (h[2]["action"], h[2]["rows_added"], h[2]["batch_id"]) == (
        "append",
        3,
        None,
    )
    assert (h[3]["action"], h[3]["rows_added"]) == ("overwrite", 8)
