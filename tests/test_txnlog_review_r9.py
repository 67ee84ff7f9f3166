"""Round-9 code-review regression tests on the transactional table
(sources/txnlog.py + txnlog_datasource.py):

1. batch ``spark.read`` + ``readChangeFeed=true`` must return the
   change feed (it used to fall through to the snapshot reader and
   stamp NULL CDC columns — well-formed but silently wrong data);
2. ``scan(distributed=True)`` must pin the file_index to the version
   the state snapshot resolved — re-resolving "latest" races a
   concurrent overwrite into an empty scan;
3. ``__HIVE_DEFAULT_PARTITION__`` holds BOTH null and empty-string
   values of a string partition column: the injected all-null stats
   marker must not prune files whose rows hold ``''``;
4. ``history().rows_added`` judges freshness against every file EVER
   referenced, so a restore (which writes zero bytes) reports 0;
5. ``optimize_zorder`` fails fast on a positional partition count
   (the pre-r9 2-arg signature allowed ``optimize_zorder(x, y, 4)``);
6. ``table_changes`` seeds the pre-window live set from the
   checkpoint-anchored state — bounded-window cost, identical feed;
7. handle construction is log-read-free (``partition_by`` resolves
   lazily).
"""

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


# -- 1: batch readChangeFeed ---------------------------------------------


def test_batch_read_change_feed_matches_table_changes(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "cdf"))
    for lo in (0, 10, 20):
        t.append(_frame(spark, lo, lo + 10))
    t.delete([("id", ">=", 25)])
    got = (
        spark.read.format("txnlog")
        .option("readChangeFeed", "true")
        .load(t.path)
    )
    want = t.table_changes(0)
    key = ["_commit_version", "_change_type", "id"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )
    # CDC columns are real, never NULL
    assert got.where("_change_type IS NULL").count() == 0


def test_batch_change_feed_version_window(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "cdfw"))
    for lo in (0, 10, 20, 30):
        t.append(_frame(spark, lo, lo + 10))
    got = (
        spark.read.format("txnlog")
        .option("readChangeFeed", "true")
        .option("startVersion", 2)
        .option("endVersion", 3)
        .load(t.path)
    )
    assert {r["_commit_version"] for r in got.collect()} == {3}
    assert got.count() == 10
    with pytest.raises(Exception, match="does not exist"):
        (
            spark.read.format("txnlog")
            .option("readChangeFeed", "true")
            .option("endVersion", 99)
            .load(t.path)
            .collect()
        )


# -- 2: distributed prune pinned to the resolved snapshot ----------------


def test_distributed_prune_survives_concurrent_overwrite(spark, tmp_path):
    path = str(tmp_path / "race")
    t = TxnTable(spark, path)
    for lo in (0, 10, 20):
        t.append(_frame(spark, lo, lo + 10))
    st = t._state(None)  # reader resolves latest = v3
    rival = TxnTable(spark, path)
    rival.overwrite(_frame(spark, 100, 110))  # v4 supersedes everything
    kept = t._prune_distributed([("id", ">=", 0)], st, None)
    # the prune must keep v3's files — re-resolving latest would
    # intersect v3's live set with v4's index and silently empty it
    assert sorted(kept) == sorted(st["live"])


# -- 3: empty string in a string partition column ------------------------


def test_empty_string_partition_rows_survive_scan(spark, tmp_path):
    t = TxnTable(
        spark,
        str(tmp_path / "es"),
        partition_by=["cat"],
        stats_columns=["id"],  # cat bounds come from the path alone
    )
    df = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, None)], "id long, cat string"
    ).coalesce(1)
    t.append(df)
    # both '' and NULL land in __HIVE_DEFAULT_PARTITION__; a scan
    # comparing on cat must NOT prune the '' row
    got = t.scan([("cat", "=", "")])
    assert [r["id"] for r in got.collect()] == [2]
    got2 = t.scan([("cat", "<=", "z")])
    assert sorted(r["id"] for r in got2.collect()) == [1, 2]


def test_non_string_null_partition_still_prunes(spark, tmp_path):
    t = TxnTable(
        spark,
        str(tmp_path / "np2"),
        partition_by=["b"],
        stats_columns=["id"],  # b bounds come from the path alone
    )
    df = spark.createDataFrame(
        [(1, 10), (2, None)], "id long, b long"
    ).coalesce(1)
    t.append(df)
    # the null-partition file of a NUMERIC column keeps its all-null
    # marker: a comparison prunes it (same answer, zero IO)
    rep = t.prune_report([("b", ">=", 0)])
    assert rep["pruned"] >= 1
    assert [r["id"] for r in t.scan([("b", ">=", 0)]).collect()] == [1]


# -- 4: restore writes nothing --------------------------------------------


def test_history_restore_rows_added_zero_even_from_older_versions(
    spark, tmp_path
):
    t = TxnTable(spark, str(tmp_path / "hr"))
    t.append(_frame(spark, 0, 10))        # v1: files A
    t.overwrite(_frame(spark, 50, 55))    # v2: files B (A gone)
    t.overwrite(_frame(spark, 60, 70))    # v3: files C
    v4 = t.restore(1)                     # re-references A, writes nothing
    hist = {r["version"]: r for r in t.history().collect()}
    assert hist[v4]["rows_added"] == 0
    assert hist[1]["rows_added"] == 10


# -- 5: optimize_zorder positional-int guard ------------------------------


def test_optimize_zorder_rejects_positional_partition_count(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "zg"))
    t.append(_frame(spark, 0, 10))
    with pytest.raises(TypeError, match="partitions="):
        t.optimize_zorder("id", "v", 4)


# -- 6: table_changes bounded-window seeding ------------------------------


def test_table_changes_window_matches_full_replay(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "tc"), checkpoint_interval=2)
    for lo in range(0, 80, 10):
        t.append(_frame(spark, lo, lo + 10))  # v1..v8 (ckpts at 2,4,6,8)
    t.delete([("id", ">=", 75)])              # v9
    # windowed feed (checkpoint-seeded pre-live) == the same window of
    # the full-history feed
    want = t.table_changes(0).where("_commit_version > 6")
    got = t.table_changes(6)
    key = ["_commit_version", "_change_type", "id"]
    assert sorted(map(tuple, got.select(*key).collect())) == sorted(
        map(tuple, want.select(*key).collect())
    )


# -- 7: lazy partition_by -------------------------------------------------


def test_constructor_reads_no_log(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "lazy")
    t = TxnTable(spark, path, partition_by=["b"])
    t.append(
        spark.createDataFrame([(1, 2)], "id long, b long").coalesce(1)
    )
    reads = {"n": 0}
    orig = TxnTable._read_json

    def counting(self, jp):
        reads["n"] += 1
        return orig(self, jp)

    monkeypatch.setattr(TxnTable, "_read_json", counting)
    h2 = TxnTable(spark, path)
    assert reads["n"] == 0  # construction alone read nothing
    assert h2.partition_by == ["b"]  # first access resolves + caches
    assert reads["n"] > 0
    n = reads["n"]
    assert h2.partition_by == ["b"]
    assert reads["n"] == n  # cached


def test_lazy_partition_conflict_raises_before_first_write(spark, tmp_path):
    path = str(tmp_path / "lazyc")
    t = TxnTable(spark, path, partition_by=["b"])
    t.append(
        spark.createDataFrame([(1, 2)], "id long, b long").coalesce(1)
    )
    bad = TxnTable(spark, path, partition_by=["id"])  # no raise yet
    with pytest.raises(ValueError, match="partitioned by"):
        bad.append(
            spark.createDataFrame([(3, 4)], "id long, b long").coalesce(1)
        )
    # nothing landed
    assert TxnTable(spark, path).snapshot().count() == 1


# -- r9: OPTIMIZE ... WHERE (predicate-scoped bin-packing) ------------------


def test_optimize_where_rewrites_only_matching_files(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ow"), stats_columns=["id"])
    for lo in (0, 10, 20, 30):
        t.append(_frame(spark, lo, lo + 10))  # 4 small single-range files
    before = set(t._state()["live"])
    rep = t.optimize(target_bytes=1 << 30, where=[("id", ">=", 20)])
    assert rep["files_rewritten"] == 2 and rep["files_kept"] == 2
    after = t._state()["live"]
    # the two out-of-scope files are re-referenced UNTOUCHED
    untouched = [rel for rel in after if rel in before]
    assert len(untouched) == 2
    assert t.snapshot().count() == 40  # nothing lost
    assert sorted(
        r["id"] for r in t.scan([("id", "<", 20)]).collect()
    ) == list(range(20))


def test_optimize_where_none_is_unscoped(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ow2"))
    for lo in (0, 10, 20):
        t.append(_frame(spark, lo, lo + 10))
    rep = t.optimize(target_bytes=1 << 30, where=None)
    assert rep["files_rewritten"] == 3  # everything small and in scope


def test_optimize_where_single_match_is_noop(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "ow3"))
    t.append(_frame(spark, 0, 10))
    t.append(_frame(spark, 10, 20))
    rep = t.optimize(target_bytes=1 << 30, where=[("id", ">=", 15)])
    assert rep["files_rewritten"] == 0  # <2 in scope: nothing to gain
    assert t.latest_version() == 2  # no commit written


# -- r9: streaming rate limit (maxCommitsPerBatch) --------------------------


def test_stream_max_commits_per_batch_bounds_batches(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "rate"))
    t.append(_frame(spark, 0, 10))  # v1: the (uncapped) first batch
    feed = (
        spark.readStream.format("txnlog")
        .option("readChangeFeed", "true")
        .option("maxCommitsPerBatch", 2)
        .load(t.path)
    )
    sizes = []

    def sink(df, _bid):
        sizes.append(
            {r["_commit_version"] for r in df.select("_commit_version").collect()}
        )

    # a RUNNING trigger (the rate limit's use case — availableNow
    # snapshots one latestOffset and stops; documented). The FIRST
    # batch is uncapped by design (the engine asks for the latest
    # offset before revealing the query's start — see the reader's
    # restart-safety note); appends landing while the stream runs
    # must drain in <= 2-commit batches.
    import time

    q = feed.writeStream.foreachBatch(sink).start()
    deadline = time.time() + 60
    while time.time() < deadline and not sizes:
        time.sleep(0.5)
    for lo in range(10, 60, 10):
        t.append(_frame(spark, lo, lo + 10))  # v2..v6 while running
    deadline = time.time() + 120
    while time.time() < deadline:
        if sizes and set().union(*[s for s in sizes if s]) == set(
            range(1, 7)
        ):
            break
        time.sleep(0.5)
    q.stop()
    seen = [s for s in sizes if s]
    assert set().union(*seen) == {1, 2, 3, 4, 5, 6}
    # every batch AFTER the first covers at most 2 commits
    assert all(len(s) <= 2 for s in seen[1:])
    assert len(seen) >= 3  # the catch-up actually split into batches


def test_stream_max_commits_rejects_non_positive(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "rate2"))
    t.append(_frame(spark, 0, 10))
    feed = (
        spark.readStream.format("txnlog")
        .option("readChangeFeed", "true")
        .option("maxCommitsPerBatch", 0)
        .load(t.path)
    )
    q = feed.writeStream.format("noop").trigger(availableNow=True).start()
    with pytest.raises(Exception, match="maxCommitsPerBatch"):
        q.awaitTermination(120)
        raise RuntimeError(str(q.exception() or "no error"))


def test_rate_limit_restart_never_regresses_offsets(spark, tmp_path):
    """r9 review: a capped latestOffset computed by a FRESH reader must
    never fall below the engine's committed offset. The reader engages
    the cap only once a lower bound is known (initialOffset on a fresh
    query, or the offsets of a replayed batch); the first post-restart
    latestOffset is uncapped."""
    from pyspark.sql import types as T
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        _TxnLogStreamReader,
    )

    t = TxnTable(spark, str(tmp_path / "rr"))
    for lo in range(0, 60, 10):
        t.append(_frame(spark, lo, lo + 10))  # v1..v6
    schema = T.StructType([T.StructField("id", T.LongType())])
    opts = {"path": t.path, "maxcommitsperbatch": "2"}

    # fresh query: initialOffset runs -> capped from startVersion
    fresh = _TxnLogStreamReader(schema, dict(opts), cdc=False)
    assert fresh.initialOffset() == {"version": 0}
    assert fresh.latestOffset() == {"version": 2}  # capped
    assert fresh.latestOffset() == {"version": 4}

    # checkpoint restart, last batch committed: latestOffset is called
    # blind -> must return the TRUE latest (no regression below the
    # committed offset, whatever it was), then cap re-engages
    restarted = _TxnLogStreamReader(schema, dict(opts), cdc=False)
    assert restarted.latestOffset() == {"version": 6}  # uncapped once
    t.append(_frame(spark, 60, 70))  # v7
    t.append(_frame(spark, 70, 80))  # v8
    t.append(_frame(spark, 80, 90))  # v9
    assert restarted.latestOffset() == {"version": 8}  # capped again

    # checkpoint restart with an UNCOMMITTED batch: the engine replays
    # it via partitions(start, end) BEFORE any latestOffset — those
    # offsets become the bound, so the cap engages immediately
    replay = _TxnLogStreamReader(schema, dict(opts), cdc=False)
    replay.partitions({"version": 4}, {"version": 6})
    assert replay.latestOffset() == {"version": 8}  # capped from 6
