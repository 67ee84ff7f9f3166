"""Round-10 txnlog DataSource features: the planner-fs abstraction
(memory:// planning without a local filesystem), the listing cursor
(O(new commits) latestOffset), maxFilesPerBatch sub-commit offsets,
and deletion-vector / column-mapping awareness through the format."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from churn_model_evaluation_platform_spark.sources.plannerfs import (
    MemoryPlannerFS,
    register_planner_fs,
)
from churn_model_evaluation_platform_spark.sources.txnlog import TxnTable
from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
    _change_batches,
    _log_versions,
    _replay,
    _TxnLogStreamReader,
    register_txnlog_source,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txnlog_source(spark)


_ID_SCHEMA = T.StructType([T.StructField("id", T.LongType())])


def _frame(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id")).coalesce(1)


def _mem_log(
    n_commits: int,
    files_per_commit: int = 1,
    bytes_per_file: int | None = None,
) -> MemoryPlannerFS:
    """Hand-built commit log on the in-memory fs (no Spark, no disk):
    proves planning runs against a non-local store. ``bytes_per_file``
    stamps write-time byte sizes into the stats (the byte-cap unit)."""
    fs = MemoryPlannerFS()
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {},
                }
            ],
        }
    )
    for v in range(1, n_commits + 1):
        added = [
            f"data/c{v:04d}/part-{i}.parquet"
            for i in range(files_per_commit)
        ]
        stats = (
            {
                rel: {"rows": 1, "cols": {}, "bytes": bytes_per_file}
                for rel in added
            }
            if bytes_per_file is not None
            else {}
        )
        fs.put(
            f"memory://tbl/_txnlog/{v:020d}.json",
            json.dumps(
                {
                    "version": v,
                    "action": "append",
                    "added": added,
                    "batch_id": None,
                    "stats": stats,
                    "table_schema": schema,
                    "data_change": True,
                }
            ).encode(),
        )
    return fs


# -- planner fs ------------------------------------------------------------


def test_memory_fs_planning():
    fs = _mem_log(5, files_per_commit=2)
    register_planner_fs("memory", fs)
    path = "memory://tbl"
    assert _log_versions(path) == [1, 2, 3, 4, 5]
    st = _replay(path, 3)
    assert len(st["live"]) == 6 and st["schema"] is not None
    entries = _change_batches(path, 1, 3)
    assert [(v, k) for v, k, _, _, _ in entries] == [(2, "insert")] * 2 + [
        (3, "insert")
    ] * 2


def test_unknown_scheme_raises():
    from churn_model_evaluation_platform_spark.sources.plannerfs import fs_for

    with pytest.raises(ValueError, match="no PlannerFS"):
        fs_for("s3zz://bucket/x")


# -- listing cursor --------------------------------------------------------


def test_listing_cursor_is_incremental():
    fs = _mem_log(1000)
    register_planner_fs("memory", fs)
    r = _TxnLogStreamReader(_ID_SCHEMA, {"path": "memory://tbl"}, cdc=False)
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1000}
    lists_after_seed = fs.calls.get("listdir", 0)
    # steady-state polling: NO further directory listings, only a
    # single forward exists() probe per trigger
    for _ in range(20):
        assert r.latestOffset() == {"version": 1000}
    assert fs.calls.get("listdir", 0) == lists_after_seed
    probes = fs.calls.get("exists", 0)
    # new commits found by forward probing alone
    fs.put(
        "memory://tbl/_txnlog/%020d.json" % 1001,
        fs.files["/tbl/_txnlog/%020d.json" % 1000]
        .replace(b'"version": 1000', b'"version": 1001'),
    )
    assert r.latestOffset() == {"version": 1001}
    assert fs.calls.get("listdir", 0) == lists_after_seed
    assert fs.calls.get("exists", 0) > probes


def test_cursor_reconcile_full_list():
    fs = _mem_log(3)
    register_planner_fs("memory", fs)
    r = _TxnLogStreamReader(_ID_SCHEMA, {"path": "memory://tbl"}, cdc=False)
    r.initialOffset()
    for _ in range(r._RECONCILE_EVERY + 2):
        r.latestOffset()
    assert fs.calls.get("listdir", 0) >= 2  # seed + periodic reconcile


# -- maxFilesPerBatch ------------------------------------------------------


@pytest.fixture()
def wide_table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "wide"))
    t.append(spark.range(0, 100).repartition(10))  # v1: 10 files
    t.append(spark.range(100, 120).repartition(2))  # v2: 2 files
    return t


def test_max_files_splits_a_commit(spark, wide_table):
    opts = {"path": wide_table.path, "maxfilesperbatch": "3"}
    r = _TxnLogStreamReader(_ID_SCHEMA, dict(opts), cdc=False)
    assert r.initialOffset() == {"version": 0}
    offsets = [r.latestOffset() for _ in range(5)]
    assert offsets == [
        {"version": 1, "files": 3},
        {"version": 1, "files": 6},
        {"version": 1, "files": 9},
        {"version": 2},  # finishes v1's 10th file + both v2 files
        {"version": 2},  # drained: offset stable
    ]
    # the batches partition the file set exactly — no file twice, none
    # lost — and every batch is within the cap
    import pyarrow.parquet as pq

    seen = []
    start = {"version": 0}
    for end in offsets[:4]:
        slices = r.partitions(start, end)
        assert 0 < len(slices) <= 3
        seen += [s.path for s in slices]
        start = end
    assert len(seen) == len(set(seen)) == 12
    total = sum(pq.read_table(p).num_rows for p in seen)
    assert total == 120


def test_max_files_never_regresses_on_restart(spark, wide_table):
    opts = {"path": wide_table.path, "maxfilesperbatch": "3"}
    r1 = _TxnLogStreamReader(_ID_SCHEMA, dict(opts), cdc=False)
    r1.initialOffset()
    assert r1.latestOffset() == {"version": 1, "files": 3}
    # restart mid-commit: the engine replays the uncommitted batch via
    # partitions(), THEN asks latestOffset — the cap must resume from
    # the replayed offset, never below it
    r2 = _TxnLogStreamReader(_ID_SCHEMA, dict(opts), cdc=False)
    r2.partitions({"version": 0}, {"version": 1, "files": 3})
    nxt = r2.latestOffset()
    assert nxt == {"version": 1, "files": 6}
    # blind restart (batch committed, no replay): uncapped first answer
    r3 = _TxnLogStreamReader(_ID_SCHEMA, dict(opts), cdc=False)
    assert r3.latestOffset() == {"version": 2}


def test_max_files_composes_with_max_commits(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "both"))
    for lo in range(0, 30, 10):
        t.append(_frame(spark, lo, lo + 10))  # v1..v3, 1 file each
    opts = {
        "path": t.path,
        "maxfilesperbatch": "5",
        "maxcommitsperbatch": "2",
    }
    r = _TxnLogStreamReader(_ID_SCHEMA, dict(opts), cdc=False)
    r.initialOffset()
    assert r.latestOffset() == {"version": 2}  # commit cap binds
    assert r.latestOffset() == {"version": 3}


def test_max_files_validates(spark, wide_table):
    with pytest.raises(ValueError, match="maxFilesPerBatch"):
        _TxnLogStreamReader(
            _ID_SCHEMA,
            {"path": wide_table.path, "maxfilesperbatch": "0"},
            cdc=False,
        )


def test_max_files_end_to_end_drain(spark, wide_table, tmp_path):
    # full engine drain through the format: whatever the trigger does
    # with the caps, the result equals the snapshot
    out = (
        spark.readStream.format("txnlog")
        .option("maxFilesPerBatch", "3")
        .load(wide_table.path)
        .writeStream.format("memory")
        .queryName("mfb_drain")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt_mfb")
        )
        .trigger(availableNow=True)
        .start()
    )
    from churn_model_evaluation_platform_spark.plans.registry import drain_stream

    drain_stream(out)
    got = spark.sql("select count(*) n, sum(id) s from mfb_drain").first()
    assert got["n"] == 120 and got["s"] == sum(range(120))


# -- deletion vectors through the format -----------------------------------


@pytest.fixture()
def dv_table(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "dvt"))
    t.append(_frame(spark, 0, 50), batch_id=0)
    t.append(_frame(spark, 50, 100), batch_id=1)
    t.delete_dv([("id", ">=", 10), ("id", "<", 13)])
    return t


def test_format_snapshot_applies_dv(spark, dv_table):
    df = spark.read.format("txnlog").load(dv_table.path)
    assert df.count() == 97
    assert df.where("id >= 10 and id < 13").count() == 0
    # time travel to the pre-DV version still sees every row
    pre = (
        spark.read.format("txnlog")
        .option("version", 2)
        .load(dv_table.path)
    )
    assert pre.count() == 100


def test_format_cdf_emits_dv_deletes(spark, dv_table):
    feed = (
        spark.read.format("txnlog")
        .option("readChangeFeed", "true")
        .option("startVersion", 2)
        .load(dv_table.path)
    )
    got = sorted(
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in feed.collect()
    )
    assert got == [(3, "delete", 10), (3, "delete", 11), (3, "delete", 12)]


def test_plain_stream_raises_on_dvdelete(spark, dv_table, tmp_path):
    from churn_model_evaluation_platform_spark.plans.registry import drain_stream

    q = (
        spark.readStream.format("txnlog")
        .load(dv_table.path)
        .writeStream.format("memory")
        .queryName("dv_plain")
        .option("checkpointLocation", str(tmp_path / "ckpt_dvp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cannot represent"):
        drain_stream(q)
        if q.exception() is not None:
            raise Exception(str(q.exception()))


def test_cdc_stream_drains_dv_deletes(spark, dv_table, tmp_path):
    from churn_model_evaluation_platform_spark.plans.registry import drain_stream

    q = (
        spark.readStream.format("txnlog")
        .option("readChangeFeed", "true")
        .option("startVersion", 2)
        .load(dv_table.path)
        .writeStream.format("memory")
        .queryName("dv_cdc")
        .option("checkpointLocation", str(tmp_path / "ckpt_dvc"))
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    got = sorted(
        (r["_change_type"], r["id"])
        for r in spark.sql("select * from dv_cdc").collect()
    )
    assert got == [("delete", 10), ("delete", 11), ("delete", 12)]


# -- column mapping through the format -------------------------------------


def test_format_reads_through_column_map(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "cm"), schema_mode="additive")
    t.append(
        spark.range(0, 10)
        .select(F.col("id"), (F.col("id") * 2.0).alias("value"))
        .coalesce(1)
    )
    t.rename_column("value", "score")
    df = spark.read.format("txnlog").load(t.path)
    assert df.columns == ["id", "score"]
    assert df.agg(F.sum("score")).first()[0] == sum(i * 2.0 for i in range(10))
    feed = (
        spark.read.format("txnlog")
        .option("readChangeFeed", "true")
        .load(t.path)
    )
    assert "score" in feed.columns and feed.count() == 10


# -- maxBytesPerBatch (r10: the third rate-limit grain) ---------------------


def test_max_bytes_soft_cap_splits_backlog():
    fs = _mem_log(4, files_per_commit=2, bytes_per_file=100)
    register_planner_fs("memory", fs)
    r = _TxnLogStreamReader(
        _ID_SCHEMA,
        {"path": "memory://tbl", "maxbytesperbatch": "250"},
        cdc=False,
    )
    r.initialOffset()
    # soft cap: admit entries until the running total crosses 250 ->
    # 3 entries (300 bytes) = commit 1 fully + 1 of commit 2's 2 files
    offs = []
    off = {"version": 0}
    while off != {"version": 4}:
        off = r.latestOffset()
        offs.append(off)
        r.partitions({"version": 0} if len(offs) == 1 else offs[-2], off)
        if len(offs) > 10:
            raise AssertionError(f"did not converge: {offs}")
    assert offs[0] == {"version": 2, "files": 1}
    assert offs[-1] == {"version": 4}
    # monotone, never-regress
    keys = [(o["version"], o.get("files", float("inf"))) for o in offs]
    assert keys == sorted(keys)


def test_max_bytes_admits_at_least_one_huge_file():
    fs = _mem_log(2, files_per_commit=1, bytes_per_file=10_000)
    register_planner_fs("memory", fs)
    r = _TxnLogStreamReader(
        _ID_SCHEMA,
        {"path": "memory://tbl", "maxbytesperbatch": "1"},
        cdc=False,
    )
    r.initialOffset()
    # each file dwarfs the budget: progress must still be 1 file/batch
    assert r.latestOffset() == {"version": 1}
    r.partitions({"version": 0}, {"version": 1})
    assert r.latestOffset() == {"version": 2}


def test_max_bytes_composes_with_max_files():
    fs = _mem_log(3, files_per_commit=4, bytes_per_file=10)
    register_planner_fs("memory", fs)
    r = _TxnLogStreamReader(
        _ID_SCHEMA,
        {
            "path": "memory://tbl",
            "maxbytesperbatch": "1000",  # byte cap never binds
            "maxfilesperbatch": "3",
        },
        cdc=False,
    )
    r.initialOffset()
    assert r.latestOffset() == {"version": 1, "files": 3}


def test_max_bytes_validates():
    import pytest as _pytest

    fs = _mem_log(1)
    register_planner_fs("memory", fs)
    with _pytest.raises(ValueError, match="maxBytesPerBatch"):
        _TxnLogStreamReader(
            _ID_SCHEMA,
            {"path": "memory://tbl", "maxbytesperbatch": "0"},
            cdc=False,
        )
