"""Round-10 review fixes: URI-authority relpath derivation, conditional
(lost-update-safe) set_properties / map-updating appends, the ANN
store's codebook pinning under concurrent refresh, and the file-capped
stream offset computing its counts in one log fold per trigger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import similarity
from churn_model_evaluation_platform_spark.operators.ann_store import (
    PROP_VERSION,
    PqVectorIndex,
)
from churn_model_evaluation_platform_spark.sources.testdata import load_table
from churn_model_evaluation_platform_spark.sources.txnlog import (
    CommitConflict,
    TxnTable,
)

SF = "/root/testdata/sf0.001"
M, KS, NCELLS = 4, 8, 16


# -- URI → path (review #1: authority must strip like toUri().getPath())


@pytest.mark.parametrize(
    "uri,expected",
    [
        ("hdfs://nn:8020/tbl/data/x.parquet", "/tbl/data/x.parquet"),
        ("s3a://bucket/tbl/data/x.parquet", "/tbl/data/x.parquet"),
        ("file:///tbl/data/x.parquet", "/tbl/data/x.parquet"),
        ("file:/tbl/data/x.parquet", "/tbl/data/x.parquet"),
        ("/tbl/data/x.parquet", "/tbl/data/x.parquet"),
    ],
)
def test_uri_path_expr_strips_scheme_and_authority(spark, uri, expected):
    got = (
        spark.range(1)
        .select(TxnTable._uri_path_expr(F.lit(uri)).alias("p"))
        .first()["p"]
    )
    assert got == expected


# -- set_properties lost-update protection (review #5)


def test_set_properties_concurrent_merge(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "props")
    t1 = TxnTable(spark, path)
    t1.append(spark.range(3).coalesce(1))
    t2 = TxnTable(spark, path)

    orig = t1._commit
    state = {"n": 0}

    def racy(*a, **k):
        if state["n"] == 0 and k.get("properties") is not None:
            state["n"] += 1
            t2.set_properties({"rival": 1})  # lands between read & commit
        return orig(*a, **k)

    monkeypatch.setattr(t1, "_commit", racy)
    t1.set_properties({"mine": 2})
    props = TxnTable(spark, path).properties()
    # before the fix the unconditional merge-commit erased 'rival'
    assert props == {"rival": 1, "mine": 2}


def test_map_updating_append_is_conditional(spark, tmp_path, monkeypatch):
    # re-adding a DROPPED column forces a map_update commit; a rival
    # meta commit landing in between must rebase, not clobber the map
    path = str(tmp_path / "mapapp")
    t1 = TxnTable(spark, path, schema_mode="additive")
    t1.append(
        spark.range(3).select(
            F.col("id"), F.lit(1.0).alias("value")
        ).coalesce(1)
    )
    t1.drop_column("value")
    t2 = TxnTable(spark, path)

    orig = t1._commit
    state = {"n": 0}

    def racy(*a, **k):
        if state["n"] == 0 and k.get("column_map") is not None:
            state["n"] += 1
            t2.set_properties({"rival": 1})
        return orig(*a, **k)

    monkeypatch.setattr(t1, "_commit", racy)
    t1.append(
        spark.range(3, 6).select(
            F.col("id"), F.lit(2.0).alias("value")
        ).coalesce(1)
    )
    fresh = TxnTable(spark, path)
    assert fresh.properties() == {"rival": 1}
    rows = fresh.snapshot().where("value = 2.0").count()
    assert rows == 3  # the re-added column reads through the merged map


# -- ANN store: append pinned to the codebook version it read (review #3)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF).cache()


@pytest.fixture(scope="module")
def quantizers(spark, emb):
    cbs = similarity.pq_codebooks_pinned(emb, m=M, ks=KS)
    small = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.where(
            F.col("vec_id").isin(list(range(0, NCELLS + 1)))
        ).collect()
    }
    cents = [small[j] for j in range(1, NCELLS + 1)]
    # a distinguishable second-generation quantizer: shifted codebooks
    cbs2 = [[[v + 0.25 for v in c] for c in book] for book in cbs]
    return cbs, cents, cbs2


def test_append_reencodes_after_concurrent_refresh(
    spark, emb, quantizers, tmp_path, monkeypatch
):
    cbs, cents, cbs2 = quantizers
    path = str(tmp_path / "race")
    idx = PqVectorIndex.create(spark, path, cbs, cents)
    idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)

    orig = idx.table.append
    state = {"n": 0}

    def racy_append(df, **k):
        if state["n"] == 0:
            state["n"] += 1
            PqVectorIndex(spark, path).reencode(
                emb.where("vec_id % 2 = 0"), cbs2, cents
            )
        return orig(df, **k)

    monkeypatch.setattr(idx.table, "append", racy_append)
    idx.append(emb.where("vec_id % 2 = 1"), batch_id=1)

    fresh = PqVectorIndex(spark, path)
    assert fresh.codebook_version() == 2
    # the conflicted batch must carry SECOND-generation codes: recompute
    # the expected encoding under cbs2 and compare a sample
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in fresh.table.snapshot().where("vec_id % 2 = 1").collect()
    }
    want = {
        r["vec_id"]: list(r["c"])
        for r in emb.where("vec_id % 2 = 1")
        .select(
            "vec_id",
            similarity.pq_encode_expr(F.col("embedding"), cbs2).alias("c"),
        )
        .collect()
    }
    assert got == want


def test_reencode_conflicts_on_racing_append(
    spark, emb, quantizers, tmp_path, monkeypatch
):
    cbs, cents, cbs2 = quantizers
    path = str(tmp_path / "race2")
    idx = PqVectorIndex.create(spark, path, cbs, cents)
    idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)

    orig = idx.table.overwrite
    state = {"n": 0}

    def racy_overwrite(df, **k):
        if state["n"] == 0:
            state["n"] += 1
            PqVectorIndex(spark, path).append(
                emb.where("vec_id % 2 = 1"), batch_id=1
            )
        return orig(df, **k)

    monkeypatch.setattr(idx.table, "overwrite", racy_overwrite)
    # the racing append would be silently wiped by an unconditional
    # overwrite — it must surface as a conflict instead
    with pytest.raises(CommitConflict):
        idx.reencode(emb.where("vec_id % 2 = 0"), cbs2, cents)
    fresh = PqVectorIndex(spark, path)
    assert fresh.codebook_version() == 1  # refresh did NOT land
    assert fresh.table.snapshot().count() == emb.count()  # append kept


def test_create_open_roundtrip_partition_layout(
    spark, emb, quantizers, tmp_path
):
    # create() now builds through __init__ (review #7): the declared
    # ivf_cell layout must land in the log and be adopted on reopen
    cbs, cents, _ = quantizers
    idx = PqVectorIndex.create(spark, str(tmp_path / "layout"), cbs, cents)
    idx.append(emb.where("vec_id < 50"), batch_id=0)
    reopened = PqVectorIndex(spark, idx.path)
    assert reopened.table.partition_by == ["ivf_cell"]


# -- file-capped offsets: one log fold per trigger (review #2)


def test_capped_latest_offset_bounded_listings():
    from tests.test_txnlog_datasource_r10 import _ID_SCHEMA, _mem_log
    from churn_model_evaluation_platform_spark.sources.plannerfs import (
        register_planner_fs,
    )
    from churn_model_evaluation_platform_spark.sources.txnlog_datasource import (
        _TxnLogStreamReader,
    )

    fs = _mem_log(120, files_per_commit=2)
    register_planner_fs("memory", fs)
    r = _TxnLogStreamReader(
        _ID_SCHEMA,
        {"path": "memory://tbl", "maxfilesperbatch": "5"},
        cdc=False,
    )
    r.initialOffset()
    before = fs.calls.get("listdir", 0)
    off = r.latestOffset()  # caps a 240-entry backlog at 5 entries
    per_trigger = fs.calls.get("listdir", 0) - before
    # the fixed path folds the window ONCE (one log list + one ckpt
    # list); the per-commit _flat_len bug did 2 lists x window commits
    assert per_trigger <= 4, per_trigger
    assert off["version"] <= 4  # the cap engaged


# -- phase timing: nested timers must not double-count (bench split)


def test_timed_phase_nesting_records_once():
    import time

    from churn_model_evaluation_platform_spark.plans import phases

    phases.drain()
    with phases.timed_phase("outer"):
        with phases.timed_phase("outer"):  # same-name nesting
            time.sleep(0.02)
        with phases.timed_phase("inner"):  # different-name nesting
            time.sleep(0.02)
    got = phases.drain()
    assert set(got) == {"outer"}  # only the outermost block records
    assert 0.03 <= got["outer"] < 1.0
    assert phases.drain() == {}  # drain resets
