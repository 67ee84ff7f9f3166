"""Streaming ANN ingestion end-to-end (round 11, VERDICT r10 next #4):
writeStream -> foreachBatch{dedup_gate -> PqVectorIndex.append(batch_id
= epoch)} -> query, ACROSS A RESTART — a replayed epoch is a no-op, the
restarted stream resumes from the checkpoint (no double-ingest), gate
rejections never land, and a query planned mid-ingest stays pinned to
its snapshot."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from churn_model_evaluation_platform_spark.operators import similarity
from churn_model_evaluation_platform_spark.operators.ann_store import PqVectorIndex
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"
M, KS, NCELLS, NPROBE = 4, 8, 16, 4

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF).cache()


@pytest.fixture(scope="module")
def pinned(spark, emb):
    cbs = similarity.pq_codebooks_pinned(emb, m=M, ks=KS)
    cents = [
        [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").between(1, NCELLS))
        .orderBy("vec_id")
        .collect()
    ]
    return cbs, cents


def _drop(df, drops: str, name: str, mtime: int) -> None:
    tmp = f"{drops}/{name}_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, f"{drops}/{name}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(f"{drops}/{name}.parquet", (mtime, mtime))


def _drain(spark, drops, ckpt, ingest):
    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def test_stream_gate_append_restart(spark, emb, pinned, tmp_path):
    cbs, cents = pinned
    drops = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drops, exist_ok=True)
    idx = PqVectorIndex.create(spark, str(tmp_path / "index"), cbs, cents)

    epochs: list[int] = []

    def ingest(batch_df, batch_id: int) -> None:
        epochs.append(batch_id)
        if idx.table._state()["live"]:
            gated = idx.dedup_gate(batch_df, threshold=0.0, nprobe=NPROBE)
            batch_df = batch_df.join(
                gated.where("keep").select("vec_id"), "vec_id", "leftsemi"
            )
        idx.append(batch_df, batch_id=batch_id)

    # ---- first run: two drops → two epochs ------------------------------
    b0 = emb.where("vec_id % 2 = 0")
    b1 = emb.where("vec_id % 2 = 1 AND vec_id < 300")
    _drop(b0, drops, "b0", 1_700_000_000)
    _drop(b1, drops, "b1", 1_700_000_001)
    _drain(spark, drops, ckpt, ingest)
    assert epochs == [0, 1]
    n_all = emb.count()
    n0, n1 = b0.count(), b1.count()
    assert idx.table.snapshot().count() == n0 + n1

    # ---- restart with one NEW drop: resumes from the checkpoint ---------
    b2 = emb.where("vec_id % 2 = 1 AND vec_id >= 300")
    _drop(b2, drops, "b2", 1_700_000_002)
    _drain(spark, drops, ckpt, ingest)
    assert epochs == [0, 1, 2]  # b0/b1 never re-delivered
    assert idx.table.snapshot().count() == n_all

    # ---- epoch replay (a crash between append and offset commit):
    # exactly-once — the replayed batch_id is a no-op commit ---------------
    v = idx.table.latest_version()
    idx.append(b1, batch_id=1)
    assert idx.table.latest_version() == v
    assert idx.table.snapshot().count() == n_all

    # ---- the drained index answers identically to a one-shot build ------
    small = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where("vec_id = 0").collect()
    }
    qvec = small[0]
    got = [
        (r["vec_id"], round(r["adc_dist"], 6))
        for r in idx.topk(qvec, k=10, nprobe=NPROBE, exclude_id=0)
        .withColumn("adc_dist", F.round("adc_dist", 6))
        .collect()
    ]
    one_shot = PqVectorIndex.create(
        spark, str(tmp_path / "oneshot"), cbs, cents
    )
    one_shot.append(emb, batch_id=0)
    want = [
        (r["vec_id"], round(r["adc_dist"], 6))
        for r in one_shot.topk(qvec, k=10, nprobe=NPROBE, exclude_id=0)
        .withColumn("adc_dist", F.round("adc_dist", 6))
        .collect()
    ]
    assert got == want


def test_stream_gate_rejections_never_land(spark, emb, pinned, tmp_path):
    cbs, cents = pinned
    drops = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drops, exist_ok=True)
    idx = PqVectorIndex.create(spark, str(tmp_path / "index"), cbs, cents)

    # rejection threshold: any duplicate of a stored vector scores at
    # most its own quantization error; 10.0 is far above every
    # self-floor on this fixture (cf. tests/test_ann_dedup_gate.py)
    def ingest(batch_df, batch_id: int) -> None:
        if idx.table._state()["live"]:
            gated = idx.dedup_gate(batch_df, threshold=10.0, nprobe=NPROBE)
            batch_df = batch_df.join(
                gated.where("keep").select("vec_id"), "vec_id", "leftsemi"
            )
        idx.append(batch_df, batch_id=batch_id)

    seed = emb.where("vec_id % 2 = 0")
    dups = seed.where("vec_id < 60").withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    _drop(seed, drops, "b0", 1_700_000_000)
    _drop(dups, drops, "b1", 1_700_000_001)
    _drain(spark, drops, ckpt, ingest)
    n_seed = seed.count()
    snap = idx.table.snapshot()
    # every duplicate was gated out; the seed landed whole
    assert snap.count() == n_seed
    assert snap.where("vec_id >= 1000000").count() == 0


def test_query_pinned_to_snapshot_during_ingest(spark, emb, pinned, tmp_path):
    cbs, cents = pinned
    idx = PqVectorIndex.create(spark, str(tmp_path / "index"), cbs, cents)
    idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
    small = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where("vec_id = 0").collect()
    }
    qvec = small[0]
    plan = idx.topk(qvec, k=10, nprobe=NPROBE, exclude_id=0)  # pinned now
    before = [tuple(r) for r in plan.collect()]
    idx.append(emb.where("vec_id % 2 = 1"), batch_id=1)  # lands mid-flight
    after = [tuple(r) for r in plan.collect()]
    assert before == after  # snapshot isolation: the new batch never leaks in
