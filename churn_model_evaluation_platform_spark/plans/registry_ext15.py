"""Round-11 registry extensions: merge-on-read UPDATE, the commit-log
protocol guard surfaced through history, the partitioned native sink,
streaming ANN ingestion, and large-vocabulary exact BPE.

VERDICT r10 "next round" items — each as an exact-oracled query. Same
conventions as registry.py: every computed column aliased identically
on both engines; integer aggregates cast to BIGINT on the DuckDB side
(HUGEINT hash trap).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .phases import timed_phase
from .registry import register
from .registry_ext12 import _t, _tmp_table_path


_SKIP_LO, _SKIP_HI = "2024-01-08", "2024-01-12"


# ---------------------------------------------------------------------------
# txnlog_update_dv — UPDATE via DELETION VECTORS (VERDICT r10 next #5,
# Delta's DV-based update): same six-5-day-bucket ingest as the CoW
# txnlog_update_where, but merge-on-read — matching rows are superseded
# by address and their updated versions append in the SAME atomic
# commit. The oracle predicts the post-update content AND pins
# files_rewritten == 0 (zero data files touched; the CoW twin rewrites
# its distinct-bucket count) AND rows_updated. A read path that failed
# to anti-join the sidecar would double-count updated rows (the dead
# originals would still be served); an update that fell back to
# rewriting breaks files_rewritten. Change-feed delete+insert pairs and
# CoW-parity are pinned in tests/test_txnlog_update_dv.py.
# ---------------------------------------------------------------------------

_UPDATE_DV_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
                       AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00'
                      THEN value * 2 + 1 ELSE value END), 2) AS sum_value,
       CAST(0 AS BIGINT) AS files_rewritten,
       (SELECT CAST(count(*) AS BIGINT) FROM events
        WHERE ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
          AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00') AS rows_updated
FROM events
GROUP BY event_type
"""


@register("txnlog_update_dv", _UPDATE_DV_SQL)
def q_txnlog_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_ext12 import _six_bucket_table

    # _six_bucket_table times its own build phase (fixture_build:txndvupd)
    t = _six_bucket_table(spark, sf_dir, "txndvupd")
    rep = t.update_dv(
        [("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)],
        {"value": F.col("value") * 2 + 1},
    )
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn(
            "files_rewritten", F.lit(rep["files_rewritten"]).cast("long")
        )
        .withColumn(
            "rows_updated", F.lit(rep["rows_updated"]).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# txnlog_protocol_versions — the COMMIT-LOG PROTOCOL GUARD's write side
# (VERDICT r10 next #1, Delta minReaderVersion/table-features parity):
# an ingest that exercises a version-1 append, a version-2 DV delete,
# and a version-2 column rename must stamp each commit with exactly the
# min_reader / reader_features its content requires — the oracle
# predicts the full history() protocol ledger arithmetically (append
# rows from the bucket sizes, the stamp values from the spec). The
# refusal side (unknown actions/features/min_reader RAISE on every read
# path instead of folding as appends) is pinned in
# tests/test_txnlog_protocol.py — a hash here plus those tests covers
# both halves of the contract.
# ---------------------------------------------------------------------------

_PROTOCOL_SQL = f"""
WITH b AS (
  SELECT CAST(floor((day(ts) - 1) / 5) AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT CAST(bucket + 1 AS BIGINT) AS version,
       'append' AS action, n AS rows_added,
       CAST(1 AS INT) AS min_reader, '' AS reader_features
FROM b
UNION ALL
SELECT 7, 'dvdelete', CAST(0 AS BIGINT), CAST(2 AS INT), 'dv'
UNION ALL
SELECT 8, 'meta', CAST(0 AS BIGINT), CAST(2 AS INT), 'column_map'
"""


@register("txnlog_protocol_versions", _PROTOCOL_SQL)
def q_txnlog_protocol_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_ext12 import _six_bucket_table

    t = _six_bucket_table(spark, sf_dir, "txnproto")
    t.delete_dv([("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)])
    t.rename_column("value", "amount")
    return t.history().select(
        "version",
        "action",
        F.coalesce(F.col("rows_added"), F.lit(0)).alias("rows_added"),
        "min_reader",
        "reader_features",
    )


# ---------------------------------------------------------------------------
# stream_ann_ingest — STREAMING ANN INGESTION end-to-end (VERDICT r10
# next #4, the composition that was unproven): writeStream over a
# file-drop source -> foreachBatch{ dedup_gate -> PqVectorIndex.append
# (batch_id = epoch) } -> ADC top-k over the post-drain snapshot — the
# daily-increment shape: one streamed micro-batch (the odd half) gated
# against a warm cached seed store (the even half) and exactly-once
# appended. The oracle is the verbatim IVF+PQ arithmetic (_ivfpq_sql —
# the same definition similarity_topk_pq_txn and the one-shot demo
# share), so a stream that dropped, duplicated, or re-encoded the
# batch breaks the hash. Threshold 0 keeps every row (min ADC is
# strictly positive for any vector that differs from its own
# reconstruction), so the gate is exercised in-plan while the stored
# corpus stays the full embeddings table the oracle expects; rejection
# behavior, restart recovery, and epoch-replay exactly-once are pinned
# in tests/test_stream_ann_ingest.py.
# ---------------------------------------------------------------------------


def _stream_ann_sql() -> str:
    from .registry_ext12 import _ivfpq_sql

    return _ivfpq_sql()


@register("stream_ann_ingest", _stream_ann_sql())
def q_stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..operators import similarity
    from ..operators.ann_store import PqVectorIndex
    from .registry import drain_stream
    from .registry_ext12 import _IVFPQ_NCELLS, _IVFPQ_NPROBE, _PQ_K, _PQ_KS, _PQ_M

    from .fixtures import cached_fixture, clone_fixture

    emb = _t(spark, sf_dir, "embeddings")
    with timed_phase("stream_ann_ingest.build"):
        # the SEED (even-half store) and the drop file are fixtures —
        # cached per machine per embeddings-content (plans/fixtures.py);
        # the measured body is the daily-increment shape itself: ONE
        # streamed micro-batch gated against a warm store, exactly-once
        # appended, then queried. The seed clones per run (the drain
        # mutates it); restart/multi-epoch coverage lives in
        # tests/test_stream_ann_ingest.py.
        def _build(path: str) -> None:
            cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
            cents_map = {
                r["vec_id"]: [float(v) for v in r["embedding"]]
                for r in emb.where(
                    F.col("vec_id").between(1, _IVFPQ_NCELLS)
                ).collect()
            }
            cents = [cents_map[j] for j in range(1, _IVFPQ_NCELLS + 1)]
            seed = PqVectorIndex.create(spark, f"{path}/index", cbs, cents)
            seed.append(emb.where("vec_id % 2 = 0"), batch_id="seed")
            tmp = f"{path}/b1_tmp"
            emb.where("vec_id % 2 = 1").coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            os.makedirs(f"{path}/drops", exist_ok=True)
            part = glob.glob(f"{tmp}/part-*.parquet")[0]
            shutil.move(part, f"{path}/drops/b1.parquet")
            shutil.rmtree(tmp, ignore_errors=True)
            os.utime(
                f"{path}/drops/b1.parquet",
                (1_700_000_000, 1_700_000_000),
            )

        from ..operators import ann_store as _ann_mod
        from ..sources import txnlog as _txnlog_mod

        fix = cached_fixture(
            sf_dir,
            "annstream",
            ["embeddings"],
            _build,
            code_modules=(_txnlog_mod, _ann_mod, similarity),
        )
        # fixed tag (no pid): _tmp_table_path rmtree's the PRIOR run's
        # clone, so sequential bench runs self-reclaim instead of
        # leaking a full store copy per process (r11 review)
        base = clone_fixture(fix, _tmp_table_path(sf_dir, "annstream"))
        drops = f"{base}/drops"
        idx = PqVectorIndex(spark, f"{base}/index")
        qvec = [
            float(v)
            for v in emb.where("vec_id = 0").collect()[0]["embedding"]
        ]

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            if idx.table._state()["live"]:
                gated = idx.dedup_gate(
                    batch_df, threshold=0.0, nprobe=_IVFPQ_NPROBE
                )
                batch_df = batch_df.join(
                    gated.where("keep").select("vec_id"),
                    "vec_id",
                    "leftsemi",
                )
            # else: empty store — nothing to gate against
            idx.append(batch_df, batch_id=batch_id)

        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField(
                    "embedding", T.ArrayType(T.FloatType())
                ),
            ]
        )
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(drops)
            .writeStream.foreachBatch(ingest)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        drain_stream(q)
    return idx.topk(
        qvec, k=_PQ_K, nprobe=_IVFPQ_NPROBE, exclude_id=0
    ).withColumn("adc_dist", F.round("adc_dist", 6))


# ---------------------------------------------------------------------------
# txnlog_format_write_partitioned — the PARTITIONED NATIVE SINK
# (VERDICT r10 next #3): the same day-bucket Hive layout and 2-bucket
# box scan as txnlog_partition_pruning, but the table is created and
# ingested entirely through df.write.format("txnlog") with
# .option("partitionBy", "bucket") — executor tasks fan rows out into
# __p_bucket=<v>/ directories and the sink's pure-Python commit records
# the library-format stats. The SHARED oracle (one definition with the
# library twin) pins both the content and files_scanned: sink-written
# partition files must prune exactly like library-written ones, so a
# sink whose directory fan-out or stats bounds diverged breaks the
# hash. Constraint enforcement, NULL routing, and stats parity are
# pinned in tests/test_txnlog_sink_partitioned.py.
# ---------------------------------------------------------------------------


def _fmt_partprune_sql() -> str:
    from .registry_ext13 import _PARTPRUNE_SQL

    return _PARTPRUNE_SQL


@register("txnlog_format_write_partitioned", _fmt_partprune_sql())
def q_txnlog_format_write_partitioned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.txnlog import TxnTable
    from ..sources.txnlog_datasource import register_txnlog_source

    register_txnlog_source(spark)
    with timed_phase("fixture_build:txnfmtpart"):
        path = _tmp_table_path(sf_dir, "txnfmtpart")
        ev = (
            _t(spark, sf_dir, "events")
            .select(
                "event_type",
                "value",
                F.least(
                    F.floor((F.dayofmonth("ts") - 1) / 5).cast("long"),
                    F.lit(5).cast("long"),
                ).alias("bucket"),
            )
            .coalesce(1)
        )
        ev.write.format("txnlog").mode("append").option(
            "partitionBy", "bucket"
        ).save(path)
        t = TxnTable(spark, path)
    where = [("bucket", "between", (1, 2)), ("value", ">=", 10.0)]
    scanned = t.prune_report(
        [("bucket", "between", (1, 2))], distributed=True
    )["kept"]
    return (
        t.scan(where, distributed=True)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("files_scanned", F.lit(scanned).cast("long"))
    )


# ---------------------------------------------------------------------------
# token_count_bpe_large — LARGE-VOCABULARY exact BPE (VERDICT r10 next
# #2): the 64-merge replace chain is O(vocab) Catalyst expression depth
# and cannot reach a realistic vocab; this is the O(1)-plan scale path
# — explode pre-tokens, tokenize each DISTINCT word once in an
# Arrow-batched classic merge loop against the pinned 8192-entry rank
# table (operators/bpe_merges_large.py: 89 exhaustion-trained firing
# merges + deterministic inventory padding, the shape of a real 50k
# vocab against one corpus slice), join counts back, sum per doc. The
# oracle replays the identical table as ONE list_reduce replace chain
# per distinct word (chain == classic loop is pinned in
# tests/test_bpe_large.py), so a rank-order, tie, or memoization bug on
# either side breaks the hash on every document at once.
# ---------------------------------------------------------------------------


def _bpe_large_sql() -> str:
    from ..operators.bpe import vocab_count_sql

    return vocab_count_sql()


@register("token_count_bpe_large", _bpe_large_sql())
def q_token_count_bpe_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_count_vocab

    return bpe_token_count_vocab(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# sequence_pack_bpe_large — the pretraining packing layout keyed on the
# LARGE-VOCAB exact token stream: the same range-partitioned prefix sum
# and integer window arithmetic as sequence_pack / _bpe_exact, with
# per-doc counts from the 8192-entry rank table's distinct-word path —
# the composition a real token-budgeted data pipeline runs (tokenizer
# at realistic vocab size -> budget arithmetic). The oracle nests the
# list_reduce replay as the counts CTE and reuses the pinned packing
# tail, so a drift in EITHER the tokenizer or the prefix sum breaks
# every doc's pack assignment at once.
# ---------------------------------------------------------------------------


def _pack_large_sql() -> str:
    from ..operators.bpe import vocab_count_sql
    from .registry_ext14 import _PACK_EXACT_TAIL

    return (
        f"WITH t AS ({vocab_count_sql()})" + _PACK_EXACT_TAIL
    )


@register("sequence_pack_bpe_large", _pack_large_sql())
def q_sequence_pack_bpe_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_count_vocab
    from ..operators.text import sequence_pack

    docs = _t(spark, sf_dir, "documents")
    counts = bpe_token_count_vocab(docs).withColumnRenamed(
        "n_tokens_exact", "n_tokens"
    )
    return sequence_pack(docs, ctx_len=512, counts_df=counts)


# ---------------------------------------------------------------------------
# ann_delete_vectors — GDPR ERASURE from the incremental vector index
# (r11): PqVectorIndex.delete = merge-on-read delete_dv on the code
# table — erasing a vec-id band from the index writes O(deleted rows)
# of addresses, rewrites ZERO code files, and every query path serves
# the post-erasure snapshot. The oracle is the shared _ivfpq_sql with
# the deleted band excluded (surgical, assertion-guarded edits on the
# ONE ADC definition) and pins files_rewritten == 0 + rows_deleted =
# the band's corpus population — a top-k that still surfaces an erased
# vector, or a delete that fell back to rewriting, breaks the hash.
# ---------------------------------------------------------------------------

_ANN_DEL_LO, _ANN_DEL_HI = 100, 200


def _ann_delete_sql() -> str:
    from .registry_ext12 import _ivfpq_sql

    sql = _ivfpq_sql()
    old_where = "WHERE a0.vec_id <> 0"
    assert old_where in sql
    sql = sql.replace(
        old_where,
        old_where
        + f"\n    AND (a0.vec_id < {_ANN_DEL_LO} OR a0.vec_id >= {_ANN_DEL_HI})",
        1,
    )
    old_sel = "SELECT vec_id, round(adc, 6) AS adc_dist FROM ("
    assert old_sel in sql
    sql = sql.replace(
        old_sel,
        "SELECT vec_id, round(adc, 6) AS adc_dist,\n"
        "       CAST(0 AS BIGINT) AS files_rewritten,\n"
        f"       (SELECT CAST(count(*) AS BIGINT) FROM e\n"
        f"        WHERE vec_id >= {_ANN_DEL_LO} AND vec_id < {_ANN_DEL_HI})"
        " AS rows_deleted FROM (",
        1,
    )
    return sql


@register("ann_delete_vectors", _ann_delete_sql())
def q_ann_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    from ..operators import ann_store as _ann_mod
    from ..operators.ann_store import PqVectorIndex
    from ..sources import txnlog as _txnlog_mod
    from .fixtures import cached_fixture, clone_fixture
    from .registry_ext12 import _IVFPQ_NCELLS, _IVFPQ_NPROBE, _PQ_K, _PQ_KS, _PQ_M

    emb = _t(spark, sf_dir, "embeddings")
    with timed_phase("fixture_build:anndelete"):
        # same pristine full-corpus store as similarity_topk_pq_txn —
        # CLONED, because the erasure mutates it
        def _build(path: str) -> None:
            cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
            cents_map = {
                r["vec_id"]: [float(v) for v in r["embedding"]]
                for r in emb.where(
                    F.col("vec_id").between(1, _IVFPQ_NCELLS)
                ).collect()
            }
            cents = [cents_map[j] for j in range(1, _IVFPQ_NCELLS + 1)]
            idx = PqVectorIndex.create(spark, path, cbs, cents)
            idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
            idx.append(emb.where("vec_id % 2 = 1"), batch_id=1)

        base = cached_fixture(
            sf_dir,
            "pqtxn",
            ["embeddings"],
            _build,
            code_modules=(_txnlog_mod, _ann_mod, similarity),
        )
        path = clone_fixture(base, _tmp_table_path(sf_dir, "anndelete"))
        idx = PqVectorIndex(spark, path)
        qvec = [
            float(v)
            for v in emb.where("vec_id = 0").collect()[0]["embedding"]
        ]
    rep = idx.delete(
        [("vec_id", ">=", _ANN_DEL_LO), ("vec_id", "<", _ANN_DEL_HI)]
    )
    return (
        idx.topk(qvec, k=_PQ_K, nprobe=_IVFPQ_NPROBE, exclude_id=0)
        .withColumn("adc_dist", F.round("adc_dist", 6))
        .withColumn(
            "files_rewritten", F.lit(rep["files_rewritten"]).cast("long")
        )
        .withColumn(
            "rows_deleted", F.lit(rep["rows_deleted"]).cast("long")
        )
    )
