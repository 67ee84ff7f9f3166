"""Round-10 registry extensions: the incremental ANN store on the
transactional table, deletion-vector DELETE, column mapping, and exact
BPE token counting.

VERDICT r9 "next round" items 1-4 — each as an exact-oracled query.
Same conventions as registry.py: every computed column aliased
identically on both engines; integer aggregates cast to BIGINT on the
DuckDB side (HUGEINT hash trap).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .phases import timed_phase
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _tmp_table_path(sf_dir: str, tag: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/spark_graft_{tag}_{base}"
    shutil.rmtree(path, ignore_errors=True)
    return path


_SKIP_LO, _SKIP_HI = "2024-01-08", "2024-01-12"


# ---------------------------------------------------------------------------
# similarity_topk_pq_txn — the INCREMENTAL ANN STORE (VERDICT r9 next
# #1): PqVectorIndex composes write-time PQ/IVF encoding with the
# transactional table — the quantizer is pinned in table PROPERTIES,
# embeddings arrive as codes through TWO exactly-once append commits
# (the daily-ingest shape), and the query scans a snapshot of stored
# codes with the probe-cell predicate pruned through the commit log's
# Hive partition layout. The oracle is the SAME composed IVF+PQ
# arithmetic as similarity_topk_ivfpq_pinned (registry_ext12._ivfpq_sql
# — one definition, the ADC math cannot diverge between the demo and
# the store): a result difference would mean the store changed the
# codes or cells. Snapshot isolation / optimize / codebook-refresh
# atomicity are pinned in tests/test_ann_txn_store.py.
# ---------------------------------------------------------------------------


def _pq_txn_sql() -> str:
    from .registry_ext12 import _ivfpq_sql

    return _ivfpq_sql()


@register("similarity_topk_pq_txn", _pq_txn_sql())
def q_similarity_topk_pq_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import similarity
    from ..operators.ann_store import PqVectorIndex
    from .registry_ext12 import _IVFPQ_NCELLS, _IVFPQ_NPROBE, _PQ_K, _PQ_KS, _PQ_M

    emb = _t(spark, sf_dir, "embeddings")
    with timed_phase("similarity_topk_pq_txn.build"):
        cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
        small = {
            r["vec_id"]: [float(v) for v in r["embedding"]]
            for r in emb.where(
                F.col("vec_id").isin(list(range(0, _IVFPQ_NCELLS + 1)))
            ).collect()
        }
        cents = [small[j] for j in range(1, _IVFPQ_NCELLS + 1)]
        qvec = small[0]
        path = _tmp_table_path(sf_dir, "pqtxn")
        idx = PqVectorIndex.create(spark, path, cbs, cents)
        idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
        idx.append(emb.where("vec_id % 2 = 1"), batch_id=1)
    return idx.topk(
        qvec, k=_PQ_K, nprobe=_IVFPQ_NPROBE, exclude_id=0
    ).withColumn("adc_dist", F.round("adc_dist", 6))


# ---------------------------------------------------------------------------
# txnlog_delete_dv — DELETE via DELETION VECTORS (VERDICT r9 next #2):
# same six-5-day-bucket ingest and 4-day DELETE as txnlog_delete_where,
# but merge-on-read — the oracle predicts the surviving content AND
# pins files_rewritten == 0 (zero data files touched; the CoW twin
# rewrites its distinct-bucket count) AND rows_deleted (every matching
# row addressed). A read path that failed to anti-join the sidecar, or
# a delete that fell back to rewriting, breaks the hash. Delta DV
# parity; CDF emission of the addressed rows is pinned in
# tests/test_txnlog_dv.py.
# ---------------------------------------------------------------------------

_DELETE_DV_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(0 AS BIGINT) AS files_rewritten,
       (SELECT CAST(count(*) AS BIGINT) FROM events
        WHERE ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
          AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00') AS rows_deleted
FROM events
WHERE NOT (ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
           AND ts < TIMESTAMP '{_SKIP_HI} 00:00:00')
GROUP BY event_type
"""


@register("txnlog_delete_dv", _DELETE_DV_SQL)
def q_txnlog_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_ext12 import _six_bucket_table

    # _six_bucket_table times its own build phase (fixture_build:txndvdel)
    t = _six_bucket_table(spark, sf_dir, "txndvdel")
    rep = t.delete_dv([("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)])
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
            "rows_deleted", F.lit(rep["rows_deleted"]).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# txnlog_column_rename — COLUMN MAPPING (VERDICT r9 next #3): ingest
# half the events under the original column name, RENAME value→amount
# (metadata-only — zero files rewritten), then append the second half
# already carrying the new logical name. The aggregate reads BOTH
# generations through the logical→physical map; sum_amount_old isolates
# the pre-rename files, so a map that fails to serve renamed columns
# from old files (NULL backfill instead of the mapped physical column)
# breaks the hash. Delta/Iceberg column-mapping parity.
# ---------------------------------------------------------------------------

_RENAME_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_amount,
       round(sum(CASE WHEN day(ts) <= 15 THEN value ELSE 0 END), 2)
         AS sum_amount_old
FROM events
GROUP BY event_type
"""


@register("txnlog_column_rename", _RENAME_SQL)
def q_txnlog_column_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    with timed_phase("txnlog_column_rename.build"):
        path = _tmp_table_path(sf_dir, "txnrename")
        ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
        first = ev.where(F.dayofmonth("ts") <= 15)
        second = ev.where(F.dayofmonth("ts") > 15)
        t = TxnTable(spark, path)
        t.append(first.coalesce(1), batch_id=0)
        t.rename_column("value", "amount")
        t.append(
            second.withColumnRenamed("value", "amount").coalesce(1),
            batch_id=1,
        )
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("amount"), 2).alias("sum_amount"),
            F.round(
                F.sum(
                    F.when(
                        F.dayofmonth("ts") <= 15, F.col("amount")
                    ).otherwise(F.lit(0.0))
                ),
                2,
            ).alias("sum_amount_old"),
        )
    )
