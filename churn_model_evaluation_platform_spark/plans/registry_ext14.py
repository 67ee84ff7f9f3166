"""Round-10 registry extensions: the incremental ANN store on the
transactional table, deletion-vector DELETE, column mapping, and exact
BPE token counting.

VERDICT r9 "next round" items 1-4 — each as an exact-oracled query.
Same conventions as registry.py: every computed column aliased
identically on both engines; integer aggregates cast to BIGINT on the
DuckDB side (HUGEINT hash trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .phases import timed_phase
from .registry import register
from .registry_ext12 import _t, _tmp_table_path


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


# ---------------------------------------------------------------------------
# token_count_bpe_exact — REAL BPE token counting (VERDICT r9 next #4):
# a pinned fixture-trained merges table (operators/bpe.py, trained by
# tools/train_bpe.py) applied as a chain of JVM-side replace() calls
# over the separator-wrapped char representation — exact merge-order
# tokenization entirely inside whole-stage codegen, zero Python. The
# oracle replays the IDENTICAL wrap + replace chain in DuckDB
# (bpe.exact_token_count_sql — one spec, two engines), and
# tests/test_bpe_exact.py proves the chain equals the classic
# lowest-rank-pair merge loop on every corpus doc plus the Sennrich
# textbook case. token_count_bpe (registry_ext4) counts PRE-tokens
# only; this is the exact count a data-mixing pipeline budgets with.
# ---------------------------------------------------------------------------


def _bpe_exact_cte(cols: str = "doc_id") -> str:
    from ..operators.bpe import exact_token_count_sql

    s_expr, count_expr = exact_token_count_sql("text")
    return (
        f"WITH m AS (SELECT {cols}, {s_expr} AS s FROM documents),\n"
        f"t AS (SELECT {cols}, {count_expr} AS n_tokens_exact FROM m)\n"
    )


@register(
    "token_count_bpe_exact",
    _bpe_exact_cte() + "SELECT doc_id, n_tokens_exact FROM t",
)
def q_token_count_bpe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_count

    return bpe_token_count(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# corpus_mix_exact — corpus_mix_report RE-KEYED on the exact BPE count:
# the (lang, source) token budget a mixture owner signs off, now under
# the real tokenizer arithmetic instead of the whitespace proxy. Same
# plan shape as corpus_mix_report (grouped agg + broadcast single-row
# total); only the per-doc counter changed.
# ---------------------------------------------------------------------------

_MIX_EXACT_TAIL = """
, g AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens_exact) AS BIGINT) AS n_tokens
  FROM t GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM g)
SELECT lang, source, n_docs, n_tokens,
       round(n_tokens / total, 6) AS token_share
FROM g, tot
"""


@register(
    "corpus_mix_exact",
    _bpe_exact_cte("doc_id, lang, source") + _MIX_EXACT_TAIL,
)
def q_corpus_mix_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_count_col

    docs = _t(spark, sf_dir, "documents")
    g = (
        docs.select(
            "lang",
            "source",
            bpe_token_count_col(F.col("text")).alias("n"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )
    tot = g.agg(F.sum("n_tokens").cast("double").alias("total"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("total"), 6).alias("token_share"),
    )


# ---------------------------------------------------------------------------
# sequence_pack_bpe_exact — concat-then-chunk packing keyed on the
# EXACT token stream: same range-partitioned prefix sum and integer
# window arithmetic as sequence_pack, with the real per-doc counts, so
# pack boundaries land where the trained-on token stream actually
# breaks.
# ---------------------------------------------------------------------------

_PACK_EXACT_TAIL = """
, c AS (SELECT doc_id, n_tokens_exact AS n_tokens,
               sum(n_tokens_exact) OVER (ORDER BY doc_id) AS cum FROM t)
SELECT doc_id, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_first,
       CAST(greatest((cum - n_tokens) // 512, (cum - 1) // 512) AS BIGINT)
         AS pack_last
FROM c
"""


@register(
    "sequence_pack_bpe_exact", _bpe_exact_cte() + _PACK_EXACT_TAIL
)
def q_sequence_pack_bpe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_token_count_col
    from ..operators.text import sequence_pack

    return sequence_pack(
        _t(spark, sf_dir, "documents"),
        ctx_len=512,
        counter=bpe_token_count_col,
    )
