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

    from .fixtures import cached_fixture

    emb = _t(spark, sf_dir, "embeddings")
    with timed_phase("similarity_topk_pq_txn.build"):
        # the store builds ONCE per machine per embeddings-content
        # (plans/fixtures.py, r11): the query is read-only (topk over a
        # snapshot), so it reuses the pristine cached index directly —
        # ingest cost stops recurring in every bench run
        def _build(path: str) -> None:
            cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
            cents_rows = emb.where(
                F.col("vec_id").between(1, _IVFPQ_NCELLS)
            ).collect()
            cents_map = {
                r["vec_id"]: [float(v) for v in r["embedding"]]
                for r in cents_rows
            }
            cents = [cents_map[j] for j in range(1, _IVFPQ_NCELLS + 1)]
            idx = PqVectorIndex.create(spark, path, cbs, cents)
            idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)
            idx.append(emb.where("vec_id % 2 = 1"), batch_id=1)

        from ..operators import ann_store as _ann_mod
        from ..sources import txnlog as _txnlog_mod

        path = cached_fixture(
            sf_dir,
            "pqtxn",
            ["embeddings"],
            _build,
            code_modules=(_txnlog_mod, _ann_mod, similarity),
        )
        idx = PqVectorIndex(spark, path)
        qvec = [
            float(v)
            for v in emb.where("vec_id = 0").collect()[0]["embedding"]
        ]
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


# ---------------------------------------------------------------------------
# ann_dedup_gate — the EMBEDDING NEAR-DUP GATE on the incremental ANN
# store (the vector analog of dedup_incremental, closing VERDICT r9's
# "embeddings have no incremental-dedup equivalent"): the even half of
# the corpus is ingested as PQ codes, then the odd half is gated BEFORE
# append — each new vector probes its nprobe IVF cells, ADC-scores the
# stored codes there (per-row distance tables riding a broadcast join;
# candidates are nprobe/n_cells of the store, never all-pairs), and
# keep = min_adc > threshold. The oracle replays probe selection, cell
# assignment, code assignment, and the ADC sum from ext12's shared CTE
# fragments (one definition of the arithmetic), aggregates the same
# min, and applies the same threshold — a gate that scored the wrong
# candidates, dropped a no-candidate row, or mixed up the tie order
# breaks the hash.
# ---------------------------------------------------------------------------

_GATE_THRESH = 1.25  # rejects ~25% of the odd half at sf0.001 — a real mix


def _gate_sql() -> str:
    # assembled from ext12's SHARED PQ oracle fragments (one definition
    # of the distance-table/join/ADC arithmetic — r8/r10 review): only
    # the query-set predicate differs (the whole odd half vs the pinned
    # audit qids)
    from .registry_ext12 import (
        _IVFPQ_NCELLS,
        _IVFPQ_NPROBE,
        _pq_adc,
        _pq_cte_block,
        _pq_dt_ctes,
        _pq_joins,
    )

    dtqs = _pq_dt_ctes(per_qid=True, qid_pred="vec_id % 2 = 1")
    joins = _pq_joins(per_qid=True)
    return f"""
WITH {_pq_cte_block()},
{",".join(dtqs)},
cents AS (
  SELECT CAST(vec_id - 1 AS INT) AS cid, ev AS cv
  FROM e WHERE vec_id BETWEEN 1 AND {_IVFPQ_NCELLS}
),
probes AS (
  SELECT vec_id AS qid, cid FROM (
    SELECT n.vec_id, c.cid,
           row_number() OVER (PARTITION BY n.vec_id ORDER BY
             list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
             + list_dot_product(cv, cv), c.cid) AS rn
    FROM (SELECT vec_id, ev FROM e WHERE vec_id % 2 = 1) n
    CROSS JOIN cents c) WHERE rn <= {_IVFPQ_NPROBE}
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
             + list_dot_product(cv, cv), c.cid) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
),
cand AS (
  SELECT dtq0.qid, {_pq_adc(per_qid=True)} AS adc
  FROM a0 {joins}
  JOIN assign ON assign.vec_id = a0.vec_id
  JOIN probes p ON p.qid = dtq0.qid AND p.cid = assign.cid
  WHERE a0.vec_id % 2 = 0
),
mins AS (SELECT qid, min(adc) AS min_adc FROM cand GROUP BY qid)
SELECT n.vec_id, round(m.min_adc, 6) AS min_adc,
       (m.min_adc IS NULL OR m.min_adc > {_GATE_THRESH}) AS keep
FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1) n
LEFT JOIN mins m ON m.qid = n.vec_id
"""


def _gate_fixture_index(spark: SparkSession, sf_dir: str):
    """The cached even-half PQ index the gate queries score against —
    shared by ann_dedup_gate (broadcast path) and
    ann_dedup_gate_shuffle (r12's non-broadcast backfill path)."""
    from ..operators import similarity
    from ..operators.ann_store import PqVectorIndex
    from .registry_ext12 import _IVFPQ_NCELLS, _PQ_KS, _PQ_M

    from .fixtures import cached_fixture

    emb = _t(spark, sf_dir, "embeddings")
    with timed_phase("fixture_build:anngate"):
        # read-only consumer of a cached store (r11, fixtures.py): the
        # gate only scans codes, so the even-half index builds once per
        # machine per embeddings-content
        def _build(path: str) -> None:
            cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
            cents = [
                [float(v) for v in r["embedding"]]
                for r in emb.where(
                    F.col("vec_id").between(1, _IVFPQ_NCELLS)
                )
                .orderBy("vec_id")
                .collect()
            ]
            idx = PqVectorIndex.create(spark, path, cbs, cents)
            idx.append(emb.where("vec_id % 2 = 0"), batch_id=0)

        from ..operators import ann_store as _ann_mod
        from ..sources import txnlog as _txnlog_mod

        path = cached_fixture(
            sf_dir,
            "anngate",
            ["embeddings"],
            _build,
            code_modules=(_txnlog_mod, _ann_mod, similarity),
        )
        return PqVectorIndex(spark, path)


@register("ann_dedup_gate", _gate_sql())
def q_ann_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_ext12 import _IVFPQ_NPROBE

    idx = _gate_fixture_index(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    return idx.dedup_gate(
        emb.where("vec_id % 2 = 1"),
        threshold=_GATE_THRESH,
        nprobe=_IVFPQ_NPROBE,
    )


# ---------------------------------------------------------------------------
# txnlog_merge_dv — MERGE-ON-READ MERGE (Delta MERGE + deletion
# vectors): the exact cdc_upsert changelog folded into a 4-file txn
# table via merge_dv — matched rows are superseded by DV addresses
# (zero data files rewritten), post-merge row versions append as new
# files, one atomic commit. The oracle replays cdc_apply's full-outer
# semantics (same SQL skeleton as cdc_upsert, aggregated per segment —
# inserts land in the NULL-segment group) and pins files_rewritten = 0
# plus the two row-level facts: rows_deleted = snapshot keys the
# changelog touches, rows_appended = effective non-delete changes. A
# merge that fell back to rewriting, dropped an insert's NULL backfill,
# or mis-resolved the latest change per key breaks the hash.
# ---------------------------------------------------------------------------

_MERGE_DV_SQL = """
WITH snap AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
  WHERE c_custkey % 3 <> 0
),
ch AS (
  SELECT o_custkey AS c_custkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         o_totalprice AS new_bal,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
),
last AS (SELECT c_custkey, op, new_bal FROM ch WHERE rn = 1),
merged AS (
  SELECT COALESCE(s.c_custkey, l.c_custkey) AS c_custkey,
         CASE WHEN l.op = 'U' THEN l.new_bal ELSE s.c_acctbal END AS c_acctbal,
         s.c_mktsegment AS c_mktsegment
  FROM snap s FULL OUTER JOIN last l ON s.c_custkey = l.c_custkey
  WHERE l.op IS NULL OR l.op <> 'D'
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(c_acctbal), 2) AS sum_bal,
       CAST(0 AS BIGINT) AS files_rewritten,
       (SELECT CAST(count(*) AS BIGINT) FROM snap s
        JOIN last l ON l.c_custkey = s.c_custkey) AS rows_deleted,
       (SELECT CAST(count(*) AS BIGINT) FROM last WHERE op <> 'D')
         AS rows_appended
FROM merged
GROUP BY c_mktsegment
"""


@register("txnlog_merge_dv", _MERGE_DV_SQL)
def q_txnlog_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    with timed_phase("fixture_build:txnmergedv"):
        path = _tmp_table_path(sf_dir, "txnmergedv")
        snap = (
            _t(spark, sf_dir, "customer")
            .where(F.col("c_custkey") % 3 != 0)
            .select("c_custkey", "c_acctbal", "c_mktsegment")
        )
        t = TxnTable(spark, path)
        t.append(snap.repartition(4), batch_id=0)
    orders = _t(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_orderdate",
        "o_orderkey",
        F.col("o_totalprice").alias("c_acctbal"),
    )
    rep = t.merge_dv(
        changes,
        keys=["c_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        op_col="op",
    )
    return (
        t.snapshot()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .withColumn(
            "files_rewritten", F.lit(rep["files_rewritten"]).cast("long")
        )
        .withColumn("rows_deleted", F.lit(rep["rows_deleted"]).cast("long"))
        .withColumn(
            "rows_appended", F.lit(rep["rows_appended"]).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# txnlog_format_write — the NATIVE BATCH WRITER: the same six-bucket
# ingest as txnlog_format_scan, but through df.write.format("txnlog")
# (one atomic commit per save; executor tasks stage pyarrow part files,
# the sink's pure-Python commit claims the next version via conditional
# put and records the library-format per-file stats). Read back through
# the format's pushed-filter scan — the SAME oracle as
# txnlog_format_scan, so sink-written stats must prune exactly like
# library-written ones: a sink whose stats encoding diverged (tz, NaN,
# kind tags) changes files_scanned and breaks the hash.
# ---------------------------------------------------------------------------


def _fmt_write_sql() -> str:
    from .registry_ext13 import _FMT_SCAN_SQL

    return _FMT_SCAN_SQL


@register("txnlog_format_write", _fmt_write_sql())
def q_txnlog_format_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same shared body as txnlog_format_scan (one definition — the two
    # plans must stay bit-identical for the shared oracle, r10 review);
    # only the ingest mechanism differs: the native sink, one atomic
    # commit per save
    from .registry_ext13 import _format_pushdown_query

    def ingest(path, slices):
        for s in slices:
            s.write.format("txnlog").mode("append").save(path)

    return _format_pushdown_query(spark, sf_dir, "txnfmtw", ingest)


# ---------------------------------------------------------------------------
# txnlog_stream_sink — the NATIVE STREAMING SINK: the change feed of a
# six-commit source table piped through Spark's own streaming machinery
# into a second txn table (readStream.format("txnlog") →
# writeStream.format("txnlog"), availableNow) — the full
# txnlog-to-txnlog replication loop with exactly-once commits keyed by
# sinkId:batchId. The oracle predicts the replicated content from the
# source rows AND pins n_sink_commits == 1 (one availableNow drain =
# one uncapped micro-batch = one atomic sink commit); a double-commit
# replay or a lossy pipe breaks the hash. Restart/replay no-op and
# incremental-commit semantics are pinned in tests/test_txnlog_sink.py.
# ---------------------------------------------------------------------------

_STREAM_SINK_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(1 AS BIGINT) AS n_sink_commits
FROM events
GROUP BY event_type
"""


@register("txnlog_stream_sink", _STREAM_SINK_SQL)
def q_txnlog_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable
    from ..sources.txnlog_datasource import register_txnlog_source
    from .registry_ext12 import _six_bucket_table

    register_txnlog_source(spark)
    # _six_bucket_table times its own build phase (fixture_build:txnsinksrc)
    src = _six_bucket_table(spark, sf_dir, "txnsinksrc")
    dst_path = _tmp_table_path(sf_dir, "txnsinkdst")
    ckpt = _tmp_table_path(sf_dir, "txnsinkckpt")  # rmtree'd by the helper
    q = (
        spark.readStream.format("txnlog")
        .option("startVersion", 0)
        .load(src.path)
        .writeStream.format("txnlog")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(dst_path)
    )
    if not q.awaitTermination(600):
        q.stop()  # never read a half-replicated destination (r10 review)
        raise TimeoutError("txnlog_stream_sink drain exceeded 600s")
    dst = TxnTable(spark, dst_path)
    n_commits = len(dst.versions())
    return (
        dst.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("n_sink_commits", F.lit(n_commits).cast("long"))
    )
