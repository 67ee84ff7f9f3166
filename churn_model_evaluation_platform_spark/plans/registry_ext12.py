"""Round-8 registry extensions, part 2: DATA SKIPPING on the
transactional table (sources/txnlog.py) — per-file column stats in the
commit log, driver-side file pruning, and OPTIMIZE ZORDER BY.

These close the last piece of VERDICT r7 missing #5 ("a 100 TB metrics
store would sit on a transactional format"): the txn table now carries
the two table-format features that actually matter at 100 TB — atomic
commits (round-8 part 1) and statistics-based scan pruning (this
module). Parity target: Delta's data-skipping + OPTIMIZE ZORDER
semantics, rebuilt on plain parquet; the reference itself has neither
(churn_prediction_pipeline.py appends bare parquet).

Same conventions as registry.py: every computed column aliased
identically on both engines; integer aggregates cast to BIGINT on the
DuckDB side (HUGEINT hash trap).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.testdata import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _tmp_table_path(sf_dir: str, tag: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/spark_graft_{tag}_{base}"
    shutil.rmtree(path, ignore_errors=True)
    return path


# ---------------------------------------------------------------------------
# txnlog_data_skipping — time-range query over a day-partitioned ingest.
# The table is built as six 5-day appends (the natural shape of a daily
# metrics ingest), then scanned with a 4-day predicate through the
# stats-pruned path. The oracle predicts BOTH the aggregate (filter
# correctness: pruning + residual filter must equal a plain filter) AND
# the number of files the scan touched: with dense per-day data, the
# pruned file count equals the number of distinct 5-day buckets among
# the matching rows — an arithmetic fact about the data, independent of
# the engine. A pruning bug in either direction breaks the hash: too
# aggressive loses rows, too lax changes files_scanned.
# ---------------------------------------------------------------------------

_SKIP_LO, _SKIP_HI = "2024-01-08", "2024-01-12"

_SKIPPING_SQL = f"""
WITH hit AS (
  SELECT event_type, value, ts FROM events
  WHERE ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
    AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00'
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(DISTINCT floor((day(ts) - 1) / 5)) AS BIGINT)
        FROM hit) AS files_scanned
FROM hit
GROUP BY event_type
"""


@register("txnlog_data_skipping", _SKIPPING_SQL)
def q_txnlog_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _six_bucket_table(spark, sf_dir, "txnskip")
    where = [("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)]
    scanned = t.prune_report(where)["kept"]
    return (
        t.scan(where)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("files_scanned", F.lit(scanned).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_zorder_skipping — OPTIMIZE ZORDER BY, then a 2-D box scan.
# One overwrite, then an atomic z-order rewrite clustered on
# (user_id, floor(value*100)) — Morton-interleaved, range-partitioned
# into 16 files (functions/zorder.py) — then a box predicate on BOTH
# dimensions through the stats-pruned scan. The oracle proves the
# rewrite lost/duplicated nothing and the residual filter is exact; the
# `skipped` flag additionally pins the physical claim that a narrow
# value band cannot touch all 16 z-range files (file-count itself is
# not oracle-predictable: range boundaries come from sampling).
# tests/test_txnlog_skipping.py asserts the stronger quantitative
# pruning floor.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# matview_incremental — incremental materialized aggregate over the txn
# table (sources/matview.py). Three ingest slices; the view is seeded by
# a full refresh then maintained by two INCREMENTAL refreshes that read
# only the newly committed files (proven by plan in
# tests/test_matview.py::test_refresh_reads_only_new_files). The oracle
# recomputes the same aggregates from scratch — any fold error (double
# count, lost slice, wrong avg weighting) breaks the hash — and the
# pinned last_mode column proves the incremental path (not a silent
# full recompute) produced the result.
# ---------------------------------------------------------------------------

_MATVIEW_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       round(avg(value), 6) AS avg_value,
       'incremental' AS last_mode
FROM events
GROUP BY event_type
"""


@register("matview_incremental", _MATVIEW_SQL)
def q_matview_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.matview import MaterializedAggregate
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "matview")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    t = TxnTable(spark, f"{path}/src")
    view = MaterializedAggregate(
        t,
        f"{path}/view",
        group_cols=["event_type"],
        aggs={
            "n": ("count",),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
            "avg_value": ("avg", "value"),
        },
    )
    day = F.dayofmonth("ts")
    t.append(ev.where(day <= 10).drop("ts"))
    view.refresh()  # full: seeds the state
    t.append(ev.where((day > 10) & (day <= 20)).drop("ts"))
    mode1 = view.refresh()["mode"]
    t.append(ev.where(day > 20).drop("ts"))
    mode2 = view.refresh()["mode"]
    last_mode = mode2 if mode1 == "incremental" else "full"
    return (
        view.read()
        .withColumn("sum_value", F.round("sum_value", 2))
        .withColumn("avg_value", F.round("avg_value", 6))
        .withColumn("last_mode", F.lit(last_mode))
    )


_ZBOX_SQL = """
WITH hit AS (
  SELECT event_type, user_id, value FROM events
  WHERE value >= 50.0 AND value <= 60.0 AND user_id <= 7
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(user_id) AS BIGINT) AS sum_user,
       round(sum(value), 2) AS sum_value,
       CAST(TRUE AS BOOLEAN) AS skipped
FROM hit
GROUP BY event_type
"""


@register("txnlog_zorder_skipping", _ZBOX_SQL)
def q_txnlog_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnzorder")
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "value")
    t = TxnTable(spark, path)
    t.overwrite(ev)
    # 16-bit z dims: user_id is already < 2^16 at every SF; value scaled
    # to centi-units (max ~56k < 2^16) keeps full resolution.
    t.optimize_zorder(
        F.col("user_id"),
        F.least(F.lit(65535), F.floor(F.col("value") * 100)),
        partitions=16,
    )
    where = [("value", "between", (50.0, 60.0)), ("user_id", "<=", 7)]
    rep = t.prune_report(where)
    return (
        t.scan(where)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("user_id").alias("sum_user"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("skipped", F.lit(rep["kept"] < rep["total"]))
    )


# ---------------------------------------------------------------------------
# Product quantization (operators/similarity.py pq_*) — the compressed
# ANN path: corpus stored as m=4 one-byte codes instead of 64 floats,
# queries scored by ADC table lookups over the CODES ONLY. Codebooks
# pinned to subvectors of corpus rows 1..8 (the frozen random-sample
# init, same trick as cosine_topk_ivf_pinned), so encoding + ADC are
# exact arithmetic DuckDB replays bit-for-bit: identity-form squared
# distances with sequential-fold dots, first-min argmin, left-assoc
# ADC sum — every term matches the proven IVF parity machinery.
# ---------------------------------------------------------------------------

_PQ_M, _PQ_KS, _PQ_K = 4, 8, 10
_PQ_DSUB = 16  # embeddings dim 64 / m
_PQ_QIDS = (0, 101, 202, 303, 404)


def _pq_cte_block() -> str:
    """Shared CTEs: per-subspace corpus slices, codebooks, assignments."""
    parts = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS "
        "DOUBLE)) AS ev FROM embeddings)"
    ]
    for s in range(_PQ_M):
        lo, hi = s * _PQ_DSUB + 1, (s + 1) * _PQ_DSUB
        parts.append(
            f"sub{s} AS (SELECT vec_id, list_slice(ev, {lo}, {hi}) AS sv "
            "FROM e)"
        )
        parts.append(
            f"cb{s} AS (SELECT CAST(vec_id - 1 AS INT) AS code, "
            f"list_slice(ev, {lo}, {hi}) AS cv FROM e "
            f"WHERE vec_id BETWEEN 1 AND {_PQ_KS})"
        )
        parts.append(
            f"a{s} AS (SELECT vec_id, code FROM ("
            f"SELECT s.vec_id, c.code, row_number() OVER ("
            "PARTITION BY s.vec_id ORDER BY "
            "list_dot_product(sv, sv) - 2 * list_dot_product(sv, cv) "
            "+ list_dot_product(cv, cv), c.code) AS rn "
            f"FROM sub{s} s CROSS JOIN cb{s} c) WHERE rn = 1)"
        )
    return ",\n".join(parts)


def _pq_dt_ctes(
    per_qid: bool = False, qid_pred: str | None = None
) -> list[str]:
    """Query→codebook distance-table CTEs, one per subspace: ``dt{s}``
    for the single pinned query (vec_id = 0), ``dtq{s}`` carrying a
    qid column for the multi-query audits. ONE definition — every PQ
    oracle assembles from here, so the ADC arithmetic cannot silently
    diverge between them (r8 review). ``qid_pred`` swaps the per-qid
    query-set predicate (default: the pinned audit qids; the ANN
    store's dedup gate passes the whole new batch)."""
    dts = []
    pred = qid_pred or f"vec_id IN {tuple(_PQ_QIDS)!r}"
    for s in range(_PQ_M):
        lo, hi = s * _PQ_DSUB + 1, (s + 1) * _PQ_DSUB
        if per_qid:
            dts.append(
                f"dtq{s} AS (SELECT q.vec_id AS qid, c.code, "
                "list_dot_product(q.qsv, q.qsv) "
                "- 2 * list_dot_product(q.qsv, c.cv) "
                "+ list_dot_product(c.cv, c.cv) AS d "
                f"FROM cb{s} c CROSS JOIN (SELECT vec_id, list_slice(ev, "
                f"{lo}, {hi}) AS qsv FROM e "
                f"WHERE {pred}) q)"
            )
        else:
            dts.append(
                f"dt{s} AS (SELECT c.code, "
                "list_dot_product(qs.qsv, qs.qsv) "
                "- 2 * list_dot_product(qs.qsv, c.cv) "
                "+ list_dot_product(c.cv, c.cv) AS d "
                f"FROM cb{s} c CROSS JOIN (SELECT list_slice(ev, {lo}, {hi}) "
                "AS qsv FROM e WHERE vec_id = 0) qs)"
            )
    return dts


def _pq_joins(per_qid: bool = False) -> str:
    """The a{s}/dt{s} join chain scoring every corpus vector's codes
    against the distance tables."""
    if per_qid:
        return " ".join(
            f"JOIN a{s} ON a{s}.vec_id = a0.vec_id "
            f"JOIN dtq{s} ON dtq{s}.code = a{s}.code AND dtq{s}.qid = dtq0.qid"
            if s
            else "JOIN dtq0 ON dtq0.code = a0.code"
            for s in range(_PQ_M)
        )
    return " ".join(
        f"JOIN a{s} ON a{s}.vec_id = a0.vec_id JOIN dt{s} ON dt{s}.code = "
        f"a{s}.code"
        if s
        else "JOIN dt0 ON dt0.code = a0.code"
        for s in range(_PQ_M)
    )


def _pq_adc(per_qid: bool = False) -> str:
    """Left-associated ADC sum — must match the Spark build's addition
    order term for term."""
    p = "dtq" if per_qid else "dt"
    return " + ".join(f"{p}{s}.d" for s in range(_PQ_M))


def _pq_topk_sql() -> str:
    dts = _pq_dt_ctes()
    joins = _pq_joins()
    adc = _pq_adc()
    return f"""
WITH {_pq_cte_block()},
{",".join(dts)}
SELECT vec_id, round(adc, 6) AS adc_dist FROM (
  SELECT a0.vec_id, {adc} AS adc
  FROM a0 {joins}
  WHERE a0.vec_id <> 0)
ORDER BY adc, vec_id LIMIT {_PQ_K}
"""


@register("similarity_topk_pq_pinned", _pq_topk_sql())
def q_similarity_topk_pq_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    enc = similarity.pq_encode(emb, cbs)
    return similarity.pq_adc_topk(
        enc, qvec, cbs, k=_PQ_K, exclude_id=0
    ).withColumn("adc_dist", F.round("adc_dist", 6))


def _pq_recall_sql() -> str:
    dts = _pq_dt_ctes(per_qid=True)
    joins = _pq_joins(per_qid=True)
    adc = _pq_adc(per_qid=True)
    return f"""
WITH {_pq_cte_block()},
{",".join(dts)},
qs AS (SELECT vec_id AS qid, ev AS qv FROM e
       WHERE vec_id IN {tuple(_PQ_QIDS)!r}),
pairs AS (
  SELECT qid, e.vec_id,
         list_dot_product(ev, qv)
           / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
           AS cos
  FROM qs CROSS JOIN e WHERE e.vec_id <> qid
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
    FROM pairs) WHERE rn <= {_PQ_K}
),
pq AS (
  SELECT qid, vec_id FROM (
    SELECT dtq0.qid, a0.vec_id,
           row_number() OVER (PARTITION BY dtq0.qid
             ORDER BY {adc}, a0.vec_id) AS rn
    FROM a0 {joins}
    WHERE a0.vec_id <> dtq0.qid) WHERE rn <= {_PQ_K}
)
SELECT CAST({len(_PQ_QIDS)} AS INT) AS n_queries, CAST({_PQ_K} AS INT) AS k,
       count(*) AS n_exact, count(p.vec_id) AS n_hits,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE round(CAST(count(p.vec_id) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) END AS recall
FROM exact x LEFT JOIN pq p ON p.qid = x.qid AND p.vec_id = x.vec_id
"""


@register("similarity_pq_recall", _pq_recall_sql())
def q_similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Completes the recall-audit family: every approximate path (LSH,
    # containment, SimHash, IVF, now PQ) ships measured quality
    # evidence; both sides of the ratio are the independently
    # hash-verified exact and PQ plans.
    return similarity.pq_recall_pinned(
        _t(spark, sf_dir, "embeddings"),
        query_ids=_PQ_QIDS,
        m=_PQ_M,
        ks=_PQ_KS,
        k=_PQ_K,
    )


def _pq_rerank_sql() -> str:
    """Two-stage PQ query: ADC shortlist (4k) then exact cosine
    re-rank — both stages the already-verified arithmetic."""
    dts = _pq_dt_ctes()
    joins = _pq_joins()
    adc = _pq_adc()
    return f"""
WITH {_pq_cte_block()},
{",".join(dts)},
short AS (
  SELECT a0.vec_id
  FROM a0 {joins}
  WHERE a0.vec_id <> 0
  ORDER BY {adc}, a0.vec_id LIMIT {4 * _PQ_K}
),
q AS (SELECT ev AS qv FROM e WHERE vec_id = 0)
SELECT e.vec_id,
       list_dot_product(ev, qv)
         / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
         AS cosine_sim
FROM e JOIN short USING (vec_id) CROSS JOIN q
ORDER BY cosine_sim DESC, e.vec_id
LIMIT {_PQ_K}
"""


@register("similarity_topk_pq_rerank", _pq_rerank_sql())
def q_similarity_topk_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The realistic two-stage PQ query (Jégou et al. §V): code-only ADC
    # nominates 4k candidates, exact cosine re-ranks only those rows —
    # raw embeddings are touched for 40 ids, never scanned. Recovers
    # the recall the 8-centroid quantization loses (see
    # similarity_pq_rerank_recall) while keeping the scan compressed.
    emb = _t(spark, sf_dir, "embeddings")
    cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    enc = similarity.pq_encode(emb, cbs)
    return similarity.pq_adc_topk_rerank(
        enc, qvec, cbs, k=_PQ_K, shortlist=4 * _PQ_K, exclude_id=0
    )


def _pq_rerank_recall_sql() -> str:
    """Recall audit of the two-stage query: per-qid ADC shortlist
    (rn <= 4k), cosine re-rank within it (rn <= k), hits vs exact."""
    dts = _pq_dt_ctes(per_qid=True)
    joins = _pq_joins(per_qid=True)
    adc = _pq_adc(per_qid=True)
    return f"""
WITH {_pq_cte_block()},
{",".join(dts)},
qs AS (SELECT vec_id AS qid, ev AS qv FROM e
       WHERE vec_id IN {tuple(_PQ_QIDS)!r}),
pairs AS (
  SELECT qid, e.vec_id,
         list_dot_product(ev, qv)
           / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
           AS cos
  FROM qs CROSS JOIN e WHERE e.vec_id <> qid
),
exact AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
    FROM pairs) WHERE rn <= {_PQ_K}
),
short AS (
  SELECT qid, vec_id FROM (
    SELECT dtq0.qid, a0.vec_id,
           row_number() OVER (PARTITION BY dtq0.qid
             ORDER BY {adc}, a0.vec_id) AS rn
    FROM a0 {joins}
    WHERE a0.vec_id <> dtq0.qid) WHERE rn <= {4 * _PQ_K}
),
rr AS (
  SELECT qid, vec_id FROM (
    SELECT p.qid, p.vec_id,
           row_number() OVER (PARTITION BY p.qid ORDER BY p.cos DESC, p.vec_id)
             AS rn
    FROM pairs p JOIN short sl ON sl.qid = p.qid AND sl.vec_id = p.vec_id)
  WHERE rn <= {_PQ_K}
)
SELECT CAST({len(_PQ_QIDS)} AS INT) AS n_queries, CAST({_PQ_K} AS INT) AS k,
       count(*) AS n_exact, count(r.vec_id) AS n_hits,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE round(CAST(count(r.vec_id) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) END AS recall
FROM exact x LEFT JOIN rr r ON r.qid = x.qid AND r.vec_id = x.vec_id
"""


@register("similarity_pq_rerank_recall", _pq_rerank_recall_sql())
def q_similarity_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Recall audit of the two-stage shortlist+re-rank query; the oracle
    # replays ADC nomination AND cosine re-ranking per query id.
    emb = _t(spark, sf_dir, "embeddings")
    cbs = similarity.pq_codebooks_pinned(emb, m=_PQ_M, ks=_PQ_KS)
    return similarity.pq_recall(
        emb, cbs, query_ids=_PQ_QIDS, k=_PQ_K, rerank=True
    )


@register("similarity_pq_recall_kmeans")  # rows-only: seeded-KMeans codebooks
def q_similarity_pq_recall_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The PRODUCTION codebook path: per-subspace seeded KMeans
    # (fit_pq_codebooks). Seed-deterministic, not SQL-replayable (KMeans
    # iterations) -> rows-only, exactly like similarity_ivf_recall_kmeans;
    # the pinned twin above carries the hash evidence, this carries the
    # production quality number (SCALE.md "PQ recall").
    emb = _t(spark, sf_dir, "embeddings")
    cbs = similarity.fit_pq_codebooks(emb, m=_PQ_M, ks=_PQ_KS)
    return similarity.pq_recall(emb, cbs, query_ids=_PQ_QIDS, k=_PQ_K)


_IVFPQ_NCELLS, _IVFPQ_NPROBE = 16, 4


def _ivfpq_sql() -> str:
    """IVF-PQ composed oracle: the cell-assignment/probe CTEs of the
    (green) IVF oracle filtering the (green) PQ/ADC scoring CTEs."""
    dts = _pq_dt_ctes()
    joins = _pq_joins()
    adc = _pq_adc()
    return f"""
WITH {_pq_cte_block()},
{",".join(dts)},
qfull AS (SELECT ev AS qv FROM e WHERE vec_id = 0),
cents AS (
  SELECT CAST(vec_id - 1 AS INT) AS cid, ev AS cv
  FROM e WHERE vec_id BETWEEN 1 AND {_IVFPQ_NCELLS}
),
probes AS (
  SELECT cid FROM (
    SELECT cid,
           row_number() OVER (ORDER BY
             list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
             + list_dot_product(cv, cv), cid) AS rn
    FROM qfull CROSS JOIN cents) WHERE rn <= {_IVFPQ_NPROBE}
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
             + list_dot_product(cv, cv), c.cid) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
)
SELECT vec_id, round(adc, 6) AS adc_dist FROM (
  SELECT a0.vec_id, {adc} AS adc
  FROM a0 {joins}
  JOIN assign ON assign.vec_id = a0.vec_id
  WHERE a0.vec_id <> 0
    AND assign.cid IN (SELECT cid FROM probes))
ORDER BY adc, vec_id LIMIT {_PQ_K}
"""


@register("similarity_topk_ivfpq_pinned", _ivfpq_sql())
def q_similarity_topk_ivfpq_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both 100 TB levers composed (operators/similarity.py
    # cosine_topk_ivfpq_pinned): IVF pruning decides WHICH rows are
    # scored (nprobe/n_cells of the corpus; partition-prunable when
    # written by cell), PQ decides what each score COSTS (codes +
    # table lookups, no embedding column in the scoring scan).
    return similarity.cosine_topk_ivfpq_pinned(
        _t(spark, sf_dir, "embeddings"),
        n_cells=_IVFPQ_NCELLS,
        nprobe=_IVFPQ_NPROBE,
        m=_PQ_M,
        ks=_PQ_KS,
        k=_PQ_K,
    ).withColumn("adc_dist", F.round("adc_dist", 6))


# ---------------------------------------------------------------------------
# matview_hll_distinct — incrementally-maintained APPROX DISTINCT via
# DataSketches HLL (the sketch the matview's rejection message points
# at). The state is a binary sketch per group; per-refresh partials
# UNION to the identical sketch a single pass would build (register
# max is associative — pinned in tests/test_matview.py). The estimate
# itself isn't SQL-predictable (DataSketches internals), so the oracle
# pins the exact distinct count and the est_ok claim |est-exact|/exact
# <= 5% — at lgK=12 the sketch's relative error is ~1.6%, so the bound
# has real slack without being vacuous.
# ---------------------------------------------------------------------------

_HLL_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
       CAST(TRUE AS BOOLEAN) AS est_ok
FROM events
GROUP BY event_type
"""


@register("matview_hll_distinct", _HLL_SQL)
def q_matview_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.matview import MaterializedAggregate
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "matviewhll")
    ev = _t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    t = TxnTable(spark, f"{path}/src")
    view = MaterializedAggregate(
        t,
        f"{path}/view",
        group_cols=["event_type"],
        aggs={"n_users_est": ("approx_distinct", "user_id")},
    )
    day = F.dayofmonth("ts")
    t.append(ev.where(day <= 15).drop("ts"))
    view.refresh()
    t.append(ev.where(day > 15).drop("ts"))  # users overlap both halves:
    view.refresh()  # the union must dedup across refreshes
    exact = (
        t.snapshot()
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users_exact"))
    )
    return (
        view.read()
        .join(exact, "event_type")
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(
                    F.col("n_users_est").cast("double")
                    - F.col("n_users_exact").cast("double")
                )
                / F.col("n_users_exact").cast("double")
                <= 0.05
            ).alias("est_ok"),
        )
    )


# ---------------------------------------------------------------------------
# stream_txnlog_matview — the full 100 TB dashboard loop as ONE query:
# file-drop stream -> exactly-once txn-table ingest (foreachBatch epoch
# id as the commit batch_id) -> per-batch INCREMENTAL matview refresh
# -> dashboard read. After the drain, batch 0 is replayed by hand (the
# crash-between-sink-write-and-checkpoint-commit scenario): the commit
# log must skip it and the view refresh must be a noop. The oracle is
# the plain batch aggregate over the source table — any double-append,
# torn ingest, or fold error breaks the hash — plus pinned last_mode /
# replay_noop flags proving the incremental path and the exactly-once
# contract actually executed.
# ---------------------------------------------------------------------------

_STREAM_MV_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       'incremental' AS last_mode,
       CAST(TRUE AS BOOLEAN) AS replay_noop
FROM events
GROUP BY event_type
"""


@register("stream_txnlog_matview", _STREAM_MV_SQL)
def q_stream_txnlog_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    from pyspark.sql import types as T

    from ..sources.matview import MaterializedAggregate
    from ..sources.txnlog import TxnTable
    from .registry import drain_stream

    base = _tmp_table_path(sf_dir, f"streammv_{os.getpid()}")
    src_dir = f"{base}/drops"
    os.makedirs(src_dir, exist_ok=True)
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    day = F.dayofmonth("ts")
    slices = [ev.where(day <= 10), ev.where((day > 10) & (day <= 20)), ev.where(day > 20)]
    for i, sl in enumerate(slices):
        tmp = f"{src_dir}/b{i}_tmp"
        sl.drop("ts").coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src_dir}/b{i}.parquet"
        shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    t = TxnTable(spark, f"{base}/table")
    view = MaterializedAggregate(
        t,
        f"{base}/view",
        group_cols=["event_type"],
        aggs={"n": ("count",), "sum_value": ("sum", "value")},
    )
    modes: list[str] = []

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        t.append(batch_df, batch_id=batch_id)
        modes.append(view.refresh()["mode"])

    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    # first refresh seeds (full); every later one must be incremental
    incremental_ok = len(modes) == 3 and all(
        m == "incremental" for m in modes[1:]
    )
    # crash-replay of epoch 0: exactly-once — no new version, noop refresh
    v_before = t.latest_version()
    t.append(slices[0].drop("ts"), batch_id=0)
    replay_noop = (
        t.latest_version() == v_before and view.refresh()["mode"] == "noop"
    )
    return (
        view.read()
        .withColumn("sum_value", F.round("sum_value", 2))
        .withColumn(
            "last_mode",
            F.lit("incremental" if incremental_ok else "full"),
        )
        .withColumn("replay_noop", F.lit(bool(replay_noop)))
    )


# ---------------------------------------------------------------------------
# matview_stats_panel — the drift-dashboard statistics maintained
# INCREMENTALLY: sample stddev/variance fold as (sum, sum-of-squares,
# count) partials; the p90 folds as a mergeable bounded-range histogram
# sketch (error <= half a bin width vs the ceil(p*n)-th order
# statistic — the sketch's stated convention). Oracle: DuckDB's
# stddev_samp/var_samp over the same rows (different summation
# algorithm — the rounded agreement IS the evidence the ssq fold
# didn't lose precision) plus the p90 band claim, with the exact order
# statistic computed Spark-side from the snapshot.
# ---------------------------------------------------------------------------

_STATS_PANEL_SQL = """
SELECT event_type,
       round(stddev_samp(value), 6) AS stddev_value,
       round(var_samp(value), 6) AS var_value,
       CAST(TRUE AS BOOLEAN) AS p90_ok
FROM events
GROUP BY event_type
"""


@register("matview_stats_panel", _STATS_PANEL_SQL)
def q_matview_stats_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..sources.matview import MaterializedAggregate
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "matviewstats")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    t = TxnTable(spark, f"{path}/src")
    qopts = {"p": 0.9, "lo": 0.0, "hi": 600.0, "bins": 60}
    view = MaterializedAggregate(
        t,
        f"{path}/view",
        group_cols=["event_type"],
        aggs={
            "stddev_value": ("stddev", "value"),
            "var_value": ("var", "value"),
            "p90_est": ("approx_quantile", "value", qopts),
        },
    )
    day = F.dayofmonth("ts")
    t.append(ev.where(day <= 15).drop("ts"))
    view.refresh()
    t.append(ev.where(day > 15).drop("ts"))
    view.refresh()
    width = (qopts["hi"] - qopts["lo"]) / qopts["bins"]
    # exact ceil(p*n)-th order statistic per group, computed from the
    # snapshot (audit side only — the production number is the sketch)
    exact = (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.element_at(
                F.sort_array(F.collect_list("value")),
                F.ceil(F.lit(qopts["p"]) * F.count("value")).cast("int"),
            ).alias("p90_exact")
        )
    )
    return (
        view.read()
        .join(exact, "event_type")
        .select(
            "event_type",
            F.round("stddev_value", 6).alias("stddev_value"),
            F.round("var_value", 6).alias("var_value"),
            (
                F.abs(F.col("p90_est") - F.col("p90_exact"))
                <= F.lit(width / 2 + 1e-9)
            ).alias("p90_ok"),
        )
    )


# ---------------------------------------------------------------------------
# bm25_search — Okapi BM25 ranked retrieval over the documents table
# (operators/text.py:bm25_topk): the retrieval half of a RAG-style
# corpus pipeline (tfidf_top_terms characterizes docs; this RANKS them
# for a query). Same tokenization as every text oracle; per-term
# weights rounded before the sum and the sum re-rounded (the tfidf
# parity recipe), constant subexpressions written in the same
# evaluation order as the Spark build so both engines compute
# identical doubles.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("hash", "join", "merge")
_BM25_K = 10

def _bm25_search_sql() -> str:
    from ..operators.text import bm25_sql

    return bm25_sql(terms=_BM25_TERMS, k=_BM25_K)


_BM25_SQL = _bm25_search_sql()


@register("bm25_search", _BM25_SQL)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"), list(_BM25_TERMS), k=_BM25_K
    )


# ---------------------------------------------------------------------------
# txnlog_describe_history — Delta's DESCRIBE HISTORY analog, built
# ENTIRELY from the commit log (zero data IO): per commit, the action
# and the rows it added (from the commit's recorded stats). The oracle
# predicts the whole history arithmetically from the source table —
# six 5-day appends land their bucket's row count at versions 1..6,
# the compaction overwrite lands the total at version 7 — so a stats
# under/over-count, a lost commit, or a replay that landed all break
# the hash.
# ---------------------------------------------------------------------------

_HISTORY_SQL = """
WITH b AS (
  SELECT CAST(floor((day(ts) - 1) / 5) AS INT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
)
SELECT CAST(bucket + 1 AS BIGINT) AS version, 'append' AS action, n AS rows_added
FROM b
UNION ALL
SELECT 7, 'overwrite', (SELECT CAST(count(*) AS BIGINT) FROM events)
"""


@register("txnlog_describe_history", _HISTORY_SQL)
def q_txnlog_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnhistory")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    t = TxnTable(spark, path)
    bucket = F.floor((F.dayofmonth("ts") - 1) / 5)
    for b in range(6):
        t.append(ev.where(bucket == b), batch_id=b)
    t.append(ev.where(bucket == 2), batch_id=2)  # replay: must NOT land
    t.compact(partitions=2)
    return t.history().select("version", "action", "rows_added")


# ---------------------------------------------------------------------------
# txnlog_delete_where / txnlog_update_where — copy-on-write DML with
# stats-bounded rewrites: DELETE/UPDATE prune the live file set to the
# files that MAY contain matching rows and rewrite only those,
# re-referencing the rest (Delta's mechanism; cost is O(files that may
# match), not O(table)). The oracle predicts both the surviving /
# updated content AND files_rewritten — the same distinct-5-day-bucket
# arithmetic as txnlog_data_skipping, but now certifying the WRITE
# path's pruning.
# ---------------------------------------------------------------------------

def _six_bucket_table(spark, sf_dir: str, tag: str):
    from ..sources.txnlog import TxnTable
    from .fixtures import cached_fixture, clone_fixture
    from .phases import timed_phase

    # Fixture construction is reported separately in BENCH_DETAIL
    # (plans/phases.py) so feed/scan regressions in the queries built on
    # this table are not diluted by the 6-commit ingest — and (r11,
    # VERDICT r10 next #7) the ingest itself runs ONCE per machine per
    # events-content: every caller gets a private CLONE of the cached
    # pristine table (the log stores relative paths, so a copied table
    # replays identically — history, stats, and batch_ids included),
    # so per-query build cost is one copytree, not six commits.
    def _build(path: str) -> None:
        ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
        t = TxnTable(spark, path)
        bucket = F.floor((F.dayofmonth("ts") - 1) / 5)
        for b in range(6):
            t.append(ev.where(bucket == b).coalesce(1), batch_id=b)

    with timed_phase(f"fixture_build:{tag}"):
        from ..sources import txnlog as _txnlog_mod

        base = cached_fixture(
            sf_dir,
            "sixbucket",
            ["events"],
            _build,
            code_modules=(_txnlog_mod,),
        )
        path = clone_fixture(base, _tmp_table_path(sf_dir, tag))
    return TxnTable(spark, path)


_DELETE_SQL = f"""
WITH hit AS (
  SELECT * FROM events
  WHERE ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
    AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00'
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(DISTINCT floor((day(ts) - 1) / 5)) AS BIGINT)
        FROM hit) AS files_rewritten
FROM events
WHERE NOT (ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
           AND ts < TIMESTAMP '{_SKIP_HI} 00:00:00')
GROUP BY event_type
"""


@register("txnlog_delete_where", _DELETE_SQL)
def q_txnlog_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _six_bucket_table(spark, sf_dir, "txndelete")
    rep = t.delete([("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)])
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
    )


_UPDATE_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CASE WHEN ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
                       AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00'
                      THEN value * 2 ELSE value END), 2) AS sum_value,
       (SELECT CAST(count(*) AS BIGINT) FROM events
        WHERE ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
          AND ts <  TIMESTAMP '{_SKIP_HI} 00:00:00') AS n_updated
FROM events
GROUP BY event_type
"""


@register("txnlog_update_where", _UPDATE_SQL)
def q_txnlog_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _six_bucket_table(spark, sf_dir, "txnupdate")
    where = [("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)]
    pre = t.scan(where).count()  # rows the predicate hits (for the audit)
    t.update(where, {"value": F.col("value") * 2})
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("n_updated", F.lit(pre).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_set_skipping — categorical pruning via per-file VALUE SETS:
# ingest partitioned by event type (one append per type — the natural
# per-source ingest shape), then an IN scan. Range min/max alone
# cannot prune 'click' from a file spanning 'click'..'view'; the
# complete per-file value set prunes it exactly. files_scanned is the
# distinct-type count among matching rows — the same oracle-predictable
# arithmetic as txnlog_data_skipping, certifying the categorical path.
# ---------------------------------------------------------------------------

_SET_TYPES = ("click", "view")

_SET_SKIP_SQL = f"""
WITH hit AS (
  SELECT event_type, value FROM events
  WHERE event_type IN {tuple(_SET_TYPES)!r}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(DISTINCT event_type) AS BIGINT) FROM hit)
         AS files_scanned
FROM hit
GROUP BY event_type
"""


@register("txnlog_set_skipping", _SET_SKIP_SQL)
def q_txnlog_set_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnset")
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    t = TxnTable(spark, path, set_columns=["event_type"])
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    for i, et in enumerate(sorted(types)):
        t.append(ev.where(F.col("event_type") == et).coalesce(1), batch_id=i)
    where = [("event_type", "in", _SET_TYPES)]
    scanned = t.prune_report(where)["kept"]
    return (
        t.scan(where)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("files_scanned", F.lit(scanned).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_version_drift — TIME TRAVEL feeding the drift family: PSI of
# the store's current content against its OWN version-3 snapshot
# (days 1-15 of the six 5-day ingests) — "drift vs last week's table"
# without ever copying a reference dataset: the commit log IS the
# reference archive. Oracle replays the same binned-PSI arithmetic
# with ref = the day-range version 3 contains.
# ---------------------------------------------------------------------------

_VERSION_DRIFT_SQL = """
WITH pooled AS (
  SELECT value AS v,
         CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS is_ref,
         1 AS is_cur
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT CAST(FLOOR(v / 10.0) AS BIGINT) AS bin,
         SUM(is_ref) AS n_ref, SUM(is_cur) AS n_cur
  FROM pooled GROUP BY 1
),
tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts),
j AS (SELECT * FROM counts, tot)
SELECT round(SUM(
  (greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6)
   - greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6))
  * ln(greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6)
       / greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6))
), 6) AS psi FROM j
"""


@register("txnlog_version_drift", _VERSION_DRIFT_SQL)
def q_txnlog_version_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import psi

    t = _six_bucket_table(spark, sf_dir, "txndrift")
    ref = t.snapshot(version=3).select("value")  # days 1-15 as-of v3
    cur = t.snapshot().select("value")  # today's full store
    return psi(ref, cur, "value", 10.0).select(
        F.round("psi", 6).alias("psi")
    )


# ---------------------------------------------------------------------------
# txnlog_restore — RESTORE TABLE TO VERSION as a pure pointer write:
# a bad DELETE is rolled back by one overwrite commit re-referencing
# version 6's file set (zero data copied; the delete stays in history,
# auditable and time-travelable). The oracle: the restored table must
# equal the untouched source, and the version counter must show all 8
# commits (6 appends + the delete + the restore) — a restore that
# copies, loses, or rewrites anything breaks either column.
# ---------------------------------------------------------------------------

_RESTORE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(8 AS BIGINT) AS n_versions
FROM events
GROUP BY event_type
"""


@register("txnlog_restore", _RESTORE_SQL)
def q_txnlog_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _six_bucket_table(spark, sf_dir, "txnrestore")
    t.delete([("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)])  # oops
    t.restore(6)  # roll the head back; history intact
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("n_versions", F.lit(t.latest_version()).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_stats_agg — metadata-only aggregation: COUNT / MIN / MAX /
# null counts answered ENTIRELY from the commit log (zero data IO —
# Delta's answer-count(*)-from-stats). The oracle computes the same
# aggregates by actually scanning the data; equality proves the log's
# stats are an exact substitute. The API refuses whenever that could
# be false (missing stats, NaN-tainted max, widened decimal bounds).
# ---------------------------------------------------------------------------

_STATS_AGG_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(event_id) AS BIGINT) AS event_id_nulls,
       CAST(min(event_id) AS BIGINT) AS event_id_min,
       CAST(max(event_id) AS BIGINT) AS event_id_max,
       CAST(count(*) - count(user_id) AS BIGINT) AS user_id_nulls,
       CAST(min(user_id) AS BIGINT) AS user_id_min,
       CAST(max(user_id) AS BIGINT) AS user_id_max
FROM events
"""


@register("txnlog_stats_agg", _STATS_AGG_SQL)
def q_txnlog_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnstatsagg")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    t = TxnTable(spark, path)
    bucket = F.floor((F.dayofmonth("ts") - 1) / 5)
    for b in range(6):
        t.append(ev.where(bucket == b).drop("ts"), batch_id=b)
    return t.stats_aggregate(["event_id", "user_id"])


# ---------------------------------------------------------------------------
# stream_txnlog_merge — streaming CDC MERGE through the TRANSACTIONAL
# table: the orders changelog replayed as three time-range micro-batches
# (the exact stream_cdc_upsert scenario), each batch MERGEd atomically
# into the txn table via its conditional-commit machinery instead of a
# driver-held localCheckpoint snapshot. Reuses stream_cdc_upsert's
# oracle verbatim — the two implementations must agree row for row —
# so the ACID path is proven equivalent to the established semantics,
# and readers during the drain could never see a half-merged store.
# ---------------------------------------------------------------------------


def _stream_txnlog_merge_sql() -> str:
    from .registry_ext8 import _stream_cdc_sql

    return _stream_cdc_sql()


@register("stream_txnlog_merge", _stream_txnlog_merge_sql())
def q_stream_txnlog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    from ..sources.txnlog import TxnTable
    from .registry import drain_stream
    from .registry_ext8 import _CDC_BATCH_BOUNDS

    orders = _t(spark, sf_dir, "orders")
    base = _tmp_table_path(sf_dir, f"streammerge_{os.getpid()}")
    src_dir = f"{base}/drops"
    os.makedirs(src_dir, exist_ok=True)
    for i, (where, _) in enumerate(_CDC_BATCH_BOUNDS):
        tmp = f"{src_dir}/b{i}_tmp"
        orders.where(F.expr(where)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src_dir}/b{i}.parquet"
        shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))

    t = TxnTable(spark, f"{base}/table")
    t.overwrite(
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 3 != 0)
        .select("c_custkey", "c_acctbal", "c_mktsegment")
    )

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        changes = batch_df.select(
            F.col("o_custkey").alias("c_custkey"),
            F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            "o_orderdate",
            "o_orderkey",
            F.col("o_totalprice").alias("c_acctbal"),
        )
        t.merge(
            changes,
            keys=["c_custkey"],
            order_cols=["o_orderdate", "o_orderkey"],
            op_col="op",
        )

    q = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(_merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
    )
    drain_stream(q)
    return t.snapshot()


# ---------------------------------------------------------------------------
# txnlog_check_constraints — governed ingest: ALTER TABLE ADD
# CONSTRAINT CHECK on the txn table, enforced before any commit lands.
# A poisoned micro-batch (negated values) must be rejected WITHOUT a
# trace — the oracle pins the clean aggregate, the rejected flag, and
# the version counter (6 appends + 1 metadata commit; the poisoned
# batch must not have burned a version).
# ---------------------------------------------------------------------------

_CHECK_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(TRUE AS BOOLEAN) AS rejected,
       CAST(7 AS BIGINT) AS n_versions
FROM events
GROUP BY event_type
"""


@register("txnlog_check_constraints", _CHECK_SQL)
def q_txnlog_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import ConstraintViolation, TxnTable

    path = _tmp_table_path(sf_dir, "txncheck")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    t = TxnTable(spark, path)
    bucket = F.floor((F.dayofmonth("ts") - 1) / 5)
    t.append(ev.where(bucket == 0).drop("ts"), batch_id=0)
    t.add_constraint("value_nonneg", "value >= 0")  # validates existing
    for b in range(1, 6):
        t.append(ev.where(bucket == b).drop("ts"), batch_id=b)
    rejected = False
    try:  # poisoned batch: negated values must never land
        t.append(
            ev.where(bucket == 2)
            .drop("ts")
            .withColumn("value", -F.col("value") - 1)
        )
    except ConstraintViolation:
        rejected = True
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("rejected", F.lit(rejected))
        .withColumn("n_versions", F.lit(t.latest_version()).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_optimize — selective small-file compaction (Delta OPTIMIZE):
# one settled big file plus six tiny ingest slices; optimize() must
# bin-pack ONLY the tinies (re-referencing the big file untouched),
# leaving exactly 2 live files. The oracle pins content preservation
# and the predicted file count; the threshold is derived from the
# table's own recorded sizes so the construction is SF-independent.
# ---------------------------------------------------------------------------

_OPTIMIZE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(2 AS BIGINT) AS files_after,
       CAST(6 AS BIGINT) AS files_rewritten
FROM events
GROUP BY event_type
"""


@register("txnlog_optimize", _OPTIMIZE_SQL)
def q_txnlog_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.txnlog import TxnTable

    path = _tmp_table_path(sf_dir, "txnoptimize")
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "ts")
    day = F.dayofmonth("ts")
    t = TxnTable(spark, path)
    t.append(ev.where(day <= 15).drop("ts").coalesce(1))  # settled big file
    for i in range(6):  # six tiny ingests covering days 16..31
        lo = 15 + 2 * i
        cond = (day > lo) & (day <= lo + 2) if i < 5 else (day > lo)
        t.append(ev.where(cond).drop("ts").coalesce(1), batch_id=i)
    sizes = [e["bytes"] for e in t._state()["stats"].values()]
    big = max(sizes)
    rep = t.optimize(target_bytes=20 * big, small_threshold=big)
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("files_after", F.lit(len(t.files())).cast("long"))
        .withColumn(
            "files_rewritten", F.lit(rep["files_rewritten"]).cast("long")
        )
    )
