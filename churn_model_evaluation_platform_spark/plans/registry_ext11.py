"""Round-8 registry extensions: measured quality for the approximate
SIMILARITY path (VERDICT r7 #1) — the IVF recall audits that complete
the recall-audit family started for dedup in rounds 6-7, plus the
round-8 drift/sink parity entries.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.testdata import load_table
from .registry import drain_stream, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# similarity_ivf_recall — recall@10 of the pinned-quantizer IVF path vs
# the exact brute-force top-10, averaged over 5 pinned query vectors.
# The oracle composes the two ALREADY hash-verified plans
# (similarity_topk's cosine ranking and similarity_topk_ivf_pinned's
# probe-pruned slice) per query, so both sides of the recall ratio are
# engine-agreed, not just the final number — the ANN counterpart of
# dedup_lsh_recall. nprobe == n_cells would force recall = 1.0 (the
# sanity anchor pinned in tests/test_ivf_recall.py).
# ---------------------------------------------------------------------------

_QIDS = (0, 101, 202, 303, 404)
_N_CELLS = 16
_NPROBE = 4
_K = 10

_EMB_DBL = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

_IVF_RECALL_SQL = f"""
WITH e AS (SELECT vec_id, {_EMB_DBL} AS ev FROM embeddings),
qs AS (SELECT vec_id AS qid, ev AS qv FROM e
       WHERE vec_id IN {tuple(_QIDS)!r}),
cents AS (
  SELECT CAST(vec_id - 1 AS INT) AS cid, ev AS cv
  FROM e WHERE vec_id BETWEEN 1 AND {_N_CELLS}
),
probes AS (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY
             list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
             + list_dot_product(cv, cv), cid) AS rn
    FROM qs CROSS JOIN cents) WHERE rn <= {_NPROBE}
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
             + list_dot_product(cv, cv), c.cid) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
),
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
    FROM pairs) WHERE rn <= {_K}
),
ivf AS (
  SELECT qid, vec_id FROM (
    SELECT p.qid, p.vec_id,
           row_number() OVER (PARTITION BY p.qid ORDER BY p.cos DESC, p.vec_id)
             AS rn
    FROM pairs p
    JOIN assign a ON a.vec_id = p.vec_id
    JOIN probes pr ON pr.qid = p.qid AND pr.cid = a.cid) WHERE rn <= {_K}
)
SELECT CAST({len(_QIDS)} AS INT) AS n_queries, CAST({_K} AS INT) AS k,
       count(*) AS n_exact, count(i.vec_id) AS n_hits,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE round(CAST(count(i.vec_id) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) END AS recall
FROM exact x LEFT JOIN ivf i ON i.qid = x.qid AND i.vec_id = x.vec_id
"""


@register("similarity_ivf_recall", _IVF_RECALL_SQL)
def q_similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QA/audit certifying the (n_cells=16, nprobe=4) IVF config: what
    # share of the exact top-10 neighbors does probe-pruned search keep,
    # over 5 pinned queries. Pinned quantizer (corpus ids 1..16) so the
    # oracle replays assignment + probing + ranking bit-for-bit; the
    # production KMeans quantizer gets the same audit rows-only below.
    return similarity.ivf_recall_pinned(
        _t(spark, sf_dir, "embeddings"),
        query_ids=_QIDS,
        n_cells=_N_CELLS,
        nprobe=_NPROBE,
        k=_K,
    )


# ---------------------------------------------------------------------------
# txnlog_metrics_store — the metrics store on the TRANSACTIONAL parquet
# table (sources/txnlog.py): three exactly-once appends (one replayed
# with a duplicate batch_id and provably skipped), an atomic
# compaction, and a time-travel read. The oracle predicts both the v1
# snapshot (first append only) and the latest snapshot (all rows,
# replay NOT double-counted, compaction row-preserving) from the source
# table alone — any torn read, double append, or lossy compaction
# breaks the hash.
# ---------------------------------------------------------------------------

_TXNLOG_SQL = """
SELECT 'v1' AS snapshot, event_type, count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events WHERE event_type = 'click' GROUP BY 2
UNION ALL
SELECT 'latest', event_type, count(*), round(sum(value), 2)
FROM events GROUP BY 2
"""


@register("txnlog_metrics_store", _TXNLOG_SQL)
def q_txnlog_metrics_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from ..sources.txnlog import TxnTable

    base = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/spark_graft_txnlog_{base}"
    shutil.rmtree(path, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    t = TxnTable(spark, path)
    t.append(ev.where(F.col("event_type") == "click"), batch_id=1)
    t.append(ev.where(F.col("event_type") == "view"), batch_id=2)
    t.append(
        ev.where(~F.col("event_type").isin("click", "view")), batch_id=3
    )
    # Crash-replay of batch 2: exactly-once contract — must be a no-op.
    t.append(ev.where(F.col("event_type") == "view"), batch_id=2)
    t.compact(partitions=4)  # atomic OPTIMIZE; rows preserved

    def agg(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ).select(F.lit(label).alias("snapshot"), "event_type", "n", "sum_value")

    return agg(t.snapshot(version=1), "v1").unionAll(
        agg(t.snapshot(), "latest")
    )


# ---------------------------------------------------------------------------
# value_drift_auto — Evidently's numerical-preset auto-selection as a
# MODE (VERDICT r7 #6): KS while the reference column has <= 1000
# non-null rows, Wasserstein above. The oracle replicates the RULE, not
# just one branch — it computes both statistics and selects by the same
# count — so the sf0.001 run (ref = 1000 rows -> ks) and the sf0.01
# correctness run (10000 rows -> wasserstein) both prove their branch.
# Switch point pinned in tests/test_drift_family.py.
# ---------------------------------------------------------------------------

_AUTO_SQL = """
WITH ref AS (SELECT value FROM events),
cur AS (SELECT value * 1.25 AS value FROM events WHERE event_type = 'view'),
pooled AS (
  SELECT value AS v, 1 AS is_ref, 0 AS is_cur FROM ref WHERE value IS NOT NULL
  UNION ALL
  SELECT value, 0, 1 FROM cur WHERE value IS NOT NULL
),
cums AS (
  SELECT SUM(is_ref) OVER (ORDER BY v) AS cr,
         SUM(is_cur) OVER (ORDER BY v) AS cc,
         SUM(is_ref) OVER () AS nr,
         SUM(is_cur) OVER () AS nc
  FROM pooled
),
ks AS (
  SELECT MAX(ABS(CAST(cr AS DOUBLE) / nr - CAST(cc AS DOUBLE) / nc))
           AS ks_stat,
         MAX(nr) AS n_ref
  FROM cums
),
aggw AS (SELECT v, SUM(is_ref) AS r, SUM(is_cur) AS c
         FROM pooled GROUP BY v),
tw AS (SELECT SUM(r) AS tr, SUM(c) AS tc FROM aggw),
cumw AS (
  SELECT v, SUM(r) OVER (ORDER BY v) AS wr, SUM(c) OVER (ORDER BY v) AS wc,
         lead(v) OVER (ORDER BY v) AS vn
  FROM aggw
),
wd AS (SELECT SUM(abs(CAST(wr AS DOUBLE) / tr - CAST(wc AS DOUBLE) / tc)
               * (vn - v)) AS wasserstein
       FROM cumw, tw WHERE vn IS NOT NULL)
SELECT CASE WHEN n_ref <= 1000 THEN 'ks' ELSE 'wasserstein' END AS method,
       round(CASE WHEN n_ref <= 1000 THEN ks_stat ELSE wasserstein END, 6)
         AS drift_score
FROM ks, wd
"""


@register("value_drift_auto", _AUTO_SQL)
def q_value_drift_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import drift_statistic

    ev = _t(spark, sf_dir, "events")
    ref = ev.select("value")
    cur = ev.where(F.col("event_type") == "view").select(
        (F.col("value") * F.lit(1.25)).alias("value")
    )
    return drift_statistic(ref, cur, "value", method="auto")


# ---------------------------------------------------------------------------
# csv_sink — standalone byte-level oracle for the sink SHAPE (VERDICT
# r7 #4): the reference's to_csv(index=False) contract. Write a frame
# with crafted comma / quote / NULL fields, read the emitted bytes back
# as raw TEXT lines, and aggregate line-shape facts the oracle predicts
# arithmetically from the source rows: header exactly once, RFC 4180
# DOUBLED quotes (not backslash escapes), nulls as empty fields,
# quoting only where needed, single part file. Any writer regression —
# quoting mode, null encoding, header, coalesce — breaks the hash.
# ---------------------------------------------------------------------------

_CSV_SINK_SQL = """
WITH s AS (
  SELECT CASE CAST(event_id % 4 AS INT)
           WHEN 1 THEN 'comma,' || CAST(event_id AS VARCHAR)
           WHEN 2 THEN 'qu"ote' || CAST(event_id AS VARCHAR)
           WHEN 3 THEN NULL
           ELSE 'plain' || CAST(event_id AS VARCHAR) END AS sv
  FROM events)
SELECT CAST(count(*) + 1 AS BIGINT) AS n_lines,
       CAST(1 AS BIGINT) AS n_header,
       CAST(sum(CASE WHEN sv LIKE '%,%' OR sv LIKE '%"%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_quoted,
       CAST(sum(CASE WHEN sv LIKE '%"%' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_doubled,
       CAST(sum(CASE WHEN sv IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_empty,
       CAST(1 AS BIGINT) AS n_files
FROM s
"""


@register("csv_sink", _CSV_SINK_SQL)
def q_csv_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..sources.csv_source import write_csv

    ev = _t(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 4 == 1, F.concat(F.lit("comma,"), F.col("event_id")))
        .when(F.col("event_id") % 4 == 2, F.concat(F.lit('qu"ote'), F.col("event_id")))
        .when(F.col("event_id") % 4 == 3, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("plain"), F.col("event_id")))
        .alias("sv"),
    )
    out = f"/tmp/spark_graft_csv_sink_{os.path.basename(os.path.normpath(sf_dir))}"
    write_csv(src, out, single_file=True)
    lines = spark.read.text(out).select(
        "value", F.input_file_name().alias("f")
    )
    header = "event_id,event_type,sv"
    b = lambda c: c.cast("int")  # noqa: E731 — sum of 0/1 flags
    return lines.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(b(F.col("value") == header)).cast("bigint").alias("n_header"),
        F.sum(b(F.col("value").contains('"'))).cast("bigint").alias("n_quoted"),
        F.sum(b(F.col("value").contains('""'))).cast("bigint").alias("n_doubled"),
        F.sum(b(F.col("value").endswith(","))).cast("bigint").alias("n_null_empty"),
        F.count_distinct("f").alias("n_files"),
    )


# ---------------------------------------------------------------------------
# value_drift_psi_window / stream_value_drift — the drift TIMESERIES
# with the statistic that also STREAMS (VERDICT r7 #3). PSI over
# static-reference bins: the stateful piece is a per-(window, column,
# bin) count — bounded, watermark-evictable streaming state — and the
# finish (psi_from_binned) runs on bin-count-sized frames only. Both
# entries share ONE oracle; tests/test_stream_drift.py additionally
# asserts drain == batch bit-for-bit, the stream_ohlc pattern.
# ---------------------------------------------------------------------------

_PSI_COLUMNS = {"value": 25.0, "user_id": 10.0}

_PSI_WINDOW_SQL = """
WITH ref AS (SELECT value, CAST(user_id AS DOUBLE) AS user_id FROM events),
cur AS (SELECT date_trunc('week', ts) AS window_start, value * 1.25 AS value,
               CAST(user_id AS DOUBLE) AS user_id
        FROM events WHERE event_type = 'view'),
ref_bins AS (
  SELECT 'value' AS col, CAST(floor(value / 25.0) AS BIGINT) AS bin,
         count(*) AS n_ref
  FROM ref WHERE value IS NOT NULL GROUP BY 2
  UNION ALL
  SELECT 'user_id', CAST(floor(user_id / 10.0) AS BIGINT), count(*)
  FROM ref WHERE user_id IS NOT NULL GROUP BY 2
),
cur_bins AS (
  SELECT window_start, 'value' AS col,
         CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n_cur
  FROM cur WHERE value IS NOT NULL GROUP BY 1, 3
  UNION ALL
  SELECT window_start, 'user_id', CAST(floor(user_id / 10.0) AS BIGINT),
         count(*)
  FROM cur WHERE user_id IS NOT NULL GROUP BY 1, 3
),
wins AS (SELECT DISTINCT window_start FROM cur_bins),
base AS (SELECT w.window_start, r.col, r.bin, r.n_ref
         FROM ref_bins r CROSS JOIN wins w),
joined AS (
  SELECT COALESCE(b.window_start, c.window_start) AS window_start,
         COALESCE(b.col, c.col) AS col,
         COALESCE(b.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
  FROM base b FULL OUTER JOIN cur_bins c
    ON c.window_start = b.window_start AND c.col = b.col AND c.bin = b.bin
),
probs AS (
  SELECT window_start, col,
    greatest(CAST(n_ref AS DOUBLE)
      / greatest(CAST(SUM(n_ref) OVER (PARTITION BY window_start, col)
                      AS DOUBLE), 1e-12), 1e-6) AS p_ref,
    greatest(CAST(n_cur AS DOUBLE)
      / greatest(CAST(SUM(n_cur) OVER (PARTITION BY window_start, col)
                      AS DOUBLE), 1e-12), 1e-6) AS p_cur
  FROM joined
)
SELECT CAST(window_start AS DATE) AS window_start, col AS column_name,
       round(SUM((p_cur - p_ref) * ln(p_cur / p_ref)), 6) AS psi
FROM probs GROUP BY 1, 2
"""


def _psi_ref_cur(spark: SparkSession, sf_dir: str):
    ev = _t(spark, sf_dir, "events")
    ref = ev.select("value", F.col("user_id").cast("double").alias("user_id"))
    cur = ev.where(F.col("event_type") == "view").select(
        "ts",
        (F.col("value") * F.lit(1.25)).alias("value"),
        F.col("user_id").cast("double").alias("user_id"),
    )
    return ref, cur


def _psi_finish_select(out: DataFrame) -> DataFrame:
    return out.select(
        F.col("window_start").cast("date").alias("window_start"),
        F.col("column").alias("column_name"),
        "psi",
    )


@register("value_drift_psi_window", _PSI_WINDOW_SQL)
def q_value_drift_psi_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch twin of stream_value_drift: weekly PSI of the drifted 'view'
    # slice vs the full reference (operators/drift.py:
    # value_drift_psi_by_window). Same mock drift as the KS panel so the
    # two timeseries are directly comparable on a dashboard.
    from ..operators.drift import value_drift_psi_by_window

    ref, cur = _psi_ref_cur(spark, sf_dir)
    out = value_drift_psi_by_window(
        ref, cur, _PSI_COLUMNS, ts_col="ts", unit="week"
    )
    return _psi_finish_select(out)


@register("stream_value_drift", _PSI_WINDOW_SQL)
def q_stream_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The SAME drift panel computed by a Structured Streaming drain:
    # the per-(window, column, bin) counts run as a streaming groupBy
    # over a file stream of events (state = live bins, watermark-
    # evictable in append mode at scale; complete mode here for the
    # availableNow drain, like stream_ohlc), then psi_from_binned
    # finishes from the drained counts — identical code to the batch
    # twin, so drain == batch is an identity, proven by the shared
    # oracle and bit-for-bit in tests/test_stream_drift.py.
    from ..operators.drift import binned_ref_counts, psi_from_binned
    from ..sources.testdata import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    cur = normalize_event_ts(stream).where(
        F.col("event_type") == "view"
    ).select(
        "ts",
        (F.col("value") * F.lit(1.25)).alias("value"),
        F.col("user_id").cast("double").alias("user_id"),
    )
    from ..operators.drift import binned_window_counts

    counts = binned_window_counts(
        cur.withWatermark("ts", "1 hour"), _PSI_COLUMNS, "ts", "week"
    )
    name = "stream_value_drift_counts"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    ref, _ = _psi_ref_cur(spark, sf_dir)
    out = psi_from_binned(
        binned_ref_counts(ref, _PSI_COLUMNS), spark.table(name)
    )
    return _psi_finish_select(out)


@register("similarity_ivf_recall_kmeans")  # rows-only: seeded-KMeans quantizer
def q_similarity_ivf_recall_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The PRODUCTION path's quality evidence (VERDICT r7 #1): recall@10
    # of the seeded-KMeans IVF (fit_ivf_centroids — the quantizer
    # similarity_topk_ivf runs) vs exact, same 5 pinned queries.
    # Seed-dependent centroids → no SQL oracle; the driver records
    # rows/schema, and tests/test_ivf_recall.py pins the recall floor
    # and the nprobe→recall curve (also recorded in SCALE.md).
    emb = _t(spark, sf_dir, "embeddings")
    centroids = similarity.fit_ivf_centroids(emb, n_cells=8, seed=42)
    qvecs = {
        int(r["vec_id"]): [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(list(_QIDS))).collect()
    }
    return similarity.ivf_recall(emb, centroids, qvecs, nprobe=4, k=_K)
