"""Round-12 registry extensions, batch 2: the data-SELECTION stage of
an LLM training-data pipeline (perplexity filtering, DSIR importance
selection) plus hybrid lexical+dense retrieval and a tokenizer
fertility audit under the real-format vocabulary.

Same conventions as registry.py: every computed column aliased
identically on both engines; integer aggregates cast to BIGINT on the
DuckDB side; libm-adjacent doubles rounded before compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .registry_ext12 import _t

# ---------------------------------------------------------------------------
# hybrid_topk_rrf — Reciprocal Rank Fusion (Cormack et al. 2009) of
# BM25 lexical retrieval over documents and exact cosine retrieval
# over embeddings (ids shared by construction of the test corpus):
# fused(d) = Σ 1/(60 + rank). The retrieval front-end of a RAG-style
# corpus pipeline — ranks rather than raw scores, so the lexical and
# dense scales never need calibration. Both retrievers end in
# TakeOrderedAndProject over one corpus pass; the fusion join touches
# ≤ 2·fetch_k rows. The fused score is a sum of exact IEEE dyadic
# terms (1/(60+r)) — no libm — so cross-engine ties are bit-identical
# and (rrf_score desc, doc_id) is fully deterministic.
# ---------------------------------------------------------------------------

_RRF_TERMS = ("hash", "join", "merge")
_RRF_FETCH_K = 50
_RRF_K = 10
_RRF_K0 = 60

def _rrf_sql() -> str:
    from ..operators.text import bm25_sql

    bm = bm25_sql(terms=_RRF_TERMS, k=_RRF_FETCH_K)
    return f"""
WITH bm AS ({bm}),
qv AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
       FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT vec_id AS doc_id,
         list_dot_product(ev, qv)
           / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
           AS cosine_sim
  FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
        FROM embeddings WHERE vec_id <> 0), qv
  ORDER BY cosine_sim DESC, doc_id LIMIT {_RRF_FETCH_K}
),
br AS (SELECT doc_id,
              row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
       FROM bm),
vr AS (SELECT doc_id,
              row_number() OVER (ORDER BY cosine_sim DESC, doc_id) AS vec_rank
       FROM vs)
SELECT doc_id,
       CAST(bm25_rank AS INT) AS bm25_rank,
       CAST(vec_rank AS INT) AS vec_rank,
       round(coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K0} + bm25_rank), 0.0)
             + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K0} + vec_rank), 0.0),
             9) AS rrf_score
FROM br FULL OUTER JOIN vr USING (doc_id)
ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_K}
"""


_RRF_SQL = _rrf_sql()


@register("hybrid_topk_rrf", _RRF_SQL)
def q_hybrid_topk_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hybrid_topk_rrf

    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    return hybrid_topk_rrf(
        _t(spark, sf_dir, "documents"),
        emb,
        list(_RRF_TERMS),
        [float(v) for v in qrow["embedding"]],
        k=_RRF_K,
        fetch_k=_RRF_FETCH_K,
        k0=_RRF_K0,
        exclude_vec_id=0,
    )


# ---------------------------------------------------------------------------
# lm_perplexity_bigram — CCNet-style perplexity filtering (Wenzek et
# al. 2019): a stupid-backoff bigram LM (Brants et al. 2007) trained
# on the even-doc_id half of the corpus scores the odd half; very high
# ppl = text unlike the reference distribution (the signal CCNet cuts
# on). Per-position logs rounded to 6 before the sum, doc mean
# re-rounded, ppl = exp(−mean) rounded to 4 (the established libm
# parity recipe). The backoff branch genuinely fires (held-out bigrams
# unseen in train), which is what distinguishes this from lm_score's
# single-distribution unigram proxy.
# ---------------------------------------------------------------------------


def _lm_bigram_sql() -> str:
    from ..operators.selection import bigram_lm_sql

    return bigram_lm_sql()


@register("lm_perplexity_bigram", _lm_bigram_sql())
def q_lm_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import bigram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_scores(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


# ---------------------------------------------------------------------------
# dsir_select_en — Data Selection via Importance Resampling (Xie et
# al. 2023): hashed unigram+bigram bag-of-ngrams importance weights
# log p_target − log p_raw with add-one smoothing over 2048 buckets
# (engine-portable md5 bucketing, functions/hashing.py), target = the
# English slice, raw = the whole corpus; top-100 by weight with a
# deterministic id tie-break. The published recipe for selecting raw
# web data that matches a trusted target distribution. Bucket table is
# 2048 rows → broadcast; the doc-side explode+groupBy is the only wide
# op.
# ---------------------------------------------------------------------------

_DSIR_N = 100
_DSIR_BUCKETS = 2048


def _dsir_sql() -> str:
    from ..operators.selection import dsir_sql

    inner = dsir_sql("lang = 'en'", n_buckets=_DSIR_BUCKETS)
    return f"""
SELECT * FROM ({inner})
ORDER BY dsir_weight DESC, doc_id LIMIT {_DSIR_N}
"""


@register("dsir_select_en", _dsir_sql())
def q_dsir_select_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import dsir_importance_weights, dsir_select

    docs = _t(spark, sf_dir, "documents")
    weights = dsir_importance_weights(
        docs, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )
    return dsir_select(weights, _DSIR_N)


# ---------------------------------------------------------------------------
# tokenizer_fertility_real — per-language fertility (tokens per
# whitespace word) and bytes-per-token under the REAL-format 50k-merge
# vocabulary: the audit a data-mixing pipeline runs before committing
# token-budget weights (an English-trained vocabulary spends far more
# tokens per byte on other languages, silently shrinking their
# effective share — exactly what this surfaces on the multilingual
# documents table). Token counts ride the O(1)-plan-depth
# distinct-word path; the oracle replays the verbatim
# byte_vocab_count_sql and re-derives words/bytes/ratios with
# identical expressions.
# ---------------------------------------------------------------------------

_FERTILITY_CORPUS_SQL = "SELECT doc_id, text, lang FROM documents"


def _fertility_sql() -> str:
    from ..operators.bpe_vocab import tokenizer_fertility_sql

    return tokenizer_fertility_sql(_FERTILITY_CORPUS_SQL)


@register("tokenizer_fertility_real", _fertility_sql())
def q_tokenizer_fertility_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        tokenizer_fertility_bytes,
    )

    return tokenizer_fertility_bytes(
        _t(spark, sf_dir, "documents").select("doc_id", "text", "lang"),
        pattern=GPT2_SPLIT_PATTERN_PORTABLE,
    )

# ---------------------------------------------------------------------------
# dsir_sample_gumbel — DSIR's PUBLISHED sampling step (Xie et al. 2023
# §2): sample-without-replacement ∝ exp(weight) via the Gumbel top-k
# trick (key = weight − ln(−ln(u))), instead of dsir_select_en's
# deterministic argmax cut — low-weight documents retain proportional
# probability mass, so the selected corpus is not a hard quality
# cliff. The noise is derived from the engine-portable md5 hash of
# (doc_id, seed) — reproducible by seed, replayed exactly by the
# oracle. Plan: the weights plan + one TakeOrderedAndProject.
# ---------------------------------------------------------------------------


def _dsir_gumbel_sql() -> str:
    from ..operators.selection import dsir_gumbel_sql, dsir_sql

    return dsir_gumbel_sql(
        dsir_sql("lang = 'en'", n_buckets=_DSIR_BUCKETS), n=_DSIR_N
    )


@register("dsir_sample_gumbel", _dsir_gumbel_sql())
def q_dsir_sample_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import (
        dsir_gumbel_sample,
        dsir_importance_weights,
    )

    docs = _t(spark, sf_dir, "documents")
    weights = dsir_importance_weights(
        docs, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
    )
    return dsir_gumbel_sample(weights.drop("n_features"), _DSIR_N)

# ---------------------------------------------------------------------------
# HLL sketch family (operators/sketch.py): engine-portable HyperLogLog
# — explicit registers from the portable md5 hash, exact-integer
# indicator sums, so the DuckDB oracle replays registers AND estimate
# bit-for-bit (the built-in approx_count_distinct's state is
# JVM-internal and can be neither persisted, merged, nor replayed).
# hll_users_estimate: one-shot distinct users + the true count + the
# realized relative error in one row. hll_merge_daily: the
# INCREMENTAL-AGGREGATE pattern — per-day register partials (m rows
# each) max-merged, pinned equal to the one-shot estimate in the same
# hashed row. hll_users_by_type: grouped registers (the dashboard
# grain), per-type estimate vs exact.
# ---------------------------------------------------------------------------


def _hll_users_sql() -> str:
    from ..operators.sketch import hll_estimate_sql, hll_registers_sql

    regs = hll_registers_sql("SELECT user_id FROM events", "user_id")
    est = hll_estimate_sql(regs)
    return f"""
SELECT n_buckets_used, hll_estimate,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(abs(hll_estimate - n_exact) / n_exact, 4) AS rel_err
FROM ({est})
CROSS JOIN (SELECT count(DISTINCT user_id) AS n_exact FROM events)
"""


@register("hll_users_estimate", _hll_users_sql())
def q_hll_users_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_distinct

    ev = _t(spark, sf_dir, "events")
    est = hll_distinct(ev, "user_id")
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_buckets_used",
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


def _hll_merge_sql() -> str:
    from ..operators.sketch import hll_estimate_sql, hll_registers_sql

    daily = hll_registers_sql(
        "SELECT day(ts) AS d, user_id FROM events", "user_id", group_cols="d"
    )
    merged_regs = f"SELECT bucket, max(rho) AS rho FROM ({daily}) GROUP BY 1"
    oneshot_regs = hll_registers_sql("SELECT user_id FROM events", "user_id")
    return f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM ({daily})) AS n_partial_rows,
       m.hll_estimate AS est_merged,
       o.hll_estimate AS est_oneshot,
       m.hll_estimate = o.hll_estimate AS merged_equals_oneshot
FROM ({hll_estimate_sql(merged_regs)}) m
CROSS JOIN ({hll_estimate_sql(oneshot_regs)}) o
"""


@register("hll_merge_daily", _hll_merge_sql())
def q_hll_merge_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_distinct, hll_estimate, hll_merge, hll_registers

    ev = _t(spark, sf_dir, "events")
    daily = hll_registers(
        ev.select(F.dayofmonth("ts").alias("d"), "user_id"),
        "user_id",
        group_cols=["d"],
    )
    n_partials = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partial_rows")
    )
    merged = hll_estimate(hll_merge(daily.select("bucket", "rho")))
    oneshot = hll_distinct(ev, "user_id")
    return (
        n_partials.crossJoin(
            F.broadcast(
                merged.select(F.col("hll_estimate").alias("est_merged"))
            )
        )
        .crossJoin(
            F.broadcast(
                oneshot.select(F.col("hll_estimate").alias("est_oneshot"))
            )
        )
        .select(
            "n_partial_rows",
            "est_merged",
            "est_oneshot",
            (F.col("est_merged") == F.col("est_oneshot")).alias(
                "merged_equals_oneshot"
            ),
        )
    )


def _hll_bytype_sql() -> str:
    from ..operators.sketch import hll_estimate_sql, hll_registers_sql

    regs = hll_registers_sql(
        "SELECT event_type, user_id FROM events",
        "user_id",
        group_cols="event_type",
    )
    est = hll_estimate_sql(regs, group_cols="event_type")
    return f"""
SELECT e.event_type, e.n_buckets_used, e.hll_estimate,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       round(abs(e.hll_estimate - x.n_exact) / x.n_exact, 4) AS rel_err
FROM ({est}) e
JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1) x USING (event_type)
"""


@register("hll_users_by_type", _hll_bytype_sql())
def q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_distinct

    ev = _t(spark, sf_dir, "events")
    est = hll_distinct(ev, "user_id", group_cols=["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return est.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_buckets_used",
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


def write_drop_files(frames, drops: str) -> None:
    """Write each DataFrame as ONE parquet drop file ``b{i}.parquet``
    with deterministic increasing mtimes — the drain order a
    ``maxFilesPerTrigger=1`` file stream follows. THE single copy of
    the fragile part-file-glob/move/utime choreography (review r13;
    previously repeated in three places); the staging dir lives
    BESIDE ``drops`` so the file stream can never glob half-written
    parts or mistake staging subdirs for partitions."""
    import glob
    import os
    import shutil

    os.makedirs(drops, exist_ok=True)
    for i, df in enumerate(frames):
        tmp = f"{drops.rstrip('/')}__stage{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{drops}/b{i}.parquet")
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(
            f"{drops}/b{i}.parquet",
            (1_700_000_000 + i, 1_700_000_000 + i),
        )


def write_drop_files_one_pass(
    df, batch_col, n_batches: int, drops: str, payload_cols=None
) -> None:
    """ONE-JOB variant of ``write_drop_files`` for the common case
    where every drop file is a predicate slice of the SAME source
    frame: tag each row with its batch index and write all batches in
    a single partitioned job, then move each partition's part file to
    ``b{i}.parquet`` with the same deterministic increasing mtimes.

    Why (optimization r15, guide §1.2/§2.4): the per-frame form runs
    one full source job PER batch, and the batch predicate sits ABOVE
    any opaque synthesis (mapInPandas PNG/WAV synth, the HTML render)
    so each job re-derives the WHOLE corpus and keeps one slice — the
    3-batch fixtures paid the source 3×. Rows whose ``batch_col`` is
    NULL are dropped (matching the predicate form, where such rows
    matched no slice). The ``repartition(n, batch)`` exchange moves
    each payload byte once; every batch value lands in exactly one
    task, so each partition directory holds exactly one part file."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    tagged = df.withColumn("__batch", batch_col.cast("int")).where(
        F.col("__batch").isNotNull()
    )
    if payload_cols is not None:
        tagged = tagged.select(*payload_cols, "__batch")
    tmp = f"{drops.rstrip('/')}__stage"
    (
        tagged.repartition(n_batches, "__batch")
        .write.mode("overwrite")
        .partitionBy("__batch")
        .parquet(tmp)
    )
    os.makedirs(drops, exist_ok=True)
    for i in range(n_batches):
        parts = glob.glob(f"{tmp}/__batch={i}/part-*.parquet")
        if len(parts) != 1:
            raise ValueError(
                f"write_drop_files_one_pass: batch {i} produced "
                f"{len(parts)} part files (empty or multi-file batch "
                f"slices are not valid drop fixtures)"
            )
        shutil.move(parts[0], f"{drops}/b{i}.parquet")
        os.utime(
            f"{drops}/b{i}.parquet",
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    shutil.rmtree(tmp, ignore_errors=True)


def _make_user_id_drops(spark, sf_dir: str, tag: str) -> str:
    """Shared file-drop fixture for the sketch-ingest streams: claims
    (and rmtree's) the per-run tmp dir ONCE, splits events' user_id
    column into three day-range drop files under <base>/drops, and
    returns base. Callers place their state table under the returned
    base and then stream with ``_drain_user_id_drops``."""
    from .registry_ext12 import _tmp_table_path

    ev = _t(spark, sf_dir, "events")
    base = _tmp_table_path(sf_dir, tag)
    day = F.dayofmonth("ts")
    # same slices as the old per-frame predicates ([1,11), [11,21),
    # [21,32)); a NULL ts matched none of them and maps to NULL here,
    # which the one-pass writer drops
    batch = (
        F.when((day >= 1) & (day < 11), 0)
        .when((day >= 11) & (day < 21), 1)
        .when((day >= 21) & (day < 32), 2)
    )
    write_drop_files_one_pass(
        ev,
        batch,
        3,
        f"{base}/drops",
        payload_cols=["user_id"],
    )
    return base


def _drain_user_id_drops(spark, base: str, ingest) -> None:
    """Stream the drop files one per trigger through ``foreachBatch
    ingest`` (availableNow) and drain."""
    from pyspark.sql import types as T

    from .registry import drain_stream

    schema = T.StructType([T.StructField("user_id", T.LongType())])
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/drops")
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)


def _cms_probe_report(spark, counters, ev) -> DataFrame:
    """Shared probe/exact/overestimate report tail for the CMS
    queries (cms_user_freq, stream_cms_ingest)."""
    from ..operators.sketch import cms_estimate

    probes = spark.createDataFrame(
        [(p,) for p in _CMS_PROBES], "probe long"
    )
    est = cms_estimate(counters, probes)
    exact = ev.groupBy(F.col("user_id").alias("probe")).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return est.join(F.broadcast(exact), "probe", "left").select(
        "probe",
        "cms_estimate",
        F.coalesce(F.col("n_exact"), F.lit(0))
        .cast("bigint")
        .alias("n_exact"),
        (
            F.col("cms_estimate")
            - F.coalesce(F.col("n_exact"), F.lit(0)).cast("bigint")
        ).alias("overestimate"),
    )



# ---------------------------------------------------------------------------
# cms_user_freq — count-min sketch point-frequency estimates (Cormode
# & Muthukrishnan 2005; operators/sketch.py): d=4 portable-hash rows ×
# w=512 counters, est = min_j counter[j][h_j(x)]. Probes cover present
# AND absent keys; the one-sided guarantee (est ≥ true, est ≤ true +
# e/w·N w.h.p.) is carried IN the hashed row as overestimate = est −
# exact (≥ 0 always — a negative value anywhere breaks the hash).
# Counters merge by addition (exactly-once partials — the txn sink's
# claimed batch ids), so the same frame serves the
# incremental-aggregate pattern as the HLL registers.
# ---------------------------------------------------------------------------

_CMS_PROBES = (0, 1, 2, 57, 149, 999_983)


def _cms_sql() -> str:
    from ..operators.sketch import cms_sql

    probes = " UNION ALL ".join(f"SELECT {p} AS probe" for p in _CMS_PROBES)
    inner = cms_sql("SELECT user_id FROM events", "user_id", probes)
    return f"""
SELECT c.probe, c.cms_estimate,
       CAST(coalesce(x.n_exact, 0) AS BIGINT) AS n_exact,
       c.cms_estimate - CAST(coalesce(x.n_exact, 0) AS BIGINT)
         AS overestimate
FROM ({inner}) c
LEFT JOIN (SELECT user_id AS probe, count(*) AS n_exact
           FROM events GROUP BY 1) x USING (probe)
"""


@register("cms_user_freq", _cms_sql())
def q_cms_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_counters

    ev = _t(spark, sf_dir, "events")
    return _cms_probe_report(spark, cms_counters(ev, "user_id"), ev)


# ---------------------------------------------------------------------------
# stream_hll_ingest — STREAMING SKETCH MAINTENANCE through the txn
# table: writeStream over a file-drop source → foreachBatch{
# hll_registers(batch) → TxnTable.append(batch_id=epoch) } → the query
# max-merges ALL persisted partials and estimates. The end-to-end
# composition of the incremental-aggregate pattern: per-epoch register
# partials (≤m rows each) land as exactly-once commits; "distinct
# users so far" never rescans raw events. The oracle is the verbatim
# one-shot HLL replay over the FULL events table (hll_users_estimate's
# SQL), so the hash pins merged-streamed-partials == one-shot across
# arbitrary micro-batch boundaries — a stream that dropped, truncated,
# or double-counted a batch breaks it. (HLL max-merge is additionally
# IDEMPOTENT, so even at-least-once delivery would stay correct —
# pinned in tests/test_stream_hll_ingest.py alongside restart
# recovery; contrast the CMS, whose additive merge NEEDS the claimed
# batch ids.)
# ---------------------------------------------------------------------------


@register("stream_hll_ingest", _hll_users_sql())
def q_stream_hll_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_merge, hll_registers
    from ..sources.txnlog import TxnTable
    from .phases import timed_phase

    ev = _t(spark, sf_dir, "events")
    with timed_phase("stream_hll_ingest.build"):
        base = _make_user_id_drops(spark, sf_dir, "hllstream")
        table = TxnTable(spark, f"{base}/regs")

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            table.append(
                hll_registers(batch_df, "user_id"), batch_id=batch_id
            )

        _drain_user_id_drops(spark, base, ingest)

    est = hll_estimate(hll_merge(table.scan().select("bucket", "rho")))
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_buckets_used",
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# hll_window_7d — the query the register table EXISTS for: trailing
# 7-day distinct users per day, answered by max-merging ≤7 daily
# register partials per window instead of rescanning raw events (a
# sliding COUNT(DISTINCT) is otherwise unmergeable — each window
# re-deduplicates from scratch). The spine×registers range join is
# days × m rows; the exact side (a days × events range join) is the
# AUDIT, not the serving path. Per-day realized error rides in the
# hashed rows.
# ---------------------------------------------------------------------------


def _hll_window_sql() -> str:
    from ..operators.sketch import hll_estimate_sql, hll_registers_sql

    daily = hll_registers_sql(
        "SELECT CAST(day(ts) AS INT) AS d, user_id FROM events",
        "user_id",
        group_cols="d",
    )
    est = hll_estimate_sql(
        "SELECT day, bucket, rho FROM win", group_cols="day"
    )
    return f"""
WITH daily AS ({daily}),
spine AS (SELECT DISTINCT CAST(day(ts) AS INT) AS day FROM events),
win AS (
  SELECT s.day, r.bucket, max(r.rho) AS rho
  FROM spine s JOIN daily r ON r.d <= s.day AND r.d > s.day - 7
  GROUP BY 1, 2
),
est AS ({est}),
exact AS (
  SELECT s.day, count(DISTINCT e.user_id) AS n_exact
  FROM spine s
  JOIN events e ON CAST(day(e.ts) AS INT) <= s.day
               AND CAST(day(e.ts) AS INT) > s.day - 7
  GROUP BY 1
)
SELECT est.day, n_buckets_used, hll_estimate,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(abs(hll_estimate - n_exact) / n_exact, 4) AS rel_err
FROM est JOIN exact USING (day)
"""


@register("hll_window_7d", _hll_window_sql())
def q_hll_window_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers

    ev = _t(spark, sf_dir, "events")
    daily = hll_registers(
        ev.select(F.dayofmonth("ts").cast("int").alias("d"), "user_id"),
        "user_id",
        group_cols=["d"],
    )
    spine = ev.select(
        F.dayofmonth("ts").cast("int").alias("day")
    ).distinct()
    win = (
        F.broadcast(spine)
        .join(
            daily,
            (F.col("d") <= F.col("day")) & (F.col("d") > F.col("day") - 7),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    est = hll_estimate(win, group_cols=["day"])
    exact = (
        F.broadcast(spine.withColumnRenamed("day", "xday"))
        .join(
            ev.select(F.dayofmonth("ts").cast("int").alias("ed"), "user_id"),
            (F.col("ed") <= F.col("xday")) & (F.col("ed") > F.col("xday") - 7),
        )
        .groupBy(F.col("xday").alias("day"))
        .agg(F.countDistinct("user_id").alias("n_exact"))
    )
    return est.join(exact, "day").select(
        "day",
        "n_buckets_used",
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# kmv_distinct_users — bottom-k / KMV sketch (Bar-Yossef et al. 2002;
# Beyer et al. 2007): the k=64 minimum portable-hash values over
# distinct user_ids — simultaneously a uniform distinct-key sample, a
# distinct-count estimator ((k−1)·H / h_(k)), and (idempotent
# min-merge) the third mergeable synopsis next to the HLL (max) and
# the CMS (sum). Small-range branch: a non-full sketch IS the exact
# distinct set. Estimate + exact + realized error in the hashed row.
# ---------------------------------------------------------------------------


def _kmv_sql() -> str:
    from ..operators.sketch import kmv_sql

    inner = kmv_sql("SELECT user_id FROM events", "user_id")
    return f"""
SELECT n_sketch, kmv_estimate,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(abs(kmv_estimate - n_exact) / n_exact, 4) AS rel_err
FROM ({inner})
CROSS JOIN (SELECT count(DISTINCT user_id) AS n_exact FROM events)
"""


@register("kmv_distinct_users", _kmv_sql())
def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import bottomk_sketch, kmv_estimate

    ev = _t(spark, sf_dir, "events")
    est = kmv_estimate(bottomk_sketch(ev, "user_id"))
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_sketch",
        "kmv_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("kmv_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# cms_heavy_hitters — the CMS's actual production use: report every
# key whose estimated frequency clears a support floor. The one-sided
# bound (est ≥ true, always) makes the report FALSE-NEGATIVE-FREE —
# every true heavy hitter is present by construction; collision mass
# can only add spurious borderline keys, and each row carries
# (estimate, exact, is_true_hh) so the false-positive band is visible
# in the hashed result. Candidates here are the distinct keys (150 at
# sf0.01); at 100 TB the candidate set is whatever bounded stream the
# pipeline tracks (e.g. the KMV sample) — the sketch side is unchanged.
# Fixture uses an absolute support floor (80 events) so the report is
# non-empty and deterministic at every SF.
# ---------------------------------------------------------------------------

_HH_FLOOR = 80


def _cms_hh_sql() -> str:
    from ..operators.sketch import cms_sql

    inner = cms_sql(
        "SELECT user_id FROM events",
        "user_id",
        "SELECT DISTINCT user_id AS probe FROM events",
    )
    return f"""
SELECT c.probe AS user_id, c.cms_estimate,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       x.n_exact >= {_HH_FLOOR} AS is_true_hh
FROM ({inner}) c
JOIN (SELECT user_id AS probe, count(*) AS n_exact
      FROM events GROUP BY 1) x USING (probe)
WHERE c.cms_estimate >= {_HH_FLOOR}
"""


@register("cms_heavy_hitters", _cms_hh_sql())
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_counters, cms_estimate

    ev = _t(spark, sf_dir, "events")
    counters = cms_counters(ev, "user_id")
    probes = ev.select(F.col("user_id").alias("probe")).distinct()
    est = cms_estimate(counters, probes)
    exact = ev.groupBy(F.col("user_id").alias("probe")).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    return (
        est.where(F.col("cms_estimate") >= _HH_FLOOR)
        .join(exact, "probe")
        .select(
            F.col("probe").alias("user_id"),
            "cms_estimate",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (F.col("n_exact") >= _HH_FLOOR).alias("is_true_hh"),
        )
    )


# ---------------------------------------------------------------------------
# kmv_jaccard_cohorts — set OVERLAP between two populations from
# their bottom-k sketches (Broder 1997's minwise estimate on the KMV
# synopsis): customers who ordered in 1995 vs customers who ordered in
# 2001 (true Jaccard ~0.50 on this data — a genuinely partial
# overlap). jaccard_est = |{k smallest of A∪B} present in BOTH A and
# B| / |union sketch| — computed entirely from the two ≤k-row
# sketches; the exact Jaccard (a full distinct-intersection) rides
# along as the audit. The pair (sketch-only estimate, exact) in one
# hashed row is the cross-population dashboard pattern: persisted
# per-cohort sketches answer ANY cohort-pair overlap later without
# touching raw orders.
# ---------------------------------------------------------------------------

_KMV_YEAR_A = 1995
_KMV_YEAR_B = 2001


def _kmv_jaccard_sql() -> str:
    from ..operators.sketch import _HASH_CHARS, KMV_K

    h = (
        "CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, "
        f"{_HASH_CHARS}) AS BIGINT)"
    )
    return f"""
WITH a AS (
  SELECT DISTINCT {h} AS hv FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) = {_KMV_YEAR_A}
  ORDER BY hv LIMIT {KMV_K}
),
b AS (
  SELECT DISTINCT {h} AS hv FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) = {_KMV_YEAR_B}
  ORDER BY hv LIMIT {KMV_K}
),
u AS (
  SELECT DISTINCT hv FROM (SELECT hv FROM a UNION ALL SELECT hv FROM b)
  ORDER BY hv LIMIT {KMV_K}
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_union_sketch,
         CAST(sum(CASE WHEN hv IN (SELECT hv FROM a)
                        AND hv IN (SELECT hv FROM b)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM u
),
x AS (
  SELECT count(DISTINCT CASE WHEN in_a AND in_b THEN k END) AS n_inter,
         count(DISTINCT k) AS n_union
  FROM (
    SELECT o_custkey AS k,
           bool_or(year(CAST(o_orderdate AS DATE)) = {_KMV_YEAR_A}) AS in_a,
           bool_or(year(CAST(o_orderdate AS DATE)) = {_KMV_YEAR_B}) AS in_b
    FROM orders
    WHERE year(CAST(o_orderdate AS DATE)) IN ({_KMV_YEAR_A}, {_KMV_YEAR_B})
    GROUP BY 1
  )
)
SELECT n_union_sketch, n_both,
       round(CAST(n_both AS DOUBLE) / n_union_sketch, 6) AS jaccard_est,
       round(CAST(n_inter AS DOUBLE) / n_union, 6) AS jaccard_exact
FROM m CROSS JOIN x
"""


@register("kmv_jaccard_cohorts", _kmv_jaccard_sql())
def q_kmv_jaccard_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import bottomk_merge, bottomk_sketch

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
    )
    a = bottomk_sketch(
        orders.where(F.col("yr") == _KMV_YEAR_A), "o_custkey"
    ).select("hv")
    b = bottomk_sketch(
        orders.where(F.col("yr") == _KMV_YEAR_B), "o_custkey"
    ).select("hv")
    u = bottomk_merge(a.unionByName(b)).select("hv")
    m = (
        u.join(a.withColumn("ia", F.lit(1)), "hv", "left")
        .join(b.withColumn("ib", F.lit(1)), "hv", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_union_sketch"),
            F.sum(
                (F.col("ia").isNotNull() & F.col("ib").isNotNull()).cast(
                    "int"
                )
            )
            .cast("bigint")
            .alias("n_both"),
        )
    )
    flags = (
        orders.where(F.col("yr").isin(_KMV_YEAR_A, _KMV_YEAR_B))
        .groupBy("o_custkey")
        .agg(
            F.max((F.col("yr") == _KMV_YEAR_A).cast("int")).alias("in_a"),
            F.max((F.col("yr") == _KMV_YEAR_B).cast("int")).alias("in_b"),
        )
    )
    x = flags.agg(
        F.countDistinct(
            F.when(
                (F.col("in_a") == 1) & (F.col("in_b") == 1),
                F.col("o_custkey"),
            )
        ).alias("n_inter"),
        F.countDistinct("o_custkey").alias("n_union"),
    )
    return m.crossJoin(F.broadcast(x)).select(
        "n_union_sketch",
        "n_both",
        F.round(
            F.col("n_both").cast("double") / F.col("n_union_sketch"), 6
        ).alias("jaccard_est"),
        F.round(
            F.col("n_inter").cast("double") / F.col("n_union"), 6
        ).alias("jaccard_exact"),
    )


# ---------------------------------------------------------------------------
# decontaminate_bpe_13gram — TOKEN-LEVEL benchmark decontamination,
# the GPT-3 appendix-C recipe (also Llama/GPT-4 card practice): a
# training candidate is contaminated if any 13-gram of its REAL-VOCAB
# token ids appears in the eval set's 13-gram set. Token-level (not
# word-shingle like contamination_check) because that is what the
# published pipelines match on — tokenizer-normalized overlap survives
# whitespace/case tricks that word shingles can miss. The corpus
# plants 10 copies of eval docs behind a prefix (their interior token
# runs are IDENTICAL — pre-tokenization is per-word, so the prefix
# only perturbs the first pre-token); n_planted_caught == n_planted is
# pinned by the hash. One tokenization pass over corpus∪eval (the
# distinct-word plan), per-doc ordered id arrays, 13-grams via
# slice+join, and a broadcast semi-join against the eval n-gram set —
# corpus token streams never shuffle for the match.
# ---------------------------------------------------------------------------

_DECON_NG = 13
_DECON_CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 10000000 AS doc_id,
       'copied benchmark row ' || text AS text
FROM documents WHERE doc_id % 50 = 0
"""


def _decon_bpe_sql() -> str:
    from ..operators.bpe_vocab import byte_tokenize_ids_sql

    ids = byte_tokenize_ids_sql(_DECON_CORPUS_SQL)
    n = _DECON_NG
    return f"""
WITH ids AS ({ids}),
arrs AS (
  SELECT doc_id,
         list(CAST(token_id AS VARCHAR) ORDER BY wpos, ti) AS toks
  FROM ids GROUP BY 1
),
ngrams AS (
  SELECT doc_id, unnest(list_transform(
           generate_series(1, len(toks) - {n - 1}),
           i -> array_to_string(toks[i:i + {n - 1}], '-'))) AS ng
  FROM arrs
),
eval_ng AS (
  SELECT DISTINCT ng FROM ngrams
  WHERE doc_id % 50 = 0 AND doc_id < 10000000
),
corpus AS (
  SELECT doc_id, ng FROM ngrams
  WHERE doc_id % 50 != 0 OR doc_id >= 10000000
),
hits AS (
  SELECT DISTINCT corpus.doc_id FROM corpus JOIN eval_ng USING (ng)
)
SELECT (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM corpus)
         AS n_corpus_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM eval_ng) AS n_eval_ngrams,
       (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_contaminated,
       (SELECT CAST(count(*) AS BIGINT) FROM hits WHERE doc_id >= 10000000)
         AS n_planted_caught
"""


@register("decontaminate_bpe_13gram", _decon_bpe_sql())
def q_decontaminate_bpe_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        bpe_tokenize_ids,
    )

    n = _DECON_NG
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("copied benchmark row "), F.col("text")).alias(
            "text"
        ),
    )
    ids = bpe_tokenize_ids(
        docs.unionByName(planted), pattern=GPT2_SPLIT_PATTERN_PORTABLE
    )
    arrs = ids.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("wpos", "ti", "token_id"))
            ),
            lambda s: s["token_id"].cast("string"),
        ).alias("toks")
    )
    ngrams = arrs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.array_join(
                        F.slice("toks", i, n), "-"
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("ng"),
    )
    is_eval = (F.col("doc_id") % 50 == 0) & (F.col("doc_id") < 10_000_000)
    eval_ng = ngrams.where(is_eval).select("ng").distinct()
    corpus = ngrams.where(~is_eval)
    hits = (
        corpus.join(F.broadcast(eval_ng), "ng", "leftsemi")
        .select("doc_id")
        .distinct()
    )
    n_corpus = corpus.select("doc_id").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus_docs")
    )
    n_eval = eval_ng.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_ngrams")
    )
    n_hits = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contaminated")
    )
    n_planted = hits.where(F.col("doc_id") >= 10_000_000).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_planted_caught")
    )
    return (
        n_corpus.crossJoin(F.broadcast(n_eval))
        .crossJoin(F.broadcast(n_hits))
        .crossJoin(F.broadcast(n_planted))
    )


# ---------------------------------------------------------------------------
# curation_pipeline_v2 — the round-12 selection stages COMPOSED as one
# curation run (the corpus_curation pattern at this round's
# calibration level): reference-LM perplexity gate (bigram stupid
# backoff trained on the even half, CCNet-style, keep ppl ≤ 32) →
# DSIR top-200 importance cut (target = the English slice) → exact
# content dedup (min-id survives per normalized-text md5) → REAL-VOCAB
# token budget of the survivors. One hashed summary row carries every
# stage's survivor count plus the final token budget, so a drift in
# ANY stage — LM counts, bucket hashing, tie-breaks, dedup
# canonicalization, or the 50k-merge tokenizer — moves the row. Each
# stage is the already-oracled operator; the composition pins that
# they agree on the HANDOFF frames too.
# ---------------------------------------------------------------------------

_CUR_PPL_MAX = 32.0
_CUR_DSIR_N = 200


def _curation_v2_sql() -> str:
    from ..operators.bpe_vocab import byte_vocab_count_sql
    from ..operators.selection import bigram_lm_sql, dsir_sql

    ppl = bigram_lm_sql(train_pred="doc_id % 2 = 0", eval_pred="TRUE")
    w = dsir_sql(
        "lang = 'en'",
        n_buckets=_DSIR_BUCKETS,
        table="(SELECT doc_id, text, lang FROM q1)",
    )
    counts = byte_vocab_count_sql(
        "SELECT d.doc_id, d.text FROM documents d JOIN q3 USING (doc_id)"
    )
    norm = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return f"""
WITH ppl AS ({ppl}),
q1 AS (
  SELECT d.doc_id, d.text, d.lang
  FROM documents d JOIN ppl USING (doc_id)
  WHERE ppl.ppl <= {_CUR_PPL_MAX}
),
q2 AS (
  SELECT doc_id FROM ({w})
  ORDER BY dsir_weight DESC, doc_id LIMIT {_CUR_DSIR_N}
),
q2j AS (SELECT q1.* FROM q1 JOIN q2 USING (doc_id)),
q3 AS (
  SELECT min(doc_id) AS doc_id FROM q2j GROUP BY {norm}
),
counts AS ({counts})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
       (SELECT CAST(count(*) AS BIGINT) FROM q1) AS n_after_ppl,
       (SELECT CAST(count(*) AS BIGINT) FROM q2j) AS n_after_dsir,
       (SELECT CAST(count(*) AS BIGINT) FROM q3) AS n_final,
       (SELECT CAST(sum(n_tokens_exact) AS BIGINT) FROM counts)
         AS total_tokens_real
"""


@register("curation_pipeline_v2", _curation_v2_sql())
def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe_vocab import (
        GPT2_SPLIT_PATTERN_PORTABLE,
        bpe_token_count_bytes,
    )
    from ..operators.selection import (
        bigram_lm_scores,
        dsir_importance_weights,
        dsir_select,
    )
    from ..operators.text import normalize_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    ppl = bigram_lm_scores(
        docs.where(F.col("doc_id") % 2 == 0), docs
    )
    # Stage handoffs MATERIALIZED with localCheckpoint (optimization
    # r15, the curation_pipeline_v4/v5 fix applied to v2): the five
    # count branches otherwise each replicate the whole LM -> DSIR ->
    # dedup -> BPE logical chain, so the driver replans (and partially
    # re-executes) it per branch. Each checkpoint is <= n_docs rows of
    # (id, text, lang).
    q1 = docs.join(
        ppl.where(F.col("ppl") <= _CUR_PPL_MAX).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)
    q2 = dsir_select(
        dsir_importance_weights(
            q1, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS
        ),
        _CUR_DSIR_N,
    ).select("doc_id")
    q2j = q1.join(q2, "doc_id").localCheckpoint(eager=True)
    q3 = q2j.groupBy(F.md5(normalize_text(F.col("text")))).agg(
        F.min("doc_id").alias("doc_id")
    ).localCheckpoint(eager=True)
    final_docs = q3.select("doc_id").join(docs, "doc_id")
    counts = bpe_token_count_bytes(
        final_docs.select("doc_id", "text"),
        pattern=GPT2_SPLIT_PATTERN_PORTABLE,
    )
    n_input = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_input")
    )
    n_ppl = q1.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_ppl")
    )
    n_dsir = q2j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_after_dsir")
    )
    n_final = q3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_final")
    )
    budget = counts.agg(
        F.sum("n_tokens_exact").cast("bigint").alias("total_tokens_real")
    )
    return (
        n_input.crossJoin(F.broadcast(n_ppl))
        .crossJoin(F.broadcast(n_dsir))
        .crossJoin(F.broadcast(n_final))
        .crossJoin(F.broadcast(budget))
    )


# ---------------------------------------------------------------------------
# lm_perplexity_trigram — the FULL stupid-backoff chain (trigram →
# bigram → add-one unigram; Brants et al. 2007 run the same chain at
# 5-gram — the order is a constant, the mechanism is what's proven):
# trained on the even half, scoring the odd half, with per-order usage
# counts (n_order3/2/1) in the hashed rows so the backoff actually
# firing is itself oracled. Same integer-sum float discipline as the
# bigram query.
# ---------------------------------------------------------------------------


def _lm_trigram_sql() -> str:
    from ..operators.selection import trigram_lm_sql

    return trigram_lm_sql()


@register("lm_perplexity_trigram", _lm_trigram_sql())
def q_lm_perplexity_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import trigram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    return trigram_lm_scores(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
    )


# ---------------------------------------------------------------------------
# hll_profile_orders — the EDA distinct-cardinality PROFILE via
# sketches: one register build per column (melted to (col, value)
# rows, so the groupBy key is (col, bucket) and all columns share one
# shuffle), per-column estimate vs exact COUNT(DISTINCT). The profile
# a 100 TB onboarding job runs instead of N exact distinct scans —
# and, persisted, the input to schema-drift monitoring (register
# deltas per column per day).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderkey")


def _hll_profile_sql() -> str:
    from ..operators.sketch import hll_estimate_sql, hll_registers_sql

    melted = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM orders"
        for c in _PROFILE_COLS
    )
    regs = hll_registers_sql(melted, "val", group_cols="col")
    est = hll_estimate_sql(
        "SELECT col, bucket, rho FROM regs", group_cols="col"
    )
    exact = " UNION ALL ".join(
        f"SELECT '{c}' AS col, count(DISTINCT {c}) AS n_exact FROM orders"
        for c in _PROFILE_COLS
    )
    return f"""
WITH regs AS ({regs}),
est AS ({est}),
exact AS ({exact})
SELECT col, n_buckets_used, hll_estimate,
       CAST(n_exact AS BIGINT) AS n_exact,
       round(abs(hll_estimate - n_exact) / n_exact, 4) AS rel_err
FROM est JOIN exact USING (col)
"""


@register("hll_profile_orders", _hll_profile_sql())
def q_hll_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_distinct

    orders = _t(spark, sf_dir, "orders")
    melted = None
    for c in _PROFILE_COLS:
        part = orders.select(
            F.lit(c).alias("col"), F.col(c).cast("string").alias("val")
        )
        melted = part if melted is None else melted.unionByName(part)
    est = hll_distinct(melted, "val", group_cols=["col"])
    exact = None
    for c in _PROFILE_COLS:
        part = orders.agg(
            F.countDistinct(c).alias("n_exact")
        ).select(F.lit(c).alias("col"), "n_exact")
        exact = part if exact is None else exact.unionByName(part)
    return est.join(F.broadcast(exact), "col").select(
        "col",
        "n_buckets_used",
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(
            F.abs(F.col("hll_estimate") - F.col("n_exact"))
            / F.col("n_exact"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# sample_per_lang — deterministic uniform EXEMPLARS per group: the k
# smallest portable-hash docs per language (the bottom-k sketch at
# dashboard grain — hash order is uniform and reproducible, so "show
# me 3 random docs per language" returns the SAME docs on every
# engine and every run; duplicates of a doc can't bias it). A window
# per group over hash rank — partitioned by lang, never global.
# ---------------------------------------------------------------------------

_SAMPLE_K = 3


def _sample_per_lang_sql() -> str:
    from ..operators.sketch import _HASH_CHARS

    h = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, "
        f"{_HASH_CHARS}) AS BIGINT)"
    )
    return f"""
SELECT lang, rk, doc_id FROM (
  SELECT lang, doc_id,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id)
              AS INT) AS rk
  FROM documents
) WHERE rk <= {_SAMPLE_K}
"""


@register("sample_per_lang", _sample_per_lang_sql())
def q_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.hashing import md5_hash_int
    from ..operators.sketch import _HASH_CHARS

    docs = _t(spark, sf_dir, "documents")
    h = md5_hash_int(F.col("doc_id").cast("string"), _HASH_CHARS)
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    return (
        docs.select(
            "lang",
            F.row_number().over(w).cast("int").alias("rk"),
            "doc_id",
        )
        .where(F.col("rk") <= _SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# rag_hybrid_hashed — the RAG ingestion+retrieval pipeline END-TO-END
# with an exactly-replayable embedder: chunk (50-token windows, stride
# 40) → feature-hash embed (Weinberger et al. 2009 signed hashed BoW —
# deterministic, model-free, bit-identical cross-engine; swapping in a
# real encoder changes one projection) → dense cosine top-50 against
# the hashed QUERY vector → BM25 top-50 over the same chunks → RRF
# fusion. Every stage already oracled alone (doc_chunks, bm25_search,
# hybrid_topk_rrf); this pins the full chain including the
# chunk-grain composite id handoff. Integer dot products; the only
# libm is the norm sqrt, rounded at 1e-6.
# ---------------------------------------------------------------------------

_RAG_QUERY = "hash join merge plan"
_RAG_FETCH_K = 50
_RAG_K = 10


def _rag_sql() -> str:
    from ..operators.similarity import (
        FEATHASH_DIM,
        feature_hash_sums_sql,
        feature_hash_vec_py,
    )
    from ..operators.text import bm25_sql

    q = feature_hash_vec_py(_RAG_QUERY)
    qnorm = sum(v * v for v in q) ** 0.5
    dot = " + ".join(f"vec[{i + 1}] * ({q[i]})" for i in range(FEATHASH_DIM))
    n2 = " + ".join(f"vec[{i + 1}] * vec[{i + 1}]" for i in range(FEATHASH_DIM))
    bm = bm25_sql(
        id_col="cid",
        terms=tuple(_RAG_QUERY.split()),
        k=_RAG_FETCH_K,
        tok_cte="ftok",
    )
    # chunk id: the portable md5 of "doc_id#chunk_index" — collision-
    # free at any document length (an arithmetic doc_id*K+index id
    # collides once a doc has >= K chunks; web docs make that real);
    # doc_id/chunk_index are recovered by joining the mapping back.
    cid = (
        "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||"
        " CAST(start // 40 AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    return f"""
WITH tok0 AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS tk
  FROM documents WHERE text IS NOT NULL
),
st AS (
  SELECT doc_id, tk, unnest(range(0, greatest(len(tk), 1), 40)) AS start
  FROM tok0
),
chunks AS (
  SELECT {cid} AS cid, doc_id, CAST(start // 40 AS INT) AS chunk_index,
         array_to_string(tk[start + 1 : start + 50], ' ') AS chunk_text
  FROM st
),
ftok AS (
  SELECT cid,
         unnest(string_split(trim(regexp_replace(lower(chunk_text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM chunks WHERE chunk_text IS NOT NULL
),
emb AS ({feature_hash_sums_sql()}),
dense0 AS (
  SELECT cid,
         round(({dot}) / (sqrt({n2}) * {qnorm!r}), 6) AS cosine_sim
  FROM emb WHERE ({n2}) > 0
),
vs AS (SELECT cid, cosine_sim FROM dense0
       ORDER BY cosine_sim DESC, cid LIMIT {_RAG_FETCH_K}),
bm AS ({bm}),
br AS (SELECT cid,
              row_number() OVER (ORDER BY bm25 DESC, cid) AS bm25_rank
       FROM bm),
vr AS (SELECT cid,
              row_number() OVER (ORDER BY cosine_sim DESC, cid) AS vec_rank
       FROM vs),
fused AS (
  SELECT cid,
         CAST(bm25_rank AS INT) AS bm25_rank,
         CAST(vec_rank AS INT) AS vec_rank,
         round(coalesce(CAST(1.0 AS DOUBLE) / (60 + bm25_rank), 0.0)
               + coalesce(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0.0),
               9) AS rrf_score
  FROM br FULL OUTER JOIN vr USING (cid)
  ORDER BY rrf_score DESC, cid LIMIT {_RAG_K}
)
SELECT c.doc_id, c.chunk_index, f.bm25_rank, f.vec_rank, f.rrf_score
FROM fused f JOIN chunks c USING (cid)
"""


@register("rag_hybrid_hashed", _rag_sql())
def q_rag_hybrid_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_hash_int
    from ..operators.similarity import (
        FEATHASH_DIM,
        feature_hash_embed,
        feature_hash_vec_py,
        rrf_fuse,
    )
    from ..operators.text import bm25_topk, doc_chunks

    q = feature_hash_vec_py(_RAG_QUERY)
    qnorm = sum(v * v for v in q) ** 0.5
    chunks = doc_chunks(_t(spark, sf_dir, "documents"), 50, 10).select(
        md5_hash_int(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit("#"),
                F.col("chunk_index").cast("string"),
            ),
            15,
        ).alias("cid"),
        "doc_id",
        "chunk_index",
        "chunk_text",
    )
    emb = chunks.select(
        "cid", feature_hash_embed(F.col("chunk_text")).alias("vec")
    )
    dot = None
    n2 = None
    for i in range(FEATHASH_DIM):
        v = F.element_at("vec", i + 1)
        dterm = v * F.lit(q[i])
        nterm = v * v
        dot = dterm if dot is None else dot + dterm
        n2 = nterm if n2 is None else n2 + nterm
    dense = (
        emb.where(n2 > 0)
        .select(
            "cid",
            F.round(
                dot / (F.sqrt(n2.cast("double")) * F.lit(qnorm)), 6
            ).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col("cid"))
        .limit(_RAG_FETCH_K)
    )
    lex = bm25_topk(
        chunks,
        sorted(set(_RAG_QUERY.split())),
        k=_RAG_FETCH_K,
        text_col="chunk_text",
        id_col="cid",
    )
    fused = rrf_fuse(
        [lex, dense],
        id_col="cid",
        score_cols=["bm25", "cosine_sim"],
        rank_names=["bm25_rank", "vec_rank"],
        k=_RAG_K,
    )
    return fused.join(
        chunks.select("cid", "doc_id", "chunk_index"), "cid"
    ).select("doc_id", "chunk_index", "bm25_rank", "vec_rank", "rrf_score")


# ---------------------------------------------------------------------------
# stream_cms_ingest — streaming COUNT-MIN maintenance through the txn
# table: the ADDITIVE-merge contrast to stream_hll_ingest. CMS
# counters merge by summation, which is NOT idempotent — a replayed
# micro-batch would double-count — so this pipeline is exactly the
# case the txn table's claimed batch ids exist for: foreachBatch
# appends each epoch's sparse counter partial under batch_id=epoch,
# replays are skipped at the commit log, and the query sums partials
# per (j, bucket) before estimating. The oracle replays the one-shot
# CMS over the full events table — a dropped, duplicated, or
# re-delivered epoch breaks the hash. The replay-vs-genuine-
# double-delivery distinction is pinned in
# tests/test_stream_cms_ingest.py.
# ---------------------------------------------------------------------------


@register("stream_cms_ingest", _cms_sql())
def q_stream_cms_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_counters, cms_merge
    from ..sources.txnlog import TxnTable
    from .phases import timed_phase

    ev = _t(spark, sf_dir, "events")
    with timed_phase("stream_cms_ingest.build"):
        base = _make_user_id_drops(spark, sf_dir, "cmsstream")
        table = TxnTable(spark, f"{base}/counters")

        def ingest(batch_df: DataFrame, batch_id: int) -> None:
            table.append(
                cms_counters(batch_df, "user_id"), batch_id=batch_id
            )

        _drain_user_id_drops(spark, base, ingest)

    counters = cms_merge(table.scan().select("j", "bucket", "c"))
    return _cms_probe_report(spark, counters, ev)


# ---------------------------------------------------------------------------
# promo_revenue_ratio — the TPC-H Q14 shape (promotion revenue share
# over a one-month shipdate window), completing the classic trio
# (Q1/Q3/Q5 shapes landed r6 as pricing_summary / shipping_priority /
# local_supplier_volume): lineitem ⋈ broadcast(part) with the date
# filter PUSHED to the fact scan, one conditional-aggregate ratio row.
# Float story: revenue terms are exact products of parquet doubles
# summed per branch; cross-engine summation order differs, so both
# sums round at 1e-4 before the ratio and the ratio re-rounds at 1e-6
# (sums are O(10^5)-scale while the grain is 1e-4 — the established
# tolerance argument for double-sum aggregates in registry.py).
# ---------------------------------------------------------------------------

_Q14_LO, _Q14_HI = "1998-03-01", "1998-04-01"

_Q14_SQL = f"""
SELECT round(100.0 * promo / total, 6) AS promo_revenue_pct,
       promo AS promo_revenue, total AS total_revenue
FROM (
  SELECT round(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END), 4) AS promo,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS total
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO} 00:00:00'
    AND l.l_shipdate < TIMESTAMP '{_Q14_HI} 00:00:00'
)
"""


@register("promo_revenue_ratio", _Q14_SQL)
def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.where(
            (F.col("l_shipdate") >= F.lit(f"{_Q14_LO} 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{_Q14_HI} 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0)
                    )
                ),
                4,
            ).alias("promo"),
            F.round(F.sum(rev), 4).alias("total"),
        )
    )
    return agg.select(
        F.round(100.0 * F.col("promo") / F.col("total"), 6).alias(
            "promo_revenue_pct"
        ),
        F.col("promo").alias("promo_revenue"),
        F.col("total").alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# k_anonymity_customers — privacy-governance audit (Sweeney 2002;
# l-diversity per Machanavajjhala et al. 2007) before releasing a
# user-grain extract: equivalence classes over the quasi-identifiers
# (nation, account-balance thousand-bucket), sensitive attribute =
# market segment. One summary row: classes, sub-k classes, rows at
# risk, realized k, realized l. One groupBy on the quasi tuple + a
# one-row fold — |classes| rows ever shuffle.
# ---------------------------------------------------------------------------

_KANON_K = 5

_KANON_SQL = f"""
SELECT CAST({_KANON_K} AS INT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(sum(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(min(n) AS BIGINT) AS min_class_size,
       CAST(min(l) AS BIGINT) AS min_l
FROM (
  SELECT c_nationkey, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_k,
         count(*) AS n, count(DISTINCT c_mktsegment) AS l
  FROM customer GROUP BY 1, 2
)
"""


@register("k_anonymity_customers", _KANON_SQL)
def q_k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq import k_anonymity_audit

    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_k"),
        "c_mktsegment",
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "bal_k"], "c_mktsegment", k=_KANON_K
    )


# ---------------------------------------------------------------------------
# hll_cardinality_drift — schema/ID-space drift monitoring from
# PERSISTED sketch partials (operationalizing hll_profile_orders'
# "feeds schema-drift monitoring" claim): per-day HLL registers over
# the event user-id space, per-day estimate, day-over-day delta, and
# a drift flag when the estimate moves more than 3x the sketch's own
# std error (1.04/√m) relative to the prior day — the signal that an
# upstream join started duplicating ids or an extractor dropped a
# shard. At 100 TB the serving side reads only the m-row-per-day
# register table; the raw-events exact column here is the audit.
# ---------------------------------------------------------------------------

_CARD_DRIFT_BAND = 3 * 1.04 / 32.0  # 3 sigma at m=1024


def _hll_drift_sql() -> str:
    from ..operators.sketch import hll_estimate_sql, hll_registers_sql

    daily = hll_registers_sql(
        "SELECT CAST(day(ts) AS INT) AS d, user_id FROM events",
        "user_id",
        group_cols="d",
    )
    est = hll_estimate_sql(
        "SELECT d, bucket, rho FROM daily", group_cols="d"
    )
    return f"""
WITH daily AS ({daily}),
est AS ({est}),
exact AS (
  SELECT CAST(day(ts) AS INT) AS d, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
),
lagged AS (
  SELECT d, hll_estimate,
         lag(hll_estimate) OVER (ORDER BY d) AS prev_est
  FROM est
)
SELECT l.d AS day, l.hll_estimate,
       CAST(x.n_exact AS BIGINT) AS n_exact,
       round(coalesce(l.hll_estimate / l.prev_est - 1.0, 0.0), 6)
         AS dod_change,
       coalesce(abs(l.hll_estimate / l.prev_est - 1.0)
                > {_CARD_DRIFT_BAND!r}, FALSE) AS drifted
FROM lagged l JOIN exact x ON l.d = x.d
"""


@register("hll_cardinality_drift", _hll_drift_sql())
def q_hll_cardinality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.sketch import hll_estimate, hll_registers

    ev = _t(spark, sf_dir, "events")
    daily = hll_registers(
        ev.select(F.dayofmonth("ts").cast("int").alias("d"), "user_id"),
        "user_id",
        group_cols=["d"],
    )
    est = hll_estimate(daily, group_cols=["d"]).drop("n_buckets_used")
    w = Window.orderBy("d")
    lagged = est.withColumn("prev_est", F.lag("hll_estimate").over(w))
    exact = ev.groupBy(
        F.dayofmonth("ts").cast("int").alias("d")
    ).agg(F.countDistinct("user_id").alias("n_exact"))
    chg = F.col("hll_estimate") / F.col("prev_est") - 1.0
    return lagged.join(exact, "d").select(
        F.col("d").alias("day"),
        "hll_estimate",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.round(F.coalesce(chg, F.lit(0.0)), 6).alias("dod_change"),
        F.coalesce(
            F.abs(chg) > F.lit(_CARD_DRIFT_BAND), F.lit(False)
        ).alias("drifted"),
    )


# ---------------------------------------------------------------------------
# hist_quantile_events — the QUANTILE synopsis (completing the
# mergeable set: HLL distinct / CMS frequency / KMV sample /
# histogram quantiles): p50/p90/p99 of the event value from a
# 256-bin fixed-range count table, with THREE pins per row — the
# estimate from the one-shot registers, the estimate from per-day
# partials merged by addition (must be identical: sum-merge is
# order-free), and the exact percentile (Spark `percentile` ==
# DuckDB `quantile_cont`, the established parity) with the absolute
# error, which tests assert ≤ one bin width. The fixed range is
# domain knowledge or the txn table's min/max stats — zero extra
# pass.
# ---------------------------------------------------------------------------

_HIST_LO, _HIST_HI = 0.0, 500.0
_HIST_QS = [0.5, 0.9, 0.99]


def _hist_sql() -> str:
    from ..operators.sketch import HIST_BINS, hist_sql

    oneshot = hist_sql(
        "SELECT value FROM events", "value", _HIST_QS, _HIST_LO, _HIST_HI
    )
    # merged-from-daily twin: per-day partials genuinely built and
    # sum-merged INSIDE the oracle (hist_sql partial_group), so the
    # merge path is replayed independently, not re-labeled
    merged = hist_sql(
        "SELECT CAST(day(ts) AS INT) AS d, value FROM events",
        "value",
        _HIST_QS,
        _HIST_LO,
        _HIST_HI,
        partial_group="d",
    )
    qlist = ", ".join(str(q) for q in _HIST_QS)
    return f"""
WITH one AS ({oneshot}),
mrg AS ({merged}),
exact AS (
  SELECT unnest([{qlist}]) AS q,
         unnest(quantile_cont(value, [{qlist}])) AS exact_value
  FROM events
)
SELECT one.q, one.hist_estimate,
       mrg.hist_estimate AS est_from_partials,
       one.hist_estimate = mrg.hist_estimate AS merge_consistent,
       round(exact_value, 6) AS exact_value,
       round(abs(one.hist_estimate - exact_value), 6) AS abs_err
FROM one JOIN mrg USING (q) JOIN exact USING (q)
"""


@register("hist_quantile_events", _hist_sql())
def q_hist_quantile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import (
        hist_merge,
        hist_quantiles,
        hist_registers,
    )

    ev = _t(spark, sf_dir, "events")
    one = hist_quantiles(
        hist_registers(ev, "value", _HIST_LO, _HIST_HI),
        _HIST_QS,
        _HIST_LO,
        _HIST_HI,
    )
    daily = hist_registers(
        ev.select(F.dayofmonth("ts").cast("int").alias("d"), "value"),
        "value",
        _HIST_LO,
        _HIST_HI,
        group_cols=["d"],
    )
    merged = hist_quantiles(
        hist_merge(daily.select("bin", "c")),
        _HIST_QS,
        _HIST_LO,
        _HIST_HI,
    ).withColumnRenamed("hist_estimate", "est_from_partials")
    exact = ev.agg(
        F.expr(
            f"percentile(value, array({','.join(str(q) for q in _HIST_QS)}))"
        ).alias("xs")
    ).select(
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(float(q)) for q in _HIST_QS]).alias("q"),
                F.col("xs").alias("x"),
            )
        ).alias("z")
    ).select(
        F.col("z.q").alias("q"),
        F.round(F.col("z.x"), 6).alias("exact_value"),
    )
    return (
        one.join(merged, "q")
        .join(F.broadcast(exact), "q")
        .select(
            "q",
            "hist_estimate",
            "est_from_partials",
            (F.col("hist_estimate") == F.col("est_from_partials")).alias(
                "merge_consistent"
            ),
            "exact_value",
            F.round(
                F.abs(F.col("hist_estimate") - F.col("exact_value")), 6
            ).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# rag_embed_batch — the model-encoder INTEGRATION POINT verified as a
# differential: documents embedded through the Arrow-batched
# mapInPandas path (operators/similarity.py embed_map_in_pandas — the
# slot a torch/onnx encoder drops into; the heavy libs are absent in
# this environment, so the default encoder is the deterministic
# feature-hash reference), exploded to (doc_id, idx, val) components.
# The oracle computes the SAME embedding entirely in SQL (the
# feature-hash sums), so the hash pins the UDF plumbing — Arrow batch
# shapes, schema, null text handling, python-side tokenization parity
# — against an independent engine. Map-only plan; the explode is for
# hashing fidelity only.
# ---------------------------------------------------------------------------


def _rag_embed_sql() -> str:
    from ..operators.similarity import feature_hash_sums_sql

    sums = feature_hash_sums_sql()
    return f"""
WITH ftok AS (
  SELECT doc_id AS cid,
         unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
emb AS ({sums})
SELECT cid AS doc_id,
       CAST(generate_subscripts(vec, 1) AS INT) AS idx,
       CAST(unnest(vec) AS BIGINT) AS val
FROM emb
"""


@register("rag_embed_batch", _rag_embed_sql())
def q_rag_embed_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embed_map_in_pandas

    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    emb = embed_map_in_pandas(docs)
    return emb.select(
        "doc_id",
        F.posexplode("embedding").alias("idx0", "val"),
    ).select(
        "doc_id",
        (F.col("idx0") + 1).cast("int").alias("idx"),
        F.col("val").cast("bigint").alias("val"),
    )
