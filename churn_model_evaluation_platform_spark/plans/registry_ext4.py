"""Registry part 4: multi-level aggregation (rollup/cube/grouping sets —
engine capabilities per SURVEY §2.G), IVF similarity search, the
stateful-streaming running aggregate, and the file-lifecycle state
machine exercised end to end.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.lifecycle import move_to_folder, read_log
from ..sources.testdata import load_table
from ..streaming.stateful import running_user_stats
from .registry import drain_stream, register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Multi-level aggregation: ROLLUP / CUBE / GROUPING SETS
# ---------------------------------------------------------------------------
# sum(l_quantity) is exact (integer-valued doubles, far below 2^53), so no
# rounding is needed for oracle parity; counts are exact by construction.
# grouping id: leftmost grouping column = most significant bit on both
# engines (Spark grouping_id(), DuckDB GROUPING(a, b)).

_ROLLUP_AGGS = "sum(l_quantity) AS sum_qty, count(*) AS n"


@register(
    "agg_rollup",
    f"""
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
       {_ROLLUP_AGGS}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hierarchical subtotals in ONE shuffle: Spark expands the grouping
    # sets map-side (Expand operator) then runs a single hash aggregate —
    # no per-level re-scan of the fact table.
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "gid", "sum_qty", "n",
        )
    )


@register(
    "agg_cube",
    f"""
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
       {_ROLLUP_AGGS}
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Full cross-dimensional subtotals — same single-shuffle Expand plan.
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("l_linestatus"),
            "gid", "sum_qty", "n",
        )
    )


@register(
    "agg_grouping_sets",
    f"""
SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
       coalesce(l_linestatus, '(all)') AS l_linestatus,
       {_ROLLUP_AGGS}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arbitrary grouping-set list through Spark SQL (same Expand plan).
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '(all)') AS l_returnflag,
               coalesce(l_linestatus, '(all)') AS l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# §2.B — schema-containment validation (file-admission predicate)
# ---------------------------------------------------------------------------


@register(
    "validate_schema_containment",
    "SELECT 'ok_case' AS case_name, TRUE AS ok, '' AS missing "
    "UNION ALL SELECT 'missing_case', FALSE, 'nonexistent_col'",
)
def q_validate_schema_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_prediction_pipeline.py:116-161 — accept iff expected ⊆ file
    # columns, compared in CLEANED name space (messy variants like
    # "Event  Type" must match event_type); extra columns tolerated.
    from ..operators.prep import validate_schema_containment

    ev = _t(spark, sf_dir, "events")
    good = validate_schema_containment(ev, ["Event  Type", "user_id"])
    bad = validate_schema_containment(ev, ["user_id", "nonexistent_col"])
    return spark.createDataFrame(
        [
            ("ok_case", good.ok, ",".join(good.missing_columns)),
            ("missing_case", bad.ok, ",".join(bad.missing_columns)),
        ],
        "case_name string, ok boolean, missing string",
    )


# ---------------------------------------------------------------------------
# Similarity search: IVF (adaptive coarse quantizer + nprobe)
# ---------------------------------------------------------------------------


@register(
    "embedding_mean",
    """
SELECT CAST(pos - 1 AS INT) AS pos, round(avg(CAST(x AS DOUBLE)), 6) AS mean
FROM (SELECT unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings)
GROUP BY 1
""",
)
def q_embedding_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Element-wise corpus mean vector; avg of doubles is order-dependent
    # → rounded on both sides.
    out = similarity.embedding_mean(_t(spark, sf_dir, "embeddings"))
    return out.select("pos", F.round("mean", 6).alias("mean"))


@register("similarity_topk_ivf")  # rows-only: recall pinned vs exact in pytest
def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF ANN: seeded-KMeans cells, probe the 4 of 8 cells nearest the
    # query, exact float64 cosine within. Approximate by design → the
    # exact baseline (similarity_topk) is the recall reference in
    # tests/test_ivf.py; driver check is rows-only.
    emb = _t(spark, sf_dir, "embeddings")
    query_vec = [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    centroids = similarity.fit_ivf_centroids(emb, n_cells=8, seed=42)
    return similarity.cosine_topk_ivf(
        emb,
        query_vec,
        centroids,
        k=10,
        nprobe=4,
        exclude_id=0,
    )


_EMB_DBL = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

_IVF_PINNED_SQL = f"""
WITH cents AS (
  SELECT CAST(vec_id - 1 AS INT) AS cid, {_EMB_DBL} AS cv
  FROM embeddings WHERE vec_id BETWEEN 1 AND 16
),
q AS (SELECT {_EMB_DBL} AS qv FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT cid FROM cents, q
  ORDER BY list_dot_product(qv, qv) - 2 * list_dot_product(qv, cv)
           + list_dot_product(cv, cv), cid
  LIMIT 4
),
e AS (SELECT vec_id, {_EMB_DBL} AS ev FROM embeddings WHERE vec_id <> 0),
assign AS (
  SELECT vec_id, ev FROM (
    SELECT e.vec_id, e.ev, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
                      + list_dot_product(cv, cv), c.cid
           ) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1 AND cid IN (SELECT cid FROM probes)
)
SELECT vec_id,
       list_dot_product(ev, qv)
         / (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv)))
         AS cosine_sim
FROM assign, q
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


@register("similarity_topk_ivf_pinned", _IVF_PINNED_SQL)
def q_similarity_topk_ivf_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash-checkable IVF twin (same pattern as batch_score_pinned):
    # centroids pinned to corpus vectors 1..16 (frozen random-sample
    # init) make assignment + probe pruning + rescoring exact arithmetic
    # the oracle replicates; similarity_topk_ivf keeps the seeded-KMeans
    # quantizer and stays rows-only.
    return similarity.cosine_topk_ivf_pinned(
        _t(spark, sf_dir, "embeddings"), n_cells=16, nprobe=4, k=10
    )


# ---------------------------------------------------------------------------
# Stateful streaming: running per-key aggregate (applyInPandasWithState)
# ---------------------------------------------------------------------------


@register(
    "stream_stateful_running",
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
    "round(sum(value), 4) AS total_value FROM events GROUP BY user_id",
)
def q_stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # applyInPandasWithState over the file stream: the whole source drains
    # in one availableNow trigger, so the final emitted state per user
    # equals the batch GROUP BY — which is exactly what the oracle checks.
    # (Cross-batch accumulation is exercised in tests/test_stateful.py.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    running = running_user_stats(stream.select("user_id", "value"))
    name = "stream_stateful_running_result"
    q = (
        running.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name).select(
        "user_id", "n_events", F.round("total_value", 4).alias("total_value")
    )


@register(
    "grouped_mad_udaf",
    "SELECT event_type, round(mad(value), 6) AS mad "
    "FROM events WHERE value IS NOT NULL GROUP BY event_type",
)
def q_grouped_mad_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pandas grouped-aggregate UDAF (median absolute deviation) vs
    # DuckDB's native mad() — both are median(|x - median(x)|) with
    # linear-interpolated medians.
    from ..operators.eda import mad_by_group

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    out = mad_by_group(ev, "value", "event_type")
    return out.select("event_type", F.round("mad", 6).alias("mad"))


# ---------------------------------------------------------------------------
# Deterministic exact stratified sampling
# ---------------------------------------------------------------------------


def _install_sample_oracle() -> None:
    from ..functions.hashing import md5_hash_int_sql
    from .registry import _ORACLES

    h = md5_hash_int_sql("CAST(event_id AS VARCHAR)")
    _ORACLES["stratified_sample"] = f"""
WITH ranked AS (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY {h}, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_id, event_type FROM ranked WHERE rn <= ceil(n * 0.1)
"""


_install_sample_oracle()


@register("stratified_sample")  # oracle installed above
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 10% exact per-stratum sample by portable hash order — identical
    # row set on both engines (sampleBy's RNG would be neither).
    from ..operators.prep import stratified_sample_exact

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type")
    return stratified_sample_exact(ev, "event_type", 0.1, "event_id")


# ---------------------------------------------------------------------------
# Capstone: the ENTIRE monitoring-run metrics set, oracle-checked
# ---------------------------------------------------------------------------

_VIEW_CM_SQL = """
WITH scored AS (
  SELECT CAST(value > 50 AS INT) AS churn,
         CAST(value + (user_id % 7) > 50 AS INT) AS churn_prediction
  FROM events WHERE event_type = 'view'
),
cm AS (
  SELECT
    CAST(SUM(CASE WHEN churn = 1 AND churn_prediction = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS tp,
    CAST(SUM(CASE WHEN churn <> 1 AND churn_prediction = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS fp,
    CAST(SUM(CASE WHEN churn = 1 AND churn_prediction <> 1 THEN 1 ELSE 0 END) AS DOUBLE) AS fn,
    CAST(SUM(CASE WHEN churn <> 1 AND churn_prediction <> 1 THEN 1 ELSE 0 END) AS DOUBLE) AS tn,
    CAST(COUNT(*) AS DOUBLE) AS n
  FROM scored
)
"""


def _install_monitoring_full_oracle() -> None:
    from ..functions.stats import ks_pvalue_sql
    from .registry import _DRIFT_CUR_SQL, _DRIFT_REF_SQL, _ORACLES, _ks_sql_block

    pv = ks_pvalue_sql("ks_stat", "n_ref", "n_cur")
    _ORACLES["monitoring_metrics_full"] = (
        _VIEW_CM_SQL
        + f""",
ref AS ({_DRIFT_REF_SQL}), cur AS ({_DRIFT_CUR_SQL}),
{_ks_sql_block('value', 'v')},
{_ks_sql_block('user_id', 'u')},
pvals AS (
  SELECT 'valuedrift_value' AS metric_name, {pv} AS value FROM stat_v
  UNION ALL SELECT 'valuedrift_user_id', {pv} FROM stat_u
),
dcc AS (
  SELECT SUM(CASE WHEN value < 0.05 THEN 1.0 ELSE 0.0 END) AS cnt,
         CAST(COUNT(*) AS DOUBLE) AS ncols
  FROM pvals
),
s AS (
  SELECT (tp + tn) / n AS accuracy,
         CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS p1,
         CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS r1,
         CASE WHEN tn + fn = 0 THEN 0.0 ELSE tn / (tn + fn) END AS p0,
         CASE WHEN tn + fp = 0 THEN 0.0 ELSE tn / (tn + fp) END AS r0
  FROM cm
),
s2 AS (
  SELECT accuracy, p1, r1, p0, r0,
         CASE WHEN p1 + r1 = 0 THEN 0.0 ELSE 2.0 * p1 * r1 / (p1 + r1) END AS f1_1,
         CASE WHEN p0 + r0 = 0 THEN 0.0 ELSE 2.0 * p0 * r0 / (p0 + r0) END AS f1_0
  FROM s
),
longm AS (
  SELECT 'accuracy' AS metric_name, accuracy AS value FROM s2
  UNION ALL SELECT 'precision', p1 FROM s2
  UNION ALL SELECT 'recall', r1 FROM s2
  UNION ALL SELECT 'f1score', f1_1 FROM s2
  UNION ALL SELECT 'precisionbylabel_1', p1 FROM s2
  UNION ALL SELECT 'recallbylabel_1', r1 FROM s2
  UNION ALL SELECT 'f1bylabel_1', f1_1 FROM s2
  UNION ALL SELECT 'precisionbylabel_0', p0 FROM s2
  UNION ALL SELECT 'recallbylabel_0', r0 FROM s2
  UNION ALL SELECT 'f1bylabel_0', f1_0 FROM s2
  UNION ALL SELECT metric_name, value FROM pvals
  UNION ALL SELECT 'driftedcolumnscount[count]', cnt FROM dcc
  UNION ALL SELECT 'driftedcolumnscount[share]', cnt / ncols FROM dcc
)
SELECT metric_name, round(value, 6) AS value FROM longm
"""
    )


_install_monitoring_full_oracle()


@register("monitoring_metrics_full")  # oracle installed above
def q_monitoring_metrics_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The flagship pipeline's COMPLETE output (14 metric rows: 4 scores,
    # 6 per-label, 2 per-column KS p-values, drifted count+share) —
    # monitoring_run end-to-end vs one assembled DuckDB oracle. This is
    # the whole-engine differential check, not an operator-level one.
    from ..plans.pipeline import monitoring_run
    from .registry import _drift_inputs

    ev = _t(spark, sf_dir, "events")
    ref, _ = _drift_inputs(spark, sf_dir)
    current = ev.where(F.col("event_type") == "view").select(
        (F.col("value") * 1.25).alias("value"),
        F.col("user_id").cast("double").alias("user_id"),
        (F.col("value") > 50).cast("int").alias("churn"),
        ((F.col("value") + F.col("user_id") % 7) > 50)
        .cast("int")
        .alias("churn_prediction"),
    )
    res = monitoring_run(
        current, ref, ["value", "user_id"], alert_sink=lambda s, m: None
    )
    return res.metrics.select(
        "metric_name", F.round("value", 6).alias("value")
    )


# ---------------------------------------------------------------------------
# Text: quality-gate admission + corpus n-gram stats
# ---------------------------------------------------------------------------


def _install_repetition_oracle() -> None:
    from .registry import _ORACLES
    from .registry_ext import _TOKENS_SQL

    def dup(arr: str) -> str:
        return (
            f"round(CASE WHEN len({arr}) > 0 THEN "
            f"1.0 - CAST(len(list_distinct({arr})) AS DOUBLE) / len({arr}) "
            f"ELSE 0.0 END, 6)"
        )

    _ORACLES["repetition_stats"] = f"""
SELECT doc_id,
       {dup("string_split(text, chr(10))")} AS line_dup_ratio,
       {dup(_TOKENS_SQL)} AS token_dup_ratio
FROM documents WHERE text IS NOT NULL
"""


_install_repetition_oracle()


@register("repetition_stats")  # oracle installed above
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def _install_rolling_oracle() -> None:
    from ..operators.text import ROLLING_BASE, ROLLING_MOD
    from .registry import _ORACLES
    from .registry_ext import _NORM_SQL

    _ORACLES["doc_fingerprint_rolling"] = f"""
SELECT doc_id,
       list_reduce(
         list_transform(string_split({_NORM_SQL}, ''), c -> CAST(ascii(c) AS BIGINT)),
         (acc, x) -> (acc * {ROLLING_BASE} + x) % {ROLLING_MOD}
       ) AS rolling_hash
FROM documents WHERE text IS NOT NULL
"""


_install_rolling_oracle()


@register("doc_fingerprint_rolling")  # oracle installed above
def q_doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import doc_fingerprint_rolling

    return doc_fingerprint_rolling(_t(spark, sf_dir, "documents"))


@register(
    "token_count_bpe",
    """
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))
            AS INT) AS n_bpe_tokens
FROM documents
""",
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_count_bpe

    out = token_count_bpe(_t(spark, sf_dir, "documents"))
    return out.select("doc_id", F.col("n_bpe_tokens").cast("int").alias("n_bpe_tokens"))


@register(
    "quality_filter",
    # Same exact-count arithmetic as the text_quality oracle, thresholded
    # on the ROUNDED ratios (quality_filter consumes text_quality output).
    "",  # assembled below — needs registry_ext fragments
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import quality_filter

    return quality_filter(_t(spark, sf_dir, "documents")).select(
        "doc_id", "reject_reason", "keep"
    )


@register(
    "top_ngrams",
    "",  # assembled below
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus top-20 bigrams by document frequency; deterministic
    # (freq desc, ngram asc) tie-break on both engines.
    from ..operators.text import top_ngrams

    return top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=20)


def _install_text_oracles() -> None:
    from ..functions.hashing import HEX_CHARS  # noqa: F401  (parity note)
    from .registry import _ORACLES
    from .registry_ext import _EN_STOP, _NORM_SQL, _TOKENS_SQL, _shingles_sql

    _ORACLES["quality_filter"] = f"""
WITH base AS (
  SELECT doc_id, {_NORM_SQL} AS norm, {_TOKENS_SQL} AS tk FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(tk) AS DOUBLE) AS nt,
         round(CAST(len(list_filter(tk, t -> t IN ({_EN_STOP}))) AS DOUBLE)
               / CAST(len(tk) AS DOUBLE), 6) AS stop_r,
         round(CAST(length(regexp_replace(norm, '[^a-z]', '', 'g')) AS DOUBLE)
               / CAST(length(norm) AS DOUBLE), 6) AS alpha_r,
         round((CAST(length(norm) AS DOUBLE) - (len(tk) - 1)) / len(tk), 6)
           AS mtl
  FROM base
),
r AS (
  SELECT doc_id,
         CASE WHEN nt < 5 THEN 'too_few_tokens'
              WHEN stop_r < 0.05 THEN 'low_stopword_ratio'
              WHEN alpha_r < 0.6 THEN 'low_alpha_ratio'
              WHEN mtl > 12.0 THEN 'long_tokens'
              ELSE '' END AS reject_reason
  FROM c
)
SELECT doc_id, reject_reason, reject_reason = '' AS keep FROM r
"""
    _ORACLES["top_ngrams"] = f"""
WITH tok AS (SELECT doc_id, {_TOKENS_SQL} AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest({_shingles_sql(2)}) AS g FROM tok)
)
SELECT g AS ngram, count(*) AS doc_freq
FROM grams GROUP BY g
ORDER BY doc_freq DESC, ngram ASC
LIMIT 20
"""


_install_text_oracles()


# ---------------------------------------------------------------------------
# Binned drift family: PSI, Jensen–Shannon, chi-squared (SURVEY §7.4:
# "keep the drift method pluggable")
# ---------------------------------------------------------------------------

# Shared DuckDB CTE: same pooled→binned→totals arithmetic as
# drift._binned_counts over the events drift inputs (ref = clicks,
# cur = non-clicks, value column, bin width 10).
_BINNED_CTE = """
WITH pooled AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_ref,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS is_cur
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT CAST(FLOOR(v / 10.0) AS BIGINT) AS bin,
         SUM(is_ref) AS n_ref, SUM(is_cur) AS n_cur
  FROM pooled GROUP BY 1
),
tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM counts),
j AS (SELECT * FROM counts, tot)
"""


def _drift_binned_inputs(spark: SparkSession, sf_dir: str):
    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("event_type") == "click").select("value")
    cur = ev.where(F.col("event_type") != "click").select("value")
    return ref, cur


@register(
    "value_drift_wasserstein",
    """
WITH pooled AS (
  SELECT value AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ir,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS ic
  FROM events WHERE value IS NOT NULL
),
agg AS (SELECT v, SUM(ir) AS r, SUM(ic) AS c FROM pooled GROUP BY v),
t AS (SELECT SUM(r) AS tr, SUM(c) AS tc FROM agg),
cum AS (
  SELECT v,
         SUM(r) OVER (ORDER BY v) AS cr,
         SUM(c) OVER (ORDER BY v) AS cc,
         lead(v) OVER (ORDER BY v) AS vn
  FROM agg
)
SELECT round(SUM(abs(CAST(cr AS DOUBLE) / tr - CAST(cc AS DOUBLE) / tc)
                 * (vn - v)), 6) AS wasserstein
FROM cum, t WHERE vn IS NOT NULL
""",
)
def q_value_drift_wasserstein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import wasserstein

    ref, cur = _drift_binned_inputs(spark, sf_dir)
    return wasserstein(ref, cur, "value").select(
        F.round("wasserstein", 6).alias("wasserstein")
    )


@register(
    "value_drift_psi",
    _BINNED_CTE
    + """
SELECT round(SUM(
  (greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6)
   - greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6))
  * ln(greatest(CAST(n_cur AS DOUBLE) / t_cur, 1e-6)
       / greatest(CAST(n_ref AS DOUBLE) / t_ref, 1e-6))
), 6) AS psi FROM j
""",
)
def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import psi

    ref, cur = _drift_binned_inputs(spark, sf_dir)
    return psi(ref, cur, "value", 10.0).select(F.round("psi", 6).alias("psi"))


@register(
    "value_drift_js",
    _BINNED_CTE
    + """
SELECT round(
  0.5 * SUM(CASE WHEN n_ref > 0 THEN (CAST(n_ref AS DOUBLE) / t_ref)
    * ln((CAST(n_ref AS DOUBLE) / t_ref)
         / ((CAST(n_ref AS DOUBLE) / t_ref + CAST(n_cur AS DOUBLE) / t_cur) / 2.0))
    ELSE 0.0 END)
  + 0.5 * SUM(CASE WHEN n_cur > 0 THEN (CAST(n_cur AS DOUBLE) / t_cur)
    * ln((CAST(n_cur AS DOUBLE) / t_cur)
         / ((CAST(n_ref AS DOUBLE) / t_ref + CAST(n_cur AS DOUBLE) / t_cur) / 2.0))
    ELSE 0.0 END), 6) AS js FROM j
""",
)
def q_value_drift_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.drift import js_divergence

    ref, cur = _drift_binned_inputs(spark, sf_dir)
    return js_divergence(ref, cur, "value", 10.0).select(
        F.round("js", 6).alias("js")
    )


@register(
    "value_drift_chi2",
    _BINNED_CTE
    + """
, stat AS (
  SELECT SUM(CASE WHEN n_ref + n_cur > 0 THEN
      power(n_ref - (n_ref + n_cur) * CAST(t_ref AS DOUBLE) / (t_ref + t_cur), 2)
        / ((n_ref + n_cur) * CAST(t_ref AS DOUBLE) / (t_ref + t_cur))
      + power(n_cur - (n_ref + n_cur) * CAST(t_cur AS DOUBLE) / (t_ref + t_cur), 2)
        / ((n_ref + n_cur) * CAST(t_cur AS DOUBLE) / (t_ref + t_cur))
      ELSE 0.0 END) AS chi2,
    CAST(COUNT(*) - 1 AS DOUBLE) AS dof
  FROM j
)
SELECT round(chi2, 4) AS chi2, CAST(dof AS BIGINT) AS dof FROM stat
""",
)
def q_value_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Statistic + dof oracle-checked exactly; the Wilson–Hilferty
    # p_approx column is dropped here (closed-form approx, pinned in
    # tests/test_drift_family.py instead).
    from ..operators.drift import chi2_drift

    ref, cur = _drift_binned_inputs(spark, sf_dir)
    return chi2_drift(ref, cur, "value", 10.0).select(
        F.round("chi2", 4).alias("chi2"), "dof"
    )


# ---------------------------------------------------------------------------
# As-of join: latest right row at-or-before each left timestamp
# ---------------------------------------------------------------------------


@register(
    "asof_join",
    """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type <> 'click'),
r AS (SELECT user_id, ts, max(value) AS click_value FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT l.event_id, r.ts AS asof_ts, r.click_value
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Each non-click event picks up the user's most recent click at or
    # before it — the union+window as-of join (operators/relational.py)
    # verified against DuckDB's native ASOF JOIN.
    from ..operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") != "click").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join(left, right, ["user_id"], right_cols=["click_value"])
    return out.select("event_id", "asof_ts", "click_value")


@register(
    "sessionize",
    """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS p FROM events),
f AS (
  SELECT event_id, user_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY user_id ORDER BY p)
                   >= 3600000000 THEN 1 ELSE 0 END AS nf
  FROM e
)
SELECT event_id,
       CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY p
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
            AS BIGINT) AS session_id
FROM f
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Gap-based sessions (1-hour inactivity): tie rows always land in the
    # same session, so the result is deterministic without a tiebreaker.
    from ..operators.relational import sessionize

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p")
    )
    out = sessionize(ev, ["user_id"], "p", gap=3_600_000_000)
    return out.select("event_id", "session_id")


@register(
    "interval_join",
    """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS p FROM events
           WHERE event_type <> 'click'),
r AS (SELECT user_id, epoch_us(ts) AS ws,
             epoch_us(ts) + 300000000 AS we
      FROM events WHERE event_type = 'click'),
ru AS (SELECT DISTINCT user_id, ws, we FROM r)
SELECT l.event_id, CAST(ru.ws AS BIGINT) AS window_start
FROM l JOIN ru ON l.user_id = ru.user_id AND l.p >= ru.ws AND l.p < ru.we
""",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range join: every non-click event inside a 5-minute window opened
    # by each click of the same user. Bucketed equi-join composition
    # (operators/relational.py) vs DuckDB's plain range join.
    from ..operators.relational import interval_join

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") != "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("p")
    )
    right = (
        ev.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.unix_micros("ts").alias("ws"),
            (F.unix_micros("ts") + 300_000_000).alias("we"),
        )
        .distinct()
    )
    out = interval_join(
        left, right, ["user_id"], "p", "ws", "we", bucket_width=300_000_000
    )
    return out.select("event_id", F.col("ws").alias("window_start"))


# ---------------------------------------------------------------------------
# Relational capabilities: semi/anti joins, pivot (wide reshaping)
# ---------------------------------------------------------------------------


@register(
    "join_semi_anti",
    """
WITH buyers AS (SELECT DISTINCT o_custkey FROM orders
                WHERE o_totalprice > 200000)
SELECT 'big_spenders' AS segment, CAST(count(*) AS BIGINT) AS n
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM buyers)
UNION ALL
SELECT 'no_big_orders', CAST(count(*) AS BIGINT)
FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM buyers)
""",
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # LEFT SEMI / LEFT ANTI joins — existence predicates without row
    # multiplication (the build side streams only keys; broadcast when
    # small). Both legs share the same buyers subplan.
    cust = _t(spark, sf_dir, "customer")
    buyers = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select("o_custkey")
    )
    semi = cust.join(
        buyers, cust.c_custkey == buyers.o_custkey, "left_semi"
    ).agg(F.lit("big_spenders").alias("segment"), F.count(F.lit(1)).alias("n"))
    anti = cust.join(
        buyers, cust.c_custkey == buyers.o_custkey, "left_anti"
    ).agg(F.lit("no_big_orders").alias("segment"), F.count(F.lit(1)).alias("n"))
    return semi.unionAll(anti)


@register(
    "metrics_pivot",
    # Portable CASE-aggregation form of PIVOT (identical result set).
    """
SELECT l_returnflag,
       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS qty_F,
       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) AS qty_O
FROM lineitem GROUP BY l_returnflag
""",
)
def q_metrics_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Long→wide reshaping (the inverse of metrics_unpivot): groupBy().
    # pivot() with EXPLICIT pivot values — without them Spark needs an
    # extra distinct-values job before planning; sum(l_quantity) is exact
    # (integer-valued doubles), so no rounding needed.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum("l_quantity"))
        .select(
            "l_returnflag",
            F.coalesce("F", F.lit(0.0)).alias("qty_F"),
            F.coalesce("O", F.lit(0.0)).alias("qty_O"),
        )
    )


# ---------------------------------------------------------------------------
# Sketch aggregates: HLL approximate distinct (exact-verified bounds)
# ---------------------------------------------------------------------------


@register(
    "approx_distinct_users",
    # Oracle checks the EXACT count plus the sketch's documented error
    # envelope: the approx value itself is engine-specific, so both sides
    # emit exact_users and a flag that approx is within 5% — DuckDB
    # computes the same flag trivially true for its own exact count.
    "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users, "
    "TRUE AS approx_within_5pct FROM events",
)
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HyperLogLog++ distinct-count sketch (approx_count_distinct, rsd=2%)
    # vs the exact count in one aggregation: at 100 TB the sketch is the
    # only option that doesn't shuffle every distinct key — this query
    # pins it inside the +/-5% envelope against the exact answer.
    ev = _t(spark, sf_dir, "events")
    agg = ev.agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )
    return agg.select(
        F.col("exact_users").cast("bigint").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("approx_within_5pct"),
    )


# ---------------------------------------------------------------------------
# File lifecycle: input → processing → processed with audit log
# ---------------------------------------------------------------------------


@register(
    "file_lifecycle",
    "SELECT 'drop.csv' AS file_name, 'moved to processing' AS message "
    "UNION ALL SELECT 'drop.csv', 'moved to processed'",
)
def q_file_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's move_to_folder state machine
    # (churn_prediction_pipeline.py:642-680) run for real on the Hadoop
    # FileSystem API: the file physically transits input → processing →
    # processed and the per-file audit log records each hop; the returned
    # rows ARE the audit log, checked verbatim by the oracle.
    sf = os.path.basename(os.path.normpath(sf_dir))
    base = f"/tmp/spark_graft_lifecycle_{sf}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(f"{base}/input")
    with open(f"{base}/input/drop.csv", "w") as f:
        f.write("a,b\n1,2\n")
    log_dir = f"{base}/logs"
    move_to_folder(
        spark, f"{base}/input/drop.csv", f"{base}/processing",
        "moved to processing", log_dir,
    )
    move_to_folder(
        spark, f"{base}/processing/drop.csv", f"{base}/processed",
        "moved to processed", log_dir,
    )
    if not os.path.exists(f"{base}/processed/drop.csv"):
        raise IOError("lifecycle did not land the file in processed/")
    lines = read_log(spark, f"{log_dir}/drop.csv.log")
    return spark.createDataFrame(
        [("drop.csv", ln) for ln in lines], "file_name string, message string"
    )
