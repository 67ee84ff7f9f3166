"""Registry part 3: assessment predicates as distributed aggregates,
CSV source/sink roundtrip, batch scoring through MLlib, multimodal
plumbing, embedding-cosine near-dup, and the watermarked streaming
window — closing the SURVEY §2 rows the first two registry parts left
as library-only functions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.stats import ks_pvalue_sql
from ..operators import dedup, multimodal, quality, score, similarity
from ..operators.drift import (
    assess_data_drift_df,
    assess_prediction_scores_df,
    value_drift,
)
from ..sources.csv_source import read_csv, write_csv
from ..sources import testdata
from ..sources.testdata import load_table
from .registry import (
    _CM_SQL,
    _DRIFT_CUR_SQL,
    _DRIFT_REF_SQL,
    _drift_inputs,
    _ks_sql_block,
    _scored,
    drain_stream,
    register,
)
from .registry_ext import _bucket_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# §2.D — assessment predicates (distributed, no collect)
# ---------------------------------------------------------------------------

_PV = ks_pvalue_sql("ks_stat", "n_ref", "n_cur")

_ASSESS_DRIFT_SQL = (
    f"WITH ref AS ({_DRIFT_REF_SQL}), cur AS ({_DRIFT_CUR_SQL}),"
    + _ks_sql_block("value", "v")
    + ","
    + _ks_sql_block("user_id", "u")
    + f""",
drift AS (
  SELECT 'value' AS col, {_PV} AS p_value FROM stat_v
  UNION ALL
  SELECT 'user_id', {_PV} FROM stat_u
),
agg AS (
  SELECT SUM(CASE WHEN p_value < 0.05 THEN 1 ELSE 0 END) AS n_drifted,
         COUNT(*) AS n_cols,
         coalesce(string_agg(CASE WHEN p_value < 0.05 THEN col END, ','
                             ORDER BY col), '') AS cols
  FROM drift
)
SELECT CAST(n_drifted AS DOUBLE) / n_cols > 0.5 AS dataset_drift,
       CAST(n_drifted AS BIGINT) AS n_drifted,
       cols AS drifted_columns
FROM agg
"""
)


@register("assess_data_drift", _ASSESS_DRIFT_SQL)
def q_assess_data_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_prediction_pipeline.py:395-431 — dataset-drift predicate as a
    # single Catalyst aggregate over per-column KS results (no collect).
    ref, cur = _drift_inputs(spark, sf_dir)
    return assess_data_drift_df(value_drift(ref, cur, ["value", "user_id"]))


@register(
    "assess_prediction_scores",
    _CM_SQL
    + """,
s AS (
  SELECT (tp + tn) / n AS accuracy,
         CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / (tp + fp) END AS prec,
         CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / (tp + fn) END AS rec
  FROM cm
),
s2 AS (
  SELECT accuracy, prec, rec,
         CASE WHEN prec + rec = 0 THEN 0.0
              ELSE 2.0 * prec * rec / (prec + rec) END AS f1
  FROM s
),
long AS (
  SELECT 'accuracy' AS metric_name, accuracy AS value FROM s2
  UNION ALL SELECT 'precision', prec FROM s2
  UNION ALL SELECT 'recall', rec FROM s2
  UNION ALL SELECT 'f1score', f1 FROM s2
)
SELECT metric_name, value FROM long WHERE value < 0.95
""",
)
def q_assess_prediction_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_prediction_pipeline.py:434-485 — scores-below-threshold filter.
    # The reference default is 0.70 (:435,:879); threshold is a caller
    # parameter, set to 0.95 here so the synthetic classifier (precision
    # ~0.944) actually trips the predicate.
    scores = quality.classification_scores(_scored(spark, sf_dir))
    return assess_prediction_scores_df(scores, 0.95)


# ---------------------------------------------------------------------------
# §2.A — CSV sink + scan roundtrip
# ---------------------------------------------------------------------------

_CSV_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
    ]
)


@register("csv_scan", "SELECT event_id, user_id, event_type FROM events")
def q_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # csv_sink (churn_prediction_pipeline.py:250-251) + csv_scan (:142-143)
    # roundtrip: write a headered multi-part CSV, read it back with an
    # EXPLICIT schema (no inference pass — SURVEY §1.3). Integer/string
    # columns only so the text roundtrip is exact by construction.
    out = f"/tmp/spark_graft_csv_scan_{os.path.basename(os.path.normpath(sf_dir))}"
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    write_csv(ev, out)
    return read_csv(spark, out, schema=_CSV_SCHEMA)


# ---------------------------------------------------------------------------
# §2.C — batch scoring through a fitted MLlib model
# ---------------------------------------------------------------------------


@register("batch_score")  # rows-only: model weights are engine-specific
def q_batch_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_prediction_pipeline.py:182-199 — model.predict(X) re-expressed
    # as JVM-side model.transform via score_with_ml_model. Train a tiny
    # LogisticRegression on deterministic labels, score the full table,
    # return the prediction histogram (stable row count: <= 2 rows).
    from pyspark.ml.classification import LogisticRegression

    ev = _t(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("value"),
        (F.col("user_id") % 7).cast("double").alias("u7"),
        (F.col("value") > 50).cast("double").alias("label"),
    )
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=["value", "u7"], outputCol="features"
    ).transform(ev)
    model = LogisticRegression(maxIter=10, regParam=0.01).fit(assembled)
    scored = score.score_with_ml_model(ev, model, ["value", "u7"])
    return scored.groupBy("churn_prediction").agg(
        F.count(F.lit(1)).alias("n")
    )


_PIN_W = {"value": 0.03, "u7": -0.25}
_PIN_B = -1.2
_PIN_MARGIN_SQL = "((-1.2 + 0.03 * value) + -0.25 * (user_id % 7))"


@register(
    "batch_score_pinned",
    f"""
SELECT event_id,
       round(1.0 / (1.0 + exp(-{_PIN_MARGIN_SQL})), 6) AS churn_probability,
       CAST({_PIN_MARGIN_SQL} > 0 AS INT) AS churn_prediction
FROM events
""",
)
def q_batch_score_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    # churn_prediction_pipeline.py:182-199 with the model PINNED to fixed
    # logistic weights: serving a linear model is a column expression, so
    # the oracle reproduces predictions bit-for-bit. The trained-model
    # variant stays as the rows-only `batch_score` entry above.
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").cast("double").alias("value"),
        (F.col("user_id") % 7).cast("double").alias("u7"),
    )
    scored = score.score_with_logistic_weights(ev, _PIN_W, _PIN_B)
    return scored.select("event_id", "churn_probability", "churn_prediction")


# ---------------------------------------------------------------------------
# North-star: embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------

_ND_PLANES = similarity.random_hyperplanes(64, 4, seed=42)
_ND_THRESHOLD = 0.4

_EMB_DOUBLE = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

_NEARDUP_SQL = f"""
WITH bkt AS (
  SELECT vec_id AS id, {_EMB_DOUBLE} AS v,
         {_bucket_sql(_EMB_DOUBLE, _ND_PLANES)} AS bk
  FROM embeddings
)
SELECT x.id AS id_a, y.id AS id_b,
       list_dot_product(x.v, y.v)
         / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
         AS cosine_sim
FROM bkt x JOIN bkt y ON x.bk = y.bk AND x.id < y.id
WHERE list_dot_product(x.v, y.v)
        / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v)))
      >= {_ND_THRESHOLD}
"""


@register("dedup_embedding_cosine", _NEARDUP_SQL)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-flavored near-dup: sign-LSH bucket self-join prunes the
    # candidate space, exact float64 cosine verifies. 4 planes / 0.4
    # threshold sized to the synthetic corpus (max pair cosine ~0.51).
    return dedup.embedding_neardup_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=_ND_THRESHOLD,
        n_planes=4,
        seed=42,
        dim=64,
    )


# ---------------------------------------------------------------------------
# North-star: multimodal columns (binary + typed metadata)
# ---------------------------------------------------------------------------


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize media rows from documents: utf-8 bytes as the opaque
    blob, media_type cycled by id, duration derived from length — the
    container has no codecs (SURVEY north-star: plumbing is real, decode
    is stubbed)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        F.lit("raw").alias("format"),
    )


@register(
    "multimodal_features",
    """
WITH d AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         text
  FROM documents
),
b AS (
  SELECT media_id, ord(substr(text, CAST(i AS INT), 1)) AS byte
  FROM (SELECT media_id, text,
               unnest(generate_series(1, length(text))) AS i
        FROM d WHERE text IS NOT NULL)
),
c AS (SELECT media_id, byte, COUNT(*) AS cnt FROM b GROUP BY media_id, byte),
t AS (SELECT media_id, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY media_id),
e AS (
  SELECT c.media_id, t.n AS n_bytes,
         round(-SUM((CAST(c.cnt AS DOUBLE) / t.n)
                    * log2(CAST(c.cnt AS DOUBLE) / t.n)), 6) AS byte_entropy
  FROM c JOIN t ON c.media_id = t.media_id GROUP BY c.media_id, t.n
)
SELECT d.media_id, d.media_type,
       COALESCE(e.n_bytes, 0) AS n_bytes,
       COALESCE(e.byte_entropy, 0.0) AS byte_entropy,
       CAST(CASE WHEN d.text IS NULL THEN 0 ELSE 8 END AS INT) AS n_features
FROM d LEFT JOIN e ON d.media_id = e.media_id
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched mapInPandas feature extraction over binary blobs —
    # zero shuffle. The blobs here are the documents' UTF-8 bytes, so the
    # oracle recomputes the byte histogram/Shannon entropy in SQL (ord ==
    # byte because the fixture corpus is pure ASCII — asserted cheap: a
    # non-ASCII char would shift octet_length vs length and break the
    # hash loudly, not silently).
    feats = multimodal.extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.round("byte_entropy", 6).alias("byte_entropy"),
        F.size("features").alias("n_features"),
    )


@register(
    "multimodal_frame_sample",
    """
SELECT media_id,
       CAST(unnest(generate_series(0, greatest(
             CAST(floor(n_chars * 10 / 250.0) AS INT) - 1, 0))) AS INT)
         AS frame_idx
FROM (SELECT doc_id AS media_id, n_chars FROM documents WHERE doc_id % 3 = 2)
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Video frame-sampling skeleton: sequence+explode in pure Catalyst
    # (the per-frame DECODE would hang off this via mapInPandas).
    frames = multimodal.sample_frames(_media(spark, sf_dir), every_ms=250)
    return frames.select("media_id", F.col("frame_idx").cast("int").alias("frame_idx"))


# ---------------------------------------------------------------------------
# Streaming: watermarked event-time tumbling window
# ---------------------------------------------------------------------------


@register(
    "stream_windowed_agg",
    "SELECT date_trunc('hour', ts) AS window_start, "
    "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1",
)
def q_stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Structured Streaming event-time tumbling window with a watermark
    # (late-data bound); availableNow drains the file source then stops.
    # Complete output mode so every window is emitted for the oracle.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    stream = testdata.normalize_event_ts(stream)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = "stream_windowed_agg_result"
    q = (
        agg.select(F.col("window.start").alias("window_start"), "n_events")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name)
