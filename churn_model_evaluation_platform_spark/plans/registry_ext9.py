"""Round-6 batch 5: incremental (batch-vs-corpus) dedup gating, more
eval depth (ECE calibration summary, MAP/MRR ranking metrics), the
temperature-sampling mixture weights a multilingual data pipeline
derives from the mix report, and the explicit two-stage distinct-count
rewrite.

Same conventions as registry.py; double literals in e-notation where
the oracle must stay DOUBLE (DuckDB parses bare decimals as DECIMAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import drain_stream, register

# Import the extension chain in registration order so standalone imports
# (tests) see the same composed-oracle state as __spark_entry__.
from . import registry_ext as _ext  # noqa: F401
from . import registry_ext3 as _ext3  # noqa: F401
from . import registry_ext4 as _ext4  # noqa: F401
from . import registry_ext5 as _ext5  # noqa: F401
from . import registry_ext6 as _ext6  # noqa: F401
from .registry_ext import (
    _BAND_KEYS_SQL,
    _BAND_MATCH_SQL,
    _MINHASH_SELECT,
    _NORM_SQL,
    _SHINGLE_HASH_CTE,
    _TOKENS_SQL,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# dedup_incremental — gate an incoming batch (doc_id % 4 == 0) against
# the kept corpus (the rest): exact-digest probe, then banded-LSH
# candidates vs the corpus verified by exact Jaccard. The shape real
# ingestion dedup runs — never corpus × corpus.
# ---------------------------------------------------------------------------

_INCR_SQL = f"""
{_SHINGLE_HASH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
sigs AS ({_MINHASH_SELECT}),
banded AS (SELECT sigs.*, {_BAND_KEYS_SQL} FROM sigs),
dig AS (SELECT doc_id, md5({_NORM_SQL}) AS content_md5 FROM documents),
exact AS (
  SELECT DISTINCT d.doc_id
  FROM dig d JOIN dig c ON c.content_md5 = d.content_md5
  WHERE d.doc_id % 4 = 0 AND c.doc_id % 4 <> 0
),
cand AS (
  SELECT a.doc_id AS id, b.doc_id AS cid
  FROM banded a JOIN banded b
    ON a.doc_id % 4 = 0 AND b.doc_id % 4 <> 0 AND ({_BAND_MATCH_SQL})
),
common AS (
  SELECT c.id, c.cid, count(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id
  JOIN sh b ON b.doc_id = c.cid AND b.h = a.h
  GROUP BY c.id, c.cid
),
near AS (
  SELECT DISTINCT cm.id AS doc_id
  FROM common cm
  JOIN sizes sa ON sa.doc_id = cm.id
  JOIN sizes sb ON sb.doc_id = cm.cid
  WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE)
        >= 0.1
)
SELECT i.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status
FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) i
LEFT JOIN exact e ON e.doc_id = i.doc_id
LEFT JOIN near nr ON nr.doc_id = i.doc_id
"""


@register("dedup_incremental", _INCR_SQL)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    # operators/dedup.py:incremental_dedup — digest semi-join + banded
    # incoming-vs-corpus bucket join + array_intersect verify.
    from ..operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 0)
    incoming = docs.where(F.col("doc_id") % 4 == 0)
    return incremental_dedup(corpus, incoming, n=3, threshold=0.1)


# ---------------------------------------------------------------------------
# calibration_ece — expected calibration error over 10 equal-width
# probability bins: the single-number companion to calibration_curve.
# ---------------------------------------------------------------------------


def _ece_sql() -> str:
    from .registry_ext5 import _PROBA_SQL

    return f"""
WITH scored AS ({_PROBA_SQL}),
b AS (
  SELECT CAST(least(floor(proba * 10), 9) AS INT) AS bin, churn, proba
  FROM scored
),
g AS (
  SELECT bin, count(*) AS n,
         round(avg(proba), 6) AS conf,
         round(avg(CAST(churn AS DOUBLE)), 6) AS acc
  FROM b GROUP BY bin
)
SELECT round(sum(n * abs(conf - acc)) / sum(n), 6) AS ece,
       CAST(count(*) AS BIGINT) AS n_bins
FROM g
"""


@register("calibration_ece", _ece_sql())
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two partial-aggregable groupBys (bin stats → one summary row);
    # per-bin conf/acc rounded before the weighted sum so order-
    # dependent averaging can't leak through the abs().
    from .registry_ext5 import _proba_scored

    s = _proba_scored(spark, sf_dir)
    b = s.select(
        F.least(F.floor(F.col("proba") * 10), F.lit(9))
        .cast("int")
        .alias("bin"),
        "churn",
        "proba",
    )
    g = b.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(F.avg("proba"), 6).alias("conf"),
        F.round(F.avg(F.col("churn").cast("double")), 6).alias("acc"),
    )
    return g.agg(
        F.round(
            F.sum(F.col("n") * F.abs(F.col("conf") - F.col("acc")))
            / F.sum("n"),
            6,
        ).alias("ece"),
        F.count("*").cast("bigint").alias("n_bins"),
    )


# ---------------------------------------------------------------------------
# ranking_map_mrr — AP@10 and reciprocal rank per user on the same
# deterministic ranking as ranking_ndcg. Cumulative-precision form for
# AP; both engines rank by (proba DESC, event_id).
# ---------------------------------------------------------------------------


def _map_mrr_sql() -> str:
    from .registry_ext6 import _NDCG_SCORED_SQL

    return f"""
WITH scored AS ({_NDCG_SCORED_SQL}),
ranked AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY proba DESC, event_id) AS rk
  FROM scored
),
pr AS (
  SELECT user_id, rk, rel,
         sum(rel) OVER (PARTITION BY user_id ORDER BY rk) AS cum_rel
  FROM ranked
),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN rk <= 10 AND rel = 1
                  THEN CAST(cum_rel AS DOUBLE) / rk ELSE 0 END) AS ap_num,
         sum(rel) AS n_pos,
         min(CASE WHEN rel = 1 AND rk <= 10 THEN rk END) AS first_rel
  FROM pr GROUP BY user_id
)
SELECT user_id,
       round(ap_num / least(n_pos, 10), 6) AS ap_at_10,
       round(CASE WHEN first_rel IS NULL THEN 0e0
                  ELSE 1e0 / first_rel END, 6) AS rr_at_10
FROM per_user WHERE n_pos > 0
"""


@register("ranking_map_mrr", _map_mrr_sql())
def q_ranking_map_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both window passes (rank + cumulative precision) share the one
    # user_id shuffle; the rest is a grouped aggregate.
    from ..functions.hashing import md5_hash_int

    ev = _t(spark, sf_dir, "events")
    scored = ev.select(
        "user_id",
        "event_id",
        (F.col("value") > 50).cast("int").alias("rel"),
        F.least(
            F.greatest(
                (
                    F.col("value")
                    + md5_hash_int(F.col("event_id").cast("string")) % 41
                    - F.lit(65.0)
                )
                / 20.0,
                F.lit(0.0),
            ),
            F.lit(1.0),
        ).alias("proba"),
    )
    w_rank = Window.partitionBy("user_id").orderBy(
        F.col("proba").desc(), "event_id"
    )
    ranked = scored.select(
        "user_id", "rel", F.row_number().over(w_rank).alias("rk")
    )
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pr = ranked.select(
        "user_id", "rk", "rel", F.sum("rel").over(w_cum).alias("cum_rel")
    )
    per_user = pr.groupBy("user_id").agg(
        F.sum(
            F.when(
                (F.col("rk") <= 10) & (F.col("rel") == 1),
                F.col("cum_rel").cast("double") / F.col("rk"),
            ).otherwise(F.lit(0.0))
        ).alias("ap_num"),
        F.sum("rel").alias("n_pos"),
        F.min(
            F.when((F.col("rel") == 1) & (F.col("rk") <= 10), F.col("rk"))
        ).alias("first_rel"),
    )
    return per_user.where(F.col("n_pos") > 0).select(
        "user_id",
        F.round(F.col("ap_num") / F.least(F.col("n_pos"), F.lit(10)), 6).alias(
            "ap_at_10"
        ),
        F.round(
            F.when(F.col("first_rel").isNull(), F.lit(0.0)).otherwise(
                F.lit(1.0) / F.col("first_rel")
            ),
            6,
        ).alias("rr_at_10"),
    )


# ---------------------------------------------------------------------------
# mixture_weights — UNIMAX/temperature sampling weights per language:
# w_i ∝ tokens_i^alpha (alpha = 0.3), next to the natural share so the
# up/down-sampling factor is visible. The actionable output of
# corpus_mix_report.
# ---------------------------------------------------------------------------

_MIXW_SQL = f"""
WITH t AS (SELECT lang, len({_TOKENS_SQL}) AS n FROM documents),
g AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_tokens FROM t GROUP BY lang),
w AS (
  SELECT lang, n_tokens,
         round(pow(CAST(n_tokens AS DOUBLE), 3e-1), 6) AS pw
  FROM g
)
SELECT lang, n_tokens,
       round(pw / sum(pw) OVER (), 6) AS weight,
       round(CAST(n_tokens AS DOUBLE)
             / sum(CAST(n_tokens AS DOUBLE)) OVER (), 6) AS natural_share
FROM w
"""


@register("mixture_weights", _MIXW_SQL)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The unpartitioned windows run over the POST-AGGREGATE frame
    # (one row per language) — fine at any corpus size. pow() is
    # libm-dependent → rounded before the ratio on both engines.
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    g = (
        docs.select("lang", F.size(tokens(F.col("text"))).alias("n"))
        .groupBy("lang")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
    )
    w_all = Window.partitionBy()
    w = g.select(
        "lang",
        "n_tokens",
        F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(0.3)), 6).alias(
            "pw"
        ),
    )
    return w.select(
        "lang",
        "n_tokens",
        F.round(F.col("pw") / F.sum("pw").over(w_all), 6).alias("weight"),
        F.round(
            F.col("n_tokens").cast("double")
            / F.sum(F.col("n_tokens").cast("double")).over(w_all),
            6,
        ).alias("natural_share"),
    )


# ---------------------------------------------------------------------------
# distinct_count_twostage — exact distinct users per event type via the
# explicit two-stage rewrite (dedup on the FULL (key, value) pair, then
# count per key): the shuffle spreads hot keys across value hashes, so
# no reducer ever sees one key's whole value set — the manual form of
# what planners do for COUNT(DISTINCT) when the naive per-key
# collect-set would OOM on a hot key.
# ---------------------------------------------------------------------------

_DISTINCT2_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


@register("distinct_count_twostage", _DISTINCT2_SQL)
def q_distinct_count_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# TPC-H-classic trio — the canonical warehouse plans (Q1/Q3/Q5 shapes on
# this schema's date range): a wide pricing rollup, a 3-way join top-k,
# and a 5-way join with a co-location predicate. These pin the
# multi-join aggregate plans Catalyst must get right at 100 TB
# (broadcast dims, partial aggs, one shuffle per wide op).
# ---------------------------------------------------------------------------

_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _PRICING_SQL)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1 shape: one scan → partial-aggregated groupBy over a
    # 6-group key. The shipdate filter reaches the parquet scan
    # (PushedFilters), every aggregate folds map-side.
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(F.sum(disc), 2).alias("sum_disc"),
        F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("n"),
    )


_SHIPPING_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("shipping_priority", _SHIPPING_SQL)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: segment-filtered customers broadcast into orders,
    # date filters pushed to both scans, top-10 via TakeOrdered on the
    # ROUNDED revenue + orderkey (deterministic under float noise).
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = (
        F.broadcast(cust.select("c_custkey"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_LOCAL_VOLUME_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("local_supplier_volume", _LOCAL_VOLUME_SQL)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: the co-location predicate (supplier nation ==
    # customer nation) rides ON the supplier join; nation + supplier
    # broadcast, so the only shuffles are orders⋈lineitem and the final
    # 25-group aggregate.
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(sup),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(
            F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey")
        )
    )
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# orc_scan — ORC write → read roundtrip (Spark's second columnar
# format): aggregate read-back values must equal the parquet original.
# Completes the source-format matrix (csv, jsonl, parquet, orc).
# ---------------------------------------------------------------------------

_ORC_SQL = """
SELECT c_mktsegment, count(*) AS n,
       round(sum(c_acctbal), 2) AS sum_bal
FROM customer GROUP BY c_mktsegment
"""


@register("orc_scan", _ORC_SQL)
def q_orc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB reads no ORC, so the oracle aggregates the SOURCE parquet —
    # the roundtrip is the thing under test: any write/read corruption
    # breaks the hash match.
    import os
    import shutil

    dest = f"/tmp/spark_graft_orc_{os.getpid()}/customer"  # per-process path
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    _t(spark, sf_dir, "customer").write.mode("overwrite").orc(dest)
    back = spark.read.orc(dest)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


# ---------------------------------------------------------------------------
# stream_ohlc — the OHLC resample as a WATERMARKED STREAMING aggregate:
# the drained stream must equal the batch ohlc_bars oracle bit-for-bit.
# open/close via min/max over (order-key, value) structs — the
# declarative form of min_by/max_by that streaming state merges
# incrementally (state per (event_type, hour) window, bounded by the
# watermark at 100 TB).
# ---------------------------------------------------------------------------

from .registry_ext7 import _OHLC_SQL as _STREAM_OHLC_ORACLE  # noqa: E402


@register("stream_ohlc", _STREAM_OHLC_ORACLE)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # nanosAsLong reads ns-timestamps as bigint; a plain read may also
    # surface TIMESTAMP_NTZ — watermarks require TIMESTAMP (LTZ), so
    # normalize either way.
    ts = (
        F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        if dict(raw.dtypes).get("ts") == "bigint"
        else F.col("ts").cast("timestamp")
    )
    # 2^62 bias: see operators/timeseries.py (negative-epoch ordering)
    ordk = F.format_string(
        "%020d|%020d",
        F.unix_micros(ts) + F.lit(1 << 62),
        F.col("event_id") + F.lit(1 << 62),
    )
    agg = (
        stream.select(
            "event_type", ts.alias("ts"), "event_id", "value"
        )
        .withWatermark("ts", "1 hour")
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min(F.struct(ordk.alias("o"), F.col("value").alias("v"))).alias(
                "first"
            ),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct(ordk.alias("o"), F.col("value").alias("v"))).alias(
                "last"
            ),
            F.count("*").alias("volume"),
        )
    )
    name = "stream_ohlc_result"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name).select(
        "event_type",
        F.col("w.start").alias("bar_ts"),
        F.col("first.v").alias("open"),
        "high",
        "low",
        F.col("last.v").alias("close"),
        "volume",
    )


# ---------------------------------------------------------------------------
# permutation_importance — model explanation without shap: break the
# feature↔label pairing with a DETERMINISTIC within-bucket permutation
# (md5-ranked cyclic shift inside 64 hash buckets — a valid column
# permutation with NO global sort; every window is bucket-partitioned),
# rescore with the pinned logistic weights, report the accuracy drop
# per feature. Mirrors sklearn.inspection.permutation_importance with
# the randomness replaced by a reproducible hash order.
# ---------------------------------------------------------------------------


def _perm_importance_sql() -> str:
    from ..functions.hashing import md5_hash_int_sql

    h = md5_hash_int_sql("CAST(event_id AS VARCHAR)")
    rows = []
    for feat in ("value", "u7"):
        rows.append(f"""
SELECT '{feat}' AS feature,
       round(avg(CASE WHEN (CASE WHEN base_l >= 0e0 THEN 1 ELSE 0 END) = label
                 THEN 1e0 ELSE 0e0 END), 6) AS base_acc,
       round(avg(CASE WHEN (CASE WHEN {feat}_l >= 0e0 THEN 1 ELSE 0 END) = label
                 THEN 1e0 ELSE 0e0 END), 6) AS perm_acc
FROM scored""")
    return f"""
WITH feats AS (
  SELECT event_id, CAST(value > 50 AS INT) AS label,
         CAST(value AS DOUBLE) AS value,
         CAST(user_id % 7 AS DOUBLE) AS u7,
         {h} % 64 AS bkt
  FROM events
),
perm AS (
  SELECT *,
         COALESCE(lead(value) OVER w, first_value(value) OVER w) AS value_pm,
         COALESCE(lead(u7) OVER w, first_value(u7) OVER w) AS u7_pm
  FROM feats
  WINDOW w AS (PARTITION BY bkt ORDER BY {h}, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
scored AS (
  SELECT label,
         0.08e0 * value - 0.5e0 * u7 - 3e0 AS base_l,
         0.08e0 * value_pm - 0.5e0 * u7 - 3e0 AS value_l,
         0.08e0 * value - 0.5e0 * u7_pm - 3e0 AS u7_l
  FROM perm
)
{rows[0]}
UNION ALL
{rows[1]}
"""


@register("permutation_importance", _perm_importance_sql())
def q_permutation_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sigmoid thresholded at 0.5 ⇒ the comparison is on the LOGIT side
    # of a monotone map — numerically safe; accuracies averaged over
    # identical indicator sets on both engines, rounded at 6.
    from pyspark.sql import Window as W

    from ..functions.hashing import md5_hash_int

    ev = _t(spark, sf_dir, "events")
    h = md5_hash_int(F.col("event_id").cast("string"))
    feats = ev.select(
        "event_id",
        (F.col("value") > 50).cast("int").alias("label"),
        F.col("value").cast("double").alias("value"),
        (F.col("user_id") % 7).cast("double").alias("u7"),
        (h % 64).alias("bkt"),
        h.alias("h"),
    )
    w = (
        W.partitionBy("bkt")
        .orderBy("h", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    perm = feats.select(
        "label",
        "value",
        "u7",
        F.coalesce(
            F.lead("value").over(
                W.partitionBy("bkt").orderBy("h", "event_id")
            ),
            F.first("value").over(w),
        ).alias("value_pm"),
        F.coalesce(
            F.lead("u7").over(W.partitionBy("bkt").orderBy("h", "event_id")),
            F.first("u7").over(w),
        ).alias("u7_pm"),
    )

    def _logit(value_col, u7_col):
        # Threshold on the LOGIT (p >= 0.5 <=> logit >= 0): pure
        # rational arithmetic, so the indicator can never flip on
        # cross-engine libm exp() noise near the boundary.
        return 0.08 * F.col(value_col) - 0.5 * F.col(u7_col) - 3.0

    scored = perm.select(
        "label",
        _logit("value", "u7").alias("base_l"),
        _logit("value_pm", "u7").alias("value_l"),
        _logit("value", "u7_pm").alias("u7_l"),
    )

    def _acc(lcol):
        return F.round(
            F.avg(
                F.when(
                    (F.col(lcol) >= 0).cast("int") == F.col("label"),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0))
            ),
            6,
        )

    rows = []
    for feat in ("value", "u7"):
        rows.append(
            scored.agg(
                _acc("base_l").alias("base_acc"),
                _acc(f"{feat}_l").alias("perm_acc"),
            ).select(
                F.lit(feat).alias("feature"), "base_acc", "perm_acc"
            )
        )
    return rows[0].unionByName(rows[1])
