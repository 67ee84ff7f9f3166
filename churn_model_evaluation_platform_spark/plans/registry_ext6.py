"""Round-6 registry extensions: measured quality for the approximate
dedup path (VERDICT r5 #5), multimodal breadth, and the scale-technique
flagships (salted skew join, bucketed co-located join, stream-stream
join) plus monitoring-domain analytics (metric trend / anomaly / SCD2).

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..sources.testdata import load_table
from .registry import drain_stream, register
from .registry_ext import (
    _BAND_KEYS_SQL,
    _BAND_MATCH_SQL,
    _MINHASH_SELECT,
    _SHINGLE_HASH_CTE,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# dedup_lsh_recall — candidate-pair recall of banded MinHash-LSH vs the
# exact n-gram Jaccard ground truth at the same threshold (0.1, matching
# dedup_ngram_jaccard / dedup_lsh_verified). One summary row; the oracle
# composes the two already-verified SQL bodies so both engines agree on
# BOTH sides of the ratio, not just the final number.
# ---------------------------------------------------------------------------

_LSH_RECALL_SQL = f"""
{_SHINGLE_HASH_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.1
),
sigs AS ({_MINHASH_SELECT}),
banded AS (SELECT sigs.*, {_BAND_KEYS_SQL} FROM sigs),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({_BAND_MATCH_SQL})
)
SELECT count(*) AS n_true_pairs,
       count(c.id_a) AS n_recalled,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE round(CAST(count(c.id_a) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) END AS recall
FROM exact e LEFT JOIN cand c ON c.id_a = e.id_a AND c.id_b = e.id_b
"""


@register("dedup_lsh_recall", _LSH_RECALL_SQL)
def q_dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # QA/audit operator certifying the (k=16, bands=4) LSH config: what
    # share of true Jaccard>=0.1 pairs survive candidate generation.
    # Run on a sample at scale — the exact side is the self-join LSH
    # replaces (see operators/dedup.py:lsh_candidate_recall).
    return dedup.lsh_candidate_recall(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.1
    )


# ---------------------------------------------------------------------------
# multimodal_decode_jpeg — REAL baseline-sequential JPEG pixel decode
# (Huffman + dequant + IDCT, operators/multimodal.py:_jpeg_decode).
# Fixtures are DC-only grayscale JPEGs with a uniform quant table of 8s,
# so block bi of media m decodes to a flat 8x8 of ((m + 7*bi) % 128) + 64
# exactly — every statistic the decoder produces is predicted
# arithmetically by the oracle. An error in the marker writer, Huffman
# tables, entropy coding, dequantization OR the IDCT breaks the hash.
# ---------------------------------------------------------------------------

_JPEG_DECODE_SQL = """
WITH g AS (
  SELECT doc_id AS media_id,
         CAST(1 + doc_id % 4 AS INT) AS bx,
         CAST(1 + doc_id % 3 AS INT) AS by
  FROM documents
),
px AS (
  SELECT media_id, bx, by, ((media_id + 7 * bi) % 128) + 64 AS v
  FROM g CROSS JOIN generate_series(0, 11) bis(bi)
  WHERE bi < bx * by
)
SELECT media_id, 'jpeg' AS format,
       CAST(bx * 8 * by * 8 AS BIGINT) AS n_values,
       round(avg(v), 6) AS mean_value,
       CAST(min(v) AS DOUBLE) AS min_value,
       CAST(max(v) AS DOUBLE) AS max_value
FROM px GROUP BY media_id, bx, by
"""


@register("multimodal_decode_jpeg", _JPEG_DECODE_SQL)
def q_multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as _pd

    from ..operators.multimodal import decode_media, synth_jpeg_bytes

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": [synth_jpeg_bytes(int(m)) for m in pdf["doc_id"]],
                }
            )

    media = docs.mapInPandas(synth, "media_id long, content binary")
    return decode_media(media)


# ---------------------------------------------------------------------------
# Scale-technique flagships — the shuffle strategies the 100 TB posture
# leans on, each proven RESULT-IDENTICAL to its naive form by the oracle.
# ---------------------------------------------------------------------------

# Deterministic per-event-type weights — a broadcast-shaped dim made
# non-broadcast on purpose (hint) so salting has something to fix.
_EVENT_WEIGHTS = [
    ("click", 1.0),
    ("error", 0.0),
    ("purchase", 5.0),
    ("signup", 2.0),
    ("view", 0.2),
]

_SALTED_JOIN_SQL = (
    "WITH dim(event_type, weight) AS (VALUES "
    + ", ".join(f"('{k}', {w})" for k, w in _EVENT_WEIGHTS)
    + """)
SELECT e.event_type, count(*) AS n_events,
       round(sum(e.value * d.weight), 6) AS weighted_value
FROM events e JOIN dim d ON d.event_type = e.event_type
GROUP BY e.event_type
"""
)


@register("skew_join_salted", _SALTED_JOIN_SQL)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact⋈dim join: events carries only ~5 distinct
    event_type values, so an unsalted shuffle join lands each hot key on
    ONE reducer (5 active tasks out of 32; at 100 TB, 5 tasks out of
    16k). ``salted_join`` spreads every hot key over 16 reducers with a
    deterministic (task-retry-safe) xxhash64 salt; the oracle is the
    plain unsalted join — bit-identical output is the whole point.

    The dim side is hinted SHUFFLE_HASH to keep Catalyst from
    broadcasting it (a 5-row dim would otherwise be broadcast and no
    salting would be needed — the demo models a dim too big to
    broadcast, the only case salting exists for)."""
    from ..functions.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    dim = spark.createDataFrame(
        _EVENT_WEIGHTS, "event_type string, weight double"
    ).hint("shuffle_hash")
    joined = salted_join(ev, dim, on=["event_type"], salt=16)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value") * F.col("weight")), 6).alias(
            "weighted_value"
        ),
    )


_BUCKETED_JOIN_SQL = """
SELECT c.c_mktsegment, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("join_bucketed", _BUCKETED_JOIN_SQL)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: both sides are written
    ``bucketBy(8, custkey).sortBy(custkey)`` (one file per bucket — the
    pre-write repartition makes each bucket a single task's output), so
    the subsequent sort-merge join reads matching buckets pairwise with
    NO Exchange and NO Sort (tests/test_ext6_queries.py asserts the
    plan). This is the 100 TB fact⋈fact strategy: pay the shuffle once
    at ingest, then every custkey-keyed join of any size is
    exchange-free. Oracle = the same join unbucketed."""
    import os
    import tempfile

    from ..sources.bucketed import read_bucketed, write_bucketed

    sfname = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    base = os.path.join(tempfile.gettempdir(), f"spark_graft_bkt_{sfname}")
    tables = {
        f"bkt_orders_{sfname}": (_t(spark, sf_dir, "orders"), "o_custkey"),
        f"bkt_customer_{sfname}": (
            _t(spark, sf_dir, "customer"),
            "c_custkey",
        ),
    }
    for tbl, (df, key) in tables.items():
        write_bucketed(
            df.repartition(8, F.col(key)),
            tbl,
            os.path.join(base, tbl),
            key,
            8,
        )
    o = read_bucketed(spark, f"bkt_orders_{sfname}")
    c = read_bucketed(spark, f"bkt_customer_{sfname}")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming: watermarked stream-stream interval join (click -> purchase
# attribution). The batch oracle is the same interval join — availableNow
# over a finite source makes streaming and batch semantics coincide.
# ---------------------------------------------------------------------------

_STREAM_STREAM_SQL = """
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
"""


@register("stream_stream_join", _STREAM_STREAM_SQL)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to a click by the same user within the
    preceding hour, as a watermarked stream-stream inner join
    (streaming/joins.py): both sides buffer state bounded by
    watermark + the time-range condition — without the range bound
    Spark rightly rejects the join as unbounded-state. At 100 TB the
    state store holds only rows inside the watermark horizon."""
    from ..sources.testdata import normalize_event_ts
    from ..streaming.joins import stream_stream_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = normalize_event_ts(
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    clicks = stream.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = stream.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    # left = purchases so the right-in-[left - within, left] window reads
    # "click within the hour BEFORE the purchase".
    joined = stream_stream_join(
        purchases.withColumnRenamed("p_user_id", "user_id"),
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        watermark="2 hours",
        within="1 hour",
    ).select(F.col("l.user_id").alias("user_id"), "click_id", "purchase_id")
    name = "stream_stream_join_result"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Monitoring-domain analytics: metric trend (per-group OLS), robust
# anomaly flags, and SCD2 validity intervals — the dashboard-side
# operations a model-evaluation platform runs on its metric store
# (reference dashboards plot exactly these trends/thresholds).
# ---------------------------------------------------------------------------

_METRIC_TREND_SQL = """
SELECT event_type, count(*) AS n,
       round(regr_slope(value, x), 6) AS slope,
       round(regr_intercept(value, x), 6) AS intercept,
       round(regr_r2(value, x), 6) AS r2
FROM (
  SELECT event_type, value,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x
  FROM events
) GROUP BY event_type
"""


@register("metric_trend", _METRIC_TREND_SQL)
def q_metric_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric linear trend (is this metric drifting UP over the
    month?) as single-pass OLS: regr_slope/intercept/r2 are one
    partial-aggregable co-moment sweep — no per-group sort, no second
    pass, the exact shape a 100 TB metric store needs (contrast with
    collecting a timeseries driver-side and fitting there)."""
    ev = _t(spark, sf_dir, "events")
    x = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).cast(
        "double"
    )
    return (
        ev.select("event_type", "value", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("regr_slope(value, x)"), 6).alias("slope"),
            F.round(F.expr("regr_intercept(value, x)"), 6).alias(
                "intercept"
            ),
            F.round(F.expr("regr_r2(value, x)"), 6).alias("r2"),
        )
    )


_METRIC_ANOMALY_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS dev
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.value,
       round(d.dev / greatest(1.4826 * m.mad, 1e-12), 4) AS robust_z
FROM dev d JOIN mad m ON m.event_type = d.event_type
WHERE round(d.dev / greatest(1.4826 * m.mad, 1e-12), 4) >= 6.0
"""


@register("metric_anomaly", _METRIC_ANOMALY_SQL)
def q_metric_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags per metric: |value - median| / (1.4826 *
    MAD) >= 6 — the standard robust z-score (median/MAD shrug off the
    very outliers mean/stddev would absorb). Two grouped exact-median
    passes + two BROADCAST joins of the 5-row stats frames back onto
    the fact: the fact table never shuffles, so the plan scales as two
    scans regardless of row count."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(dev, 0.5)").alias("mad")
    )
    # Clamp: a metric where >half the group repeats one value has
    # MAD=0 — Spark's x/0→NULL would silently drop every anomaly while
    # DuckDB's inf flags all; the clamp degrades to "any deviation is
    # anomalous", identically on both engines (same hazard class as
    # embedding_outliers' zero-variance dimension, ADVICE r6).
    z = F.round(
        F.col("dev")
        / F.greatest(F.lit(1.4826) * F.col("mad"), F.lit(1e-12)),
        4,
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id", "event_type", "value", z.alias("robust_z")
        )
        .where(F.col("robust_z") >= 6.0)
    )


_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type AS status, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_status
  FROM events
),
changes AS (
  SELECT user_id, status, ts AS valid_from, event_id
  FROM ordered
  WHERE prev_status IS NULL OR prev_status <> status
)
SELECT user_id, status, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
         AS valid_to,
       CAST(lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id)
            IS NULL AS INT) AS is_current
FROM changes
"""


@register("scd2_intervals", _SCD2_SQL)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build: collapse each user's
    event stream to status CHANGE points and assign [valid_from,
    valid_to) validity intervals (open-ended current row flagged). Both
    window passes share the user_id partitioning, so the whole build is
    ONE shuffle of (user, ts) pairs — the standard CDC->warehouse
    history-table materialization (operators/relational.py)."""
    from ..operators.relational import scd2_intervals

    return scd2_intervals(
        _t(spark, sf_dir, "events"),
        key="user_id",
        status_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )


# ---------------------------------------------------------------------------
# Product-analytics family: cohort retention, ordered funnel, column
# entropy. A churn-evaluation platform's business-side counterpart —
# churn IS (1 - retention); these are the queries its analysts run next
# to the model metrics.
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cw, date_trunc('week', e.ts) AS aw
  FROM events e JOIN firsts f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
)
SELECT CAST(cw AS DATE) AS cohort_week,
       CAST(date_diff('day', cw, aw) // 7 AS INT) AS week_offset,
       count(*) AS n_users
FROM activity GROUP BY cw, aw
"""


@register("cohort_retention", _COHORT_SQL)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly purchase-retention triangle: users grouped by the week of
    their FIRST purchase, counted in every later week they purchased
    again — the denominator of churn itself. Two user_id-keyed hash
    aggregations and one user_id join share co-partitioned shuffles;
    the final (cohort, offset) aggregate is dashboard-sized. Week
    truncation is Monday-based on both engines."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    firsts = purchases.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    activity = (
        purchases.join(firsts, "user_id")
        .select("user_id", "cw", F.date_trunc("week", F.col("ts")).alias("aw"))
        .distinct()
    )
    return (
        activity.groupBy("cw", "aw")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("cw").cast("date").alias("cohort_week"),
            F.expr("CAST(datediff(aw, cw) DIV 7 AS INT)").alias(
                "week_offset"
            ),
            "n_users",
        )
    )


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL 24 HOURS
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL 24 HOURS
  GROUP BY e.user_id
)
SELECT '1_signup' AS stage, (SELECT count(*) FROM s1) AS n_users
UNION ALL
SELECT '2_click_24h', (SELECT count(*) FROM s2)
UNION ALL
SELECT '3_purchase_24h', (SELECT count(*) FROM s3)
"""


@register("funnel_conversion", _FUNNEL_SQL)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel with per-stage 24 h windows: first
    signup -> first click within 24 h -> first purchase within 24 h of
    that click (each stage's timestamp must STRICTLY follow the
    previous stage's). Every stage is a user_id-keyed aggregate joined
    to the previous stage on user_id — all shuffles co-partitioned on
    the same key; stage counts are single-row aggregates unioned at
    the end (no cross joins)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def stage(prev: DataFrame, etype: str, prev_ts: str, out_ts: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == etype)
            .join(prev, "user_id")
            .where(
                (F.col("ts") > F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + F.expr("interval 24 hours"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = stage(s1, "click", "t1", "t2")
    s3 = stage(s2, "purchase", "t2", "t3")
    rows = [
        (s1, "1_signup"),
        (s2, "2_click_24h"),
        (s3, "3_purchase_24h"),
    ]
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )
        for df, name in rows
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


_ENTROPY_SQL = """
SELECT 'documents.lang' AS column_name, round(entropy(lang), 6) AS entropy
FROM documents
UNION ALL
SELECT 'documents.source', round(entropy(source), 6) FROM documents
UNION ALL
SELECT 'events.event_type', round(entropy(event_type), 6) FROM events
"""


@register("column_entropy", _ENTROPY_SQL)
def q_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of categorical columns — the profiling
    stat that catches collapsed distributions (a lang column suddenly
    90% one value) before they poison a training mix. Computed as
    log2(N) - sum(n*log2(n))/N over the per-value counts, one grouped
    aggregate + one single-row aggregate per column; the DuckDB oracle
    uses its native entropy() — two independent formulations must meet
    at 6 decimals."""

    def entropy_of(df: DataFrame, col: str, label: str) -> DataFrame:
        counts = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return counts.agg(
            F.round(
                F.log2(F.sum("n"))
                - F.sum(F.col("n") * F.log2("n")) / F.sum("n"),
                6,
            ).alias("entropy")
        ).select(F.lit(label).alias("column_name"), "entropy")

    docs = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")
    parts = [
        entropy_of(docs, "lang", "documents.lang"),
        entropy_of(docs, "source", "documents.source"),
        entropy_of(ev, "event_type", "events.event_type"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# Evaluation-suite depth: ranking quality (NDCG@k) and a deterministic
# Bayesian-bootstrap confidence interval — "the AUC moved 0.01, is that
# real?" is THE question a model-evaluation platform answers.
# ---------------------------------------------------------------------------

# Hash-noised score: monotone-in-value plus a deterministic +-20 md5
# swing, so the ranking is imperfect (NDCG spreads 0.78..1.0) and every
# discordant pair is reproduced bit-identically on both engines.
_NDCG_SCORED_SQL = """
SELECT user_id, event_id, CAST(value > 50 AS INT) AS rel,
       least(greatest((value
         + (CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 7) AS BIGINT) % 41)
         - 65.0) / 20.0, 0.0), 1.0) AS proba
FROM events
"""

_NDCG_SQL = f"""
WITH scored AS ({_NDCG_SCORED_SQL}),
ranked AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id ORDER BY proba DESC, event_id) AS rk
  FROM scored
),
agg AS (
  SELECT user_id,
         sum(CASE WHEN rk <= 10 THEN rel / log2(rk + 1.0) ELSE 0 END) AS dcg,
         sum(rel) AS n_pos
  FROM ranked GROUP BY user_id
),
ideal AS (
  SELECT a.user_id, sum(1.0 / log2(i + 1.0)) AS idcg
  FROM agg a JOIN generate_series(1, 10) t(i) ON i <= least(a.n_pos, 10)
  GROUP BY a.user_id
)
SELECT a.user_id, round(a.dcg / i.idcg, 6) AS ndcg
FROM agg a JOIN ideal i ON i.user_id = a.user_id
WHERE a.n_pos > 0
"""


@register("ranking_ndcg", _NDCG_SQL)
def q_ranking_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per user (binary gains, rel/log2(rank+1)): ranking
    quality for recommender-style scores. One user_id window ranks by
    score; the ideal DCG is the closed-form prefix sum evaluated with a
    higher-order `aggregate` over `sequence(1, min(n_pos, 10))` — a
    per-row JVM expression, no second ranking pass and no join against
    a positions table (the oracle uses that join; two formulations must
    agree)."""
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
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("proba").desc(), "event_id"
    )
    ranked = scored.select("user_id", "rel", F.row_number().over(w).alias("rk"))
    agg = ranked.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("rk") <= 10,
                F.col("rel") / F.log2(F.col("rk") + F.lit(1.0)),
            ).otherwise(F.lit(0.0))
        ).alias("dcg"),
        F.sum("rel").alias("n_pos"),
    )
    idcg = F.expr(
        "aggregate(sequence(1, CAST(least(n_pos, 10) AS INT)),"
        " CAST(0 AS DOUBLE), (acc, i) -> acc + 1.0 / log2(CAST(i AS DOUBLE) + 1.0))"
    )
    return (
        agg.where(F.col("n_pos") > 0)
        .select("user_id", F.round(F.col("dcg") / idcg, 6).alias("ndcg"))
    )


_BOOTSTRAP_B = 100
_BOOTSTRAP_SQL = f"""
WITH reps AS (SELECT i AS b FROM generate_series(0, {_BOOTSTRAP_B - 1}) t(i)),
w AS (
  SELECT b, value,
         -ln((CAST('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)), 1, 7) AS BIGINT) + 0.5) / 268435456.0) AS wt
  FROM events CROSS JOIN reps
),
means AS (SELECT b, sum(wt * value) / sum(wt) AS m FROM w GROUP BY b)
SELECT round((SELECT avg(value) FROM events), 6) AS point_mean,
       round(quantile_cont(m, 0.025), 6) AS ci_lo,
       round(quantile_cont(m, 0.975), 6) AS ci_hi,
       count(*) AS n_replicates
FROM means
"""


@register("metric_bootstrap_ci", _BOOTSTRAP_SQL)
def q_metric_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Bayesian-bootstrap CI for a metric mean (Rubin 1981): each
    replicate reweights every row with an Exponential(1) draw
    -ln(U) where U is a DETERMINISTIC md5 uniform of (row id,
    replicate id) — fully reproducible across engines, retries, and
    cluster sizes, where rand() is none of those. The replicate
    explode is a map-side `explode(sequence(...))` and partial
    aggregation folds each partition's B x (sum(w*v), sum(w)) pairs
    BEFORE the shuffle — only B rows per partition move, so 100
    replicates cost 100x compute but shuffle stays tiny. The question
    this answers — 'f1 dropped 0.01, is that noise?' — is the
    evaluation platform's reason to exist."""
    from ..functions.hashing import md5_hash_int

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    w = ev.select(
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOTSTRAP_B - 1))).alias("b"),
        "event_id",
    ).select(
        "b",
        "value",
        (
            -F.log(
                (
                    md5_hash_int(
                        F.concat_ws(
                            ":",
                            F.col("event_id").cast("string"),
                            F.col("b").cast("string"),
                        )
                    )
                    + F.lit(0.5)
                )
                / F.lit(268435456.0)
            )
        ).alias("wt"),
    )
    means = w.groupBy("b").agg(
        (F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias("m")
    )
    ci = means.agg(
        F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_replicates"),
    )
    point = ev.agg(F.round(F.avg("value"), 6).alias("point_mean"))
    return point.crossJoin(F.broadcast(ci)).select(
        "point_mean", "ci_lo", "ci_hi", "n_replicates"
    )


_QUANTIZE_SQL = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sc AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM base
)
SELECT vec_id, len(v) AS n_dims, round(scale, 6) AS scale,
       round(list_max(list_transform(v, x -> abs(round(x / scale) * scale - x))), 6)
         AS max_abs_err
FROM sc WHERE scale > 0
"""


@register("embedding_quantize", _QUANTIZE_SQL)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit for the ANN index: per-vector
    scale = max|v|/127 and the worst-case reconstruction error of
    round(v/scale)*scale — the number that says whether the quantized
    index can stand in for full-precision vectors. All JVM-side
    higher-order array expressions (`transform`/`array_max`): 4x
    memory/bandwidth reduction decided without a single Python row."""
    emb = _t(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    base = emb.select("vec_id", v.alias("v"))
    sc = base.select(
        "vec_id",
        "v",
        (F.array_max(F.expr("transform(v, x -> abs(x))")) / 127.0).alias(
            "scale"
        ),
    )
    return sc.where(F.col("scale") > 0).select(
        "vec_id",
        F.size("v").alias("n_dims"),
        F.round("scale", 6).alias("scale"),
        F.round(
            F.array_max(
                F.expr("transform(v, x -> abs(round(x / scale) * scale - x))")
            ),
            6,
        ).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Streaming: native session_window aggregation (gap-merged sessions as a
# STATEFUL streaming operator, vs the batch `sessionize` which derives
# sessions with window functions). Oracle derives the same sessions by
# hand: new session iff the event is >= gap after its predecessor.
# ---------------------------------------------------------------------------

_SESSION_GAP = "30 minutes"

_STREAM_SESSION_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTES AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


@register("stream_session_window", _STREAM_SESSION_SQL)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregation with Spark's NATIVE
    ``session_window`` (dynamic gap-merged windows held in the state
    store — the operator the manual batch `sessionize` composition
    replaces in streaming). State is keyed (user, open session) and
    sessions merge as events arrive; with a watermark, closed sessions
    are evicted, bounding state by the gap + lateness horizon at any
    input rate. Complete output mode here so the finite-source drain
    emits every session for the oracle."""
    from ..sources import testdata

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = testdata.normalize_event_ts(
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy(
        F.session_window("ts", _SESSION_GAP), F.col("user_id")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    name = "stream_session_window_result"
    q = (
        agg.select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    drain_stream(q)
    return spark.table(name)


# ---------------------------------------------------------------------------
# decontaminate_corpus — the ACTION after contamination_check detects:
# drop every corpus doc sharing >= 5 shingles with an eval/benchmark doc
# (other than itself; the synthetic bench is every 97th doc), and
# account for what survives. Summary-row differential like
# corpus_curation: every count exact.
# ---------------------------------------------------------------------------


def _decontaminate_sql() -> str:
    from .registry_ext import _TOKENS_SQL

    return f"""
{_SHINGLE_HASH_CTE},
bsh AS (SELECT doc_id AS bench_id, h FROM sh WHERE doc_id % 97 = 0),
common AS (
  SELECT s.doc_id, b.bench_id, count(*) AS common
  FROM sh s JOIN bsh b ON s.h = b.h
  GROUP BY s.doc_id, b.bench_id
),
cont AS (
  SELECT DISTINCT doc_id FROM common
  WHERE common >= 5 AND doc_id <> bench_id
),
kept AS (
  SELECT d.* FROM documents d LEFT JOIN cont ON cont.doc_id = d.doc_id
  WHERE cont.doc_id IS NULL
)
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT count(*) FROM cont) AS BIGINT) AS n_contaminated,
       CAST((SELECT count(*) FROM kept) AS BIGINT) AS n_kept,
       CAST((SELECT sum(len({_TOKENS_SQL})) FROM kept) AS BIGINT) AS kept_tokens
"""


@register("decontaminate_corpus", _decontaminate_sql())
def q_decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination end-to-end: detection (broadcast
    eval-set shingle collision, corpus text never shuffles) -> LEFT
    ANTI join removal -> surviving-token accounting. The anti join's
    build side is the contaminated-id set (eval-sized by construction,
    broadcastable at any corpus scale), so removal is a map-side
    filter over the 100 TB side."""
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    pairs = dedup.contamination_pairs(docs, bench, n=3, min_common=5)
    cont = (
        pairs.where(F.col("doc_id") != F.col("bench_id"))
        .select("doc_id")
        .distinct()
    )
    kept = docs.join(F.broadcast(cont), "doc_id", "left_anti")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_cont = cont.agg(F.count(F.lit(1)).alias("n_contaminated"))
    n_kept = kept.agg(F.count(F.lit(1)).alias("n_kept"))
    toks = kept.select(F.size(tokens(F.col("text"))).alias("n")).agg(
        F.sum("n").cast("bigint").alias("kept_tokens")
    )
    return (
        n_docs.crossJoin(F.broadcast(n_cont))
        .crossJoin(F.broadcast(n_kept))
        .crossJoin(F.broadcast(toks))
    )


# ---------------------------------------------------------------------------
# Engine capabilities not yet demonstrated: semi-structured JSON columns
# and event-time RANGE window frames.
# ---------------------------------------------------------------------------

_JSON_PROPS_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract(props, '$.k') AS INT)), 6) AS avg_k,
       max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


@register("json_props_agg", _JSON_PROPS_SQL)
def q_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload analytics: events.props carries a JSON
    object; `from_json` with an EXPLICIT schema parses it JVM-side
    (one pass, no inference job over 100 TB, malformed rows -> NULL not
    error) and the extracted field aggregates like any column. The
    DuckDB oracle goes through json_extract path syntax — a different
    JSON implementation must produce the same numbers."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


# Rolling sums accumulate in integer CENTS (values carry 2 decimals):
# windowed double sums are evaluated in engine-specific orders (segment
# tree vs sliding add/remove), which drifts past 6 dp once frames reach
# hundreds of rows, and a rounded average still trips round-half
# boundaries (sum/100/n lands on exact 5e-7 multiples) — integer
# (n, sum_cents) is exact in any order; the caller divides for display.
_ROLLING_SQL = """
SELECT event_id,
       count(*) OVER w AS rolling_n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
            AS BIGINT) AS rolling_sum_cents
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL 6 HOURS PRECEDING AND CURRENT ROW)
"""


@register("rolling_metrics", _ROLLING_SQL)
def q_rolling_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time rolling smoothing (the dashboard's moving-average
    line): a RANGE frame over the previous 6 h per metric — frame
    membership is defined by TIME, not row count, so ties and uneven
    sampling are handled exactly. One shuffle on the partition key;
    within a partition the frame slides monotonically (O(n) two-pointer
    evaluation, no per-row rescan). The windowed sum runs in integer
    cents so the result is exact and order-independent (see
    _ROLLING_SQL note); the moving average is sum_cents/100/n at
    display time."""
    ev = _t(spark, sf_dir, "events")
    frame = (
        "(PARTITION BY event_type ORDER BY ts "
        "RANGE BETWEEN INTERVAL 6 HOURS PRECEDING AND CURRENT ROW)"
    )
    return ev.selectExpr(
        "event_id",
        f"count(*) OVER {frame} AS rolling_n",
        f"""sum(CAST(round(value * 100) AS BIGINT)) OVER {frame}
           AS rolling_sum_cents""",
    )
