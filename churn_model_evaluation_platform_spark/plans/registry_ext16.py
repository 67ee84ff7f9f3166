"""Round-11 (second batch) registry extensions: per-file bloom-filter
point-lookup skipping on the transactional table.

Same conventions as registry.py: every computed column aliased
identically on both engines; integer aggregates cast to BIGINT on the
DuckDB side (HUGEINT hash trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .phases import timed_phase
from .registry import register
from .registry_ext12 import _t


# ---------------------------------------------------------------------------
# txnlog_clone_shallow — ZERO-COPY SHALLOW CLONE (r11, Delta's CREATE
# TABLE ... CLONE): clone the six-bucket events table in ONE metadata
# commit (external '../'-relative file references, stamped with the
# external_files reader feature), then CoW-DELETE a day band in the
# CLONE. The oracle pins three things at once: the clone's post-delete
# content (the delete localized the touched files and left the rest
# externally referenced), source_rows = the full events count (the
# source must be untouched by the clone's DML — independence), and
# files_copied == 0 measured on disk before the delete (the clone moved
# zero bytes). Protocol refusal by feature-less readers, DV refusals,
# deep clones carrying DVs, and rewrite-localization are pinned in
# tests/test_txnlog_clone.py.
# ---------------------------------------------------------------------------


def _clone_sql() -> str:
    from .registry_ext12 import _SKIP_HI, _SKIP_LO

    return f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(*) AS BIGINT) FROM events) AS source_rows,
       CAST(0 AS BIGINT) AS files_copied
FROM events
WHERE NOT (ts >= TIMESTAMP '{_SKIP_LO} 00:00:00'
           AND ts < TIMESTAMP '{_SKIP_HI} 00:00:00')
GROUP BY event_type
"""


@register("txnlog_clone_shallow", _clone_sql())
def q_txnlog_clone_shallow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob

    from .registry_ext12 import (
        _SKIP_HI,
        _SKIP_LO,
        _six_bucket_table,
        _tmp_table_path,
    )

    t = _six_bucket_table(spark, sf_dir, "txnclonesrc")
    with timed_phase("fixture_build:txnclone"):
        dest = _tmp_table_path(sf_dir, "txnclonedst")
    cl = t.clone(dest)
    files_copied = len(
        _glob.glob(f"{dest}/data/**/*.parquet", recursive=True)
    )
    cl.delete([("ts", ">=", _SKIP_LO), ("ts", "<", _SKIP_HI)])
    src_rows = t.snapshot().count()
    return (
        cl.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("source_rows", F.lit(src_rows).cast("long"))
        .withColumn("files_copied", F.lit(files_copied).cast("long"))
    )


# ---------------------------------------------------------------------------
# txnlog_expire_log — COMMIT-LOG RETENTION (r11, Delta's
# logRetentionDuration): the six-bucket ingest with a checkpoint every
# 2 commits, then expire_log(0) anchors on the newest checkpoint (v6)
# and deletes the log prefix. The oracle pins the full post-expiry
# content (state must resolve bit-identically through the anchor
# checkpoint + empty tail) and log_starts_at = 6 (the prefix is gone);
# the refusal invariants — expired versions raise, a truncated log
# with no readable checkpoint refuses to replay, vacuum reclaims only
# expired-version files — are pinned in tests/test_txnlog_expire.py.
# ---------------------------------------------------------------------------

_EXPIRE_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       CAST(6 AS BIGINT) AS log_starts_at
FROM events
GROUP BY event_type
"""


@register("txnlog_expire_log", _EXPIRE_SQL)
def q_txnlog_expire_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import txnlog as _txnlog_mod
    from ..sources.txnlog import TxnTable
    from .fixtures import cached_fixture, clone_fixture
    from .registry_ext12 import _tmp_table_path

    with timed_phase("fixture_build:txnexpire"):

        def _build(path: str) -> None:
            t = TxnTable(spark, path, checkpoint_interval=2)
            ev = _t(spark, sf_dir, "events").select(
                "ts",
                "event_type",
                "value",
                F.least(
                    F.floor((F.dayofmonth("ts") - 1) / 5).cast("int"),
                    F.lit(5),
                ).alias("bucket"),
            )
            for b in range(6):  # checkpoints land at v2, v4, v6
                t.append(
                    ev.where(F.col("bucket") == b)
                    .drop("bucket")
                    .coalesce(1)
                )

        fix = cached_fixture(
            sf_dir, "txnexpire", ["events"], _build,
            code_modules=(_txnlog_mod,),
        )
        path = clone_fixture(fix, _tmp_table_path(sf_dir, "txnexpire"))
        t = TxnTable(spark, path)
    t.expire_log(retention_seconds=0.0)
    return (
        t.snapshot()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn(
            "log_starts_at", F.lit(t.versions()[0]).cast("long")
        )
    )


# ---------------------------------------------------------------------------
# txnlog_generated_partition — GENERATED COLUMNS as derived partition
# keys (r11, Delta's generated columns): the table declares
# day = CAST(ts AS DATE), writers append events WITHOUT the column,
# the table derives it, Hive-partitions on it, and a day-range scan
# prunes through the path-derived min==max bounds. The oracle replays
# the generation expression and predicts files_scanned = distinct days
# in the range (one append x one file per day-partition) — a generator
# that mis-derived, a partition layout that mis-keyed, or pruning that
# read extra files all break the hash. Validation/SET-refusal/
# recompute-on-update/adoption/protocol are pinned in
# tests/test_txnlog_generated.py.
# ---------------------------------------------------------------------------

_GEN_LO, _GEN_HI = "2024-01-08", "2024-01-11"

_GEN_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 2) AS sum_value,
       (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '{_GEN_LO}'
                                   AND DATE '{_GEN_HI}') AS files_scanned
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '{_GEN_LO}' AND DATE '{_GEN_HI}'
GROUP BY event_type
"""


@register("txnlog_generated_partition", _GEN_SQL)
def q_txnlog_generated_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as _dt

    from ..sources import txnlog as _txnlog_mod
    from ..sources.txnlog import TxnTable
    from .fixtures import cached_fixture

    with timed_phase("fixture_build:txngen"):

        def _build(path: str) -> None:
            t = TxnTable(
                spark,
                path,
                partition_by=["day"],
                generated_columns={"day": "CAST(ts AS DATE)"},
            )
            ev = _t(spark, sf_dir, "events").select(
                "ts", "event_type", "value"
            )
            t.append(ev.coalesce(1))  # one file per day partition

        fix = cached_fixture(
            sf_dir, "txngen", ["events"], _build,
            code_modules=(_txnlog_mod,),
        )
        t = TxnTable(spark, fix)
    where = [
        (
            "day",
            "between",
            (
                _dt.date.fromisoformat(_GEN_LO),
                _dt.date.fromisoformat(_GEN_HI),
            ),
        )
    ]
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
# span_dedup_exact — C4-STYLE EXACT SPAN DEDUP across the corpus
# (Raffel et al. 2020 removed all but one of any repeated 3-sentence
# span; Lee et al. 2021 is the exact-substring generalization): drop
# every word covered by a 5-word span whose identical text occurred
# earlier (doc_id, then position — lexicographic), rebuild each doc
# from the survivors. The engine groups on a 128-bit md5 DIGEST of the
# span (fixed 16-byte shuffle keys at any span width; exact up to
# 2^-128 collisions) — the oracle replays the SAME digest grouping and
# the same lexicographic first-occurrence order (rn > 1 over
# PARTITION BY md5(gram) ORDER BY doc_id, pos is exactly "strictly
# after the struct-min"), covered-position union, anti-join and ORDER
# BY-position string rebuild — so a window off-by-one, an ordering
# bug, or a rebuild that loses word order breaks the hash on every
# affected doc at once.
# ---------------------------------------------------------------------------

_SPAN_N = 5

_SPAN_DEDUP_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL
),
spans AS (
  SELECT doc_id,
         unnest(generate_series(1, len(ws) - {_SPAN_N - 1})) AS pos,
         unnest(list_transform(generate_series(1, len(ws) - {_SPAN_N - 1}),
                i -> list_aggregate(ws[i:i+{_SPAN_N - 1}], 'string_agg', ' ')))
           AS gram
  FROM toks WHERE len(ws) >= {_SPAN_N}
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY md5(gram)
                            ORDER BY doc_id, pos) AS rn
  FROM spans
),
dup_words AS (
  SELECT DISTINCT doc_id, wpos FROM (
    SELECT doc_id,
           unnest(generate_series(pos, pos + {_SPAN_N - 1})) AS wpos
    FROM ranked WHERE rn > 1)
),
words AS (
  SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS word
  FROM toks
),
kept AS (
  SELECT w.doc_id, w.wpos, w.word
  FROM words w ANTI JOIN dup_words d
    ON w.doc_id = d.doc_id AND w.wpos = d.wpos
)
SELECT t.doc_id,
       coalesce(string_agg(k.word, ' ' ORDER BY k.wpos), '') AS text_deduped,
       CAST(len(t.ws) - count(k.word) AS BIGINT) AS n_words_removed
FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
GROUP BY t.doc_id, len(t.ws)
"""


@register("span_dedup_exact", _SPAN_DEDUP_SQL)
def q_span_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import span_dedup_corpus

    return span_dedup_corpus(_t(spark, sf_dir, "documents"), n=_SPAN_N)


# ---------------------------------------------------------------------------
# txnlog_bloom_pointlookup — BLOOM-FILTER FILE SKIPPING (r11, Delta's
# bloom-filter-index posture): orders ingested in 4 commits x 2 files
# bucketed by xxhash64(o_orderkey), so every file's [min, max] spans
# the whole key space and range stats can prune NOTHING; the per-file
# blooms recorded in the commit log answer a 3-key point lookup by
# skipping every file that cannot hold a key. The oracle pins the
# matched content (the 3 smallest order keys — SQL-expressible on both
# engines) plus `bloom_pruned` = "the scan touched at most half the
# files", which only holds through the blooms; the no-false-negative
# invariant, checkpoint/rename survival, and the cross-kind literal
# guard are pinned in tests/test_txnlog_bloom.py.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# dedup_semantic_clustered — SemDeDup (Abbas et al. 2023): kmeans-
# bucketed semantic dedup, the cluster-then-triangular-sim-matrix
# filter a pretraining corpus runs when MinHash can't see paraphrase
# duplicates. Centroids pinned to corpus vectors 1..8 (the frozen
# random-sample init the IVF-pinned family uses) make assignment,
# farthest-from-centroid ranking, and the max-sim-to-earlier-ranked
# reduction exact arithmetic the oracle replays term-for-term; the
# threshold sits at 0.35 because the synthetic corpus's intra-cluster
# sims top out at ~0.49 — both keep branches are exercised at every SF
# (64/500 removed at sf0.001, 723/2000 at sf0.1).
# ---------------------------------------------------------------------------

_EMB_DBL16 = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_SEMDEDUP_TAU = 0.35

_SEMDEDUP_SQL = f"""
WITH cents AS (
  SELECT CAST(vec_id - 1 AS INT) AS cid, {_EMB_DBL16} AS cv
  FROM embeddings WHERE vec_id BETWEEN 1 AND 8
),
e AS (SELECT vec_id, {_EMB_DBL16} AS ev FROM embeddings),
assign AS (
  SELECT vec_id, ev, cid, d2 FROM (
    SELECT e.vec_id, e.ev, c.cid,
           list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
             + list_dot_product(cv, cv) AS d2,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(ev, ev) - 2 * list_dot_product(ev, cv)
                      + list_dot_product(cv, cv), c.cid) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
),
ranked AS (
  SELECT vec_id, ev, cid,
         row_number() OVER (PARTITION BY cid ORDER BY d2 DESC, vec_id) AS rnk
  FROM assign
),
sims AS (
  SELECT b.vec_id,
         max(list_dot_product(a.ev, b.ev)
             / (sqrt(list_dot_product(a.ev, a.ev))
                * sqrt(list_dot_product(b.ev, b.ev)))) AS ms
  FROM ranked a JOIN ranked b ON a.cid = b.cid AND a.rnk < b.rnk
  GROUP BY b.vec_id
)
SELECT r.vec_id, r.cid AS cluster_id,
       coalesce(s.ms < {_SEMDEDUP_TAU}, TRUE) AS keep,
       round(s.ms, 6) AS max_sim_prior
FROM ranked r LEFT JOIN sims s ON r.vec_id = s.vec_id
"""


@register("dedup_semantic_clustered", _SEMDEDUP_SQL)
def q_dedup_semantic_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import semantic_dedup_clustered

    emb = _t(spark, sf_dir, "embeddings")
    cents_map = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").between(1, 8)).collect()
    }
    cents = [cents_map[j] for j in range(1, 9)]
    out = semantic_dedup_clustered(emb, cents, threshold=_SEMDEDUP_TAU)
    return out.withColumn("max_sim_prior", F.round("max_sim_prior", 6))


_BLOOM_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total,
       CAST(TRUE AS BOOLEAN) AS bloom_pruned
FROM orders
WHERE o_orderkey IN
      (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 3)
"""


@register("txnlog_bloom_pointlookup", _BLOOM_SQL)
def q_txnlog_bloom_pointlookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import txnlog as _txnlog_mod
    from ..sources.txnlog import TxnTable
    from .fixtures import cached_fixture

    with timed_phase("fixture_build:txnbloom"):

        def _build(path: str) -> None:
            t = TxnTable(
                spark,
                path,
                bloom_columns=["o_orderkey"],
                # sized for sf0.1's ~19k rows/file: kn/m ≈ 0.43 → ~0.2% fpp
                bloom_bits=1 << 18,
            )
            od = _t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_custkey", "o_totalprice"
            )
            for c in range(4):
                t.append(
                    od.where(
                        F.pmod(F.xxhash64("o_orderkey"), F.lit(4)) == c
                    ).repartition(2)
                )

        fix = cached_fixture(
            sf_dir,
            "txnbloom",
            ["orders"],
            _build,
            code_modules=(_txnlog_mod,),
        )
        t = TxnTable(spark, fix)
        keys = [
            r[0]
            for r in _t(spark, sf_dir, "orders")
            .select("o_orderkey")
            .orderBy("o_orderkey")
            .limit(3)
            .collect()
        ]
    rep = t.prune_report([("o_orderkey", "in", keys)])
    # deterministic given the fixture (the hashes are): ≤3 true files
    # + ~0.2%-probability false hits out of 8 — far under half
    pruned = bool(rep["kept"] * 2 <= rep["total"])
    return (
        t.scan([("o_orderkey", "in", keys)])
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("total"),
        )
        .withColumn("bloom_pruned", F.lit(pruned))
    )
