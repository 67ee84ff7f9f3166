"""Round-6 second batch: the data-platform ops a churn-monitoring store
grows into once it runs at warehouse scale — CDC MERGE compaction,
OHLC bar resampling for dashboard timeseries, a bloom runtime-filtered
join, fixed-budget PageRank + exact triangle counting over
interaction graphs, nearest-neighbor as-of matching, and equi-depth
binning without a global sort.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent double aggregates rounded
on both sides; double literals written in e-notation in the oracle so
DuckDB parses them as DOUBLE, not DECIMAL (IEEE parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# cdc_upsert — SCD1 MERGE: fold an insert/update/delete changelog into a
# dimension snapshot. Snapshot = customers outside every 3rd key (so the
# changelog exercises true inserts); changelog = one change per order
# (delete when orderkey % 10 == 0, else upsert of the order's total as
# the new balance), latest change per key wins by (orderdate, orderkey).
# ---------------------------------------------------------------------------

_CDC_SQL = """
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
last AS (SELECT c_custkey, op, new_bal FROM ch WHERE rn = 1)
SELECT COALESCE(s.c_custkey, l.c_custkey) AS c_custkey,
       CASE WHEN l.op = 'U' THEN l.new_bal ELSE s.c_acctbal END AS c_acctbal,
       s.c_mktsegment AS c_mktsegment
FROM snap s FULL OUTER JOIN last l ON s.c_custkey = l.c_custkey
WHERE l.op IS NULL OR l.op <> 'D'
"""


@register("cdc_upsert", _CDC_SQL)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Delta/Iceberg MERGE INTO semantics on plain parquet (operators/
    # cdc.py): latest-change-per-key via struct-max aggregate (no
    # window), one full-outer shuffle join. Mirrors compacting the
    # reference's append-only metrics store back into a snapshot
    # (churn_prediction_pipeline.py:78-84 double-write posture).
    from ..operators.cdc import cdc_apply

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    snap = cust.where(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "o_orderdate",
        "o_orderkey",
        F.col("o_totalprice").alias("c_acctbal"),
    )
    return cdc_apply(
        snap,
        changes,
        keys=["c_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        op_col="op",
    )


# ---------------------------------------------------------------------------
# ohlc_bars — resample the event stream into hourly OHLC bars per event
# type: the O(bars) representation dashboard timeseries panels want.
# ---------------------------------------------------------------------------

# 2^62 bias matches operators/timeseries.py: '%020d' on a negative
# value (pre-1970 ts) prints '-' and breaks lexicographic == numeric.
_OHLC_ORD = (
    "printf('%020d|%020d', epoch_us(ts) + 4611686018427387904,"
    " event_id + 4611686018427387904)"
)
_OHLC_SQL = f"""
SELECT event_type,
       date_trunc('hour', ts) AS bar_ts,
       arg_min(value, {_OHLC_ORD}) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, {_OHLC_ORD}) AS close,
       count(*) AS volume
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


@register("ohlc_bars", _OHLC_SQL)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One partial-aggregated groupBy — min_by/max_by on a zero-padded
    # (epoch, event_id) string key, so open/close are deterministic even
    # at duplicated timestamps (operators/timeseries.py).
    from ..operators.timeseries import ohlc_bars

    ev = _t(spark, sf_dir, "events")
    return ohlc_bars(
        ev, ["event_type"], "ts", "value", "event_id", bucket="hour"
    )


# ---------------------------------------------------------------------------
# bloom_filter_join — runtime bloom filter built from the filtered dim
# keys pre-filters the fact scan before the join; the exact join then
# removes false positives, so the result equals the plain join (the
# oracle) bit-for-bit while the fact shuffle carries only might-match
# rows. The explicit form of Spark's runtime.bloomFilter rewrite.
# ---------------------------------------------------------------------------

_BLOOM_JOIN_SQL = """
SELECT s_nationkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_acctbal > 4500
GROUP BY s_nationkey
"""


@register("bloom_filter_join", _BLOOM_JOIN_SQL)
def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bloom import bloom_build, bloom_might_contain

    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    dim = sup.where(F.col("s_acctbal") > 4500).select(
        "s_suppkey", "s_nationkey"
    )
    words = bloom_build(dim, "s_suppkey")
    fact = li.select(
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).where(bloom_might_contain("l_suppkey", words))
    return (
        fact.join(F.broadcast(dim), fact.l_suppkey == dim.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# pagerank — fixed 3-iteration PageRank over the symmetrized
# customer–supplier interaction graph (who-bought-from-whom via
# orders ⋈ lineitem; vertex ids namespaced even/odd). The oracle
# unrolls the same three power iterations in SQL.
# ---------------------------------------------------------------------------

_PR_EDGES = """
e0 AS (
  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b AS src, a AS dst FROM e0),
v AS (SELECT DISTINCT src AS id FROM e),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
nn AS (SELECT count(*) AS n FROM v)
"""


def _pr_iter(prev: str, out: str) -> str:
    return f""",
{out} AS (
  SELECT v.id,
         1.5e-1 / (SELECT n FROM nn)
           + 8.5e-1 * COALESCE(s.inflow, 0e0) AS pr
  FROM v LEFT JOIN (
    SELECT e.dst AS id, sum(p.pr / d.deg) AS inflow
    FROM e JOIN {prev} p ON p.id = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.id = v.id
)"""


_PAGERANK_SQL = (
    "WITH "
    + _PR_EDGES
    + ",\npr0 AS (SELECT id, 1e0 / (SELECT n FROM nn) AS pr FROM v)"
    + _pr_iter("pr0", "pr1")
    + _pr_iter("pr1", "pr2")
    + _pr_iter("pr2", "pr3")
    + "\nSELECT id, round(pr, 8) AS pr FROM pr3"
)


@register("pagerank", _PAGERANK_SQL)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # operators/graph.py pagerank: one shuffle per iteration (rank join
    # on src + partial-agg sum on dst), N a driver scalar. Symmetrized
    # edges → no dangling mass, matching the unrolled SQL exactly
    # (teleport passed as the literal 0.15, not 1 - 0.85).
    from ..operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = e0.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(e0.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    pr = pagerank(edges, iters=3, damping=0.85, teleport=0.15)
    return pr.select("id", F.round("pr", 8).alias("pr"))


# ---------------------------------------------------------------------------
# triangle_count — exact triangle count of the part co-purchase graph
# (parts appearing in the same order). Spark side uses degree-oriented
# wedge counting (Suri & Vassilvitskii); the oracle counts a < b < c
# directly with a triple join — same total by construction.
# ---------------------------------------------------------------------------

_TRIANGLES_SQL = """
WITH p AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS pid FROM lineitem),
e AS (
  SELECT DISTINCT a.pid AS a, b.pid AS b
  FROM p a JOIN p b ON a.k = b.k AND a.pid < b.pid
)
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@register("triangle_count", _TRIANGLES_SQL)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    p = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pid")
    ).distinct()
    a, b = p.alias("pa"), p.alias("pb")
    edges = (
        a.join(
            b,
            (F.col("pa.k") == F.col("pb.k"))
            & (F.col("pa.pid") < F.col("pb.pid")),
        )
        .select(F.col("pa.pid").alias("a"), F.col("pb.pid").alias("b"))
        .distinct()
    )
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# asof_join_nearest — each non-click event matches its user's NEAREST
# click in either time direction (ties → the earlier one). Verified
# against DuckDB's two chained directional ASOF joins + distance CASE.
# ---------------------------------------------------------------------------

_NEAREST_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type <> 'click'),
r AS (SELECT user_id, ts, max(value) AS click_value FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts),
j AS (
  SELECT l.event_id, l.ts,
         b.ts AS bts, b.click_value AS bval,
         f.ts AS fts, f.click_value AS fval
  FROM l
  ASOF LEFT JOIN r b ON l.user_id = b.user_id AND l.ts >= b.ts
  ASOF LEFT JOIN r f ON l.user_id = f.user_id AND l.ts <= f.ts
)
SELECT event_id,
       CASE WHEN bts IS NOT NULL AND (fts IS NULL OR (ts - bts) <= (fts - ts))
            THEN bts ELSE fts END AS near_ts,
       CASE WHEN bts IS NOT NULL AND (fts IS NULL OR (ts - bts) <= (fts - ts))
            THEN bval ELSE fval END AS click_value
FROM j
WHERE bts IS NOT NULL OR fts IS NOT NULL
"""


@register("asof_join_nearest", _NEAREST_SQL)
def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two ordered window passes (asc backward carry, desc forward carry)
    # over ONE union + one shuffle, then a per-row interval-distance
    # pick — still no range join (operators/relational.py).
    from ..operators.relational import asof_join_nearest

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") != "click").select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    out = asof_join_nearest(
        left, right, ["user_id"], right_cols=["click_value"], ts_out="near_ts"
    )
    return out.select("event_id", "near_ts", "click_value")


# ---------------------------------------------------------------------------
# quantile_bins — equi-depth (quartile) binning of a fact column without
# a global sort/ntile: exact interpolated boundaries via one aggregate,
# broadcast back, CASE-assigned. At 100 TB swap the exact percentile for
# percentile_approx; the assign stage is unchanged.
# ---------------------------------------------------------------------------

_QBINS_SQL = """
WITH q AS (
  SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.50) AS q2,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem
)
SELECT CASE WHEN l_extendedprice <= q1 THEN 1
            WHEN l_extendedprice <= q2 THEN 2
            WHEN l_extendedprice <= q3 THEN 3
            ELSE 4 END AS bucket,
       count(*) AS n,
       min(l_extendedprice) AS lo,
       max(l_extendedprice) AS hi
FROM lineitem, q
GROUP BY 1
"""


@register("quantile_bins", _QBINS_SQL)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice")
    # ONE array-percentile aggregate: three scalar `percentile` exprs
    # would each buffer the full value multiset (3× the memory and
    # merge work — measured 6.6 s → ~2 s at sf0.1 from this alone).
    qs = li.agg(
        F.expr(
            "percentile(l_extendedprice, array(0.25, 0.50, 0.75))"
        ).alias("qq")
    ).select(*[F.col("qq")[i].alias(f"q{i + 1}") for i in range(3)])
    binned = li.crossJoin(F.broadcast(qs)).select(
        "l_extendedprice",
        F.when(F.col("l_extendedprice") <= F.col("q1"), 1)
        .when(F.col("l_extendedprice") <= F.col("q2"), 2)
        .when(F.col("l_extendedprice") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("bucket"),
    )
    return binned.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )


# ---------------------------------------------------------------------------
# ngram_novelty — per-doc fraction of shingles no earlier (smaller-id)
# doc contributed: the marginal-information audit of a crawl.
# ---------------------------------------------------------------------------


def _novelty_sql() -> str:
    from .registry_ext import _SHINGLE_HASH_CTE

    return f"""
{_SHINGLE_HASH_CTE},
first AS (SELECT h, min(doc_id) AS first_id FROM sh GROUP BY h)
SELECT doc_id,
       count(*) AS n_sh,
       CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty
FROM sh JOIN first USING (h)
GROUP BY doc_id
"""


@register("ngram_novelty", _novelty_sql())
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    # groupBy(shingle-hash) min + hash-co-partitioned join back —
    # heaviest shuffle bounded by distinct-shingle count, never pairs
    # (operators/dedup.py:ngram_novelty).
    from ..operators.dedup import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"), n=3)


# ---------------------------------------------------------------------------
# dedup_containment — rare-shingle-blocked candidates verified by
# CONTAINMENT |A∩B| / min(|A|,|B|) (Broder): flags near-supersets whose
# Jaccard dilutes toward 0 as the size ratio grows. Banded MinHash-LSH
# would be the wrong candidate generator (band collision ~ jaccard^r,
# and these pairs have LOW jaccard by definition); blocking on each
# doc's k=5 globally rarest shingles gives recall 1.0 for full
# containment and near-linear bucket joins (df-bounded buckets).
# jaccard rides along so consumers can split true near-dups from
# containment-only pairs.
# ---------------------------------------------------------------------------


def _containment_ctes() -> str:
    """Shared CTE prefix: shingles, doc-frequencies, rare-blocking,
    sizes, and the blocked candidate set — used by both the pair query
    and the recall audit so the two stay in lockstep."""
    from .registry_ext import _SHINGLE_HASH_CTE

    return f"""
{_SHINGLE_HASH_CTE},
freq AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
rare AS (
  SELECT doc_id, h FROM (
    SELECT s.doc_id, s.h,
           row_number() OVER (PARTITION BY s.doc_id ORDER BY f.df, s.h) AS rn
    FROM sh s JOIN freq f ON f.h = s.h
  ) WHERE rn <= 5
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
cand AS (
  -- threshold degrades to the smaller doc's shingle count so tiny docs
  -- keep recall 1.0 (mirrors operators/dedup.py containment_pairs)
  SELECT id_a, id_b FROM (
    SELECT DISTINCT least(r.doc_id, s.doc_id) AS id_a,
                    greatest(r.doc_id, s.doc_id) AS id_b, r.h
    FROM rare r JOIN sh s ON s.h = r.h AND s.doc_id <> r.doc_id
  )
  JOIN sizes sca ON sca.doc_id = id_a
  JOIN sizes scb ON scb.doc_id = id_b
  GROUP BY id_a, id_b
  HAVING count(*) >= least(2, min(sca.n_sh), min(scb.n_sh))
)"""


def _containment_sql() -> str:
    return f"""
{_containment_ctes()},
common AS (
  SELECT c.id_a, c.id_b, count(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.h = a.h
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       CAST(common AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)
         AS containment,
       CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE)
         AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.5
"""


@register("dedup_containment", _containment_sql())
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), n=3, k_rare=5, min_blocks=2,
        threshold=0.5,
    )


def _containment_recall_sql() -> str:
    return f"""
{_containment_ctes()},
allc AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
exact AS (
  SELECT c.id_a, c.id_b FROM allc c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE CAST(common AS DOUBLE) / CAST(least(sa.n_sh, sb.n_sh) AS DOUBLE)
        >= 0.5
)
SELECT count(*) AS n_true_pairs,
       CAST(coalesce(sum(CASE WHEN k.id_a IS NOT NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_recalled,
       CASE WHEN count(*) = 0 THEN 1.0
            ELSE round(CAST(sum(CASE WHEN k.id_a IS NOT NULL THEN 1 ELSE 0
                                END) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) END AS recall
FROM exact e LEFT JOIN cand k ON k.id_a = e.id_a AND k.id_b = e.id_b
"""


@register("dedup_containment_recall", _containment_recall_sql())
def q_dedup_containment_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Completes the recall-audit family (lsh / simhash / containment):
    # measured share of true containment>=0.5 pairs (exact shingle
    # equi-join ground truth — no rare-blocking) recovered by the
    # rare-shingle candidate generator. Expected 1.0: each doc's
    # k_rare=5 rarest shingles are all in any superset, and tiny docs
    # degrade the block threshold (ADVICE r6 fix) — a lower reading
    # flags a blocking bug. QA scale, like the other recall audits.
    from ..operators.dedup import containment_candidate_recall

    return containment_candidate_recall(
        _t(spark, sf_dir, "documents"), n=3, k_rare=5, min_blocks=2,
        threshold=0.5,
    )


# ---------------------------------------------------------------------------
# zorder_cluster — Morton-interleaved clustering audit: bucket rows by
# the z-value of (partkey, suppkey) low bits and show each bucket's
# min/max envelope in BOTH dimensions — the footer-stats tightness that
# makes 2-D file pruning work after a ZORDER BY rewrite. Bit arithmetic
# only, so parity with the oracle is exact.
# ---------------------------------------------------------------------------


def _zorder_sql() -> str:
    from ..functions.zorder import morton_interleave_sql

    z = morton_interleave_sql("l_partkey % 1024", "l_suppkey % 1024")
    return f"""
SELECT ({z} >> 12) AS bucket,
       count(*) AS n,
       min(l_partkey % 1024) AS px_lo, max(l_partkey % 1024) AS px_hi,
       min(l_suppkey % 1024) AS sy_lo, max(l_suppkey % 1024) AS sy_hi
FROM lineitem
GROUP BY 1
"""


@register("zorder_cluster", _zorder_sql())
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    # functions/zorder.py: magic-number bit spreading, pure JVM
    # shiftleft/AND inside codegen; `zorder_by` range-partitions on the
    # same z-value for the actual layout rewrite.
    from ..functions.zorder import morton_interleave

    li = _t(spark, sf_dir, "lineitem")
    z = morton_interleave(F.col("l_partkey") % 1024, F.col("l_suppkey") % 1024)
    return (
        li.select(
            F.shiftright(z, 12).alias("bucket"),
            (F.col("l_partkey") % 1024).alias("px"),
            (F.col("l_suppkey") % 1024).alias("sy"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("px").alias("px_lo"),
            F.max("px").alias("px_hi"),
            F.min("sy").alias("sy_lo"),
            F.max("sy").alias("sy_hi"),
        )
    )
