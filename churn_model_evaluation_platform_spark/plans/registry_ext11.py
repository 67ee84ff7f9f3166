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
from .registry import register


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
