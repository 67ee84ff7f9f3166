"""Round-6 registry extensions: measured quality for the approximate
dedup path (VERDICT r5 #5) and multimodal breadth.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import dedup
from ..sources.testdata import load_table
from .registry import register
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
       round(CAST(count(c.id_a) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS recall
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
