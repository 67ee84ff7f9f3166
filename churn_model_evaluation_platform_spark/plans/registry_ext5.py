"""Round-2 registry extensions: reference model-quality parity,
evaluation artifacts (ROC/PR/confusion), composed LSH-verified dedup,
multi-probe ANN.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
# §2.C — reference model-quality parity (VERDICT r1 top-next)
# ---------------------------------------------------------------------------


@register("train_eval_churn")  # rows-only: model training, not SQL-expressible
def q_train_eval_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the engine's full Spark pipeline on the reference's own
    churn data and report holdout P/R/F1 next to the published targets
    (churn_model_training.py:335-376; published scores
    churn_model_training.ipynb cell 19 = 0.92/0.81/0.86)."""
    from ..ml.parity import train_eval_frame

    return train_eval_frame(spark)


# ---------------------------------------------------------------------------
# LLM-pipeline dedup — the composed scale path (VERDICT r1 #4)
# ---------------------------------------------------------------------------


@register(
    "dedup_lsh_verified",
    f"""
{_SHINGLE_HASH_CTE},
sigs AS ({_MINHASH_SELECT}),
banded AS (SELECT sigs.*, {_BAND_KEYS_SQL} FROM sigs),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({_BAND_MATCH_SQL})
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, count(*) AS common
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.h = a.h
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.1
""",
)
def q_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Banded-LSH candidates → exact array_intersect Jaccard on the
    # candidates only — the near-linear 100 TB dedup path.
    return dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.1
    )
