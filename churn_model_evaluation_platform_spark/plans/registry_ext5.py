"""Round-2 registry extensions: reference model-quality parity,
evaluation artifacts (ROC/PR/confusion), composed LSH-verified dedup,
multi-probe ANN.

Same conventions as registry.py: every computed column aliased
identically on both engines; order-dependent float aggregates rounded
on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register


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
