"""Evaluation-curve artifacts: ROC / PR points, confusion matrix, AUC.

The mlflow-less counterpart of the reference's evaluation suite
(churn_model_training.py:144-168 logs ROC/PR/confusion plots and
metrics to MLflow): the same information as DataFrames, computed with
the engine's scalable primitives.

Scale design:
- One ``groupBy(score)`` aggregation first — the shuffle carries
  (score, pos_count, neg_count), i.e. DISTINCT-SCORE cardinality, never
  the scored rows themselves.
- Cumulative tp/fp across thresholds via ``partitioned_prefix_sum``
  (range-partitioned, tie-aware) — no single-reducer global window even
  with billions of distinct scores.
- AUC by the Mann-Whitney U identity with midrank tie correction —
  AUC = (Σ_g pos_g · midrank_g − P(P+1)/2) / (P·N) — one prefix sum +
  one aggregation; algebraically equal to trapezoidal integration of
  the tie-plateau ROC. Midranks are exact multiples of 0.5, so the
  float accumulation is exact and cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import partitioned_prefix_sum


def _score_counts(
    df: DataFrame, label_col: str, score_col: str, positive: int
) -> DataFrame:
    return df.groupBy(score_col).agg(
        F.sum((F.col(label_col) == positive).cast("long")).alias("pos"),
        F.sum((F.col(label_col) != positive).cast("long")).alias("neg"),
    )


def roc_pr_points(
    df: DataFrame,
    label_col: str = "churn",
    score_col: str = "proba",
    positive: int = 1,
) -> DataFrame:
    """One row per distinct score, the threshold sweep of ``pred =
    score >= threshold``: (threshold, tp, fp, fn, tn, tpr, fpr,
    precision, recall). ROC plots (fpr, tpr); PR plots (recall,
    precision)."""
    counts = _score_counts(df, label_col, score_col, positive)
    # cumulate over scores >= threshold: prefix-sum ascending on -score
    ps = partitioned_prefix_sum(
        counts.withColumn("__neg_score", -F.col(score_col)),
        "__neg_score",
        ["pos", "neg"],
        with_totals=True,
    )
    tp = F.col("cum_pos")
    fp = F.col("cum_neg")
    p = F.col("tot_pos")
    n = F.col("tot_neg")
    prec = F.when(tp + fp == 0, F.lit(0.0)).otherwise(
        tp.cast("double") / (tp + fp)
    )
    return ps.select(
        F.col(score_col).alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        (p - tp).alias("fn"),
        (n - fp).alias("tn"),
        (tp.cast("double") / p).alias("tpr"),
        (fp.cast("double") / n).alias("fpr"),
        prec.alias("precision"),
        (tp.cast("double") / p).alias("recall"),
    )


def auc_roc(
    df: DataFrame,
    label_col: str = "churn",
    score_col: str = "proba",
    positive: int = 1,
) -> DataFrame:
    """Single-row (auc) — Mann-Whitney U with midrank tie correction."""
    counts = _score_counts(df, label_col, score_col, positive).withColumn(
        "n_g", F.col("pos") + F.col("neg")
    )
    ps = partitioned_prefix_sum(counts, score_col, ["n_g"], with_totals=False)
    midrank = F.col("cum_n_g") - (F.col("n_g") - 1) / F.lit(2.0)
    agg = ps.agg(
        F.sum(F.col("pos") * midrank).alias("s"),
        F.sum("pos").alias("p"),
        F.sum("n_g").alias("nn"),
    )
    p = F.col("p")
    return agg.select(
        (
            (F.col("s") - p * (p + 1) / F.lit(2.0))
            / (p.cast("double") * (F.col("nn") - p))
        ).alias("auc")
    )
