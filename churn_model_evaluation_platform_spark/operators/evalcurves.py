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


def calibration_curve(
    df: DataFrame,
    label_col: str = "churn",
    score_col: str = "proba",
    n_bins: int = 10,
    positive: int = 1,
) -> DataFrame:
    """Reliability-diagram points: scores bucketed into ``n_bins``
    equal-width bins over [0, 1]; per bin the mean predicted
    probability vs the observed positive rate. One aggregation pass —
    the shuffle carries ``n_bins`` partial rows after map-side combine.

    Output: (bin, n, mean_predicted, fraction_positive), bin in
    [0, n_bins-1] (score 1.0 closes into the top bin)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col(score_col).cast("double")).alias("mean_predicted"),
            F.avg((F.col(label_col) == positive).cast("double")).alias(
                "fraction_positive"
            ),
        )
    )


def lift_curve(
    df: DataFrame,
    label_col: str = "churn",
    score_col: str = "proba",
    n_buckets: int = 10,
    positive: int = 1,
) -> DataFrame:
    """Decile lift/gain table: rows ranked by score descending, split
    into ``n_buckets`` equal-population buckets; per bucket the
    positive count, cumulative capture rate (gain) and cumulative lift
    vs the base rate.

    No global sort: ``partitioned_prefix_sum`` over the per-score
    counts yields each distinct score's cumulative row count, from
    which the bucket is a pure expression (ceil(B·cum/total)) —
    tie-groups land in one bucket, exactly like rank-based ntile on
    distinct scores."""
    counts = _score_counts(df, label_col, score_col, positive).withColumn(
        "n_g", F.col("pos") + F.col("neg")
    )
    ps = partitioned_prefix_sum(
        counts.withColumn("__neg_score", -F.col(score_col)),
        "__neg_score",
        ["n_g"],
        with_totals=True,
    )
    bucket = F.ceil(F.lit(n_buckets) * F.col("cum_n_g") / F.col("tot_n_g"))
    per_bucket = (
        ps.select(
            bucket.cast("int").alias("bucket"),
            "pos",
            "n_g",
        )
        .groupBy("bucket")
        .agg(F.sum("pos").alias("positives"), F.sum("n_g").alias("n"))
    )
    # cumulative over buckets: at most n_buckets rows — window is trivial
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_pos = F.sum("positives").over(w)
    cum_n = F.sum("n").over(w)
    all_pos = F.sum("positives").over(tot)
    all_n = F.sum("n").over(tot)
    return per_bucket.select(
        "bucket",
        "n",
        "positives",
        (cum_pos.cast("double") / all_pos).alias("gain"),
        (
            (cum_pos.cast("double") / cum_n)
            / (all_pos.cast("double") / all_n)
        ).alias("lift"),
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


def auc_pr(
    df: DataFrame,
    label_col: str = "churn",
    score_col: str = "proba",
    positive: int = 1,
) -> DataFrame:
    """Single-row (auc_pr) — AVERAGE PRECISION, the area under the PR
    curve by right-step integration (sklearn's average_precision_score
    semantics, r9): AP = Σ_i (R_i − R_{i−1}) · P_i over thresholds
    descending. With thresholds at the distinct scores, the recall
    increment of tie group g is pos_g / P, so
    AP = Σ_g (pos_g / P) · cum_pos_g / (cum_pos_g + cum_neg_g) — one
    prefix sum + one aggregation, the exact shape of ``auc_roc``; no
    trapezoid (PR interpolation is ill-defined, per the sklearn doc)."""
    counts = _score_counts(df, label_col, score_col, positive)
    ps = partitioned_prefix_sum(
        counts.withColumn("__neg_score", -F.col(score_col)),
        "__neg_score",
        ["pos", "neg"],
        with_totals=True,
    )
    prec = F.col("cum_pos").cast("double") / (
        F.col("cum_pos") + F.col("cum_neg")
    )
    term = F.col("pos").cast("double") / F.col("tot_pos") * prec
    return ps.agg(F.sum(term).alias("auc_pr"))
