"""Cluster-canonical keep-best selection — argmax semantics, missing
scores, and tie-breaks."""

from __future__ import annotations

from churn_model_evaluation_platform_spark.operators.dedup import (
    keep_best_per_cluster,
)


def test_keep_best_argmax_ties_and_missing(spark):
    comp = spark.createDataFrame(
        [
            (1, 10),  # cluster 10: scores 5, 7 -> keep 2
            (2, 10),
            (3, 30),  # cluster 30: tie 4 == 4 -> keep lowest id 3
            (4, 30),
            (5, 50),  # singleton, no score row at all
            (6, 60),  # cluster 60: one scored, one missing -> scored
            (7, 60),
        ],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 5), (2, 7), (3, 4), (4, 4), (7, -9)],
        "doc_id long, mn long",
    )
    got = {
        r["cluster_id"]: (
            r["n_members"],
            r["n_dropped"],
            r["kept_doc_id"],
            r["kept_score"],
        )
        for r in keep_best_per_cluster(comp, scores).collect()
    }
    assert got == {
        10: (2, 1, 2, 7),
        30: (2, 1, 3, 4),
        50: (1, 0, 5, None),  # unscored cluster reports NULL score
        60: (2, 1, 7, -9),  # any score beats a missing one
    }


def test_keep_best_negative_scores_beat_sentinel(spark):
    comp = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    scores = spark.createDataFrame(
        [(2, -(10**17))], "doc_id long, mn long"
    )
    (row,) = keep_best_per_cluster(comp, scores).collect()
    assert row["kept_doc_id"] == 2
    assert row["kept_score"] == -(10**17)
