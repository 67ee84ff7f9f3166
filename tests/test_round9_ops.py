"""Round-6 batch-5 semantics: incremental dedup gating and the ranking
metric formulas, pinned on hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.dedup import (
    incremental_dedup,
)


def test_incremental_dedup_statuses_and_precedence(spark):
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " x y"  # high jaccard
    fresh = " ".join(f"z{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(1, base), (3, "other doc entirely " * 10)],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, base),  # exact dup of corpus doc 1
            (11, near),  # near dup of corpus doc 1
            (12, fresh),  # brand new
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.status
        for r in incremental_dedup(corpus, incoming, threshold=0.1).collect()
    }
    assert out == {10: "exact_dup", 11: "near_dup", 12: "kept"}


def test_incremental_dedup_ignores_incoming_vs_incoming(spark):
    # Two identical docs in the SAME incoming batch are not each other's
    # duplicates for this gate (intra-batch dedup is dedup_exact's job).
    doc = "alpha beta gamma delta " * 5
    corpus = spark.createDataFrame([(1, "unrelated " * 20)], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(10, doc), (11, doc)], "doc_id long, text string"
    )
    out = {r.doc_id: r.status for r in incremental_dedup(corpus, incoming).collect()}
    assert out == {10: "kept", 11: "kept"}


def test_map_mrr_formula_on_known_ranking(spark):
    # One user, 4 items ranked by proba desc: rel pattern [1, 0, 1, 0]
    # → AP@10 = (1/1 + 2/3) / 2 = 5/6; MRR = 1.
    from churn_model_evaluation_platform_spark.plans.registry_ext9 import (
        q_ranking_map_mrr,  # noqa: F401  (registration)
    )
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(1, 1, 0.9), (1, 0, 0.8), (1, 1, 0.7), (1, 0, 0.6)],
        "user_id long, rel int, proba double",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("proba").desc())
    ranked = df.select("user_id", "rel", F.row_number().over(w).alias("rk"))
    wc = (
        Window.partitionBy("user_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pr = ranked.select(
        "user_id", "rk", "rel", F.sum("rel").over(wc).alias("cum_rel")
    )
    row = (
        pr.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("rk") <= 10) & (F.col("rel") == 1),
                    F.col("cum_rel").cast("double") / F.col("rk"),
                ).otherwise(F.lit(0.0))
            ).alias("ap_num"),
            F.sum("rel").alias("n_pos"),
            F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("first_rel"),
        )
        .collect()[0]
    )
    assert abs(row.ap_num / min(row.n_pos, 10) - 5 / 6) < 1e-12
    assert row.first_rel == 1
