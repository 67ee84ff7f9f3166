"""IVF similarity search: recall vs the exact brute-force baseline, cell
assignment completeness, and exactness when every cell is probed."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    fit_ivf_centroids,
    ivf_cell_expr,
)

DIM = 8
N = 400


@pytest.fixture(scope="module")
def emb_df(spark):
    # Three well-separated gaussian clusters so KMeans cells are stable.
    rng = random.Random(7)
    centers = [[5.0] * DIM, [-5.0] * DIM, [5.0 if i % 2 else -5.0 for i in range(DIM)]]
    rows = [
        (i, [rng.gauss(centers[i % 3][j], 1.0) for j in range(DIM)])
        for i in range(N)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def _query_vec(emb_df):
    return [float(v) for v in emb_df.where(F.col("vec_id") == 1).first()["embedding"]]


def test_cells_partition_corpus(spark, emb_df):
    cents = fit_ivf_centroids(emb_df, n_cells=3, seed=42)
    celled = emb_df.withColumn("c", ivf_cell_expr(F.col("embedding"), cents))
    assert celled.where(F.col("c").isNull()).count() == 0
    assert celled.count() == N
    ids = [r["c"] for r in celled.select("c").distinct().collect()]
    assert set(ids) <= set(range(3))


def test_full_probe_equals_exact(spark, emb_df):
    q = _query_vec(emb_df)
    cents = fit_ivf_centroids(emb_df, n_cells=3, seed=42)
    exact = [r["vec_id"] for r in cosine_topk(emb_df, q, k=10, exclude_id=1).collect()]
    ivf = [
        r["vec_id"]
        for r in cosine_topk_ivf(
            emb_df, q, cents, k=10, nprobe=3, exclude_id=1
        ).collect()
    ]
    assert ivf == exact


def test_nprobe1_recall_on_clustered_data(spark, emb_df):
    # With clearly separated clusters, the query's own cell holds its true
    # neighbors — recall@10 should be perfect even probing one cell.
    q = _query_vec(emb_df)
    cents = fit_ivf_centroids(emb_df, n_cells=3, seed=42)
    exact = {r["vec_id"] for r in cosine_topk(emb_df, q, k=10, exclude_id=1).collect()}
    ivf = {
        r["vec_id"]
        for r in cosine_topk_ivf(
            emb_df, q, cents, k=10, nprobe=1, exclude_id=1
        ).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.9


def test_centroids_shape(spark, emb_df):
    cents = fit_ivf_centroids(emb_df, n_cells=4, seed=42)
    assert len(cents) == 4
    assert all(len(c) == DIM and all(math.isfinite(v) for v in c) for c in cents)


def test_pinned_ivf_deterministic_and_prunes(spark, emb_df):
    from churn_model_evaluation_platform_spark.operators.similarity import (
        cosine_topk_ivf_pinned,
    )

    a = cosine_topk_ivf_pinned(emb_df, n_cells=8, nprobe=2, k=10, query_id=1)
    b = cosine_topk_ivf_pinned(emb_df, n_cells=8, nprobe=2, k=10, query_id=1)
    ra = [(r.vec_id, r.cosine_sim) for r in a.collect()]
    rb = [(r.vec_id, r.cosine_sim) for r in b.collect()]
    assert ra == rb  # pinned quantizer → bit-stable across runs
    assert len(ra) == 10
    assert 1 not in [i for i, _ in ra]  # query excluded


def test_pinned_ivf_full_probe_equals_exact(spark, emb_df):
    """nprobe == n_cells degrades to the exact baseline — proves the
    cell assignment loses nothing, only the probe filter approximates."""
    from churn_model_evaluation_platform_spark.operators.similarity import (
        cosine_topk_ivf_pinned,
    )

    q = _query_vec(emb_df)
    exact = [
        r["vec_id"] for r in cosine_topk(emb_df, q, k=10, exclude_id=1).collect()
    ]
    pinned = [
        r.vec_id
        for r in cosine_topk_ivf_pinned(
            emb_df, n_cells=8, nprobe=8, k=10, query_id=1
        ).collect()
    ]
    assert pinned == exact


def test_pinned_ivf_recall_on_clustered_data(spark, emb_df):
    """With cluster-structured data the probed cells hold the true
    neighbors: recall@10 vs exact must be high at nprobe=2 of 8."""
    from churn_model_evaluation_platform_spark.operators.similarity import (
        cosine_topk_ivf_pinned,
    )

    q = _query_vec(emb_df)
    exact = {
        r["vec_id"] for r in cosine_topk(emb_df, q, k=10, exclude_id=1).collect()
    }
    got = {
        r.vec_id
        for r in cosine_topk_ivf_pinned(
            emb_df, n_cells=8, nprobe=2, k=10, query_id=1
        ).collect()
    }
    assert len(got & exact) / len(exact) >= 0.8
