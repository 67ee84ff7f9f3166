"""SemDeDup-style clustered semantic dedup
(operators/dedup.py semantic_dedup_clustered): kmeans-bucketed
upper-triangular cosine filter — the published SemDeDup
implementation's shape (Abbas et al. 2023, arXiv:2303.09540). The
exact-oracle hash lives in the registry (dedup_semantic_clustered);
here: the structural invariants and the degenerate cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.dedup import (
    semantic_dedup_clustered,
)


@pytest.fixture()
def cents():
    # two well-separated unit centroids in 4-d
    return [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_exact_duplicates_keep_exactly_one(spark, cents):
    df = _df(
        spark,
        [
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),  # exact dup of 1
            (3, [0.9, 0.1, 0.0, 0.0]),  # exact dup of 1
            (4, [0.0, 0.1, 0.0, 0.9]),  # other cluster, alone
        ],
    )
    out = {r["vec_id"]: r.asDict() for r in semantic_dedup_clustered(
        df, cents, threshold=0.99
    ).collect()}
    kept = sorted(i for i, r in out.items() if r["keep"])
    # equal distance to centroid -> rank ties break on id: 1 survives
    assert kept == [1, 4]
    assert out[2]["max_sim_prior"] == pytest.approx(1.0)
    assert out[1]["max_sim_prior"] is None  # rank-1 of its cluster
    assert out[4]["max_sim_prior"] is None
    assert out[1]["cluster_id"] == 0 and out[4]["cluster_id"] == 1


def test_farthest_from_centroid_is_the_kept_representative(spark, cents):
    # two near-identical vectors at different centroid distances: the
    # FARTHER one ranks first and survives (SemDeDup's representative)
    df = _df(
        spark,
        [
            (10, [0.99, 0.01, 0.0, 0.0]),  # close to centroid 0
            (11, [0.60, 0.02, 0.0, 0.0]),  # same direction, farther out
        ],
    )
    out = {r["vec_id"]: r["keep"] for r in semantic_dedup_clustered(
        df, cents, threshold=0.9
    ).collect()}
    assert out == {11: True, 10: False}


def test_below_threshold_keeps_everything(spark, cents):
    df = _df(
        spark,
        [
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.1, 0.9, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.2, 0.9]),
        ],
    )
    out = semantic_dedup_clustered(df, cents, threshold=0.999)
    assert all(r["keep"] for r in out.collect())


def test_invariants_on_corpus(spark, sf_dir_small, cents_unused=None):
    emb = spark.read.parquet(f"{sf_dir_small}/embeddings.parquet")
    cmap = {
        r["vec_id"]: [float(v) for v in r["embedding"]]
        for r in emb.where(F.col("vec_id").between(1, 8)).collect()
    }
    cents = [cmap[j] for j in range(1, 9)]
    out = semantic_dedup_clustered(emb, cents, threshold=0.35)
    rows = out.collect()
    assert len(rows) == emb.count()  # one verdict per vector
    for r in rows:
        if r["max_sim_prior"] is None:
            assert r["keep"]  # each cluster's rank-1 point
        else:
            assert r["keep"] == (r["max_sim_prior"] < 0.35)
    # deterministic: a second run is identical
    again = {
        (r["vec_id"]): (r["cluster_id"], r["keep"])
        for r in semantic_dedup_clustered(
            emb, cents, threshold=0.35
        ).collect()
    }
    assert again == {
        r["vec_id"]: (r["cluster_id"], r["keep"]) for r in rows
    }


@pytest.fixture()
def sf_dir_small():
    return "/root/testdata/sf0.001"
