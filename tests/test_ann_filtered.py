"""Filtered ANN (round 9, VERDICT r8 next #4): predicate-constrained
top-k through the IVF path — correctness of the composition and the
MEASURED recall under filtering (selectivity shrinks cells, so the
filtered recall curve is its own evidence, not the unfiltered one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import similarity
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_filtered_results_satisfy_the_predicate(spark, emb):
    out = similarity.cosine_topk_ivf_pinned(
        emb, 16, 4, 10, candidate_filter=F.col("label") == 1
    )
    labels = {
        r["label"]
        for r in out.join(emb.select("vec_id", "label"), "vec_id").collect()
    }
    assert labels == {1}


def test_full_probe_filtered_equals_filtered_exact(spark, emb, qvec):
    """nprobe == n_cells degrades to the exact filtered baseline — the
    machinery adds no error of its own."""
    pred = F.col("label") == 1
    exact = _ids(
        similarity.cosine_topk(emb.where(pred), qvec, 10, exclude_id=0)
    )
    full = _ids(
        similarity.cosine_topk_ivf_pinned(
            emb, 16, 16, 10, candidate_filter=pred
        )
    )
    assert full == exact


def test_filtered_recall_floor_and_monotone(spark, emb, qvec):
    """Measured recall under filtering: rises with nprobe, hits 1.0 at
    full probe, and clears a floor at the half-probe point. (At this
    corpus size the pinned random-sample quantizer measures 0.4/0.6/1.0
    at nprobe 4/8/16 — recorded, not asserted exactly, because the
    floor must survive testdata regeneration.)"""
    pred = F.col("label") == 1
    exact = set(
        _ids(similarity.cosine_topk(emb.where(pred), qvec, 10, exclude_id=0))
    )
    recalls = {}
    for nprobe in (4, 8, 16):
        got = set(
            _ids(
                similarity.cosine_topk_ivf_pinned(
                    emb, 16, nprobe, 10, candidate_filter=pred
                )
            )
        )
        recalls[nprobe] = len(exact & got) / len(exact)
    assert recalls[4] <= recalls[8] <= recalls[16] == 1.0
    assert recalls[8] >= 0.5, recalls


def test_filter_composes_with_kmeans_ivf(spark, emb, qvec):
    """The production (seeded-KMeans) path takes the same filter."""
    pred = F.col("label") == 2
    cents = similarity.fit_ivf_centroids(emb, n_cells=8, seed=42)
    out = similarity.cosine_topk_ivf(
        emb, qvec, cents, k=5, nprobe=8, exclude_id=0, candidate_filter=pred
    )
    exact = _ids(similarity.cosine_topk(emb.where(pred), qvec, 5, exclude_id=0))
    assert _ids(out) == exact  # full probe == exact, filtered


def test_filter_is_pushed_into_the_scan(spark, emb, qvec):
    """The predicate must reach the source, not sit above the
    assignment expression: PushedFilters carries the label predicate."""
    out = similarity.cosine_topk_ivf_pinned(
        emb, 16, 4, 10, candidate_filter=F.col("label") == 1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "label" in plan.split("PushedFilters")[1][:200]
