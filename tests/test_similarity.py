"""Similarity search: exact cosine on hand-computable vectors + LSH."""

from __future__ import annotations

import math

import pytest

from churn_model_evaluation_platform_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
)


@pytest.fixture
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),   # parallel → cos 1
        (2, [1.0, 1.0, 0.0]),   # 45° → cos √2/2
        (3, [0.0, 1.0, 0.0]),   # orthogonal → cos 0
        (4, [-1.0, 0.0, 0.0]),  # opposite → cos -1
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact_values(vecs):
    out = cosine_topk(vecs, [1.0, 0.0, 0.0], k=4, exclude_id=0).collect()
    got = [(r["vec_id"], r["cosine_sim"]) for r in out]
    assert got[0] == (1, pytest.approx(1.0))
    assert got[1] == (2, pytest.approx(math.sqrt(2) / 2))
    assert got[2] == (3, pytest.approx(0.0))
    assert got[3] == (4, pytest.approx(-1.0))


def test_cosine_topk_k_limits(vecs):
    out = cosine_topk(vecs, [1.0, 0.0, 0.0], k=2, exclude_id=0).collect()
    assert [r["vec_id"] for r in out] == [1, 2]


def test_lsh_results_subset_of_exact(spark):
    import random

    rng = random.Random(5)
    dim = 16
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[0][1]
    exact = {r["vec_id"]: r["cosine_sim"]
             for r in cosine_topk(df, q, k=200, exclude_id=0).collect()}
    approx = cosine_topk_lsh(df, q, k=10, n_planes=4, exclude_id=0).collect()
    assert len(approx) > 0
    for r in approx:
        assert r["cosine_sim"] == pytest.approx(exact[r["vec_id"]])
    # bucket sharing ⇒ the returned neighbors skew similar, and the top
    # LSH hit should be a genuinely close neighbor in the exact ranking
    top_exact = sorted(exact.values(), reverse=True)[:50]
    assert approx[0]["cosine_sim"] >= top_exact[-1]


def test_multiprobe_recall_beats_single_probe(spark):
    """Recall-pinned multi-probe contract (mirrors tests/test_ivf.py):
    on clustered data, 4-plane/8-probe sign-LSH recovers >= 0.8 of the
    exact top-10; single-probe recovers no more than multi-probe."""
    import random

    from churn_model_evaluation_platform_spark.operators.similarity import (
        multiprobe_buckets,
        random_hyperplanes,
    )

    rng = random.Random(11)
    dim = 16
    # query cluster (40 near-dups of the query) + background noise
    q = [rng.gauss(0, 1) for _ in range(dim)]
    rows = [(i, [v + rng.gauss(0, 0.35) for v in q]) for i in range(1, 41)]
    rows += [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(41, 400)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {r["vec_id"] for r in cosine_topk(df, q, k=10).collect()}

    def recall(n_probes: int) -> float:
        got = {
            r["vec_id"]
            for r in cosine_topk_lsh(
                df, q, k=10, n_planes=4, n_probes=n_probes, seed=42
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 >= 0.8
    assert r8 >= r1
    # the probe sequence is cost-ordered and starts at the base bucket
    planes = random_hyperplanes(dim, 4, seed=42)
    probes = multiprobe_buckets(q, planes, 8)
    assert len(set(probes)) == 8
    margins = [sum(a * b for a, b in zip(q, p)) for p in planes]
    assert probes[0] == sum(1 << i for i, d in enumerate(margins) if d > 0)


def test_embedding_drift_identity_and_shift(spark):
    from churn_model_evaluation_platform_spark.operators.similarity import (
        embedding_drift,
    )

    a = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.2])], ["vec_id", "embedding"]
    )
    # identical corpora → centroids coincide → cosine 1.0
    assert embedding_drift(a, a).first()["centroid_cosine"] == pytest.approx(1.0)
    # orthogonal shift → cosine ~0
    b = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [-0.2, 1.0])], ["vec_id", "embedding"]
    )
    shifted = embedding_drift(a, b).first()["centroid_cosine"]
    assert abs(shifted) < 0.15


def test_embedding_outliers_survives_constant_dimension(spark):
    """A zero-variance dimension must not null (Spark x/0→NULL) or inf
    (DuckDB) the whole score — the clamped divisor keeps every score
    finite and the ranking driven by the live dimensions (ADVICE r6)."""
    from churn_model_evaluation_platform_spark.operators.similarity import (
        embedding_outliers,
    )

    rows = [
        (1, [5.0, 0.0]),
        (2, [5.0, 0.1]),
        (3, [5.0, -0.1]),
        (4, [5.0, 9.0]),  # the outlier, visible only in dim 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = embedding_outliers(df, k=4).collect()
    scores = {r.vec_id: r.score for r in out}
    assert len(scores) == 4
    assert all(s is not None and math.isfinite(s) for s in scores.values())
    assert out[0].vec_id == 4  # dim-1 outlier still tops the ranking
