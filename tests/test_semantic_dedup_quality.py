"""SemDeDup production fit + quality audit (operators/dedup.py
semantic_dedup_recall, round 12, VERDICT r11 next #2): measured
dup-detection quality of the seeded-KMeans clustered pass vs exact
all-pairs ground truth, the audit CATCHING an out-of-regime threshold,
and correctness under a deliberately skewed mega-cluster (the
Σ|cluster|² bound's worst case)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.dedup import (
    semantic_dedup_clustered,
    semantic_dedup_recall,
)
from churn_model_evaluation_platform_spark.operators.similarity import (
    fit_ivf_centroids,
    ivf_cell_expr,
)

SF_DIR = "/root/testdata/sf0.01"


def _audit_corpus(spark):
    from churn_model_evaluation_platform_spark.plans.registry_ext17 import (
        _semantic_audit_corpus,
    )

    return _semantic_audit_corpus(spark, SF_DIR)


@pytest.fixture(scope="module")
def fitted(spark):
    corpus = _audit_corpus(spark)
    cents = fit_ivf_centroids(corpus, n_cells=8, seed=42)
    return corpus, cents


def test_quality_floors_at_operating_threshold(fitted):
    """The planted near-dup pairs (cosine ≈ 0.9999) are the ground
    truth at τ=0.9; the fitted quantizer must co-cluster essentially
    all of them and agree with the exact single-cluster run."""
    corpus, cents = fitted
    r = semantic_dedup_recall(corpus, cents, threshold=0.9).collect()[0]
    assert r["n_dup_pairs"] >= 100  # every 5th of 500 vectors planted
    assert r["pair_recall"] >= 0.95
    assert r["keep_agreement"] >= 0.95
    assert r["n_removed_clustered"] >= 95


def test_audit_catches_out_of_regime_threshold(fitted):
    """τ=0.35 sits in the random-similarity tail of this corpus
    (inter-label p99 ≈ 0.29, max ≈ 0.51): 'duplicates' at that level
    have no cluster structure, and the audit must EXPOSE that as low
    pair recall instead of letting the config ship."""
    corpus, cents = fitted
    r = semantic_dedup_recall(corpus, cents, threshold=0.35).collect()[0]
    assert r["n_dup_pairs"] > 300  # the tail is dense down here
    assert r["pair_recall"] < 0.6  # clustering cannot see these pairs


def _skewed_corpus(spark, n_blob=300, n_scatter=60, dim=8):
    """One tight mega-blob (near-identical vectors around a center,
    ~83% of the corpus) + deterministic scattered points — the skew
    shape the Σ|cluster|² docstring claim is about."""
    rows = []
    for i in range(n_blob):
        base = [1.0, 2.0, -1.0, 0.5, 0.0, 3.0, -2.0, 1.5]
        # tiny deterministic perturbation: keeps cosine to the center
        # ≈ 1 (a genuine near-dup group), distinct ranks via vec norm
        rows.append(
            (i, [v * (1.0 + 0.0001 * (i % 17)) + 0.00001 * i for v in base])
        )
    for j in range(n_scatter):
        # spread over orthants: no two scattered points are near-dups
        vec = [
            math.cos(0.7 * j + k) * (2.0 + (j % 5))
            for k in range(dim)
        ]
        rows.append((10_000 + j, vec))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _python_replay(corpus, cents, threshold):
    """Brute-force per-cluster replay of the SemDeDup rule: assign by
    nearest centroid (same dot identity and tie order as
    ivf_cell_expr), rank distance-to-own-centroid DESC then id, drop a
    point iff max cosine to any earlier-ranked cluster member reaches
    the threshold."""

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    rows = [
        (r["vec_id"], list(r["embedding"])) for r in corpus.collect()
    ]
    clusters: dict[int, list] = {}
    for vid, v in rows:
        d2s = [
            dot(v, v) - 2 * dot(v, c) + dot(c, c) for c in cents
        ]
        cid = d2s.index(min(d2s))
        clusters.setdefault(cid, []).append((vid, v, d2s[cid]))
    expect = {}
    for members in clusters.values():
        ranked = sorted(members, key=lambda t: (-t[2], t[0]))
        for i, (vid, v, _) in enumerate(ranked):
            ms = max(
                (cos(pv, v) for _, pv, _ in ranked[:i]), default=None
            )
            expect[vid] = ms is None or ms < threshold
    return expect


def test_mega_cluster_skew_correct_and_bounded(spark):
    corpus = _skewed_corpus(spark)
    cents = fit_ivf_centroids(corpus, n_cells=4, seed=7)
    # the fixture really is skewed: one cluster holds >= 75% of rows
    sizes = (
        corpus.select(
            ivf_cell_expr(F.col("embedding"), cents).alias("cid")
        )
        .groupBy("cid")
        .count()
        .collect()
    )
    by_cid = {r["cid"]: r["count"] for r in sizes}
    n = sum(by_cid.values())
    assert max(by_cid.values()) >= 0.75 * n
    # Σ|cluster|² pairwise bound: the quadratic term is the mega
    # cluster's — still far below the all-pairs n², which is the whole
    # SemDeDup argument; pin the arithmetic the docstring claims
    pair_work = sum(c * (c - 1) // 2 for c in by_cid.values())
    assert pair_work < n * (n - 1) // 2  # strictly under all-pairs
    out = semantic_dedup_clustered(
        corpus, cents, threshold=0.99
    ).collect()
    kept = {r["vec_id"] for r in out if r["keep"]}
    # the mega-blob collapses to ONE representative (every member's
    # cosine to any other is ~1 > 0.99)
    blob_ids = set(range(300))
    assert len(blob_ids & kept) == 1
    # and the whole output equals a per-cluster brute-force Python
    # replay of the SemDeDup rule — correctness is unchanged by skew
    assert {
        r["vec_id"]: r["keep"] for r in out
    } == _python_replay(corpus, cents, threshold=0.99)


def test_exact_single_cluster_run_is_the_ground_truth(spark):
    """semantic_dedup_recall's 'exact' arm is the operator with ONE
    mean centroid — verify it equals a brute-force python replay of
    the SemDeDup rule on a small corpus."""
    corpus = _skewed_corpus(spark, n_blob=20, n_scatter=10)
    rows = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in corpus.collect()
    )
    dim = 8
    mean = [
        sum(v[k] for _, v in rows) / len(rows) for k in range(dim)
    ]

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    # rank: distance to mean DESC, id ASC — the operator's rule
    ranked = sorted(
        rows,
        key=lambda iv: (
            -(
                dot(iv[1], iv[1])
                - 2 * dot(iv[1], mean)
                + dot(mean, mean)
            ),
            iv[0],
        ),
    )
    expect_keep = {}
    for i, (vid, v) in enumerate(ranked):
        ms = max(
            (cos(pv, v) for _, pv in ranked[:i]), default=None
        )
        expect_keep[vid] = ms is None or ms < 0.99
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup_clustered(
            corpus, [mean], threshold=0.99
        ).collect()
    }
    assert got == expect_keep
