"""Product quantization (operators/similarity.py pq_*): pinned
codebooks, encoding, ADC top-k, and the recall audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import similarity as S
from churn_model_evaluation_platform_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF)


@pytest.fixture(scope="module")
def cbs(emb):
    return S.pq_codebooks_pinned(emb, m=4, ks=8)


def test_codebook_shape(cbs):
    assert len(cbs) == 4
    assert all(len(cb) == 8 for cb in cbs)
    assert all(len(c) == 16 for cb in cbs for c in cb)


def test_codebook_rows_encode_to_themselves(emb, cbs):
    """Corpus vectors 1..8 ARE the codebook: each must encode to its
    own code in every subspace (distance exactly 0 beats everything)."""
    enc = S.pq_encode(emb, cbs)
    rows = {
        r["vec_id"]: list(r["pq_code"])
        for r in enc.where(F.col("vec_id").between(1, 8))
        .select("vec_id", "pq_code")
        .collect()
    }
    for i in range(1, 9):
        assert rows[i] == [i - 1] * 4, (i, rows[i])


def test_codes_in_range(emb, cbs):
    enc = S.pq_encode(emb, cbs)
    bad = enc.where(
        ~F.forall("pq_code", lambda c: (c >= 0) & (c < 8))
        | (F.size("pq_code") != 4)
    ).count()
    assert bad == 0


def test_adc_topk_scans_codes_only(emb, cbs):
    """The ADC plan must not reference the embedding column — that's
    the compression point: drop it and the query still runs."""
    enc = S.pq_encode(emb, cbs).select("vec_id", "pq_code")  # embedding GONE
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    out = S.pq_adc_topk(enc, qvec, cbs, k=5, exclude_id=0)
    rows = out.collect()
    assert len(rows) == 5
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)
    assert all(d >= -1e-9 for d in dists)  # squared distances


def test_recall_bounds_and_anchor(emb):
    r = S.pq_recall_pinned(emb, query_ids=(0, 101), m=4, ks=8, k=10).first()
    assert r["n_exact"] == 20
    assert 0.0 <= r["recall"] <= 1.0
    assert r["n_hits"] <= r["n_exact"]


def test_rerank_full_shortlist_is_exact(emb, cbs):
    """The audit's built-in sanity anchor: a shortlist covering the
    whole corpus makes the two-stage query degrade to the exact
    baseline — recall must be exactly 1.0."""
    n = emb.count()
    r = S.pq_recall_pinned(emb, query_ids=(0, 101), k=10).first()
    full = S.pq_recall(
        emb,
        cbs,
        query_ids=(0, 101),
        k=10,
        rerank=True,
    )
    # rerank's default shortlist is 4k; force full coverage instead
    from churn_model_evaluation_platform_spark.operators.similarity import (
        pq_adc_topk_rerank,
        pq_encode,
        cosine_topk,
    )

    enc = pq_encode(emb, cbs)
    qvec = [
        float(v)
        for v in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    got = {
        r2["vec_id"]
        for r2 in pq_adc_topk_rerank(
            enc, qvec, cbs, k=10, shortlist=n, exclude_id=0
        ).collect()
    }
    want = {
        r2["vec_id"]
        for r2 in cosine_topk(emb, qvec, 10, exclude_id=0).collect()
    }
    assert got == want
    # and the shortlist monotonicity floor: rerank >= code-only ADC
    assert full.first()["recall"] >= r["recall"] - 1e-9


def test_kmeans_codebooks_shape(emb):
    cbs = S.fit_pq_codebooks(emb, m=4, ks=4)
    assert len(cbs) == 4 and all(len(cb) == 4 for cb in cbs)
    assert all(len(c) == 16 for cb in cbs for c in cb)
    # deterministic under the same seed
    cbs2 = S.fit_pq_codebooks(emb, m=4, ks=4)
    assert cbs == cbs2


def test_validation_errors(emb):
    with pytest.raises(ValueError, match="not divisible"):
        S.pq_codebooks_pinned(emb, m=7, ks=8)
    with pytest.raises(ValueError, match="lacks required"):
        S.pq_codebooks_pinned(emb.where(F.col("vec_id") > 3), m=4, ks=8)
    with pytest.raises(ValueError, match="lacks query"):
        S.pq_recall_pinned(emb, query_ids=(999999,), m=4, ks=8)
