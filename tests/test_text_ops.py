"""BM25 ranked retrieval (operators/text.py:bm25_topk)."""

from __future__ import annotations

def test_bm25_hand_computed(spark):
    """3-doc corpus, hand-checkable: a doc matching both terms with a
    short length outranks a longer single-term doc; docs matching no
    term are absent."""
    import math

    from pyspark.sql import Row

    from churn_model_evaluation_platform_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="hash join hash"),
            Row(doc_id=2, text="join scan scan scan scan scan"),
            Row(doc_id=3, text="scan filter"),
        ]
    )
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["hash", "join"], k=10).collect()}
    assert set(out) == {1, 2}  # doc 3 matches nothing
    assert out[1]["n_terms_matched"] == 2
    assert out[2]["n_terms_matched"] == 1
    assert out[1]["bm25"] > out[2]["bm25"]
    # hand-compute doc 1: N=3, avgdl=(3+6+2)/3
    k1, b = 1.2, 0.75
    avgdl = 11 / 3
    def w(tf, df, dl):
        idf = math.log(1 + (3 - df + 0.5) / (df + 0.5))
        return round(idf * tf * (k1 + 1) / (tf + k1 * (0.25 + b * dl / avgdl)), 6)
    want = round(w(2, 1, 3) + w(1, 2, 3), 6)
    assert math.isclose(out[1]["bm25"], want, abs_tol=2e-6)


def test_bm25_empty_terms_raises(spark):
    import pytest

    from churn_model_evaluation_platform_spark.operators.text import bm25_topk

    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(spark.range(1).selectExpr("id doc_id", "'x' text"), [])
