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


# ---------------------------------------------------------------------------
# Luhn-validated credit-card scan (r13)
# ---------------------------------------------------------------------------


def test_luhn_validation_and_redaction(spark):
    from pyspark.sql import functions as F

    from churn_model_evaluation_platform_spark.operators.text import (
        credit_card_scan,
        luhn_valid,
    )

    rows = [
        (1, "pay 4111111111111111 today"),  # valid Visa test number
        (2, "card 4111 1111 1111 1111 on file"),  # separated, valid
        (3, "typo 4111111111111112 rejected"),  # checksum off by one
        (4, "amex 378282246310005 works"),  # valid 15-digit
        (5, "order 1234567890123 is not a card"),  # 13 digits, invalid
        (6, "short 12345 number"),  # below candidate window
        (7, "no digits at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["n_cc_candidates"],
            r["n_cc_valid"],
            r["scrubbed"],
        )
        for r in credit_card_scan(df).collect()
    }
    assert out[1] == (1, 1, "pay <CC> today")
    assert out[2] == (1, 1, "card <CC> on file")
    assert out[3] == (1, 0, "typo <CC> rejected")  # redacted anyway
    assert out[4] == (1, 1, "amex <CC> works")
    assert out[5] == (1, 0, "order <CC> is not a card")
    assert out[6] == (0, 0, "short 12345 number")
    assert out[7] == (0, 0, "no digits at all here")

    # the fold itself on bare digit strings
    d = spark.createDataFrame(
        [("4111111111111111",), ("4111111111111112",), ("0000000000000",)],
        "d string",
    )
    got = [
        r["ok"]
        for r in d.select(luhn_valid(F.col("d")).alias("ok")).collect()
    ]
    assert got == [True, False, True]  # all-zeros IS Luhn-valid
