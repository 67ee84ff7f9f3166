"""C4-style exact span dedup (operators/text.py span_dedup_corpus):
corpus-wide removal of words covered by an n-word span whose identical
text occurred earlier. The cross-engine hash lives in the registry
(span_dedup_exact); here: the semantic edge cases.
"""

from __future__ import annotations

import pytest

from churn_model_evaluation_platform_spark.operators.text import (
    span_dedup_corpus,
)


def _run(spark, docs, n=3):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text_deduped"], r["n_words_removed"])
        for r in span_dedup_corpus(df, n=n).collect()
    }


def test_repeated_boilerplate_collapses_to_first_occurrence(spark):
    out = _run(
        spark,
        [
            (1, "subscribe to our newsletter for more a b c"),
            (2, "x y z subscribe to our newsletter for more"),
            (3, "subscribe to our newsletter for more"),
        ],
        n=6,
    )
    # doc 1 holds the first occurrence: untouched
    assert out[1] == ("subscribe to our newsletter for more a b c", 0)
    # docs 2 and 3 lose every word the repeated span covers
    assert out[2] == ("x y z", 6)
    assert out[3] == ("", 6)


def test_within_doc_repetition_keeps_first_span(spark):
    out = _run(spark, [(1, "p q r s p q r s")], n=4)
    assert out[1] == ("p q r s", 4)


def test_short_docs_untouched(spark):
    out = _run(spark, [(1, "a b"), (2, "a b")], n=3)
    assert out == {1: ("a b", 0), 2: ("a b", 0)}


def test_overlap_can_eat_into_a_first_occurrence(spark):
    # "b c d" in doc 2 duplicates doc 1; the covered words include the
    # start of doc 2's otherwise-novel tail — documented word-level rule
    out = _run(spark, [(1, "a b c d"), (2, "b c d e")], n=3)
    assert out[1] == ("a b c d", 0)
    assert out[2] == ("e", 3)


def test_null_text_rows_are_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    rows = span_dedup_corpus(df, n=3).collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_determinism(spark):
    docs = [(i, f"w{i % 4} common span here tail{i}") for i in range(20)]
    a = _run(spark, docs, n=3)
    b = _run(spark, docs, n=3)
    assert a == b
    # "common span here" first occurs in doc 0; docs 1-3 also hold the
    # first "w<k> common span" for their prefix word (3 removed); from
    # doc 4 on, that span duplicates too (4 removed)
    assert a[0] == ("w0 common span here tail0", 0)
    assert all(a[i] == (f"w{i} tail{i}", 3) for i in range(1, 4))
    assert all(a[i] == (f"tail{i}", 4) for i in range(4, 20))
