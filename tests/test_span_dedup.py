"""C4-style exact span dedup (operators/text.py span_dedup_corpus):
corpus-wide removal of words covered by an n-word span whose identical
text occurred earlier. The cross-engine hash lives in the registry
(span_dedup_exact); here: the semantic edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_string_ids_order_lexicographically(spark):
    """The first-occurrence order is a struct (id, pos) min — any
    orderable id type works (the old doc_id * 2^20 + pos arithmetic
    NULLed out on non-integer ids and silently disabled dedup:
    ADVICE r11 low)."""
    df = spark.createDataFrame(
        [("docA", "s p a n x"), ("docB", "s p a n y")],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: (r["text_deduped"], r["n_words_removed"])
        for r in span_dedup_corpus(df, n=4).collect()
    }
    assert rows["docA"] == ("s p a n x", 0)
    assert rows["docB"] == ("y", 4)


def test_huge_position_beyond_old_encoding_bound(spark):
    """Positions past 2^20 mis-ordered under the old arithmetic
    encoding; the struct order has no bound. One >2^20-word doc and a
    later doc repeating its TAIL span: the tail's first occurrence is
    doc 1, so doc 2 dedups."""
    n_words = (1 << 20) + 8
    df = (
        spark.range(1)
        .select(
            F.lit(1).alias("doc_id"),
            F.concat(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(n_words - 3)),
                        lambda i: F.concat(F.lit("w"), (i % 7).cast("string")),
                    ),
                    " ",
                ),
                F.lit(" zz yy xx"),
            ).alias("text"),
        )
        .union(
            spark.range(1).select(
                F.lit(2).alias("doc_id"),
                F.lit("qq zz yy xx").alias("text"),
            )
        )
    )
    rows = {
        r["doc_id"]: (r["text_deduped"], r["n_words_removed"])
        for r in span_dedup_corpus(df, n=4).collect()
    }
    # doc 2's "qq zz yy xx" never occurred; but with n=4 the span
    # "<last w> zz yy xx" of doc 1 is its first occurrence — doc 2's
    # only 4-gram is novel, so doc 2 survives whole; doc 1 dedups
    # internally on its repeating w0..w6 cycle but its TAIL survives.
    assert rows[2] == ("qq zz yy xx", 0)
    assert rows[1][0].endswith("zz yy xx")


def test_null_id_fails_loudly(spark):
    df = spark.createDataFrame(
        [(None, "a b c d e f"), (2, "a b c d e f")],
        "doc_id bigint, text string",
    )
    with pytest.raises(Exception, match="NULL id"):
        span_dedup_corpus(df, n=3).collect()


def test_null_id_fails_loudly_even_after_warm_run(spark):
    """Regression (r13): same AQE empty-relation hole as the line
    dedup twin — a warm plan shape let the NULL-id doc through as
    text_deduped='' / everything-removed while the assert fired only
    in a background thread. Guard now on the left side's n_words."""
    import pytest as _pytest

    from churn_model_evaluation_platform_spark.operators.text import (
        span_dedup_corpus,
    )

    ok = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e x y")],
        "doc_id long, text string",
    )
    span_dedup_corpus(ok).collect()
    bad = spark.createDataFrame(
        [(None, "a b c d e f g")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="NULL id"):
        span_dedup_corpus(bad).collect()
