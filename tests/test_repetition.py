"""Gopher repetition gates: hand-computed statistics on planted
shapes, overlap safety of the coverage union, and threshold behavior.
The corpus-scale differential is q:`gopher_repetition`.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.repetition import (
    gopher_repetition_filter,
    repetition_stats,
)


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0].asDict()


def test_dup_lines_hand_computed(spark):
    s = _stats(spark, "good line\ngood line\nunique tail line")
    # 3 lines, 2 distinct → 1/3 duplicated
    assert s["dup_line_frac"] == round(1 / 3, 6)
    # line chars 9+9+16=34; distinct 9+16=25 → excess 9/34
    assert s["dup_line_char_frac"] == round(9 / 34, 6)


def test_blank_and_padded_lines_ignored(spark):
    s = _stats(spark, "a line\n\n   \n  a line  \nb")
    # "a line" twice (trimmed), "b" once → 1/3 dup
    assert s["dup_line_frac"] == round(1 / 3, 6)


def test_top_ngram_fraction_hand_computed(spark):
    # norm chars = 39; top bigram "spam spam" occurs 7x (overlapping),
    # len 9 → 63/39 (the standard overlap-counting definition can
    # exceed 1 — deterministic on both engines)
    s = _stats(spark, "spam spam spam spam spam spam spam spam")
    assert s["top2_frac"] == round(7 * 9 / 39, 6)
    assert s["top3_frac"] == round(6 * 14 / 39, 6)


def test_dup_ngram_coverage_is_union_not_sum(spark):
    # "a b c d e" repeated 3x: every 5-gram position is covered by a
    # duplicated 5-gram → coverage is EXACTLY 1.0 even though the
    # duplicated grams overlap heavily (a sum would exceed 1)
    s = _stats(spark, "a b c d e a b c d e a b c d e")
    assert s["dup_ngram_frac"] == 1.0


def test_partial_coverage(spark):
    # 'x y z w v' unique tail after a repeated 5-gram block:
    # tokens: a b c d e a b c d e x y z w v (15 tokens, 15 chars)
    # duplicated 5-grams: 'a b c d e' (pos 0 and 5) → covers 0..9
    s = _stats(spark, "a b c d e a b c d e x y z w v")
    assert s["dup_ngram_frac"] == round(10 / 15, 6)


def test_no_repetition_all_zero(spark):
    s = _stats(spark, "one two three four five six seven eight")
    assert s["dup_line_frac"] == 0.0
    assert s["dup_ngram_frac"] == 0.0
    assert s["top2_frac"] > 0  # a top bigram always exists (n_toks>=2)


def test_short_doc_no_grams(spark):
    s = _stats(spark, "only three words")
    # no 4-grams or 5-grams → those stats are 0, not NULL
    assert s["top4_frac"] == 0.0
    assert s["dup_ngram_frac"] == 0.0


def test_filter_branches(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "a b c d e a b c d e a b c d e"),
            (3, "good line\ngood line\nunique tail line"),
            # long enough that a count-1 top bigram stays under the
            # threshold (the Gopher gates target web-scale docs, not
            # ten-token strings)
            (
                4,
                "a perfectly ordinary sentence with varied words "
                "that keeps going on about many different things "
                "such as weather trade ships harbors maps stars "
                "navigation currents tides winds sails ropes decks "
                "plus more plain prose so no single gram can span "
                "a big share of such a long and wordy document",
            ),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["reject_reason"], r["keep"])
        for r in gopher_repetition_filter(df).collect()
    }
    assert out[1] == ("top2_ngram", False)
    assert out[2] == ("top2_ngram", False)
    assert out[3] == ("dup_lines", False)
    assert out[4] == ("", True)


def test_null_text_excluded(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "some ordinary words here")],
        "doc_id long, text string",
    )
    rows = repetition_stats(df).collect()
    assert [r["doc_id"] for r in rows] == [2]


# ---------------------------------------------------------------------------
# character entropy gate (r13)
# ---------------------------------------------------------------------------


def test_char_entropy_hand_computed(spark):
    import math

    from churn_model_evaluation_platform_spark.operators.repetition import (
        char_entropy,
    )

    rows = [
        (1, "aaaa"),  # one symbol -> exactly 0 bits
        (2, "abab"),  # two equiprobable symbols -> exactly 1 bit
        (3, "abcd"),  # four equiprobable -> exactly 2 bits
        (4, "aab"),  # 2/3,1/3 mix
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict() for r in char_entropy(df).collect()
    }
    assert out[1]["char_entropy"] == 0.0 and out[1]["keep"] is False
    assert out[2]["char_entropy"] == 1.0 and out[2]["keep"] is False
    assert out[3]["char_entropy"] == 2.0 and out[3]["keep"] is True

    def term(p):
        return round(-p * math.log2(p) * 1e6)

    want = round((term(2 / 3) + term(1 / 3)) / 1e6, 6)
    assert out[4]["char_entropy"] == want
    assert (out[3]["n_chars"], out[3]["n_distinct_chars"]) == (4, 4)


def test_char_entropy_normalization_applied(spark):
    from churn_model_evaluation_platform_spark.operators.repetition import (
        char_entropy,
    )

    # "AA  aa" normalizes to "aa aa": chars {a:4, ' ':1}
    df = spark.createDataFrame(
        [(1, "AA  aa")], "doc_id long, text string"
    )
    row = char_entropy(df).collect()[0]
    assert row["n_chars"] == 5
    assert row["n_distinct_chars"] == 2


def test_char_entropy_edge_docs_guarded(spark):
    # Regression (r14): the Spark side now carries the same guards as
    # the DuckDB replay (length(norm) > 0, ch <> '') instead of relying
    # on split(col, '') dropping empty elements — empty and
    # whitespace-only docs must vanish from the output on both paths,
    # even if a Spark upgrade changes empty-pattern split semantics.
    from churn_model_evaluation_platform_spark.operators.repetition import (
        char_entropy,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "abcd")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in char_entropy(df).collect()}
    assert set(out) == {4}
    assert out[4]["char_entropy"] == 2.0
