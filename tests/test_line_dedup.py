"""line_dedup_corpus: corpus-wide first-occurrence line dedup (the
C4 line-grain pass). Differential coverage is q:`line_dedup_extracted`
(nav-bar boilerplate collapsing to one copy corpus-wide)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.text import (
    line_dedup_corpus,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (
            r["text_deduped"],
            r["n_lines_kept"],
            r["n_lines_removed"],
        )
        for r in line_dedup_corpus(df).collect()
    }


def test_first_occurrence_survives_cross_doc(spark):
    out = _run(
        spark,
        [
            (1, "boiler\nunique one"),
            (2, "boiler\nunique two"),
            (3, "unique three\nboiler"),
        ],
    )
    # "boiler" kept only at its (1, 1) first occurrence
    assert out[1] == ("boiler\nunique one", 2, 0)
    assert out[2] == ("unique two", 1, 1)
    assert out[3] == ("unique three", 1, 1)


def test_within_doc_duplicates_collapse(spark):
    out = _run(spark, [(1, "x\ny\nx\nx\nz")])
    assert out[1] == ("x\ny\nz", 3, 2)


def test_line_order_preserved(spark):
    out = _run(spark, [(1, "c\na\nb")])
    assert out[1][0] == "c\na\nb"  # document order, never sorted


def test_blank_and_padded_lines(spark):
    out = _run(spark, [(1, "  a  \n\n   \na"), (2, "a")])
    # trimmed "a" twice in doc 1 → one kept; doc 2's copy removed
    assert out[1] == ("a", 1, 1)
    assert out[2] == ("", 0, 1)


def test_fully_deduplicated_doc_keeps_row(spark):
    out = _run(spark, [(1, "only line"), (2, "only line")])
    assert out[2] == ("", 0, 1)
    assert set(out) == {1, 2}


def test_null_id_fails_loudly(spark):
    df = spark.createDataFrame(
        [(None, "a\nb")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="NULL id"):
        line_dedup_corpus(df).collect()


def test_null_text_excluded(spark):
    out = _run(spark, [(1, None), (2, "keep me")])
    assert set(out) == {2}


def test_null_id_fails_loudly_even_after_warm_run(spark):
    """Regression (r13): with a prior successful run in the session,
    AQE's empty-relation propagation used to skip the stage carrying
    the assert (it fired only in a background broadcast thread) and
    the NULL-id doc came back silently destroyed. The guard now rides
    the always-materialized left side."""
    ok = spark.createDataFrame(
        [(1, "boiler\nx"), (2, "boiler\ny")], "doc_id long, text string"
    )
    line_dedup_corpus(ok).collect()  # warm the plan shape
    bad = spark.createDataFrame(
        [(None, "a\nb")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="NULL id"):
        line_dedup_corpus(bad).collect()
