"""Regression pins for the five round-12 ADVICE items (all latent
cross-engine divergences caught by the advisor's code read, none
triggered by a live query):

1. ``bm25_sql`` rendered the IN list via Python tuple repr — a single
   term produced ``IN ('x',)`` (invalid SQL) and an embedded quote
   broke quoting.
2. ``bm25_sql`` inlined ``round(1-b, 2)`` while the Spark side uses
   the exact double ``1.0-b`` — coincidentally equal only for b=0.75.
3. ``hll_estimate_sql`` always inlined the closed-form alpha while
   ``hll_alpha()`` returns table constants for m<128.
4. ``hist_registers``/``hist_sql`` diverged on NaN: DuckDB raises on
   CAST(floor(NaN) AS BIGINT) while Spark's non-ANSI cast silently
   bins the row. Both now drop NaN alongside NULL.
5. ``feature_hash_vec_py`` tokenized with Python's Unicode-aware \\s
   while the Catalyst/DuckDB twins use ASCII-only \\s (Java/RE2), so
   non-ASCII whitespace embedded differently through the Python path.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F


DOCS = [
    (1, "apple banana apple cherry"),
    (2, "banana cherry cherry d'angelo"),
    (3, "apple apple apple zebra"),
    (4, "cherry"),
]


def _duck_docs(con):
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)


def test_bm25_sql_single_term_is_valid_sql():
    from churn_model_evaluation_platform_spark.operators.text import bm25_sql

    con = duckdb.connect()
    _duck_docs(con)
    sql = bm25_sql("docs", terms=("apple",), k=3)
    assert "('apple',)" not in sql  # the old tuple-repr bug
    rows = con.execute(sql).fetchall()
    assert [r[0] for r in rows] == [3, 1]  # doc 3 has tf=3, doc 1 tf=2


def test_bm25_sql_quoted_term_is_escaped():
    from churn_model_evaluation_platform_spark.operators.text import bm25_sql

    con = duckdb.connect()
    _duck_docs(con)
    rows = con.execute(bm25_sql("docs", terms=("d'angelo",), k=3)).fetchall()
    assert [r[0] for r in rows] == [2]


def test_bm25_nondefault_b_spark_duckdb_parity(spark):
    """b=0.8 → 1-b = 0.19999999999999996; the old round(.,2) oracle
    constant (0.2) could flip the 6th decimal. Both engines must now
    fold the identical double."""
    from churn_model_evaluation_platform_spark.operators.text import (
        bm25_sql,
        bm25_topk,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["doc_id"], r["bm25"], r["n_terms_matched"])
        for r in bm25_topk(
            df, ["apple", "cherry"], k=4, b=0.8
        ).collect()
    ]
    con = duckdb.connect()
    _duck_docs(con)
    want = con.execute(
        bm25_sql("docs", terms=("apple", "cherry"), k=4, b=0.8)
    ).fetchall()
    assert got == [tuple(r) for r in want]
    assert "0.19999999999999996" in bm25_sql("docs", terms=("x",), b=0.8)


def test_hll_alpha_single_source_small_m():
    from churn_model_evaluation_platform_spark.operators.sketch import (
        hll_alpha,
        hll_estimate_sql,
    )

    # table constants for m<128 (Flajolet et al. Fig. 3)
    for p, alpha in [(4, 0.673), (5, 0.697), (6, 0.709)]:
        assert hll_alpha(p) == alpha
        assert repr(alpha) in hll_estimate_sql("SELECT 1", p=p)
    # closed form at the default precision, still the same source
    assert repr(hll_alpha(10)) in hll_estimate_sql("SELECT 1", p=10)
    assert math.isclose(hll_alpha(10), 0.7213 / (1.0 + 1.079 / 1024))


def test_hist_nan_dropped_identically(spark):
    from churn_model_evaluation_platform_spark.operators.sketch import (
        hist_quantiles,
        hist_registers,
        hist_sql,
    )

    vals = [1.0, 2.0, 3.0, 4.0, float("nan"), None, 2.5]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    regs = hist_registers(df, "v", lo=0.0, hi=5.0, nbins=10)
    # NaN and NULL both gone: 5 surviving rows
    assert regs.agg(F.sum("c")).collect()[0][0] == 5
    got = {
        r["q"]: r["hist_estimate"]
        for r in hist_quantiles(
            regs, [0.5], lo=0.0, hi=5.0, nbins=10
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?)", [(v,) for v in vals]
    )
    # the old oracle raised here: CAST(floor(NaN) AS BIGINT)
    want = con.execute(
        hist_sql("SELECT v FROM t", "v", [0.5], lo=0.0, hi=5.0, nbins=10)
    ).fetchall()
    assert {r[0]: r[1] for r in want} == got


@pytest.mark.parametrize(
    "text",
    [
        "caf\u00e9 du\u00a0monde",  # NBSP inside: ONE token
        "\u00a0leading nbsp",  # leading NBSP survives ASCII trim
        "ideographic\u3000space",  # U+3000 is \s in Python, not Java
    ],
)
def test_feature_hash_vec_py_ascii_whitespace_only(spark, text):
    from churn_model_evaluation_platform_spark.operators.similarity import (
        feature_hash_embed,
        feature_hash_vec_py,
    )

    df = spark.createDataFrame([(0, text)], "cid long, t string")
    got = list(
        df.select(feature_hash_embed(F.col("t")).alias("v"))
        .collect()[0]["v"]
    )
    assert got == feature_hash_vec_py(text)
