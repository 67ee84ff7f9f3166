"""Exact BPE tokenization (operators/bpe.py, VERDICT r9 next #4).

Proves the three-way spec equivalence the oracle relies on:
the JVM replace-chain (Spark), the DuckDB replace-chain (oracle
fragment), and the classic lowest-rank-adjacent-pair merge loop
(encode_word_reference) produce identical tokenizations — over the
real fixture corpus, pinned hand-derived cases, and the Sennrich-style
textbook example with custom merges.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators import bpe
from churn_model_evaluation_platform_spark.operators.text import (
    BPE_TOKEN_PATTERN,
)

SF = "/root/testdata/sf0.001"


def _reference_doc(text: str, merges=None) -> list[str]:
    pat = re.compile(BPE_TOKEN_PATTERN)
    return [
        t
        for w in pat.findall(text or "")
        for t in bpe.encode_word_reference(w, merges)
    ]


# ---------------------------------------------------------------------------
# pinned expectations (hand-derived from BPE_MERGES rank order)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "word,expected",
    [
        # full-vocabulary words collapse to one token
        ("window", ["window"]),
        ("query", ["query"]),
        ("stream", ["stream"]),
        ("filter", ["filter"]),
        ("column", ["column"]),
        # partial merges: (o,w) fires (rank 3), nothing joins r or s
        ("rows", ["r", "ow", "s"]),
        # merge ORDER matters: (e,r) rank 0 fires before (o,r) rank 1
        ("orer", ["or", "er"]),
        # unseen word: character fallback except trained subparts
        ("zebra", ["z", "e", "b", "r", "a"]),
    ],
)
def test_pinned_word_tokenizations(spark, word, expected):
    assert bpe.encode_word_reference(word) == expected
    got = (
        spark.range(1)
        .select(bpe.bpe_tokens(F.lit(word)).alias("t"))
        .first()["t"]
    )
    assert list(got) == expected


def test_textbook_custom_merges(spark):
    # Sennrich-style: with merges [(l,o),(lo,w)] only, "low lowest"
    # tokenizes to [low, low, e, s, t] — the operator is generic in the
    # merges table, not hardwired to the pinned vocabulary.
    merges = [("l", "o"), ("lo", "w")]
    expected = ["low", "low", "e", "s", "t"]
    assert _reference_doc("low lowest", merges) == expected
    got = (
        spark.range(1)
        .select(bpe.bpe_tokens(F.lit("low lowest"), merges).alias("t"))
        .first()["t"]
    )
    assert list(got) == expected


def test_pretokenizer_boundaries(spark):
    # Merges never cross pre-token (word/punct/digit-run) boundaries:
    # "sc an" must NOT merge into "scan" even though (s,can) is trained.
    assert _reference_doc("sc an") == ["s", "c", "an"]
    got = (
        spark.range(1)
        .select(bpe.bpe_tokens(F.lit("sc an")).alias("t"))
        .first()["t"]
    )
    assert list(got) == ["s", "c", "an"]


def test_empty_and_punctuation(spark):
    row = (
        spark.createDataFrame(
            [(0, ""), (1, "can't stop!"), (2, "a  b")], ["doc_id", "text"]
        )
        .select(
            "doc_id",
            bpe.bpe_tokens(F.col("text")).alias("t"),
            bpe.bpe_token_count_col(F.col("text")).alias("n"),
        )
        .orderBy("doc_id")
        .collect()
    )
    # empty text -> zero tokens (split('') yields [''], excluded by count)
    assert row[0]["n"] == 0
    # contraction suffix is its own pre-token; (', t) is untrained so
    # it falls back to characters: can | ' t | st o p | !
    assert list(row[1]["t"]) == ["can", "'", "t", "st", "o", "p", "!"]
    assert row[1]["n"] == 7
    assert row[2]["n"] == 2


# ---------------------------------------------------------------------------
# corpus-wide three-way equivalence
# ---------------------------------------------------------------------------


def test_spark_chain_equals_reference_loop_on_corpus(spark):
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", bpe.bpe_tokens(F.col("text")).alias("t"))
        .collect()
    )
    assert len(rows) >= 100
    for r in rows:
        assert list(r["t"]) == _reference_doc(r["text"]), r["doc_id"]


def test_duckdb_fragment_equals_spark_counts(spark):
    s_expr, c_expr = bpe.exact_token_count_sql("text")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    dk = dict(
        con.execute(
            f"WITH m AS (SELECT doc_id, {s_expr} AS s FROM documents) "
            f"SELECT doc_id, {c_expr} FROM m"
        ).fetchall()
    )
    sp = {
        r["doc_id"]: r["n_tokens_exact"]
        for r in bpe.bpe_token_count(
            spark.read.parquet(f"{SF}/documents.parquet")
        ).collect()
    }
    assert sp == dk


def test_separators_absent_from_corpus():
    # The wrap encoding requires text to contain neither US nor RS —
    # guaranteed for the fixture corpus (ASCII >= 0x20).
    (lo,) = duckdb.sql(
        f"SELECT min(unicode(c)) FROM (SELECT unnest(string_split_regex(text,'')) c "
        f"FROM '{SF}/documents.parquet')"
    ).fetchone()
    assert lo >= 32


def test_count_matches_token_array_len(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    rows = df.select(
        F.size(bpe.bpe_tokens(F.col("text"))).alias("k"),
        bpe.bpe_token_count_col(F.col("text")).alias("n"),
    ).collect()
    for r in rows:
        assert r["k"] == r["n"]
