"""BPE tokenizer training — merge-application semantics, the trainer
loop against a pure-Python reference twin, and the generated DuckDB
replay (the oracle) against the Spark run on the same tiny corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from churn_model_evaluation_platform_spark.operators.bpe_train import (
    apply_merge,
    bpe_train,
    bpe_train_sql,
    bpe_word_freqs,
    pair_counts,
)


def _apply_merge_py(sym: str, a: str, b: str) -> str:
    """Reference leftmost-scan merge (the classic trainer's rewrite)."""
    toks = sym.split(" ")
    out: list = []
    pend = None
    for x in toks:
        if pend == a and x == b:
            out.append(a + b)
            pend = None
        elif pend is None:
            pend = x
        else:
            out.append(pend)
            pend = x
    if pend is not None:
        out.append(pend)
    return " ".join(out)


def _bpe_train_py(texts: list, k: int) -> list:
    """Pure-Python trainer twin: word freq → k × (pair count, argmax
    by (count desc, a, b), leftmost-scan rewrite)."""
    import collections
    import re

    wc: dict = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if re.fullmatch("[a-z]+", w):
                wc[w] += 1
    wf = {w: [c, re.sub("(.)", r"\1 ", w) + "_"] for w, c in wc.items()}
    merges = []
    for step in range(1, k + 1):
        pc: dict = collections.Counter()
        for c, s in wf.values():
            toks = s.split(" ")
            for x, y in zip(toks, toks[1:]):
                pc[(x, y)] += c
        m = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == m)[0]
        merges.append((step, a, b, a + b, m))
        for v in wf.values():
            v[1] = _apply_merge_py(v[1], a, b)
    return merges


@pytest.mark.parametrize(
    "sym,a,b,expect",
    [
        ("x x x", "x", "x", "xx x"),  # run of 3: leftmost pair only
        ("x x x x", "x", "x", "xx xx"),
        ("a b a b a b", "a", "b", "ab ab ab"),
        ("t h e _", "h", "e", "t he _"),
        ("t h e _", "z", "q", "t h e _"),  # no match
        ("q", "a", "b", "q"),  # single symbol
        ("a b b", "a", "b", "ab b"),  # merged left absorbs only once
    ],
)
def test_apply_merge_leftmost_scan(spark, sym, a, b, expect):
    row = spark.createDataFrame([(sym,)], "sym string").select(
        apply_merge(F.col("sym"), a, b).alias("m")
    )
    assert row.collect()[0]["m"] == expect
    assert _apply_merge_py(sym, a, b) == expect


def test_word_freqs_filter_and_sym(spark):
    df = spark.createDataFrame(
        [("the the Big b2g ok",), ("the ok",)], "text string"
    )
    rows = {
        r["word"]: (r["cnt"], r["sym"])
        for r in bpe_word_freqs(df).collect()
    }
    # mixed-case and digit words are filtered; counts aggregate
    assert rows == {"the": (3, "t h e _"), "ok": (2, "o k _")}


def test_pair_counts_weighted_and_guarded(spark):
    df = spark.createDataFrame(
        [("ab", 3, "a b"), ("solo", 5, "q")],
        "word string, cnt long, sym string",
    )
    got = {
        (r["a"], r["b"]): r["pcnt"] for r in pair_counts(df).collect()
    }
    # the single-symbol row contributes nothing (no phantom reversed
    # pair from Spark's descending sequence(1, 0))
    assert got == {("a", "b"): 3}


def test_bpe_train_matches_python_twin(spark):
    texts = [
        "low lower lowest new newer newest low low wider wide",
        "low newer wide wide wider lowest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, wf = bpe_train(df, k=6)
    assert merges == _bpe_train_py(texts, 6)
    # every learned merged symbol appears in the final segmentation
    syms = set()
    for r in wf.collect():
        syms.update(r["sym"].split(" "))
    assert merges[0][3] in syms or any(
        merges[0][3] in s for s in syms
    )


def test_bpe_train_sql_replays_spark_run(spark, tmp_path):
    texts = [
        "aaab aab ab ab b aaab casa cast cast base base",
        "casa base aab ab aaab",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    pq = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(pq)
    merges, _ = bpe_train(df, k=5)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')"
    )
    got = sorted(con.execute(bpe_train_sql(5)).fetchall())
    assert got == merges


def test_bpe_train_fails_loud_when_pairs_exhausted(spark):
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    # "ab" exhausts after 2 merges (a+b, ab+_)
    with pytest.raises(ValueError, match="exhausted"):
        bpe_train(df, k=5)
